"""Pallas TPU kernels: the generator's 1x1 feature tap as a fused
IN -> conv1x1 -> IN -> PReLU -> conv1x1 -> IN -> PReLU chain.

The tap256 stage (reference models/networks/generator.py:205-224,
``layer256``) runs three per-sample instance norms interleaved with two
1x1 convs on the generator's largest activation (crop^2 x 128). Under
XLA each instance norm is a reduction barrier, so the chain costs ~7
full HBM round trips and measures ~0.83 ms/img @512px/B16 (~6-8 TF/s
effective) — it is bandwidth-bound, not FLOPs-bound. Instance-norm
statistics are per-sample, so they cannot be folded into the conv
weights (that would make the weights batch-dependent); a fused kernel
is the only way to cut the traffic.

This implementation runs FOUR pallas_call passes (each one sequential
scan over row-blocks per batch element):

  1. stats(x)                          -> sum/sumsq per (b, channel)
  2. t = bf16((x - m1) * r1) @ W1 + b1 -> t, stats(t)
  3. u = bf16(prelu((t - m2) * r2)) @ W2 + b2 -> u, stats(u)
  4. out = prelu((u - m3) * r3)

i.e. ~8 blockwise HBM transfers instead of XLA's ~13 (reads of x are
the expensive ones: x is Cin=128 wide, t/u are 64), with every matmul
on the MXU and all normalization arithmetic in f32 in VMEM. Statistics
use the same one-pass E[x^2]-E[x]^2 f32 form as ``nn.layers
.instance_norm``'s bfloat16 path, computed from the values the next
stage actually consumes (post-cast bf16, like the XLA composite).

Gradients are not defined (inference path only); the training graph
keeps the XLA composite (PPSTConfig.fused_tap gates call sites).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_EPS = 1e-5


def _pick_bh(h: int) -> int:
    # 16 rows x 512 lanes x 128ch keeps the conv stage's working set
    # (bf16 block + f32 normalized copy + f32 matmul result + double
    # buffering) under the 16 MB VMEM budget; 32 rows OOMs at W=512.
    for bh in (16, 8):
        if h % bh == 0:
            return bh
    return h


def _stats_kernel(x_ref, s_ref):
    """Accumulate per-(batch, channel) sum and sum-of-squares."""
    h = pl.program_id(1)

    @pl.when(h == 0)
    def _init():
        s_ref[...] = jnp.zeros_like(s_ref)

    x = x_ref[0].astype(jnp.float32)  # (bh, W, C)
    s_ref[0, 0, :] += jnp.sum(x, axis=(0, 1))
    s_ref[0, 1, :] += jnp.sum(x * x, axis=(0, 1))


def _in_conv_kernel(m_ref, r_ref, w_ref, b_ref, a_ref, x_ref, t_ref, s_ref,
                    *, prelu: bool):
    """t = bf16((prelu?((x - m) * r)) @ W + b); accumulate stats of t."""
    h = pl.program_id(1)

    @pl.when(h == 0)
    def _init():
        s_ref[...] = jnp.zeros_like(s_ref)

    x = x_ref[0].astype(jnp.float32)  # (bh, W, Cin)
    y = (x - m_ref[0, 0]) * r_ref[0, 0]
    if prelu:
        a = a_ref[0, 0]
        y = jnp.maximum(y, 0.0) + a * jnp.minimum(y, 0.0)
    bh, wdim, cin = y.shape
    y = jnp.dot(
        y.reshape(bh * wdim, cin).astype(jnp.bfloat16),
        w_ref[...],
        preferred_element_type=jnp.float32,
    )
    y = (y + b_ref[0]).astype(t_ref.dtype)
    t_ref[0] = y.reshape(bh, wdim, -1)
    y32 = y.astype(jnp.float32)
    s_ref[0, 0, :] += jnp.sum(y32, axis=0)
    s_ref[0, 1, :] += jnp.sum(y32 * y32, axis=0)


def _in_prelu_kernel(m_ref, r_ref, a_ref, x_ref, o_ref):
    x = x_ref[0].astype(jnp.float32)
    y = (x - m_ref[0, 0]) * r_ref[0, 0]
    a = a_ref[0, 0]
    y = jnp.maximum(y, 0.0) + a * jnp.minimum(y, 0.0)
    o_ref[0] = y.astype(o_ref.dtype)


def _moments(sums, n):
    mean = sums[:, 0, :] / n
    var = jnp.maximum(sums[:, 1, :] / n - jnp.square(mean), 0.0)
    return mean[:, None, :], jax.lax.rsqrt(var + _EPS)[:, None, :]


def fused_tap_1x1(x, w1, b1, a1, w2, b2, a2, interpret: bool | None = None):
    """IN(x) @ w1 + b1 -> IN -> PReLU(a1) -> @ w2 + b2 -> IN -> PReLU(a2).

    ``x``: (B, H, W, Cin) bfloat16; ``w1``/``w2``: (Cin, C1)/(C1, C2)
    f32 (cast to bf16 like TorchConv2d does in bf16 compute mode);
    ``a1``/``a2``: scalar PReLU slopes. Returns (B, H, W, C2) bf16.
    """
    b, h, w, cin = x.shape
    c1, c2 = w1.shape[1], w2.shape[1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bh = _pick_bh(h)
    grid = (b, h // bh)
    seq = dict(
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        )
    ) if not interpret else {}

    row_spec = lambda c: pl.BlockSpec((1, bh, w, c), lambda i, j: (i, j, 0, 0))
    stat_spec = lambda c: pl.BlockSpec((1, 2, c), lambda i, j: (i, 0, 0))
    bc_spec = lambda shape: pl.BlockSpec(shape, lambda i, j: (0,) * len(shape))
    per_b = lambda c: pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0))

    stats = pl.pallas_call(
        _stats_kernel,
        grid=grid,
        in_specs=[row_spec(cin)],
        out_specs=stat_spec(cin),
        out_shape=jax.ShapeDtypeStruct((b, 2, cin), jnp.float32),
        interpret=interpret,
        **seq,
    )(x)
    m1, r1 = _moments(stats, h * w)

    def conv_stage(inp, m, r, wmat, bias, alpha, cout, prelu):
        kern = functools.partial(_in_conv_kernel, prelu=prelu)
        t, s = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                per_b(inp.shape[-1]),           # mean
                per_b(inp.shape[-1]),           # rstd
                bc_spec((inp.shape[-1], cout)),  # weight
                bc_spec((1, cout)),              # bias
                bc_spec((1, 1)),                 # prelu alpha
                row_spec(inp.shape[-1]),
            ],
            out_specs=[row_spec(cout), stat_spec(cout)],
            out_shape=[
                jax.ShapeDtypeStruct((b, h, w, cout), x.dtype),
                jax.ShapeDtypeStruct((b, 2, cout), jnp.float32),
            ],
            interpret=interpret,
            **seq,
        )(
            m, r,
            wmat.astype(jnp.bfloat16),
            bias.astype(jnp.float32).reshape(1, cout),
            jnp.asarray(alpha, jnp.float32).reshape(1, 1),
            inp,
        )
        return t, s

    t, s2 = conv_stage(x, m1, r1, w1, b1, 0.0, c1, prelu=False)
    m2, r2 = _moments(s2, h * w)
    u, s3 = conv_stage(t, m2, r2, w2, b2, a1, c2, prelu=True)
    m3, r3 = _moments(s3, h * w)

    out = pl.pallas_call(
        _in_prelu_kernel,
        grid=grid,
        in_specs=[
            per_b(c2), per_b(c2),
            bc_spec((1, 1)),
            row_spec(c2),
        ],
        out_specs=row_spec(c2),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c2), x.dtype),
        interpret=interpret,
        **seq,
    )(m3, r3, jnp.asarray(a2, jnp.float32).reshape(1, 1), u)
    return out
