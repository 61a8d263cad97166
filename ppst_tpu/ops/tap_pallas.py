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

Training support (round 5): ``fused_tap_1x1`` carries a ``jax.custom_vjp``
whose backward pass is four more Pallas kernels of the same shape
(sequential row-block scans accumulating per-(batch, channel) statistics,
then applying the instance-norm backward identity
``dx = r * (g - mean(g) - x_hat * mean(g * x_hat))`` stage by stage while
gathering dW/db/dalpha on the fly). Gradient-exactness vs the XLA
composite is tested in tests/test_pallas_kernels.py::test_tap_pallas_grad;
the knob is legal under --dtype bfloat16 training.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_EPS = 1e-5


def _pick_bh(h: int, w: int = 512, cin: int = 128) -> int:
    # Budget-aware row-block height: the conv stage's working set
    # (bf16 block + f32 normalized copy + f32 matmul result + double
    # buffering) scales with bh*w*cin; 16 rows at W=512/Cin=128 is the
    # measured sweet spot (~8.4 MB), 32 rows OOMs there, and W=1024
    # needs 8 rows (16 rows hit the 16 MB scoped-vmem limit — round-5
    # 1024px grid serving).
    budget = 9 * 1024 * 1024
    for bh in (16, 8, 4, 2, 1):
        if h % bh == 0 and bh * w * cin * 8 <= budget:
            return bh
    return 1


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

    Differentiable: a custom VJP runs the backward as Pallas kernels
    (see module docstring).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _fused_tap(bool(interpret), x, w1, b1, a1, w2, b2, a2)


def _fused_tap_impl(interpret, x, w1, b1, a1, w2, b2, a2):
    b, h, w, cin = x.shape
    c1, c2 = w1.shape[1], w2.shape[1]
    bh = _pick_bh(h, w, cin)
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
    residuals = (x, t, u, m1, r1, m2, r2, m3, r3, w1, w2, a1, a2)
    return out, residuals


# ---------------------------------------------------------------------------
# Backward pass (four Pallas kernels)
# ---------------------------------------------------------------------------
#
# Chain (forward): n1 = (x - m1) r1;  t = bf16(n1) @ W1 + b1
#                  n2 = (t - m2) r2;  p2 = prelu_a1(n2); u = bf16(p2) @ W2 + b2
#                  n3 = (u - m3) r3;  out = prelu_a2(n3)
# Instance-norm backward identity (per sample/channel, N = H*W pixels):
#   d in = r * (g - mean(g) - n * mean(g * n))       with n the normalized
# activations — mean(g) absorbs the d(mean) path and mean(g*n) the d(var)
# path (same algebra the XLA composite's autodiff produces).


def _bwd_out_stats_kernel(m3_ref, r3_ref, a2_ref, u_ref, g_ref,
                          s_ref, da2_ref):
    i, j = pl.program_id(0), pl.program_id(1)

    @pl.when(j == 0)
    def _init_s():
        s_ref[...] = jnp.zeros_like(s_ref)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _init_da():
        da2_ref[...] = jnp.zeros_like(da2_ref)

    u = u_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    n3 = (u - m3_ref[0, 0]) * r3_ref[0, 0]
    dn3 = g * jnp.where(n3 > 0, 1.0, a2_ref[0, 0])
    s_ref[0, 0, :] += jnp.sum(dn3, axis=(0, 1))
    s_ref[0, 1, :] += jnp.sum(dn3 * n3, axis=(0, 1))
    da2_ref[...] += jnp.sum(g * jnp.minimum(n3, 0.0)).reshape(1, 1)


def _bwd_stage2_kernel(m3_ref, r3_ref, s3_ref, a2_ref, w2_ref,
                       m2_ref, r2_ref, a1_ref, t_ref, u_ref, g_ref,
                       dn2_ref, dw2_ref, db2_ref, da1_ref, s2_ref, *, n):
    """du = IN3-backward(dn3); then through the W2 matmul and the a1
    PReLU, emitting dn2 rows plus dW2/db2/da1 and the IN2-backward
    statistics — one read of (t, u, g) for the whole middle stage."""
    i, j = pl.program_id(0), pl.program_id(1)

    @pl.when(j == 0)
    def _init_s():
        s2_ref[...] = jnp.zeros_like(s2_ref)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _init_acc():
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)
        da1_ref[...] = jnp.zeros_like(da1_ref)

    u = u_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    r3 = r3_ref[0, 0]
    n3 = (u - m3_ref[0, 0]) * r3
    dn3 = g * jnp.where(n3 > 0, 1.0, a2_ref[0, 0])
    s1 = s3_ref[0, 0] * (1.0 / n)
    s2m = s3_ref[0, 1] * (1.0 / n)
    du = r3 * (dn3 - s1 - n3 * s2m)  # (bh, W, C2) f32
    db2_ref[0] += jnp.sum(du, axis=(0, 1))

    t = t_ref[0].astype(jnp.float32)
    a1 = a1_ref[0, 0]
    n2 = (t - m2_ref[0, 0]) * r2_ref[0, 0]
    p2 = jnp.maximum(n2, 0.0) + a1 * jnp.minimum(n2, 0.0)
    bh, wdim, c1 = p2.shape
    c2 = du.shape[-1]
    p2f = p2.reshape(bh * wdim, c1)
    duf = du.reshape(bh * wdim, c2)
    dw2_ref[...] += jax.lax.dot_general(
        p2f, duf, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp2 = jax.lax.dot_general(
        duf, w2_ref[...].astype(jnp.float32),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(bh, wdim, c1)
    da1_ref[...] += jnp.sum(dp2 * jnp.minimum(n2, 0.0)).reshape(1, 1)
    dn2 = dp2 * jnp.where(n2 > 0, 1.0, a1)
    s2_ref[0, 0, :] += jnp.sum(dn2, axis=(0, 1))
    s2_ref[0, 1, :] += jnp.sum(dn2 * n2, axis=(0, 1))
    dn2_ref[0] = dn2


def _bwd_stage1_kernel(m2_ref, r2_ref, s2_ref, w1_ref, m1_ref, r1_ref,
                       t_ref, dn2_ref, x_ref,
                       dn1_ref, dw1_ref, db1_ref, s1_ref, *, n):
    """dt = IN2-backward(dn2); through the W1 matmul, emitting dn1 rows
    plus dW1/db1 and the IN1-backward statistics."""
    i, j = pl.program_id(0), pl.program_id(1)

    @pl.when(j == 0)
    def _init_s():
        s1_ref[...] = jnp.zeros_like(s1_ref)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _init_acc():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)

    t = t_ref[0].astype(jnp.float32)
    r2 = r2_ref[0, 0]
    n2 = (t - m2_ref[0, 0]) * r2
    t1 = s2_ref[0, 0] * (1.0 / n)
    t2 = s2_ref[0, 1] * (1.0 / n)
    dn2 = dn2_ref[0]
    dt = r2 * (dn2 - t1 - n2 * t2)  # (bh, W, C1) f32
    db1_ref[0] += jnp.sum(dt, axis=(0, 1))

    x = x_ref[0].astype(jnp.float32)
    n1 = (x - m1_ref[0, 0]) * r1_ref[0, 0]
    bh, wdim, cin = n1.shape
    c1 = dt.shape[-1]
    n1f = n1.reshape(bh * wdim, cin)
    dtf = dt.reshape(bh * wdim, c1)
    dw1_ref[...] += jax.lax.dot_general(
        n1f, dtf, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dn1 = jax.lax.dot_general(
        dtf, w1_ref[...].astype(jnp.float32),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(bh, wdim, cin)
    s1_ref[0, 0, :] += jnp.sum(dn1, axis=(0, 1))
    s1_ref[0, 1, :] += jnp.sum(dn1 * n1, axis=(0, 1))
    dn1_ref[0] = dn1


def _bwd_dx_kernel(m1_ref, r1_ref, s1_ref, x_ref, dn1_ref, dx_ref, *, n):
    """dx = IN1-backward(dn1) — a separate kernel so XLA drops it
    entirely when the tap input is stop_gradient'd (the generator's
    feature taps, models/generator.py:260,275)."""
    x = x_ref[0].astype(jnp.float32)
    r1 = r1_ref[0, 0]
    n1 = (x - m1_ref[0, 0]) * r1
    u1 = s1_ref[0, 0] * (1.0 / n)
    u2 = s1_ref[0, 1] * (1.0 / n)
    dx = r1 * (dn1_ref[0] - u1 - n1 * u2)
    dx_ref[0] = dx.astype(dx_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_tap(interpret, x, w1, b1, a1, w2, b2, a2):
    out, _ = _fused_tap_impl(interpret, x, w1, b1, a1, w2, b2, a2)
    return out


def _fused_tap_fwd(interpret, x, w1, b1, a1, w2, b2, a2):
    return _fused_tap_impl(interpret, x, w1, b1, a1, w2, b2, a2)


def _fused_tap_bwd(interpret, res, g):
    x, t, u, m1, r1, m2, r2, m3, r3, w1, w2, a1, a2 = res
    b, h, w, cin = x.shape
    c1, c2 = w1.shape[1], w2.shape[1]
    n = float(h * w)
    # smaller row blocks than forward: the middle kernel holds several
    # f32 temporaries of the row block at once
    # smaller blocks than forward: the backward kernels hold several f32
    # temporaries of the row block at once. Budget rule calibrated on
    # the training graphs: bh*w*cin <= 4*512*128 (bh=8 at W=512/Cin=128
    # overshoots the 16 MB scoped-vmem limit by ~0.8 MB; bh=4 fits;
    # W=1024 needs bh=2).
    target = max(1, (4 * 512 * 128) // (w * cin))
    bh = 1
    for cand in (8, 4, 2):
        if cand <= target and h % cand == 0:
            bh = cand
            break
    grid = (b, h // bh)
    seq = dict(
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")
        )
    ) if not interpret else {}

    row_spec = lambda c: pl.BlockSpec((1, bh, w, c), lambda i, j: (i, j, 0, 0))
    stat_spec = lambda c: pl.BlockSpec((1, 2, c), lambda i, j: (i, 0, 0))
    bc_spec = lambda shape: pl.BlockSpec(shape, lambda i, j: (0,) * len(shape))
    per_b = lambda c: pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0))

    a1s = jnp.asarray(a1, jnp.float32).reshape(1, 1)
    a2s = jnp.asarray(a2, jnp.float32).reshape(1, 1)

    s3, da2 = pl.pallas_call(
        _bwd_out_stats_kernel,
        grid=grid,
        in_specs=[per_b(c2), per_b(c2), bc_spec((1, 1)),
                  row_spec(c2), row_spec(c2)],
        out_specs=[stat_spec(c2), bc_spec((1, 1))],
        out_shape=[
            jax.ShapeDtypeStruct((b, 2, c2), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        interpret=interpret,
        **seq,
    )(m3, r3, a2s, u, g)

    dn2, dw2, db2, da1, s2 = pl.pallas_call(
        functools.partial(_bwd_stage2_kernel, n=n),
        grid=grid,
        in_specs=[per_b(c2), per_b(c2), stat_spec(c2), bc_spec((1, 1)),
                  bc_spec((c1, c2)), per_b(c1), per_b(c1), bc_spec((1, 1)),
                  row_spec(c1), row_spec(c2), row_spec(c2)],
        out_specs=[row_spec(c1), bc_spec((c1, c2)), bc_spec((1, c2)),
                   bc_spec((1, 1)), stat_spec(c1)],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, w, c1), jnp.float32),
            jax.ShapeDtypeStruct((c1, c2), jnp.float32),
            jax.ShapeDtypeStruct((1, c2), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, 2, c1), jnp.float32),
        ],
        interpret=interpret,
        **seq,
    )(m3, r3, s3, a2s, w2.astype(jnp.bfloat16), m2, r2, a1s, t, u, g)

    dn1, dw1, db1, s1 = pl.pallas_call(
        functools.partial(_bwd_stage1_kernel, n=n),
        grid=grid,
        in_specs=[per_b(c1), per_b(c1), stat_spec(c1),
                  bc_spec((cin, c1)), per_b(cin), per_b(cin),
                  row_spec(c1), row_spec(c1), row_spec(cin)],
        out_specs=[row_spec(cin), bc_spec((cin, c1)), bc_spec((1, c1)),
                   stat_spec(cin)],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, w, cin), jnp.float32),
            jax.ShapeDtypeStruct((cin, c1), jnp.float32),
            jax.ShapeDtypeStruct((1, c1), jnp.float32),
            jax.ShapeDtypeStruct((b, 2, cin), jnp.float32),
        ],
        interpret=interpret,
        **seq,
    )(m2, r2, s2, w1.astype(jnp.bfloat16), m1, r1, t, dn2, x)

    dx = pl.pallas_call(
        functools.partial(_bwd_dx_kernel, n=n),
        grid=grid,
        in_specs=[per_b(cin), per_b(cin), stat_spec(cin),
                  row_spec(cin), row_spec(cin)],
        out_specs=row_spec(cin),
        out_shape=jax.ShapeDtypeStruct((b, h, w, cin), x.dtype),
        interpret=interpret,
        **(dict(
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")
            )
        ) if not interpret else {}),
    )(m1, r1, s1, x, dn1)

    return (
        dx,
        dw1.astype(jnp.result_type(w1)),
        db1[0].astype(jnp.float32),
        jnp.asarray(da1[0, 0], jnp.float32),
        dw2.astype(jnp.result_type(w2)),
        db2[0].astype(jnp.float32),
        jnp.asarray(da2[0, 0], jnp.float32),
    )


_fused_tap.defvjp(_fused_tap_fwd, _fused_tap_bwd)
