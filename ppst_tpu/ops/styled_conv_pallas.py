"""Pallas TPU kernels: fused StyledConv (3x3 conv + noise + bias +
leaky-relu + instance norm + style modulation), forward AND backward.

The generator's up-blocks (models/generator.py::UpsamplingResnetBlock,
reference models/networks/generator.py:63-77) spend the training G-step
in chains of StyledConv = EqualizedConv2d -> NoiseInjection -> bias ->
FusedLeakyReLU -> LayerEpilogue(InstanceNorm -> StyleMod) (reference
stylegan2_layers.py:439-475). The round-4 device profile (BASELINE.md)
measured the XLA lowering at 57% MFU on the convs themselves plus ~40%
zero-FLOP glue: activation layout flips between conv fwd/bwd layouts,
separate IN stats/apply fusions, and pad assemblies. This kernel set
executes the whole chain out of VMEM with the conv as nine MXU dots per
row-block and the epilogue applied in-register, so the only HBM traffic
is one padded read of x, one write+read of the pre-IN activations, and
the output write — no relayouts.

Math (all additive biases folded into ``b_total``):

    pre = conv3x3(x, w) + gain * noise + b_total
    a   = leaky_relu(pre, 0.2) * sqrt(2)
    n   = (a - mean_hw(a)) * rsqrt(var_hw(a) + 1e-5)
    out = n * s1 + shift                 # s1 = style_scale + 1

Forward: two pallas_calls (conv+epilogue rows with one-pass f32
stats accumulation; then IN-apply + StyleMod). Backward: three more
(stats of the IN backward; pre-activation gradient + bias/gain grads;
then dx as the transposed conv and dW as nine gathered MXU dots).
Gradient identities are the same instance-norm backward used by
ops.tap_pallas (see that module's docstring).

Layout: NHWC throughout, channels on the 128-lane minor dimension. The
halo problem (3x3 needs +-1 rows/cols) is solved by padding x once on
the host (cheap single pass; XLA's conv does the same internally) and
manually DMA-ing overlapping (bh+2)-row windows from HBM into VMEM
scratch — BlockSpec index maps cannot express overlap.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-5
_SQRT2 = math.sqrt(2.0)
_SLOPE = 0.2


def _pick_bh(h: int, w: int, cin: int, cout: int) -> int:
    """Row-block height: keep (bh+2, W+2, Cin) bf16 + f32 accumulators
    within a few MB of VMEM."""
    budget = 6 * 1024 * 1024
    for bh in (32, 16, 8, 4, 2, 1):
        if h % bh:
            continue
        need = (bh + 2) * (w + 2) * cin * 2 + bh * w * cout * 6
        if need <= budget:
            return bh
    return 1


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _wpad(w: int) -> int:
    """Padded width: W+2 rounded up to the 8-sublane tile so HBM window
    DMAs stay tile-aligned (Mosaic rejects unaligned memref slices)."""
    return ((w + 2 + 7) // 8) * 8


def _conv_rows(xs, w_ref, bh, wdim, cout):
    """Nine shifted MXU dots over a (bh+2, Wp, Cin) VMEM window."""
    acc = jnp.zeros((bh, wdim, cout), jnp.float32)
    for ki in range(3):
        for kj in range(3):
            xk = xs[ki : ki + bh, kj : kj + wdim, :]
            acc += jax.lax.dot_general(
                xk,
                w_ref[ki, kj],
                (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    return acc


def _fwd_conv_kernel(x_hbm, w_ref, noise_ref, gain_ref, b_ref,
                     a_ref, s_ref, xs, sem, *, bh, wdim):
    """a = lrelu(conv(x, w) + gain*noise + b) * sqrt2; accumulate per-
    (batch, channel) sum / sum-of-squares of a."""
    i, j = pl.program_id(0), pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        s_ref[...] = jnp.zeros_like(s_ref)

    cp = pltpu.make_async_copy(
        x_hbm.at[i, pl.ds(j * bh, bh + 2)], xs, sem
    )
    cp.start()
    cp.wait()

    cout = a_ref.shape[-1]
    acc = _conv_rows(xs, w_ref, bh, wdim, cout)
    pre = acc + gain_ref[0, 0] * noise_ref[0].astype(jnp.float32) + b_ref[0]
    a = jnp.where(pre >= 0, pre, pre * _SLOPE) * _SQRT2
    a_ref[0] = a.astype(a_ref.dtype)
    s_ref[0, 0, :] += jnp.sum(a, axis=(0, 1))
    s_ref[0, 1, :] += jnp.sum(a * a, axis=(0, 1))


def _fwd_apply_kernel(m_ref, r_ref, s1_ref, sh_ref, a_ref, o_ref):
    a = a_ref[0].astype(jnp.float32)
    n = (a - m_ref[0, 0]) * r_ref[0, 0]
    o_ref[0] = (n * s1_ref[0, 0] + sh_ref[0, 0]).astype(o_ref.dtype)


def _moments(sums, n):
    mean = sums[:, 0, :] / n
    var = jnp.maximum(sums[:, 1, :] / n - jnp.square(mean), 0.0)
    return mean[:, None, :], jax.lax.rsqrt(var + _EPS)[:, None, :]


def _specs(b, h, w, bh):
    row = lambda c: pl.BlockSpec((1, bh, w, c), lambda i, j: (i, j, 0, 0))
    stat = lambda c: pl.BlockSpec((1, 2, c), lambda i, j: (i, 0, 0))
    bc = lambda shape: pl.BlockSpec(shape, lambda i, j: (0,) * len(shape))
    per_b = lambda c: pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0))
    return row, stat, bc, per_b


def _seq(interpret, semantics=("arbitrary", "arbitrary")):
    if interpret:
        return {}
    return dict(
        compiler_params=pltpu.CompilerParams(dimension_semantics=semantics)
    )


def _styled_conv_impl(interpret, x, w, noise, gain, b_total, s1, shift):
    b, h, wdim, cin = x.shape
    cout = w.shape[-1]
    bh = _pick_bh(h, wdim, cin, cout)
    grid = (b, h // bh)
    row, stat, bc, per_b = _specs(b, h, wdim, bh)

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, _wpad(wdim) - wdim - 1), (0, 0)))
    wk = w.astype(x.dtype)
    gain_s = jnp.asarray(gain, jnp.float32).reshape(1, 1)
    bt = b_total.astype(jnp.float32).reshape(1, cout)

    a, sums = pl.pallas_call(
        functools.partial(_fwd_conv_kernel, bh=bh, wdim=wdim),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # x padded, HBM
            bc((3, 3, cin, cout)),                  # weights
            row(1),                                 # noise
            bc((1, 1)),                             # gain
            bc((1, cout)),                          # folded biases
        ],
        out_specs=[row(cout), stat(cout)],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, wdim, cout), x.dtype),
            jax.ShapeDtypeStruct((b, 2, cout), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bh + 2, _wpad(wdim), cin), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
        **_seq(interpret),
    )(xp, wk, noise.astype(x.dtype), gain_s, bt)

    m, r = _moments(sums, h * wdim)
    out = pl.pallas_call(
        _fwd_apply_kernel,
        grid=grid,
        in_specs=[per_b(cout), per_b(cout), per_b(cout), per_b(cout),
                  row(cout)],
        out_specs=row(cout),
        out_shape=jax.ShapeDtypeStruct((b, h, wdim, cout), x.dtype),
        interpret=interpret,
        **_seq(interpret, ("parallel", "arbitrary")),
    )(
        m, r,
        s1.astype(jnp.float32)[:, None, :],
        shift.astype(jnp.float32)[:, None, :],
        a,
    )
    return out, (x, wk, noise, gain, a, m, r, s1, shift)


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------


def _bwd_stats_kernel(m_ref, r_ref, s1_ref, a_ref, g_ref,
                      s_ref, ds_ref, dsh_ref):
    """Per-(batch, channel): IN-backward stats of dn = g*s1, plus
    dstyle_scale = sum(g*n) and dshift = sum(g)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        s_ref[...] = jnp.zeros_like(s_ref)
        ds_ref[...] = jnp.zeros_like(ds_ref)
        dsh_ref[...] = jnp.zeros_like(dsh_ref)

    a = a_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    n = (a - m_ref[0, 0]) * r_ref[0, 0]
    dn = g * s1_ref[0, 0]
    s_ref[0, 0, :] += jnp.sum(dn, axis=(0, 1))
    s_ref[0, 1, :] += jnp.sum(dn * n, axis=(0, 1))
    ds_ref[0, 0, :] += jnp.sum(g * n, axis=(0, 1))
    dsh_ref[0, 0, :] += jnp.sum(g, axis=(0, 1))


def _bwd_dpre_kernel(m_ref, r_ref, s1_ref, s_ref, noise_ref,
                     a_ref, g_ref, dpre_ref, db_ref, dg_ref, *, n):
    """dpre = IN-backward(g*s1) * lrelu'(pre) * sqrt2; accumulate
    db_total = sum(dpre) and dgain = sum(dpre * noise)."""
    i, j = pl.program_id(0), pl.program_id(1)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _init():
        db_ref[...] = jnp.zeros_like(db_ref)
        dg_ref[...] = jnp.zeros_like(dg_ref)

    a = a_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    r = r_ref[0, 0]
    nn = (a - m_ref[0, 0]) * r
    dn = g * s1_ref[0, 0]
    s1m = s_ref[0, 0] * (1.0 / n)
    s2m = s_ref[0, 1] * (1.0 / n)
    da = r * (dn - s1m - nn * s2m)
    dpre = da * _SQRT2 * jnp.where(a >= 0, 1.0, _SLOPE)
    dpre_ref[0] = dpre.astype(dpre_ref.dtype)
    db_ref[0] += jnp.sum(dpre, axis=(0, 1))
    dg_ref[...] += jnp.sum(
        dpre * noise_ref[0].astype(jnp.float32)
    ).reshape(1, 1)


def _bwd_dx_kernel(gp_hbm, wflip_ref, dx_ref, gs, sem, *, bh, wdim):
    """dx = conv3x3(dpre_padded, flip(w)^T) — the transposed conv."""
    i, j = pl.program_id(0), pl.program_id(1)
    cpg = pltpu.make_async_copy(gp_hbm.at[i, pl.ds(j * bh, bh + 2)], gs, sem)
    cpg.start()
    cpg.wait()
    cin = dx_ref.shape[-1]
    dx_ref[0] = _conv_rows(gs, wflip_ref, bh, wdim, cin).astype(dx_ref.dtype)


def _bwd_dw_kernel(xp_hbm, g_ref, dw_ref, xs, sem, *, bh, wdim):
    """dW[ki,kj, :, ct] += x_shift^T @ dpre[..., ct] — output channels
    tiled on the leading grid axis so the f32 dW accumulator block stays
    within VMEM at Cin=Cout=512 (the full (3,3,512,512) f32 tensor is
    9.4 MB; a 128-wide tile is 2.4 MB)."""
    t, i, j = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _init():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    cpx = pltpu.make_async_copy(xp_hbm.at[i, pl.ds(j * bh, bh + 2)], xs, sem)
    cpx.start()
    cpx.wait()

    cin = xs.shape[-1]
    ct = g_ref.shape[-1]
    gf = g_ref[0].astype(jnp.float32).reshape(bh * wdim, ct)
    for ki in range(3):
        for kj in range(3):
            xk = xs[ki : ki + bh, kj : kj + wdim, :]
            xf = xk.astype(jnp.float32).reshape(bh * wdim, cin)
            dw_ref[ki, kj] += jax.lax.dot_general(
                xf, gf, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _styled_conv(interpret, x, w, noise, gain, b_total, s1, shift):
    out, _ = _styled_conv_impl(interpret, x, w, noise, gain, b_total, s1,
                               shift)
    return out


def _styled_conv_fwd(interpret, x, w, noise, gain, b_total, s1, shift):
    return _styled_conv_impl(interpret, x, w, noise, gain, b_total, s1,
                             shift)


def _styled_conv_bwd(interpret, res, g):
    x, wk, noise, gain, a, m, r, s1, shift = res
    b, h, wdim, cin = x.shape
    cout = wk.shape[-1]
    n = float(h * wdim)
    bh = _pick_bh(h, wdim, cin, cout)
    grid = (b, h // bh)
    row, stat, bc, per_b = _specs(b, h, wdim, bh)

    s1b = s1.astype(jnp.float32)[:, None, :]

    sums, ds1, dshift = pl.pallas_call(
        _bwd_stats_kernel,
        grid=grid,
        in_specs=[per_b(cout), per_b(cout), per_b(cout),
                  row(cout), row(cout)],
        out_specs=[stat(cout), per_b(cout), per_b(cout)],
        out_shape=[
            jax.ShapeDtypeStruct((b, 2, cout), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, cout), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, cout), jnp.float32),
        ],
        interpret=interpret,
        **_seq(interpret),
    )(m, r, s1b, a, g)

    dpre, db, dgain = pl.pallas_call(
        functools.partial(_bwd_dpre_kernel, n=n),
        grid=grid,
        in_specs=[per_b(cout), per_b(cout), per_b(cout), stat(cout),
                  row(1), row(cout), row(cout)],
        out_specs=[row(cout), bc((1, cout)), bc((1, 1))],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, wdim, cout), x.dtype),
            jax.ShapeDtypeStruct((1, cout), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        interpret=interpret,
        **_seq(interpret),
    )(m, r, s1b, sums, noise.astype(x.dtype), a, g)

    # transposed conv: correlate dpre with the spatially-flipped,
    # in/out-transposed kernel
    wflip = jnp.flip(wk, (0, 1)).transpose(0, 1, 3, 2)
    wp_extra = _wpad(wdim) - wdim - 1
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, wp_extra), (0, 0)))
    gp = jnp.pad(dpre, ((0, 0), (1, 1), (1, wp_extra), (0, 0)))

    dx = pl.pallas_call(
        functools.partial(_bwd_dx_kernel, bh=bh, wdim=wdim),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            bc((3, 3, cout, cin)),
        ],
        out_specs=row(cin),
        out_shape=jax.ShapeDtypeStruct((b, h, wdim, cin), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bh + 2, _wpad(wdim), cout), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
        **_seq(interpret),
    )(gp, wflip)

    ct = min(cout, 128)
    assert cout % ct == 0
    dw = pl.pallas_call(
        functools.partial(_bwd_dw_kernel, bh=bh, wdim=wdim),
        grid=(cout // ct,) + grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, bh, wdim, ct), lambda t, i, j: (i, j, 0, t)),
        ],
        out_specs=pl.BlockSpec((3, 3, cin, ct), lambda t, i, j: (0, 0, 0, t)),
        out_shape=jax.ShapeDtypeStruct((3, 3, cin, cout), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((bh + 2, _wpad(wdim), cin), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
        **(_seq(interpret, ("arbitrary", "arbitrary", "arbitrary"))),
    )(xp, dpre)

    dnoise = None  # noise is a fixed input (no grad path in the model)
    return (
        dx,
        dw.astype(jnp.result_type(wk)),
        jnp.zeros_like(noise),
        jnp.asarray(dgain[0, 0], jnp.float32),
        db[0].astype(jnp.float32),
        ds1[:, 0, :].astype(jnp.float32),
        dshift[:, 0, :].astype(jnp.float32),
    )


_styled_conv.defvjp(_styled_conv_fwd, _styled_conv_bwd)


def styled_conv3x3(x, w, noise, gain, b_total, style_scale, style_shift,
                   interpret: bool | None = None):
    """Fused StyledConv chain (module docstring). Shapes:

    ``x`` (B, H, W, Cin); ``w`` (3, 3, Cin, Cout); ``noise`` (B, H, W, 1);
    ``gain`` scalar; ``b_total`` (Cout,) — the sum of the conv bias,
    StyledConv bias, and FusedLeakyReLU bias (all additive pre-
    activation); ``style_scale``/``style_shift`` (B, Cout) from the
    StyleMod linear. Returns (B, H, W, Cout) in x.dtype. Differentiable
    wrt everything except ``noise``.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    s1 = style_scale + 1.0
    return _styled_conv(bool(interpret), x, w, noise, gain, b_total, s1,
                        style_shift)
