"""Pallas upfirdn2d / fused-act kernels vs the XLA reference paths."""

import numpy as np
import jax.numpy as jnp
import pytest

from ppst_tpu.ops.fused_act import fused_leaky_relu
from ppst_tpu.ops.fused_act_pallas import fused_leaky_relu_pallas
from ppst_tpu.ops.upfirdn2d import upfirdn2d
from ppst_tpu.ops.upfirdn2d_pallas import upfirdn2d_pallas


@pytest.mark.parametrize(
    "taps,down,pad",
    [
        ([1, 3, 3, 1], 1, (2, 1)),
        ([1, 2, 1], 1, (1, 1)),
        ([1, 3, 3, 1], 2, (2, 2)),
        ([1, 2, 1], 2, (2, 1)),
    ],
)
def test_upfirdn_pallas_matches_xla(rng, taps, down, pad):
    x = jnp.asarray(rng.standard_normal((2, 16, 12, 8)).astype(np.float32))
    k = np.asarray(taps, np.float32)
    k = k / k.sum()
    want = upfirdn2d(x, k, up=1, down=down, pad=pad)
    got = upfirdn2d_pallas(x, k, down=down, pad=pad, channel_block=8)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-5)


def test_fused_act_pallas_matches_xla(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 16)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((16,)).astype(np.float32))
    want = fused_leaky_relu(x, b)
    got = fused_leaky_relu_pallas(x, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6,
                               atol=1e-6)


def test_fused_tap_matches_composite(rng):
    """ops.tap_pallas.fused_tap_1x1 vs the XLA composite tap (bf16): same
    parameters, same math modulo bf16 rounding through three INs."""
    import jax
    from ppst_tpu.models.config import PPSTConfig
    from ppst_tpu.models.generator import _FeatureTap

    x32 = rng.standard_normal((2, 32, 32, 128)).astype(np.float32)
    x = jnp.asarray(x32).astype(jnp.bfloat16)
    ref_tap = _FeatureTap(conv1x1=True, feature_ch=256, fused=False)
    fused_tap = _FeatureTap(conv1x1=True, feature_ch=256, fused=True)
    params = ref_tap.init(jax.random.PRNGKey(0), x.astype(jnp.float32))
    # identical param trees (fused path declares the same names/shapes)
    fused_params = fused_tap.init(jax.random.PRNGKey(0), x)
    ref_leaves = jax.tree_util.tree_structure(params)
    fused_leaves = jax.tree_util.tree_structure(fused_params)
    assert ref_leaves == fused_leaves
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(fused_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    want = np.asarray(ref_tap.apply(params, x)).astype(np.float32)
    got = np.asarray(fused_tap.apply(params, x)).astype(np.float32)
    assert got.shape == want.shape
    # bf16 resolution ~0.8%; three chained instance norms amplify it
    np.testing.assert_allclose(got, want, atol=0.06)
    assert np.abs(got - want).mean() < 5e-3


def _tap_precision_twin(x, w1, b1, a1, w2, b2, a2):
    """jnp twin of fused_tap_1x1's exact precision semantics (f32 IN and
    epilogues, bf16 only at the matmul inputs, f32 accumulation) — the
    tight gradient oracle. The XLA composite (_FeatureTap fused=False)
    additionally rounds its IN outputs and activations to bf16, which
    makes ITS gradients the noisier ones (measured: its dW is ~16x
    farther from this f32 twin than the Pallas backward is)."""
    import jax

    b, h, w, cin = x.shape
    c1, c2 = w1.shape[1], w2.shape[1]

    def inorm(v):
        v32 = v.astype(jnp.float32)
        m = v32.mean((1, 2), keepdims=True)
        ms = jnp.mean(v32 * v32, (1, 2), keepdims=True)
        var = jnp.maximum(ms - m * m, 0.0)
        return (v32 - m) * jax.lax.rsqrt(var + 1e-5)

    def mm(v, wm):
        return jax.lax.dot_general(
            v.astype(jnp.bfloat16).reshape(-1, v.shape[-1]),
            wm.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    t = (mm(inorm(x), w1) + b1).astype(jnp.bfloat16).reshape(b, h, w, c1)
    n2 = inorm(t)
    p2 = jnp.maximum(n2, 0) + a1 * jnp.minimum(n2, 0)
    u = (mm(p2, w2) + b2).astype(jnp.bfloat16).reshape(b, h, w, c2)
    n3 = inorm(u)
    return (jnp.maximum(n3, 0) + a2 * jnp.minimum(n3, 0)).astype(x.dtype)


def test_tap_pallas_grad(rng):
    """The fused tap's custom VJP (four Pallas backward kernels) vs
    autodiff of a precision-matched jnp twin: every gradient (x, conv
    weights/biases, PReLU slopes) within bf16-rounding tolerance. Makes
    ``--fused_tap`` legal in bf16 training (VERDICT r4 ask #5)."""
    import jax
    from ppst_tpu.ops.tap_pallas import fused_tap_1x1

    b, h, w, cin, c1 = 2, 16, 16, 128, 64
    x = jnp.asarray(
        rng.standard_normal((b, h, w, cin)).astype(np.float32)
    ).astype(jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((cin, c1)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((c1,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((c1, c1)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((c1,)) * 0.1, jnp.float32)
    a1 = jnp.float32(0.25)
    a2 = jnp.float32(0.25)
    cot = jnp.asarray(rng.standard_normal((b, h, w, c1)).astype(np.float32))
    args = (x, w1, b1, a1, w2, b2, a2)

    import jax as _jax

    def lossify(f):
        return lambda *a: jnp.sum(f(*a).astype(jnp.float32) * cot)

    g_kernel = _jax.grad(lossify(fused_tap_1x1),
                         argnums=tuple(range(7)))(*args)
    g_twin = _jax.grad(lossify(_tap_precision_twin),
                       argnums=tuple(range(7)))(*args)

    overall = max(float(np.abs(np.asarray(l)).max()) for l in g_twin)
    names = ["dx", "dw1", "db1", "da1", "dw2", "db2", "da2"]
    for name, a, b_ in zip(names, g_kernel, g_twin):
        a = np.asarray(a, np.float64)
        b_ = np.asarray(b_, np.float64)
        if np.abs(b_).max() < 0.02 * overall:
            # bias grads are mathematically ~0 (a per-channel shift
            # cancels in the following instance norm); even the twin
            # reports bf16 cotangent-rounding residue around 0 (its
            # backward rounds pixel cotangents at the t/u bf16 casts,
            # the Pallas kernels keep f32). Require noise level, not a
            # match of the noise.
            assert np.abs(a).max() <= max(np.abs(b_).max(),
                                          0.01 * overall), name
            continue
        tol = 0.02 * np.abs(b_).max()
        assert np.abs(a - b_).max() <= tol, (
            f"{name}: max gap {np.abs(a - b_).max():.3e} > tol {tol:.3e}"
        )


def test_tap_pallas_grad_module_wiring(rng):
    """Module-level: _FeatureTap(fused=True) is differentiable through
    _Conv1x1Params/_PReLUParam and its gradients track the XLA
    composite's (which carries extra bf16 rounding — direction, not
    bitwise, agreement is the contract here; the tight check is
    test_tap_pallas_grad)."""
    import jax
    from ppst_tpu.models.generator import _FeatureTap

    x = jnp.asarray(
        rng.standard_normal((2, 16, 16, 128)).astype(np.float32)
    ).astype(jnp.bfloat16)
    ref_tap = _FeatureTap(conv1x1=True, feature_ch=256, fused=False)
    fused_tap = _FeatureTap(conv1x1=True, feature_ch=256, fused=True)
    params = ref_tap.init(jax.random.PRNGKey(0), x.astype(jnp.float32))
    cot = jnp.asarray(rng.standard_normal((2, 16, 16, 64)).astype(np.float32))

    def loss(tap):
        return lambda p, xx: jnp.sum(
            tap.apply(p, xx).astype(jnp.float32) * cot
        )

    g_ref = jax.grad(loss(ref_tap), argnums=(0, 1))(params, x)
    g_fused = jax.grad(loss(fused_tap), argnums=(0, 1))(params, x)
    overall = max(float(np.abs(np.asarray(l)).max())
                  for l in jax.tree.leaves(g_ref))
    paths = [
        "/".join(str(k) for k in p)
        for p, _ in jax.tree_util.tree_flatten_with_path(g_ref)[0]
    ]
    for name, a, b in zip(paths, jax.tree.leaves(g_fused),
                          jax.tree.leaves(g_ref)):
        a = np.asarray(a, np.float64).ravel()
        b = np.asarray(b, np.float64).ravel()
        assert np.isfinite(a).all(), name
        if np.abs(b).max() < 0.02 * overall:
            # bias grads: bf16 noise around a mathematical zero on the
            # composite side; require ours at noise level too
            assert np.abs(a).max() <= max(np.abs(b).max(),
                                          0.01 * overall), name
            continue
        if a.size > 1:
            cos = float(
                a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
            )
            assert cos > 0.98, f"{name}: cosine {cos:.4f}"
        else:
            # the composite's PReLU-alpha grad is degraded by a bf16 sum
            # reduction in its backward (observed bf16-quantized values
            # like 92.5/128.0); the kernel accumulates in f32 and tracks
            # the f32 twin to ~1e-5 (test_tap_pallas_grad). Same sign +
            # same ballpark is all the composite can certify here.
            assert np.sign(a) == np.sign(b) and (
                abs(a - b) <= 0.5 * abs(b) + 0.01 * overall
            ), f"{name}: {a} vs {b}"


def _styled_conv_twin(x, w, noise, gain, bt, sc, sh):
    """f32 twin of the fused StyledConv chain (conv of bf16-rounded
    inputs with f32 accumulation, f32 epilogue/IN, bf16 output)."""
    import jax
    import math

    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32),
        w.astype(x.dtype).astype(jnp.float32),
        (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    pre = y + gain * noise + bt
    a = jnp.where(pre >= 0, pre, pre * 0.2) * math.sqrt(2.0)
    a = a.astype(x.dtype).astype(jnp.float32)  # kernel stores a in bf16
    m = a.mean((1, 2), keepdims=True)
    ms = jnp.mean(a * a, (1, 2), keepdims=True)
    var = jnp.maximum(ms - m * m, 0.0)
    n = (a - m) * jax.lax.rsqrt(var + 1e-5)
    return (n * (sc[:, None, None, :] + 1.0)
            + sh[:, None, None, :]).astype(x.dtype)


def test_styled_conv_pallas_fwd_bwd(rng):
    """ops.styled_conv_pallas vs the f32 twin: forward at bf16 rounding,
    every gradient (x, w, gain, folded bias, style scale/shift) within
    bf16 tolerance (VERDICT r4 ask #1's kernel)."""
    import jax
    from ppst_tpu.ops.styled_conv_pallas import styled_conv3x3

    b, h, w, c = 2, 8, 8, 128
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.bfloat16)
    wt = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.05, jnp.float32)
    noise = jnp.asarray(rng.standard_normal((b, h, w, 1)), jnp.float32)
    gain = jnp.float32(0.7)
    bt = jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32)
    sc = jnp.asarray(rng.standard_normal((b, c)) * 0.3, jnp.float32)
    sh = jnp.asarray(rng.standard_normal((b, c)) * 0.3, jnp.float32)
    args = (x, wt, noise, gain, bt, sc, sh)

    out = styled_conv3x3(*args)
    want = _styled_conv_twin(*args)
    got = np.asarray(out, np.float32)
    ref = np.asarray(want, np.float32)
    assert got.shape == ref.shape and out.dtype == x.dtype
    assert np.abs(got - ref).max() <= 0.05 * max(1.0, np.abs(ref).max())

    cot = jnp.asarray(rng.standard_normal(out.shape), jnp.float32)

    def lossify(f):
        return lambda *a: jnp.sum(f(*a).astype(jnp.float32) * cot)

    gk = jax.grad(lossify(styled_conv3x3), argnums=(0, 1, 3, 4, 5, 6))(*args)
    gt = jax.grad(lossify(_styled_conv_twin),
                  argnums=(0, 1, 3, 4, 5, 6))(*args)
    names = ["dx", "dw", "dgain", "db", "dscale", "dshift"]
    overall = max(float(np.abs(np.asarray(l)).max()) for l in gt)
    for name, a, b_ in zip(names, gk, gt):
        a = np.asarray(a, np.float64)
        b_ = np.asarray(b_, np.float64)
        tol = 0.04 * max(np.abs(b_).max(), 0.01 * overall)
        assert np.abs(a - b_).max() <= tol, (
            f"{name}: max gap {np.abs(a - b_).max():.3e} > tol {tol:.3e}"
        )


def test_styled_conv_module_parity(rng):
    """nn.layers.StyledConv(fused=True): identical parameter tree to the
    composite, close outputs, finite gradients through the module."""
    import jax
    from ppst_tpu.nn.layers import StyledConv

    x = jnp.asarray(rng.standard_normal((2, 8, 8, 128)), jnp.bfloat16)
    style = jnp.asarray(rng.standard_normal((2, 64)), jnp.float32)
    noise = jnp.asarray(rng.standard_normal((2, 8, 8, 1)), jnp.float32)

    comp = StyledConv(128, 3, fused=False)
    fused = StyledConv(128, 3, fused=True)
    p_comp = comp.init(
        {"params": jax.random.PRNGKey(0)}, x.astype(jnp.float32), style
    )
    p_fused = fused.init({"params": jax.random.PRNGKey(0)}, x, style,
                         noise)
    assert (jax.tree_util.tree_structure(p_comp)
            == jax.tree_util.tree_structure(p_fused))
    for a, b in zip(jax.tree.leaves(p_comp), jax.tree.leaves(p_fused)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    want = np.asarray(
        comp.apply(p_comp, x, style, noise), np.float32
    )
    got = np.asarray(fused.apply(p_comp, x, style, noise), np.float32)
    # bf16 rounding through conv + IN + style-mod on ~unit-scale
    # activations; the tight numeric check is test_styled_conv_pallas_fwd_bwd
    assert np.abs(got - want).max() <= 0.15
    assert np.abs(got - want).mean() <= 0.02

    def loss(p):
        return jnp.sum(
            fused.apply(p, x, style, noise).astype(jnp.float32) ** 2
        )

    g = jax.grad(loss)(p_comp)
    for leaf in jax.tree.leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()
