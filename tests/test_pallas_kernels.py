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
