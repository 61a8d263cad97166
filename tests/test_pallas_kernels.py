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
