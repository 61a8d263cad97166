"""SSIM/PSNR sanity."""

import numpy as np
import jax.numpy as jnp

from ppst_tpu.evaluation.metrics import psnr, ssim


def test_ssim_identity_and_ordering(rng):
    a = jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32))
    same = np.asarray(ssim(a, a))
    np.testing.assert_allclose(same, 1.0, atol=1e-5)
    small = a + 0.02 * jnp.asarray(rng.standard_normal(a.shape).astype(np.float32))
    big = a + 0.2 * jnp.asarray(rng.standard_normal(a.shape).astype(np.float32))
    s_small = float(np.mean(np.asarray(ssim(a, jnp.clip(small, 0, 1)))))
    s_big = float(np.mean(np.asarray(ssim(a, jnp.clip(big, 0, 1)))))
    assert 1.0 > s_small > s_big


def test_psnr(rng):
    a = jnp.asarray(rng.random((1, 16, 16, 3)).astype(np.float32))
    b = jnp.clip(a + 0.1, 0, 1)
    assert float(psnr(a, a)[0]) > 100
    assert 10 < float(psnr(a, b)[0]) < 30


def test_ssim_bounded_on_flat_images(rng):
    """Near-constant windows must not push SSIM above 1 (variance
    cancellation)."""
    a = jnp.full((1, 32, 32, 3), 0.5) + 1e-4 * jnp.asarray(
        rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
    )
    b = a + 1e-4
    s = float(np.mean(np.asarray(ssim(a, b))))
    assert s <= 1.0 + 1e-6
