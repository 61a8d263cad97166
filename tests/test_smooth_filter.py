"""smooth_filter (local affine + bilateral) sanity tests."""

import numpy as np
import jax.numpy as jnp

from ppst_tpu.ops.smooth_filter import smooth_local_affine, _local_affine


def test_identity_affine_recovered(rng):
    """When stylized == content, the best local affine is identity and the
    output must reproduce the input."""
    img = rng.random((1, 24, 24, 3)).astype(np.float32)
    out = np.asarray(
        smooth_local_affine(jnp.asarray(img), jnp.asarray(img), f_radius=4)
    )
    np.testing.assert_allclose(out, img, atol=5e-2)


def test_affine_relation_recovered(rng):
    """stylized = 0.5*content + 0.2 must be recovered exactly by the local
    affine model (it IS an affine map)."""
    content = rng.random((1, 20, 20, 3)).astype(np.float32)
    stylized = 0.5 * content + 0.2
    out = np.asarray(
        smooth_local_affine(jnp.asarray(stylized), jnp.asarray(content), f_radius=3)
    )
    np.testing.assert_allclose(out, stylized, atol=5e-2)


def test_local_affine_shapes(rng):
    content = jnp.asarray(rng.random((2, 16, 16, 3)).astype(np.float32))
    stylized = jnp.asarray(rng.random((2, 16, 16, 3)).astype(np.float32))
    a = _local_affine(content, stylized)
    assert a.shape == (2, 16, 16, 3, 4)
    assert np.isfinite(np.asarray(a)).all()
