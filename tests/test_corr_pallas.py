"""Blockwise fused corr-warp kernel vs the dense jnp path."""

import jax
import jax.numpy as jnp
import numpy as np

from ppst_tpu.ops.corr import corrm, warp
from ppst_tpu.ops.corr_pallas import corr_warp_blockwise, fused_corr_warp


def test_matches_dense_path(rng):
    b, l, c, cv = 2, 256, 64, 32
    fea = rng.standard_normal((b, 16, 16, c)).astype(np.float32)
    fea0 = rng.standard_normal((b, 16, 16, c)).astype(np.float32)
    vals = rng.standard_normal((b, 16, 16, cv)).astype(np.float32)

    dense = warp(jnp.asarray(vals), corrm(jnp.asarray(fea), jnp.asarray(fea0),
                                          split=32))
    # kernel path with matching split
    from ppst_tpu.ops import corr_pallas as cp

    q = cp._normalize_desc(jnp.asarray(fea0).reshape(b, l, c), split=32)
    k = cp._normalize_desc(jnp.asarray(fea).reshape(b, l, c), split=32)
    v = jnp.asarray(vals).reshape(b, l, cv)
    got = cp.corr_warp_blockwise(q, k, v, block_q=128, block_k=64)
    np.testing.assert_allclose(
        np.asarray(got).reshape(b, 16, 16, cv), np.asarray(dense),
        rtol=2e-4, atol=2e-5,
    )


def test_rectangular_grids(rng):
    """Different content/style grid sizes (inference case)."""
    b, c, cv = 1, 512, 16
    fea = rng.standard_normal((b, 8, 8, c)).astype(np.float32)  # style 64
    fea0 = rng.standard_normal((b, 16, 8, c)).astype(np.float32)  # content 128
    vals = rng.standard_normal((b, 8, 8, cv)).astype(np.float32)
    got = fused_corr_warp(
        jnp.asarray(fea), jnp.asarray(fea0), jnp.asarray(vals),
        block_q=64, block_k=32,
    )
    want = warp(
        jnp.asarray(vals),
        corrm(jnp.asarray(fea), jnp.asarray(fea0)),
        out_hw=(16, 8),
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4,
                               atol=2e-5)


def test_fallback_on_awkward_sizes(rng):
    b, l, c, cv = 1, 100, 32, 8  # 100 not divisible by blocks
    q = rng.standard_normal((b, l, c)).astype(np.float32)
    k = rng.standard_normal((b, l, c)).astype(np.float32)
    v = rng.standard_normal((b, l, cv)).astype(np.float32)
    out = corr_warp_blockwise(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    assert out.shape == (b, l, cv)


def test_e2_corr_qk_matches_corrmatrix(rng):
    """E2's fused descriptor path (corr_qk) must match the dense
    corrmatrix path."""
    import jax
    from ppst_tpu.models.config import PPSTConfig
    from ppst_tpu.models.encoder_col import ColorEncoder
    from ppst_tpu.ops import corr_pallas as cp

    cfg = PPSTConfig(crop_size=128)
    e2 = ColorEncoder(cfg)
    x = jnp.asarray(rng.standard_normal((2, 128, 128, 3)).astype(np.float32))
    params = e2.init({"params": jax.random.PRNGKey(0)}, x)
    desc = jnp.asarray(rng.standard_normal((2, 16, 16, 512)).astype(np.float32))
    desc0 = jnp.asarray(rng.standard_normal((2, 16, 16, 512)).astype(np.float32))

    dense = e2.apply(params, x, corrmatrix=corrm(desc, desc0)).vectors_w
    q = cp._normalize_desc(desc0.reshape(2, 256, 512))
    k = cp._normalize_desc(desc.reshape(2, 256, 512))
    fused = e2.apply(params, x, corr_qk=(q, k), corr_out_hw=(16, 16)).vectors_w
    for a, b in zip(dense, fused):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3,
                                   atol=2e-4)
