"""Network construction, output shapes, and basic invariants (the
reference's shape facts: SURVEY.md section 2.4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppst_tpu.models import (
    ColorEncoder,
    ContentEncoder,
    Discriminator,
    Generator,
    PPSTConfig,
)

CFG = PPSTConfig(crop_size=128)
B, S = 2, 128
GRID = S // 8  # structure-code resolution
L = GRID * GRID


@pytest.fixture(scope="module")
def nets():
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}
    x = jnp.zeros((B, S, S, 3))
    e1 = ContentEncoder(CFG)
    e1_params = e1.init(rngs, x)
    e2 = ColorEncoder(CFG)
    e2_params = e2.init(rngs, x)
    g = Generator(CFG)
    sp = jnp.zeros((B, GRID, GRID, CFG.spatial_code_ch))
    gl = [jnp.zeros((B, CFG.style_dim))] * 4
    # init must trace the feature branch too so its params exist
    g_params = g.init(rngs, sp, gl, extract_features=True)
    d = Discriminator(CFG)
    d_params = d.init(rngs, x)
    return dict(e1=(e1, e1_params), e2=(e2, e2_params), g=(g, g_params), d=(d, d_params))


def test_e1_structure_code_shape(nets, rng):
    e1, params = nets["e1"]
    x = jnp.asarray(rng.standard_normal((B, S, S, 3)).astype(np.float32))
    sp = e1.apply(params, x)
    assert sp.shape == (B, GRID, GRID, CFG.spatial_code_ch)


def test_e2_style_vectors(nets, rng):
    e2, params = nets["e2"]
    x = jnp.asarray(rng.standard_normal((B, S, S, 3)).astype(np.float32))
    out = e2.apply(params, x)
    assert len(out.vectors) == 4
    for v in out.vectors:
        assert v.shape == (B, CFG.global_code_ch)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(v), axis=-1), 1.0, rtol=1e-4
        )
    assert out.vectors_w == () and out.projections_m == ()


def test_e2_full_paths(nets, rng):
    e2, params = nets["e2"]
    x = jnp.asarray(rng.standard_normal((B, S, S, 3)).astype(np.float32))
    corr = jax.nn.softmax(
        jnp.asarray(rng.standard_normal((B, L, L)).astype(np.float32)), -1
    )
    mask = jnp.asarray((rng.random((B, S, S, 3)) > 0.5).astype(np.float32))
    out = e2.apply(params, x, corrmatrix=corr, mask=mask)
    assert len(out.vectors) == 4
    assert len(out.vectors_w) == 4
    assert len(out.projections_m) == 12  # 3 regions x 4 scales
    assert len(out.projections_mw) == 12
    for v in out.vectors_w + out.projections_m + out.projections_mw:
        assert v.shape == (B, CFG.global_code_ch)


def test_e2_trunk_cache_exact(nets, rng):
    """The staged-inference trunk cache (extraction stage returns the conv
    trunk; the warp stage feeds it back) must reproduce the direct
    corrmatrix path exactly — it is the same computation, paid once."""
    e2, params = nets["e2"]
    x = jnp.asarray(rng.standard_normal((B, S, S, 3)).astype(np.float32))
    corr = jax.nn.softmax(
        jnp.asarray(rng.standard_normal((B, L, L)).astype(np.float32)), -1
    )
    direct = e2.apply(params, x, corrmatrix=corr)
    plain, trunk = e2.apply(params, x, return_trunk=True)
    assert len(trunk) == 4
    cached = e2.apply(
        params, None, corrmatrix=corr, trunk=trunk, warped_only=True
    )
    assert cached.vectors == ()  # warped_only skips the plain heads
    for a, b in zip(plain.vectors, direct.vectors):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(cached.vectors_w, direct.vectors_w):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-6, atol=2e-6
        )


def test_generator_rgb_and_features(nets, rng):
    g, params = nets["g"]
    sp = jnp.asarray(
        rng.standard_normal((B, GRID, GRID, CFG.spatial_code_ch)).astype(np.float32)
    )
    gl = [
        jnp.asarray(rng.standard_normal((B, CFG.style_dim)).astype(np.float32))
        for _ in range(4)
    ]
    rgb = g.apply(params, sp, gl, rngs={"noise": jax.random.PRNGKey(2)})
    assert rgb.shape == (B, S, S, 3)
    rgb2, feat, feat1 = g.apply(
        params, sp, gl, extract_features=True, rngs={"noise": jax.random.PRNGKey(2)}
    )
    assert rgb2.shape == (B, S, S, 3)
    assert feat.shape == (B, GRID, GRID, 256)
    # feat1 lives at 4x the structure grid (== 256x256 for 512px inputs)
    assert feat1.shape == (B, 4 * GRID, 4 * GRID, 64)


def test_discriminator_logit(nets, rng):
    d, params = nets["d"]
    x = jnp.asarray(rng.standard_normal((B, S, S, 3)).astype(np.float32))
    out = d.apply(params, x)
    assert out.shape == (B, 1)


def test_init_discriminator_is_input_sensitive(nets, rng):
    """A properly initialized D must map different inputs to different
    scores. Guards the fast_init pitfall: a uniform small-std param fill
    breaks equalized-lr signal propagation (20x attenuation per wscale
    layer in the normalization-free D) and silently turns D into a
    constant function — which corrupted an early training-dynamics
    ablation (util/fast_init.py docstring). Real init must never do this."""
    d, params = nets["d"]
    a = jnp.asarray(rng.standard_normal((1, S, S, 3)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((1, S, S, 3)).astype(np.float32))
    sa, sb = float(d.apply(params, a)[0, 0]), float(d.apply(params, b)[0, 0])
    assert abs(sa - sb) > 1e-6, (sa, sb)
    # and the degenerate fill really is degenerate (documents the hazard)
    from ppst_tpu.util.fast_init import random_params_like

    bad = random_params_like(lambda: d.init(
        {"params": jax.random.PRNGKey(0)}, a), seed=3)
    ba, bb = float(d.apply(bad, a)[0, 0]), float(d.apply(bad, b)[0, 0])
    assert abs(ba - bb) < 1e-7, "fast_init D unexpectedly input-sensitive"


def test_param_counts_in_expected_range(nets):
    # Sanity guard against gross wiring mistakes; reference param counts
    # (base_network.py printout) put E2 around 25-30M (projector MLPs) and
    # G as the largest net.
    def count(tree):
        return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(tree))

    c_e2 = count(nets["e2"][1])
    c_g = count(nets["g"][1])
    c_e1 = count(nets["e1"][1])
    assert 20e6 < c_e2 < 40e6, c_e2
    assert c_g > 30e6, c_g
    assert 0.3e6 < c_e1 < 10e6, c_e1


def test_e2_fast_warp_pool_is_close(nets, rng):
    """The e2_fast_warp_pool serving mode (pool the warp grid directly
    instead of upsampling first) must track the faithful path closely."""
    import dataclasses

    from ppst_tpu.models import ColorEncoder

    e2, params = nets["e2"]
    x = jnp.asarray(rng.standard_normal((B, S, S, 3)).astype(np.float32))
    corr = jax.nn.softmax(
        jnp.asarray(rng.standard_normal((B, L, L)).astype(np.float32)) * 3, -1
    )
    base = e2.apply(params, x, corrmatrix=corr).vectors_w
    fast_cfg = dataclasses.replace(CFG, e2_fast_warp_pool=True)
    fast = ColorEncoder(fast_cfg).apply(params, x, corrmatrix=corr).vectors_w
    for u, v in zip(base, fast):
        cos = float(jnp.mean(jnp.sum(u * v, axis=-1)))
        assert cos > 0.99, cos


def test_remat_taps_same_params_and_grads(rng):
    """cfg.remat_taps + cfg.remat_blocks (nested checkpoints of the
    feature branch / per-resolution resblocks — the 512px batch>=6 OOM
    fixes) must not change the param tree, the forward values, or the
    gradients; they are pure memory/compute trades."""
    import dataclasses

    cfg = dataclasses.replace(
        PPSTConfig(crop_size=64),
        netG_scale_capacity=0.25,
        global_code_ch=128,
        spatial_code_ch=16,
        netG_resnet_ch=32,
        netG_num_base_resnet_layers=1,
        netE_num_downsampling_sp=2,
    )
    sp = jnp.asarray(rng.standard_normal((2, 8, 8, cfg.spatial_code_ch)), jnp.float32)
    gl = [jnp.asarray(rng.standard_normal((2, cfg.style_dim)), jnp.float32)] * 4
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}

    outs = {}
    for taps in (False, True):
        g = Generator(
            dataclasses.replace(cfg, remat_taps=taps, remat_blocks=taps)
        )
        params = g.init(rngs, sp, gl, extract_features=True)

        def loss(v):
            rgb, feat, feat1 = g.apply(
                v, sp, gl, extract_features=True,
                rngs={"noise": jax.random.PRNGKey(2)},
            )
            return jnp.sum(feat**2) + jnp.sum(feat1**2) + jnp.sum(rgb**2)

        val, grads = jax.value_and_grad(loss)(params)
        outs[taps] = (params, val, grads)

    p0, v0, g0 = outs[False]
    p1, v1, g1 = outs[True]
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-4)
    # norm-based: XLA reassociates instance-norm reductions differently
    # inside/outside checkpoint, so near-zero gradient COMPONENTS are
    # f32-cancellation noise; the per-leaf gradient vectors must agree.
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        # absolute floor: leaves with ~zero true gradient (e.g. a conv
        # bias whose output feeds straight into instance norm — its
        # gradient is mathematically zero) are pure f32 noise
        assert np.linalg.norm(a - b) < 5e-3 * np.linalg.norm(a) + 5e-3, (
            np.linalg.norm(a - b), np.linalg.norm(a)
        )
