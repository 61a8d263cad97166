"""Amortized grid serving (PPSTModel.grid_extract/grid_pairs) must
reproduce the per-pair staged pipeline exactly: batched extraction ==
per-image extraction, the trunk bank == E2's full recompute inside
encode2, index gathers select the right pairs, and the batched
corrm+warp+decode == the per-pair calls (reference
evaluation/content_style_grid_generation_evaluator.py:53-99 semantics).

Noise injection is pinned via explicit ``noises`` (sliced per pair on
the reference side) so batch composition cannot change the draws.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ppst_tpu.models.config import PPSTConfig
from ppst_tpu.models.generator import make_fixed_noise
from ppst_tpu.models.ppst import PPSTModel

CROP = 64


def test_grid_pairs_match_per_pair_pipeline(rng):
    cfg = PPSTConfig(crop_size=CROP)
    model = PPSTModel(cfg)
    params, _ = model.init(jax.random.PRNGKey(0), CROP)
    imgs = jnp.asarray(
        rng.standard_normal((4, CROP, CROP, 3)).astype(np.float32) * 0.3
    )
    contents, styles = imgs[:2], imgs[2:]

    n_ext = make_fixed_noise(cfg, jax.random.PRNGKey(5), 4, CROP)
    bank = jax.jit(
        lambda p, x, r: model.grid_extract(p, x, r, noises=n_ext)
    )(params, imgs, jax.random.PRNGKey(1))
    c_bank = jax.tree.map(lambda a: a[:2], bank)
    s_bank = jax.tree.map(lambda a: a[2:], bank)

    ci = jnp.asarray([0, 0, 1, 1], jnp.int32)
    si = jnp.asarray([0, 1, 0, 1], jnp.int32)
    n_dec = make_fixed_noise(cfg, jax.random.PRNGKey(6), 4, CROP)
    out = jax.jit(
        lambda p, cb, sb, i, j, r, t: model.grid_pairs(
            p, cb, sb, i, j, r, smooth_target=t, noises=n_dec
        )
    )(params, c_bank, s_bank, ci, si, jax.random.PRNGKey(2), contents)

    grid_hw = (CROP // 8, CROP // 8)
    for k in range(4):
        c, s = int(ci[k]), int(si[k])
        # per-image extraction with the same pinned noise rows
        ext_c = model.grid_extract(
            params, contents[c : c + 1], jax.random.PRNGKey(9),
            noises=[n[c : c + 1] for n in n_ext],
        )
        ext_s = model.grid_extract(
            params, styles[s : s + 1], jax.random.PRNGKey(9),
            noises=[n[2 + s : 3 + s] for n in n_ext],
        )
        corr = model.corrm(ext_s["desc"], ext_c["desc"])
        # full E2 recompute from the style image (what the reference's
        # encode2 does) — checks the trunk bank against recomputation
        gl_w = model.e2.apply(
            {"params": params["E2"]},
            styles[s : s + 1],
            corrmatrix=corr,
            corr_out_hw=grid_hw,
        ).vectors_w
        exp = model.decode(
            params,
            ext_c["sp"],
            list(gl_w),
            jax.random.PRNGKey(9),
            target=contents[c : c + 1],
            noises=[n[k : k + 1] for n in n_dec],
        )
        np.testing.assert_allclose(
            np.asarray(out[k : k + 1]), np.asarray(exp),
            atol=2e-4, rtol=1e-4,
            err_msg=f"grid pair {k} (content {c}, style {s})",
        )
