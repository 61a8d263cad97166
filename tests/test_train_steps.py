"""End-to-end training-step smoke test: D step, lazy-R1 D step, G step
(with RSCL queues) on a tiny synthetic batch; loss keys present & finite
(SURVEY.md section 4's required smoke test)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppst_tpu.models.config import PPSTConfig
from ppst_tpu.models.ppst import PPSTModel
from ppst_tpu.train.steps import build_train_steps

# full train-step/network compiles: minutes on a 1-core CPU host.
# Tier: run via `pytest -m slow` (or the targeted nohup recipe in PARITY.md).
pytestmark = pytest.mark.slow

CROP = 64
B = 2


SLIM = dict(
    # Slimmed widths keep the smoke within the 1-core test budget; the
    # properties checked (loss keys, finiteness, update routing, queue
    # advancement) are width-independent. Full-width training is covered
    # by the slow-tier checkpoint/e2e tests and hardware runs.
    netE_scale_capacity=0.25,
    netE2_scale_capacity=0.25,
    netG_scale_capacity=0.25,
    netD_scale_capacity=0.25,
    global_code_ch=256,
    spatial_code_ch=64,
    netG_resnet_ch=64,
    netG_num_base_resnet_layers=2,
    remat=False,
)


def _make(dtype="float32"):
    cfg = PPSTConfig(crop_size=CROP, dtype=dtype, **SLIM)
    model = PPSTModel(cfg)
    params, state = model.init(jax.random.PRNGKey(0), CROP)
    init_opt, d_step, d_step_r1, g_step = build_train_steps(model, donate=False)
    opt_states = init_opt(params)
    rng = np.random.default_rng(0)
    real = jnp.asarray(rng.standard_normal((B, CROP, CROP, 3)).astype(np.float32) * 0.5)
    mask = jnp.asarray((rng.random((B, CROP, CROP, 3)) > 0.5).astype(np.float32))
    return model, params, state, opt_states, (d_step, d_step_r1, g_step), real, mask


@pytest.fixture(scope="module")
def setup():
    return _make()


def _check_finite(losses, keys):
    for k in keys:
        assert k in losses, f"missing loss {k}: {list(losses)}"
    for k, v in losses.items():
        assert np.isfinite(np.asarray(v)).all(), f"{k} not finite"


def test_d_step(setup):
    model, params, state, opt_states, (d_step, _, _), real, mask = setup
    rng = jax.random.PRNGKey(1)
    p2, s2, o2, losses = d_step(params, state, opt_states, real, mask, rng)
    _check_finite(losses, ["D_real", "D_rec", "D_mix"])
    assert int(s2["num_d_iters"]) == int(state["num_d_iters"]) + 1
    # D params changed, G params untouched
    d_before = jax.tree.leaves(params["D"])[0]
    d_after = jax.tree.leaves(p2["D"])[0]
    assert not np.allclose(np.asarray(d_before), np.asarray(d_after))
    g_before = jax.tree.leaves(params["G"])[0]
    g_after = jax.tree.leaves(p2["G"])[0]
    np.testing.assert_array_equal(np.asarray(g_before), np.asarray(g_after))


def test_d_step_with_r1(setup):
    model, params, state, opt_states, (_, d_step_r1, _), real, mask = setup
    rng = jax.random.PRNGKey(2)
    p2, s2, o2, losses = d_step_r1(params, state, opt_states, real, mask, rng)
    _check_finite(losses, ["D_real", "D_rec", "D_mix", "D_R1", "D_total"])
    assert float(losses["D_R1"]) >= 0.0


def test_g_step(setup):
    model, params, state, opt_states, (_, _, g_step), real, mask = setup
    rng = jax.random.PRNGKey(3)
    p2, s2, o2, losses = g_step(params, state, opt_states, real, mask, rng)
    _check_finite(
        losses,
        [
            "G_L1",
            "G_L1_cyc",
            "image_warp_reg",
            "Mask_warp",
            "G_styleContmix",
            "G_styleContrec",
            "G_GAN_rec",
            "G_GAN_mix",
            "L1_dist",
        ],
    )
    # queues advanced by 6 keys per scale
    np.testing.assert_array_equal(np.asarray(s2["rscl"]["ptrs"]), 6)
    # G/E params changed, D untouched
    d_before = jax.tree.leaves(params["D"])[0]
    d_after = jax.tree.leaves(p2["D"])[0]
    np.testing.assert_array_equal(np.asarray(d_before), np.asarray(d_after))
    for k in ("G", "E1", "E2"):
        before = np.asarray(jax.tree.leaves(params[k])[0])
        after = np.asarray(jax.tree.leaves(p2[k])[0])
        assert not np.allclose(before, after), f"{k} params did not update"


# ---------------------------------------------------------------------------
# bf16 compute mode (VERDICT r3 ask #3): losses finite, params/opt-state
# and RSCL queues stay float32, updates flow.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def setup_bf16():
    return _make(dtype="bfloat16")


def test_bf16_steps(setup_bf16):
    model, params, state, opt_states, steps, real, mask = setup_bf16
    d_step, d_step_r1, g_step = steps
    p, s, o, d_losses = d_step_r1(params, state, opt_states, real, mask,
                                  jax.random.PRNGKey(1))
    p, s, o, g_losses = g_step(p, s, o, real, mask, jax.random.PRNGKey(2))
    for k, v in {**d_losses, **g_losses}.items():
        assert np.isfinite(np.asarray(v)).all(), f"{k} not finite under bf16"
    # master params, optimizer state, and queues stay f32
    for leaf in jax.tree.leaves(p):
        assert leaf.dtype == jnp.float32, f"param dtype {leaf.dtype}"
    for leaf in jax.tree.leaves(o):
        assert leaf.dtype in (jnp.float32, jnp.int32), f"opt dtype {leaf.dtype}"
    assert s["rscl"]["queues"].dtype == jnp.float32
    # and the updates actually moved every subtree
    for k in ("G", "E1", "E2", "D"):
        before = np.asarray(jax.tree.leaves(params[k])[0])
        after = np.asarray(jax.tree.leaves(p[k])[0])
        assert not np.allclose(before, after), f"{k} did not update under bf16"
