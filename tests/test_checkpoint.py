"""ModelBundle checkpoint save/load round trip (reference
base_model.py:33-112 semantics: Nk naming + latest symlink, tolerant
load, D skipped at test time)."""

import argparse

import jax
import numpy as np
import pytest


def make_opt(tmp_path, **kw):
    base = dict(
        name="ckpt_test", checkpoints_dir=str(tmp_path), model="ppst",
        num_gpus=1, seed=0, crop_size=64, isTrain=True, continue_train=False,
        resume_iter="latest", pretrained_name=None,
    )
    base.update(kw)
    return argparse.Namespace(**base)


@pytest.mark.slow
def test_save_load_roundtrip(tmp_path):
    from ppst_tpu.train.bundle import ModelBundle

    b1 = ModelBundle(make_opt(tmp_path))
    b1.save(50_000)
    assert (tmp_path / "ckpt_test" / "50k_checkpoint.msgpack").exists()
    assert (tmp_path / "ckpt_test" / "latest_checkpoint.msgpack").exists()

    b2 = ModelBundle(make_opt(tmp_path, seed=1))  # different init
    before = np.asarray(jax.tree.leaves(b2.params["G"])[0])
    assert not np.allclose(
        before, np.asarray(jax.tree.leaves(b1.params["G"])[0])
    )
    b2.load("latest")
    for k in ("E1", "E2", "G", "D"):
        a = jax.tree.leaves(b1.params[k])
        c = jax.tree.leaves(b2.params[k])
        for x, y in zip(a, c):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    np.testing.assert_array_equal(
        np.asarray(b1.state["rscl"]["queues"]),
        np.asarray(b2.state["rscl"]["queues"]),
    )

    # test-time load skips D (reference base_model.py:61)
    b3 = ModelBundle(make_opt(tmp_path, isTrain=False, seed=2))
    d_init = np.asarray(jax.tree.leaves(b3.params["D"])[0])
    b3.load("50k")
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(b3.params["D"])[0]), d_init
    )
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(b3.params["G"])[0]),
        np.asarray(jax.tree.leaves(b1.params["G"])[0]),
    )


@pytest.mark.slow
def test_opt_state_restore(tmp_path):
    """Adam moments are saved AND restored across resume (the reference
    silently restarts them)."""
    from ppst_tpu.train.bundle import ModelBundle
    from ppst_tpu.train.steps import build_train_steps

    b1 = ModelBundle(make_opt(tmp_path, name="optres"))
    init_opt, *_ = build_train_steps(b1.model, donate=False)
    b1.opt_states = init_opt(b1.params)
    # make the moments nonzero so restoration is observable
    b1.opt_states = jax.tree.map(lambda x: x + 1.0 if x.dtype.kind == "f" else x,
                                 b1.opt_states)
    b1.save(1_000)

    b2 = ModelBundle(make_opt(tmp_path, name="optres", continue_train=True))
    b2.load("latest")
    b2.opt_states = init_opt(b2.params)
    assert b2.restore_opt_states()
    a = jax.tree.leaves(b1.opt_states)
    c = jax.tree.leaves(b2.opt_states)
    for x, y in zip(a, c):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))


@pytest.mark.slow
def test_async_save(tmp_path):
    from ppst_tpu.train.bundle import ModelBundle

    b = ModelBundle(make_opt(tmp_path, name="async"))
    b.save(2_000, blocking=False)
    b.join_pending_save()
    assert (tmp_path / "async" / "2k_checkpoint.msgpack").exists()
    # a second bundle can load it
    b2 = ModelBundle(make_opt(tmp_path, name="async", seed=3))
    b2.load("latest")
    a = np.asarray(jax.tree.leaves(b.params["G"])[0])
    c = np.asarray(jax.tree.leaves(b2.params["G"])[0])
    np.testing.assert_array_equal(a, c)
