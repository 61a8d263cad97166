"""End-to-end CLI tests: a short training run through train.py's loop and
a simple_swapping inference through test.py's path, plus the driver's
multichip dryrun contract."""

import os
import sys

import numpy as np
import pytest
from PIL import Image


def run_argv(argv, fn):
    old = sys.argv
    sys.argv = argv
    try:
        return fn()
    finally:
        sys.argv = old


@pytest.mark.slow
def test_train_cli_smoke(tmp_path):
    import train as train_mod

    ckpt = tmp_path / "ckpt"
    argv = [
        "train.py", "--name", "smoke", "--checkpoints_dir", str(ckpt),
        "--dataset_mode", "synthetic", "--crop_size", "64", "--load_size", "64",
        "--batch_size", "2", "--total_nimgs", "8", "--save_freq", "8",
        "--print_freq", "2", "--display_freq", "6",
        "--evaluation_metrics", "none", "--synthetic_size", "8",
    ]
    run_argv(argv, train_mod.main)
    exp = ckpt / "smoke"
    assert (exp / "loss_log.txt").exists()
    assert (exp / "opt.txt").exists()
    ckpts = list(exp.glob("*_checkpoint.msgpack"))
    assert ckpts, "no checkpoint written"
    assert (exp / "latest_checkpoint.msgpack").exists()
    log = (exp / "loss_log.txt").read_text()
    assert "G_L1" in log and "D_real" in log
    assert list((exp / "snapshots").glob("*.png")), "no snapshot grid written"


@pytest.mark.slow
def test_simple_swapping_cli(tmp_path):
    """simple_swapping on random weights produces an image of the right
    shape (SURVEY.md section 4's required smoke)."""
    import test as test_mod

    rng = np.random.default_rng(0)
    imgs = []
    for name in ("content", "style"):
        arr = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        p = tmp_path / f"{name}.png"
        Image.fromarray(arr).save(p)
        imgs.append(str(p))

    argv = [
        "test.py", "--name", "smoke_swap", "--checkpoints_dir",
        str(tmp_path / "ckpt"), "--evaluation_metrics", "simple_swapping",
        "--input_structure_image", imgs[0], "--input_texture_image", imgs[1],
        "--preprocess", "resize", "--load_size", "64", "--crop_size", "64",
        "--result_dir", str(tmp_path / "results"), "--resume_iter", "none",
    ]

    # no checkpoint exists: patch create_model's load to tolerate
    import ppst_tpu.train.bundle as bundle_mod

    orig_load = bundle_mod.ModelBundle.load
    bundle_mod.ModelBundle.load = lambda self, *a, **k: None
    try:
        run_argv(argv, test_mod.main)
    finally:
        bundle_mod.ModelBundle.load = orig_load

    outs = list((tmp_path / "results").rglob("*.png"))
    assert outs, "no output image written"
    img = np.asarray(Image.open(outs[0]))
    assert img.shape == (64, 64, 3)


@pytest.mark.slow
def test_dryrun_multichip_contract():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(2)
