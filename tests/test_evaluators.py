"""Grid evaluators end-to-end on random weights: swap_visualization
(training snapshots) and content_style_grid_generation (+ the
content_style_1t1_generation alias), incl. HTML artifacts."""

import sys

import numpy as np
import pytest
from PIL import Image


def parse(argv, train=True):
    from ppst_tpu.options import TestOptions, TrainOptions

    old = sys.argv
    sys.argv = ["prog"] + argv
    try:
        return (TrainOptions() if train else TestOptions()).parse()
    finally:
        sys.argv = old


def _bundle(opt):
    import ppst_tpu.train.bundle as bundle_mod

    orig = bundle_mod.ModelBundle.load
    bundle_mod.ModelBundle.load = lambda self, *a, **k: None
    try:
        return bundle_mod.create_model(opt)
    finally:
        bundle_mod.ModelBundle.load = orig


@pytest.mark.slow
def test_swap_visualization(tmp_path):
    import ppst_tpu.data as data
    from ppst_tpu.evaluation import GroupEvaluator

    opt = parse([
        "--name", "swapviz", "--checkpoints_dir", str(tmp_path),
        "--dataset_mode", "synthetic", "--crop_size", "64", "--load_size",
        "64", "--batch_size", "2", "--synthetic_size", "4",
        "--evaluation_metrics", "trainswap_visualization",
        "--swap_num_columns", "2", "--swap_num_images", "2",
    ])
    bundle = _bundle(opt)
    loader = data.create_dataset(opt)
    GroupEvaluator(opt).evaluate(bundle, loader, nsteps=2000)
    out = tmp_path / "swapviz" / "snapshots"
    pages = list(out.rglob("*.html"))
    imgs = list(out.rglob("*.png"))
    assert pages and imgs
    grid = np.asarray(Image.open(imgs[0]))
    # (N+1) x (N+1) cells of load_size
    assert grid.shape[0] == 64 * 3 and grid.shape[1] == 64 * 3
    loader._stop_worker()


@pytest.mark.slow
def test_content_style_grid_alias(tmp_path):
    import ppst_tpu.data as data
    from ppst_tpu.evaluation import GroupEvaluator

    rng = np.random.default_rng(0)
    (tmp_path / "imgs" / "content").mkdir(parents=True)
    (tmp_path / "imgs" / "style").mkdir(parents=True)
    for i in range(2):
        for sub in ("content", "style"):
            arr = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(tmp_path / "imgs" / sub / f"{sub}{i}.png")

    opt = parse([
        "--name", "grid", "--checkpoints_dir", str(tmp_path),
        "--dataset_mode", "imagefolder", "--dataroot", str(tmp_path / "imgs"),
        "--preprocess", "resize", "--crop_size", "64", "--load_size", "64",
        "--batch_size", "1", "--result_dir", str(tmp_path / "results"),
        # the reference launcher's broken metric name, fixed via alias
        "--evaluation_metrics", "content_style_1t1_generation",
    ], train=False)
    bundle = _bundle(opt)
    loader = data.create_dataset(opt)
    GroupEvaluator(opt).evaluate(bundle, loader, nsteps=None)
    results = list((tmp_path / "results").rglob("*.html"))
    imgs = list((tmp_path / "results").rglob("*.png"))
    assert results, "no HTML grid written"
    # 2 contents x 2 styles + originals + blank
    assert len(imgs) >= 7
