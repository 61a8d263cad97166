"""Evaluator-level END-TO-END grid-serving benchmark (VERDICT r4 ask #2).

Where tools/bench_grid.py measures the device math on in-memory tensors,
this drives the REAL content_style_grid workflow: PNGs on disk ->
TestOptions parse -> ConfigurableDataLoader (PIL decode + preprocess) ->
ContentStyleGridGenerationEvaluator (batched extraction, per-row pair
dispatch, device->host uint8 fetch, threaded PNG encode, HTML) — the
workflow a user of `test.py --evaluation_metrics
content_style_1t1_generation` runs (reference
evaluation/content_style_grid_generation_evaluator.py:36-99).

Emits `grid_pairs_per_sec_e2e_<crop>px` = (n_c * n_s) / wall seconds of
`GroupEvaluator.evaluate`, everything included: image decode, device
compute, relay fetch of every output PNG, encode, HTML.

Run: python tools/bench_grid_e2e.py [--contents 16 --styles 16 --crop 512]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_corpus(root: str, n_c: int, n_s: int, crop: int) -> str:
    """Content PNGs under <root>/imgs/content/, styles under
    <root>/imgs/style/ (the evaluator splits on '/content/' in the
    path — reference :48-51)."""
    from PIL import Image

    rng = np.random.default_rng(7)
    for sub, n in (("content", n_c), ("style", n_s)):
        d = os.path.join(root, "imgs", sub)
        os.makedirs(d, exist_ok=True)
        for i in range(n):
            low = rng.random((crop // 8, crop // 8, 3))
            img = np.kron(low, np.ones((8, 8, 1)))
            img = (img * 255).astype(np.uint8)
            Image.fromarray(img).save(os.path.join(d, f"{sub}_{i:03d}.png"))
    return os.path.join(root, "imgs")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--contents", type=int, default=16)
    ap.add_argument("--styles", type=int, default=16)
    ap.add_argument("--crop", type=int, default=512)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--nThreads", type=int, default=8)
    args = ap.parse_args()

    from ppst_tpu.util.cache import setup_compile_cache

    setup_compile_cache()

    root = "/tmp/ppst_grid_e2e"
    shutil.rmtree(root, ignore_errors=True)
    dataroot = make_corpus(root, args.contents, args.styles, args.crop)

    import ppst_tpu.data as data
    from ppst_tpu.evaluation import GroupEvaluator
    from ppst_tpu.options import TestOptions

    ckpt_dir = os.path.join(root, "ckpt")
    argv = [
        "test.py",
        "--name", "grid_e2e",
        "--checkpoints_dir", ckpt_dir,
        "--result_dir", os.path.join(root, "results"),
        "--dataset_mode", "imagefolder",
        "--dataroot", dataroot,
        "--preprocess", "resize",
        "--load_size", str(args.crop), "--crop_size", str(args.crop),
        "--batch_size", "4",
        "--nThreads", str(args.nThreads),
        "--dtype", args.dtype,
        "--fused_tap", "true" if args.dtype == "bfloat16" else "false",
        "--evaluation_metrics", "content_style_1t1_generation",
    ]
    old_argv = sys.argv
    sys.argv = argv
    try:
        opt = TestOptions().parse()
    finally:
        sys.argv = old_argv

    # a checkpoint for the real test.py load path. Params come from
    # fast_init (eval_shape + host fill): the real 512px model.init is a
    # multi-minute cold compile that benchmarking doesn't need, and
    # throughput is distribution-independent (util/fast_init docstring).
    from ppst_tpu.train.bundle import ModelBundle
    from ppst_tpu.util.fast_init import random_params_like

    t_build = time.perf_counter()
    bundle = ModelBundle.__new__(ModelBundle)
    bundle.opt = opt
    from ppst_tpu.models.config import PPSTConfig
    from ppst_tpu.models import find_model_using_name
    from ppst_tpu.parallel.mesh import make_mesh

    import jax

    bundle.cfg = PPSTConfig.from_options(opt)
    bundle.model = find_model_using_name("ppst")(bundle.cfg)
    bundle.mesh = make_mesh(1)
    bundle.rng = jax.random.PRNGKey(0)
    bundle.params, bundle.state = random_params_like(
        lambda: bundle.model.init(jax.random.PRNGKey(0), bundle.cfg.crop_size),
        seed=0,
    )
    bundle.opt_states = None
    bundle.save(0)
    bundle.load("latest")
    print(f"[bench] bundle built+saved+loaded in "
          f"{time.perf_counter() - t_build:.1f}s", flush=True)

    dataset = data.create_dataset(opt)
    evaluators = GroupEvaluator(opt)

    # pass 1 compiles the extraction/pair programs (one-time; persisted
    # in the compile cache); pass 2 is the steady-state serving number
    t0 = time.perf_counter()
    evaluators.evaluate(bundle, dataset, opt.resume_iter)
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    evaluators.evaluate(bundle, dataset, opt.resume_iter)
    dt = time.perf_counter() - t0

    pairs = args.contents * args.styles
    print(json.dumps({
        "metric": f"grid_pairs_per_sec_e2e_{args.crop}px",
        "value": round(pairs / dt, 3),
        "unit": "pairs/s",
        "grid": f"{args.contents}x{args.styles}",
        "wall_s": round(dt, 2),
        "cold_wall_s": round(cold, 2),
        "includes": "PNG decode + preprocess + extraction + pairs + "
                    "uint8 fetch + PNG encode + HTML",
    }))
    dataset._stop_worker()  # before rmtree: the prefetch thread may
    # otherwise race a re-iteration against the corpus deletion
    if not args.keep:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
