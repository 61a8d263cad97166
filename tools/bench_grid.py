"""Amortized grid-serving benchmark: folder x folder content/style grid
throughput (BASELINE config #3; reference
evaluation/content_style_grid_generation_evaluator.py:53-99).

The grid workload precomputes per-image extraction ONCE (the reference
already amortizes the style descriptors this way) and then runs only the
marginal per-pair work — corrm + E2 style warp + decode (with the
in-graph guided filter) — for every (content, style) cell, batched
PAIR_BATCH pairs per dispatch. Marginal work is ~0.9 TFLOP/pair vs ~3.6
for the full per-pair pipeline, which is what makes the 10x-vs-reference
north star reachable on this axis (BASELINE.md round-4 roofline).

Reported pairs/s INCLUDES the extraction cost, amortized over the grid.

Usage: python tools/bench_grid.py [--crop 512] [--contents 4] [--styles 8]
       [--pair_batch 8] [--iters 10]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("PPST_JAX_CACHE", "/root/.cache/jax_ppst_tpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)


def build_grid_pipeline(crop: int, dtype, smooth: bool = True,
                        fast_pool: bool = False, blockwise: bool = False):
    """(params, extract_fn, pairs_fn, model): jitted extraction and
    pair-stage callables over grid banks."""
    from ppst_tpu.models.config import PPSTConfig
    from ppst_tpu.models.ppst import PPSTModel
    from ppst_tpu.util.fast_init import random_params_like

    cfg = PPSTConfig(
        crop_size=crop,
        e2_fast_warp_pool=fast_pool,
        fused_tap=(dtype == jnp.bfloat16),
    )
    model = PPSTModel(cfg)
    full = random_params_like(
        lambda: model.init(jax.random.PRNGKey(0), crop), seed=0
    )
    params = jax.device_put(full[0])

    extract = jax.jit(model.grid_extract)

    @jax.jit
    def pairs(params, content_bank, style_bank, ci, si, rng, targets):
        return model.grid_pairs(
            params, content_bank, style_bank, ci, si, rng,
            smooth_target=targets if smooth else None,
            blockwise=blockwise,
        )

    return params, extract, pairs, model


def measure_grid(crop: int = 512, contents: int = 4, styles: int = 8,
                 pair_batch: int = 8, iters: int = 10,
                 dtype: str = "bfloat16", smooth: bool = True,
                 fast_pool: bool = False, blockwise: bool = False,
                 extract_chunk: int = 0) -> float:
    """Grid pairs/sec on the current device, extraction amortized over
    the contents x styles grid. Importable by bench.py."""
    dt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    params, extract, pairs, _ = build_grid_pipeline(
        crop, dt, smooth=smooth, fast_pool=fast_pool, blockwise=blockwise
    )

    key = jax.random.PRNGKey(1)
    imgs = (jax.random.normal(
        key, (contents + styles, crop, crop, 3), jnp.float32
    ) * 0.3).astype(dt)
    content_imgs, style_imgs = imgs[:contents], imgs[contents:]

    n_pairs = contents * styles
    assert n_pairs % pair_batch == 0, (
        f"grid {contents}x{styles} must split into pair batches of "
        f"{pair_batch}"
    )
    # row-major traversal of the grid, batched
    ci_all = np.repeat(np.arange(contents), styles).astype(np.int32)
    si_all = np.tile(np.arange(styles), contents).astype(np.int32)
    batches = [
        (jnp.asarray(ci_all[o : o + pair_batch]),
         jnp.asarray(si_all[o : o + pair_batch]))
        for o in range(0, n_pairs, pair_batch)
    ]

    def run_grid(rng):
        r_e, r_p = jax.random.split(rng)
        # one batched extraction pass over every image in the grid; the
        # two banks slice it (identical math to separate passes).
        # extract_chunk > 0 splits extraction into equal chunks — the
        # HBM-peak knob that unlocks grids whose single-pass extraction
        # batch OOMs (e.g. 8x8 at 1024px needs b=16; b=12 is the
        # measured single-pass limit there)
        if extract_chunk and extract_chunk < imgs.shape[0]:
            assert imgs.shape[0] % extract_chunk == 0
            parts = [
                extract(params, imgs[o : o + extract_chunk], r_e)
                for o in range(0, imgs.shape[0], extract_chunk)
            ]
            bank = jax.tree.map(
                lambda *xs: jnp.concatenate(xs, axis=0), *parts
            )
        else:
            bank = extract(params, imgs, r_e)
        c_bank = jax.tree.map(lambda a: a[:contents], bank)
        s_bank = jax.tree.map(lambda a: a[contents:], bank)
        out = None
        for ci, si in batches:
            out = pairs(params, c_bank, s_bank, ci, si, r_p, content_imgs)
        return out

    # warmup / compile; a host scalar fetch forces device completion
    # (block_until_ready does not synchronize through the axon relay)
    out = run_grid(jax.random.PRNGKey(2))
    float(np.asarray(out[0, 0, 0, 0]))

    t0 = time.perf_counter()
    for i in range(iters):
        out = run_grid(jax.random.PRNGKey(3 + i))
    float(np.asarray(out[0, 0, 0, 0]))
    wall = time.perf_counter() - t0
    return n_pairs * iters / wall


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--crop", type=int, default=512)
    ap.add_argument("--contents", type=int, default=4)
    ap.add_argument("--styles", type=int, default=8)
    ap.add_argument("--pair_batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--no_smooth", action="store_true",
                    help="disable the in-graph guided filter")
    ap.add_argument("--fast_pool", action="store_true",
                    help="e2_fast_warp_pool serving approximation")
    ap.add_argument("--extract_chunk", type=int, default=0,
                    help="split the extraction pass into chunks of this "
                         "many images (HBM-peak knob for large grids)")
    ap.add_argument("--blockwise", action="store_true",
                    help="fused Pallas blockwise correspondence in the "
                         "pair stage (the 1024px+ grid path: dense corr "
                         "is ~1 GiB/pair at L=16384)")
    args = ap.parse_args()

    pairs_s = measure_grid(
        crop=args.crop, contents=args.contents, styles=args.styles,
        pair_batch=args.pair_batch, iters=args.iters, dtype=args.dtype,
        smooth=not args.no_smooth, fast_pool=args.fast_pool,
        blockwise=args.blockwise, extract_chunk=args.extract_chunk,
    )
    print(json.dumps({
        "metric": f"grid_pairs_per_sec_per_chip_{args.crop}px",
        "value": round(pairs_s, 3),
        "unit": "pairs/s",
        "grid": f"{args.contents}x{args.styles}",
        "pair_batch": args.pair_batch,
    }))


if __name__ == "__main__":
    main()
