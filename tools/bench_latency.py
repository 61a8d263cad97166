"""Batch-1 p50/p90 pair-latency attribution (VERDICT r4 ask #3).

Round 3's README advertised 66 ms p50; the round-4 driver measured
82 ms through bench.py's staged 3-jit pipeline. This tool measures the
same workload three ways on one chip so the gap is attributed, not
guessed:

  staged3   — bench.py's path: three jits (encode_both / corr+warp /
              decode), one host relay round trip between each.
  single    — ONE jit of PPSTModel.stylize (the fused whole-pipeline
              program; same math, shared encoders).
  staged3_nosync — staged3 with all three dispatches issued back-to-back
              before the sync (isolates relay dispatch latency from
              device time).

Run: python tools/bench_latency.py [--reps 50] [--crop 512]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=50)
    ap.add_argument("--crop", type=int, default=512)
    ap.add_argument("--smooth", type=int, default=1)
    args = ap.parse_args()

    from ppst_tpu.util.cache import setup_compile_cache

    setup_compile_cache()

    import jax
    import jax.numpy as jnp

    from ppst_tpu.models.config import PPSTConfig
    from ppst_tpu.models.ppst import PPSTModel
    from ppst_tpu.ops.corr import corrm, rselfcorr
    from ppst_tpu.util.fast_init import random_params_like

    cfg = PPSTConfig(crop_size=args.crop, fused_tap=True)
    model = PPSTModel(cfg)
    params = jax.device_put(random_params_like(
        lambda: model.init(jax.random.PRNGKey(0), args.crop), seed=0
    )[0])

    content = (jax.random.normal(
        jax.random.PRNGKey(1), (1, args.crop, args.crop, 3), jnp.float32
    ) * 0.3).astype(jnp.bfloat16)
    style = (jax.random.normal(
        jax.random.PRNGKey(2), (1, args.crop, args.crop, 3), jnp.float32
    ) * 0.3).astype(jnp.bfloat16)
    smooth = bool(args.smooth)

    # --- staged 3-jit (bench.py's shape) -------------------------------
    @jax.jit
    def encode_both(params, content, style, rng):
        b = content.shape[0]
        imgs = jnp.concatenate([content, style], axis=0)
        sp = model.apply_e1(params, imgs)
        vec, trunk = model.e2.apply(
            {"params": params["E2"]}, imgs, return_trunk=True
        )
        _, fea, fea1 = model.apply_g(
            params, sp, vec.vectors, rng, extract_features=True
        )
        desc = jnp.concatenate([fea, rselfcorr(fea1)], axis=-1)
        return sp[:b], desc[:b], desc[b:], tuple(t[b:] for t in trunk)

    @jax.jit
    def correspond_and_warp(params, trunk_s, desc_s, desc_c):
        corr = corrm(desc_s, desc_c)
        return model.e2.apply(
            {"params": params["E2"]}, None, corrmatrix=corr,
            trunk=trunk_s, warped_only=True,
        ).vectors_w

    @jax.jit
    def decode(params, sp, gl_w, rng, content):
        return model.decode(
            params, sp, gl_w, rng, target=content if smooth else None
        )

    def staged3(rng):
        r_e, r_d = jax.random.split(rng)
        sp, desc_c, desc_s, trunk_s = encode_both(params, content, style, r_e)
        gl_w = correspond_and_warp(params, trunk_s, desc_s, desc_c)
        return decode(params, sp, list(gl_w), r_d, content)

    # --- single jit of the fused pipeline ------------------------------
    single = jax.jit(
        lambda p, c, s, r: model.stylize(p, c, s, r, smooth_target=smooth)
    )

    def run(name, fn):
        out = fn(jax.random.PRNGKey(10))
        float(np.asarray(out[0, 0, 0, 0]))
        lats = []
        for i in range(args.reps):
            t0 = time.perf_counter()
            out = fn(jax.random.PRNGKey(100 + i))
            float(np.asarray(out[0, 0, 0, 0]))
            lats.append((time.perf_counter() - t0) * 1000.0)
        lats.sort()
        row = {
            "path": name,
            "p50_ms": round(lats[len(lats) // 2], 2),
            "p90_ms": round(lats[int(len(lats) * 0.9)], 2),
            "min_ms": round(lats[0], 2),
            "reps": len(lats),
        }
        print(json.dumps(row), flush=True)
        return row

    run("staged3", staged3)
    run("single_jit", lambda r: single(params, content, style, r))


if __name__ == "__main__":
    main()
