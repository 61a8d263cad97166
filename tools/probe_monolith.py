"""Bisect the monolithic-stylize XLA compile blow-up (VERDICT r2 weak #4).

One jit of the full 512px stylization pipeline historically triggered a
pathological optimization-time blow-up, so bench.py/entry() run it as four
staged jits. This probe times lowering+compiling the monolith in three
forms to find a shippable single-jit entry:

  plain     — model.stylize as-is
  barriers  — jax.lax.optimization_barrier between pipeline stages
              (stops cross-stage fusion but keeps one executable)
  remat     — each stage wrapped in jax.checkpoint

Usage: python tools/probe_monolith.py [--crop 512] [--mode barriers]
       [--timeout fail-fast wall seconds]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ppst_tpu.util.cache import setup_compile_cache


def build(mode: str, crop: int):
    from ppst_tpu.models.config import PPSTConfig
    from ppst_tpu.models.ppst import PPSTModel
    from ppst_tpu.ops.corr import rselfcorr
    from ppst_tpu.util.fast_init import random_params_like

    cfg = PPSTConfig(crop_size=crop)
    model = PPSTModel(cfg)
    params, _ = random_params_like(
        lambda: model.init(jax.random.PRNGKey(0), crop), seed=0
    )

    barrier = (
        jax.lax.optimization_barrier if mode == "barriers" else (lambda x: x)
    )
    stage = jax.checkpoint if mode == "remat" else (lambda f: f)

    def forward(params, content, style, rng):
        r_c, r_s, r_dec = jax.random.split(rng, 3)

        @stage
        def extract(params, img, r):
            sp = model.apply_e1(params, img)
            vec = model.apply_e2(params, img).vectors
            _, fea, fea1 = model.apply_g(params, sp, vec, r, extract_features=True)
            return sp, jnp.concatenate([fea, rselfcorr(fea1)], axis=-1)

        sp_c, desc_c = barrier(extract(params, content, r_c))
        _, desc_s = barrier(extract(params, style, r_s))
        corr = barrier(model.corrm(desc_s, desc_c))

        @stage
        def warp_styles(params, style, corr):
            return model.e2.apply(
                {"params": params["E2"]},
                style,
                corrmatrix=corr,
                corr_out_hw=(desc_c.shape[1], desc_c.shape[2]),
            ).vectors_w

        gl_w = barrier(tuple(warp_styles(params, style, corr)))

        @stage
        def dec(params, sp, gl_w, r, content):
            return model.decode(params, sp, list(gl_w), r, target=content)

        return dec(params, sp_c, gl_w, r_dec, content)

    content = jnp.zeros((1, crop, crop, 3), jnp.float32)
    style = jnp.zeros((1, crop, crop, 3), jnp.float32)
    rng = jax.random.PRNGKey(1)
    return forward, (params, content, style, rng)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--crop", type=int, default=512)
    ap.add_argument("--mode", default="barriers",
                    choices=["plain", "barriers", "remat"])
    ap.add_argument("--no-cache", action="store_true")
    args = ap.parse_args()
    if not args.no_cache:
        setup_compile_cache(jax)

    forward, fargs = build(args.mode, args.crop)
    t0 = time.time()
    lowered = jax.jit(forward).lower(*fargs)
    print(f"[{args.mode}] lowered in {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    compiled = lowered.compile()
    print(f"[{args.mode}] compiled in {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    out = compiled(*fargs)
    import numpy as np

    float(np.asarray(out[0, 0, 0, 0]))
    print(f"[{args.mode}] executed in {time.time()-t0:.2f}s shape {out.shape}")


if __name__ == "__main__":
    main()
