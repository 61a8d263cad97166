"""Benchmark: 512px stylized portraits/sec/chip, end-to-end
simple-swapping pipeline (encode content + encode style + dense
correspondence + style warp + decode) on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference publishes no throughput numbers
(BASELINE.md). ``vs_baseline`` is therefore computed against an analytic
estimate of the reference CUDA pipeline on its era-typical GPU: ~1.1
TFLOP per stylized pair (2x feature extraction + corrm + E2 warp +
decode, fp32 torch, unfused) on a 2080Ti-class card at ~30% MFU
(~13.4 TF/s) with per-image CPU guided-filter excluded -> ~12 pairs/s.
Revisit when a measured reference number exists.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

REFERENCE_PAIRS_PER_SEC = 12.0
CROP = 512
BATCH = 4
ITERS = 10


def main():
    from ppst_tpu.models.config import PPSTConfig
    from ppst_tpu.models.ppst import PPSTModel

    from ppst_tpu.util.fast_init import random_params_like

    cfg = PPSTConfig(crop_size=CROP)
    model = PPSTModel(cfg)
    # eval_shape + host RNG: skips compiling the init graph (bench only
    # measures forward compute; weight values don't change its cost)
    full = random_params_like(
        lambda: model.init(jax.random.PRNGKey(0), CROP), seed=0
    )
    params = jax.device_put(full[0])

    @jax.jit
    def stylize(params, content, style, rng):
        r_corr, r_dec = jax.random.split(rng)
        sp, _ = model.encode(params, content)
        corr = model.correspondence_from_images(params, content, style, r_corr)
        out = model.e2.apply({"params": params["E2"]}, style, corrmatrix=corr)
        return model.decode(params, sp, out.vectors_w, r_dec)

    key = jax.random.PRNGKey(1)
    content = jax.random.normal(key, (BATCH, CROP, CROP, 3), jnp.float32) * 0.3
    style = jnp.roll(content, 1, axis=0)

    # warmup / compile
    stylize(params, content, style, jax.random.PRNGKey(2)).block_until_ready()

    t0 = time.perf_counter()
    for i in range(ITERS):
        out = stylize(params, content, style, jax.random.PRNGKey(3 + i))
    out.block_until_ready()
    dt = time.perf_counter() - t0

    pairs_per_sec = BATCH * ITERS / dt
    print(
        json.dumps(
            {
                "metric": "stylized_portraits_per_sec_per_chip_512px",
                "value": round(pairs_per_sec, 3),
                "unit": "pairs/s",
                "vs_baseline": round(pairs_per_sec / REFERENCE_PAIRS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
