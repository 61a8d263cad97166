"""Fine-grained on-chip stage profile of the 512px stylization pipeline.

Times each sub-computation in its own jit (device completion forced via a
device-side scalar index + 4-byte fetch; block_until_ready does not wait
through the axon relay) and prints ms + effective TF/s per stage.

Usage: python tools/bench_stages.py [crop] [batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_ppst_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

CROP = int(sys.argv[1]) if len(sys.argv) > 1 else 512
B = int(sys.argv[2]) if len(sys.argv) > 2 else 4
DT = jnp.bfloat16


def fetch(out):
    x = jax.tree.leaves(out)[0]
    return float(jnp.ravel(x)[0])


def timeit(fn, *args, iters=10):
    out = fn(*args)
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fetch(out)
    return (time.perf_counter() - t0) / iters


def report(name, secs, flops=None):
    tf = f"{flops/secs/1e12:7.1f} TF/s" if flops else "           "
    print(f"{name:42s} {secs*1e3:8.2f} ms  {tf}", flush=True)


def main():
    from ppst_tpu.models.config import PPSTConfig
    from ppst_tpu.models.ppst import PPSTModel
    from ppst_tpu.ops.corr import corrm, rselfcorr
    from ppst_tpu.ops.guided_filter import guided_filter
    from ppst_tpu.util.fast_init import random_params_like

    cfg = PPSTConfig(crop_size=CROP)
    model = PPSTModel(cfg)
    params, _ = random_params_like(
        lambda: model.init(jax.random.PRNGKey(0), CROP), seed=0
    )
    params = jax.device_put(params)

    key = jax.random.PRNGKey(1)
    img = (jax.random.normal(key, (B, CROP, CROP, 3), jnp.float32) * 0.3).astype(DT)
    rng = jax.random.PRNGKey(2)
    grid = CROP // 8
    sp = jax.random.normal(key, (B, grid, grid, cfg.spatial_code_ch), DT)
    gl = tuple(
        jax.random.normal(jax.random.fold_in(key, i), (B, cfg.style_dim), DT)
        for i in range(4)
    )

    # --- E1 ---------------------------------------------------------------
    f = jax.jit(lambda p, x: model.apply_e1(p, x))
    report("E1 encode", timeit(f, params, img))

    # --- E2 plain ----------------------------------------------------------
    f = jax.jit(lambda p, x: tuple(model.apply_e2(p, x).vectors))
    report("E2 encode (vectors)", timeit(f, params, img))

    # --- G decode only ------------------------------------------------------
    f = jax.jit(lambda p, s, g, r: model.apply_g(p, s, list(g), r))
    report("G decode (no taps)", timeit(f, params, sp, gl, rng))

    # --- G decode + feature taps -------------------------------------------
    f = jax.jit(
        lambda p, s, g, r: model.apply_g(p, s, list(g), r, extract_features=True)
    )
    report("G decode + feature taps", timeit(f, params, sp, gl, rng))

    # --- taps/fusion alone: diff is implied; also time pieces ----------------
    _, fea, fea1 = f(params, sp, gl, rng)

    # --- rselfcorr ----------------------------------------------------------
    fr = jax.jit(rselfcorr)
    report("rselfcorr", timeit(fr, fea1))

    # --- corrm ----------------------------------------------------------
    desc = jnp.concatenate([fea, fr(fea1)], axis=-1)
    fc = jax.jit(corrm)
    L = grid * grid
    report("corrm (LxL softmax)", timeit(fc, desc, desc),
           2 * B * L * L * desc.shape[-1] * 2)

    corr = fc(desc, desc)

    # --- E2 warp path -------------------------------------------------------
    f = jax.jit(
        lambda p, x, c: tuple(model.apply_e2(p, x, corrmatrix=c).vectors_w)
    )
    report("E2 warp (corrmatrix)", timeit(f, params, img, corr))

    # --- guided filter --------------------------------------------------
    f = jax.jit(lambda g, x: guided_filter(g, x, radius=30, eps=(0.02 * 255) ** 2))
    report("guided filter", timeit(f, img.astype(jnp.float32),
                                   img.astype(jnp.float32)))

    # --- decode + guided filter fused ----------------------------------------
    f = jax.jit(lambda p, s, g, r, t: model.decode(p, s, list(g), r, target=t))
    report("decode incl. guided filter", timeit(f, params, sp, gl, rng, img))


if __name__ == "__main__":
    main()
