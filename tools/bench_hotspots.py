"""Per-hotspot TPU microbenchmarks for the stylization pipeline.

Times the pipeline's dominant conv shapes and network sub-graphs on the
real chip and prints an MFU table (effective TF/s vs the v5e bf16 peak),
isolating where the conv-efficiency gap (VERDICT r2 weak #1) actually
lives: raw conv shapes, the generator body, the feature-extraction
branch, and candidate alternative formulations (im2col matmul).

Usage: python tools/bench_hotspots.py [--crop 512] [--batch 4]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ppst_tpu.util.cache import setup_compile_cache

setup_compile_cache(jax)

V5E_BF16_PEAK_TFS = 197.0


def _sync(x):
    # through the axon relay block_until_ready does not wait for device
    # completion; a host scalar fetch does (BASELINE.md timing caveat)
    leaf = jax.tree.leaves(x)[0]
    float(np.asarray(jax.tree.map(lambda a: a.reshape(-1)[0], leaf)))


def timeit(fn, *args, iters: int = 10):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def bench_conv(batch, hw, cin, cout, k, dtype, iters=10, stride=1):
    """One conv3x3/1x1 shape; returns (ms, tf_s, mfu)."""
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (batch, hw, hw, cin), jnp.float32).astype(dtype)
    w = jax.random.normal(key, (k, k, cin, cout), jnp.float32).astype(dtype)

    @jax.jit
    def f(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (stride, stride), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    dt = timeit(f, x, w, iters=iters)
    flops = 2 * batch * (hw // stride) ** 2 * cin * cout * k * k
    tfs = flops / dt / 1e12
    return dt * 1e3, tfs, tfs / V5E_BF16_PEAK_TFS


def bench_im2col(batch, hw, cin, cout, k, dtype, iters=10):
    """Same conv as explicit patch-matmul (layout experiment)."""
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (batch, hw, hw, cin), jnp.float32).astype(dtype)
    w = jax.random.normal(key, (k * k * cin, cout), jnp.float32).astype(dtype)

    @jax.jit
    def f(x, w):
        p = k // 2
        xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
        cols = [
            xp[:, i : i + hw, j : j + hw, :] for i in range(k) for j in range(k)
        ]
        patches = jnp.concatenate(cols, axis=-1)  # (B, H, W, k*k*cin)
        return patches.reshape(-1, k * k * cin) @ w

    dt = timeit(f, x, w, iters=iters)
    flops = 2 * batch * hw * hw * cin * cout * k * k
    tfs = flops / dt / 1e12
    return dt * 1e3, tfs, tfs / V5E_BF16_PEAK_TFS


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--crop", type=int, default=512)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    B = args.batch

    print(f"backend={jax.default_backend()} batch={B} dtype={args.dtype}")
    print("== raw conv shapes (pipeline inventory) ==")
    # (label, hw, cin, cout, k, stride)
    shapes = [
        ("G head styled 64x64x512", 64, 512, 512, 3, 1),
        ("G up1 conv2 128x128x512", 128, 512, 512, 3, 1),
        ("G up2 conv1 256x256 512->256", 256, 512, 256, 3, 1),
        ("G up2 conv2 256x256x256", 256, 256, 256, 3, 1),
        ("G up3 conv1 512x512 256->128", 512, 256, 128, 3, 1),
        ("G up3 conv2 512x512x128", 512, 128, 128, 3, 1),
        ("fuse1_res 256x256x256", 256, 256, 256, 3, 1),
        ("tap128 3x3 256->128 @128", 128, 256, 128, 3, 1),
        ("E1 512x512x32", 512, 32, 32, 3, 1),
        ("E1 512->256 down 32->64", 512, 32, 64, 3, 2),
        ("calib 512x512x64", 512, 64, 64, 3, 1),
    ]
    for label, hw, cin, cout, k, stride in shapes:
        ms, tfs, mfu = bench_conv(B, hw, cin, cout, k, dtype, args.iters, stride)
        print(f"{label:36s} {ms:8.2f} ms  {tfs:7.1f} TF/s  {mfu*100:5.1f}% MFU")

    print("== im2col matmul formulation ==")
    for label, hw, cin, cout, k in [
        ("im2col 512x512x64", 512, 64, 64, 3),
        ("im2col fuse1 256x256x256", 256, 256, 256, 3),
        ("im2col 512x512 256->128", 512, 256, 128, 3),
    ]:
        ms, tfs, mfu = bench_im2col(B, hw, cin, cout, k, dtype, args.iters)
        print(f"{label:36s} {ms:8.2f} ms  {tfs:7.1f} TF/s  {mfu*100:5.1f}% MFU")

    print("== network sub-graphs ==")
    from ppst_tpu.models.config import PPSTConfig
    from ppst_tpu.models.ppst import PPSTModel
    from ppst_tpu.ops.corr import rselfcorr
    from ppst_tpu.util.fast_init import random_params_like

    cfg = PPSTConfig(crop_size=args.crop)
    model = PPSTModel(cfg)
    params, _ = random_params_like(
        lambda: model.init(jax.random.PRNGKey(0), args.crop), seed=0
    )
    params = jax.device_put(params)
    crop = args.crop
    img = (jax.random.normal(jax.random.PRNGKey(1), (B, crop, crop, 3)) * 0.3
           ).astype(dtype)
    grid = crop // 8
    sp = jax.random.normal(
        jax.random.PRNGKey(2), (B, grid, grid, cfg.spatial_code_ch)
    ).astype(dtype)
    gl = [
        jax.random.normal(jax.random.PRNGKey(3 + i), (B, cfg.style_dim)).astype(dtype)
        for i in range(4)
    ]
    rng = jax.random.PRNGKey(9)

    g_body = jax.jit(lambda p, s, g: model.apply_g(p, s, g, rng))
    g_ext = jax.jit(
        lambda p, s, g: model.apply_g(p, s, g, rng, extract_features=True)
    )
    e1 = jax.jit(model.apply_e1)
    e2 = jax.jit(lambda p, x: model.apply_e2(p, x).vectors)
    rself = jax.jit(rselfcorr)

    # FLOP estimates per sample (from the architecture defs; f32-equiv)
    for label, fn, fargs, gflops in [
        ("E1 encode", e1, (params, img), 50.0),
        ("E2 encode", e2, (params, img), 60.0),
        ("G body (decode conv stack)", g_body, (params, sp, gl), 740.0),
        ("G extract (body+feature branch)", g_ext, (params, sp, gl), 930.0),
    ]:
        dt = timeit(fn, *fargs, iters=args.iters)
        tfs = gflops * B / dt / 1e3
        print(
            f"{label:36s} {dt*1e3:8.2f} ms  ~{tfs:6.1f} TF/s "
            f"({gflops:.0f} GF/sample est)"
        )
    out = g_ext(params, sp, gl)
    feat1 = out[2]
    dt = timeit(rself, feat1, iters=args.iters)
    print(f"{'rselfcorr':36s} {dt*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
