"""Microbenchmark: conv3x3 variants on the chip, to locate the conv
efficiency gap (BASELINE.md: ~13 TF/s effective vs 135 TF/s matmul
calibration). Times lax.conv in several dtype/layout/channel configs plus
an im2col-as-matmul formulation and space-to-depth."""

import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("PPST_JAX_CACHE", "/root/.cache/jax_ppst_tpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)


def timeit(fn, *args, iters=20):
    out = fn(*args)
    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])  # force completion
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    return (time.perf_counter() - t0) / iters


def conv_nhwc(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def report(name, secs, flops):
    print(f"{name:55s} {secs*1e3:8.2f} ms  {flops/secs/1e12:7.1f} TF/s")


def main():
    print("backend:", jax.default_backend(), jax.devices()[0])
    B, H = 4, 512

    for cin, cout in [(64, 64), (128, 128), (32, 32), (512, 512)]:
        h = H if cin <= 128 else 64
        flops = 2 * B * h * h * cin * cout * 9
        for dt in (jnp.bfloat16, jnp.float32):
            x = jnp.ones((B, h, h, cin), dt)
            w = jnp.ones((3, 3, cin, cout), dt)
            f = jax.jit(conv_nhwc)
            s = timeit(f, x, w)
            report(f"conv3x3 {h}^2 {cin}->{cout} {dt.__name__}", s, flops)
        # mixed: bf16 activations, f32 weights (the current G config)
        x = jnp.ones((B, h, h, cin), jnp.bfloat16)
        w = jnp.ones((3, 3, cin, cout), jnp.float32)
        f = jax.jit(lambda x, w: conv_nhwc(x, w.astype(x.dtype)))
        s = timeit(f, x, w)
        report(f"conv3x3 {h}^2 {cin}->{cout} bf16(x) f32(w) cast", s, flops)
        f2 = jax.jit(conv_nhwc)
        s = timeit(f2, x, w)
        report(f"conv3x3 {h}^2 {cin}->{cout} bf16(x) f32(w) mixed", s, flops)

    # space-to-depth: 512^2 x 64 -> 256^2 x 256 conv with rearranged weights
    cin, cout = 64, 64
    flops = 2 * B * H * H * cin * cout * 9
    x = jnp.ones((B, H // 2, H // 2, cin * 4), jnp.bfloat16)
    w = jnp.ones((2, 2, cin * 4, cout * 4), jnp.bfloat16)  # equivalent-cost proxy
    f = jax.jit(conv_nhwc)
    s = timeit(f, x, w)
    report("s2d-proxy conv2x2 256^2 256->256 bf16", s, 2 * B * 256 * 256 * 256 * 256 * 4)

    # pure matmul with the same arithmetic as conv3x3 512^2 64->64
    M, K, N = B * H * H, 9 * 64, 64
    a = jnp.ones((M, K), jnp.bfloat16)
    bm = jnp.ones((K, N), jnp.bfloat16)
    f = jax.jit(lambda a, b: a @ b)
    s = timeit(f, a, bm)
    report(f"matmul {M}x{K}x{N} bf16 (im2col shape)", s, 2 * M * K * N)

    # same matmul but N=128 lanes full
    N = 128
    bm = jnp.ones((K, N), jnp.bfloat16)
    s = timeit(f, a, bm)
    report(f"matmul {M}x{K}x{N} bf16", s, 2 * M * K * N)

    # big square matmul calibration
    for dt in (jnp.bfloat16, jnp.float32):
        n = 8192
        a = jnp.ones((n, n), dt)
        b2 = jnp.ones((n, n), dt)
        s = timeit(f, a, b2, iters=5)
        report(f"matmul {n}^3 {dt.__name__} (calibration)", s, 2 * n**3)


if __name__ == "__main__":
    main()
