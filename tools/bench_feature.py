"""Microbenchmark: the generator feature branch, piece by piece.

BASELINE.md round-3 roofline puts the extraction feature branch at
~22-28 TF/s vs ~80 TF/s for the G body; this tool locates where that
time goes (taps, fuse blocks, feat1 residual block, resizes, rselfcorr)
so the fix targets the real hotspot. Timing is chained (K data-dependent
applications per jit) because single ops through the axon relay are
dispatch-floor-bound (~1.1 ms).

Usage: python tools/bench_feature.py [--batch 16] [--chain 8]
"""

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("PPST_JAX_CACHE", "/root/.cache/jax_ppst_tpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from ppst_tpu.models.config import PPSTConfig
from ppst_tpu.models.generator import Generator, _FeatureTap, _ResidualBlock
from ppst_tpu.ops.corr import adaptive_avg_pool, resize_bilinear, rselfcorr


def chained(module_apply, x, chain):
    """K data-dependent applications; returns (out, per-call FLOP mult)."""
    acc = jnp.float32(0.0)
    out = None
    for _ in range(chain):
        out = module_apply(x + (acc * 1e-30).astype(x.dtype))
        acc = jnp.mean(out.astype(jnp.float32))
    return acc


def timeit(fn, *args, iters=5):
    out = fn(*args)
    float(np.asarray(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(np.asarray(out))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--chain", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()
    B, K = args.batch, args.chain
    dt = jnp.dtype(args.dtype)
    print("backend:", jax.default_backend(), "B =", B, "chain =", K, flush=True)

    cfg = PPSTConfig(crop_size=512)
    rng = jax.random.PRNGKey(0)

    def bench_module(name, mod, shape, flops_per_img):
        x = jax.random.normal(rng, (B,) + shape, jnp.float32)
        params = mod.init(jax.random.PRNGKey(1), x)
        params = jax.tree.map(lambda a: a.astype(dt) if a.ndim >= 2 else a, params)
        x = x.astype(dt)
        f = jax.jit(
            lambda p, x: chained(lambda y: mod.apply(p, y), x, K)
        )
        s = timeit(f, params, x) / K
        tf = flops_per_img * B / s / 1e12
        print(f"{name:38s} {s*1e3/B:7.3f} ms/img  {tf:6.1f} TF/s", flush=True)
        return s

    g9 = lambda sp, cin, cout: 2 * sp * sp * 9 * cin * cout
    g1 = lambda sp, cin, cout: 2 * sp * sp * cin * cout

    total = 0.0
    total += bench_module(
        "tap32 (64^2 512->128->64)",
        _FeatureTap(feature_ch=256), (64, 64, 512),
        g9(64, 512, 128) + g9(64, 128, 64),
    )
    total += bench_module(
        "tap64 (128^2 512->128->64)",
        _FeatureTap(feature_ch=256), (128, 128, 512),
        g9(128, 512, 128) + g9(128, 128, 64),
    )
    total += bench_module(
        "tap128 (256^2 256->128->64)",
        _FeatureTap(feature_ch=256), (256, 256, 256),
        g9(256, 256, 128) + g9(256, 128, 64),
    )
    total += bench_module(
        "tap256 (1x1 512^2 128->64->64)",
        _FeatureTap(conv1x1=True, feature_ch=256), (512, 512, 128),
        g1(512, 128, 64) + g1(512, 64, 64),
    )
    total += bench_module(
        "fuse resblock @64^2x256 (x3 in model)",
        _ResidualBlock(256), (64, 64, 256),
        2 * g9(64, 256, 256),
    ) * 3
    total += bench_module(
        "feat1 resblock @256^2x256",
        _ResidualBlock(256), (256, 256, 256),
        2 * g9(256, 256, 256),
    )

    # resizes + concat for feat1 (bandwidth)
    taps = [
        jax.random.normal(rng, (B, s, s, 64), dt)
        for s in (64, 128, 256, 512)
    ]

    def feat1_pre(ts):
        f1 = jnp.concatenate([resize_bilinear(t, (256, 256)) for t in ts], -1)
        f = jnp.concatenate(
            [ts[0]] + [adaptive_avg_pool(t, (64, 64)) for t in ts[1:]], -1
        )
        return jnp.mean(f1.astype(jnp.float32)) + jnp.mean(f.astype(jnp.float32))

    f = jax.jit(lambda ts: sum(feat1_pre([t + i * 1e-30 for t in ts]) for i in range(K)))
    s = timeit(f, taps) / K
    print(f"{'resize/pool concat (feat+feat1 pre)':38s} {s*1e3/B:7.3f} ms/img", flush=True)
    total += s

    # rselfcorr on fea1 (256^2 x 64)
    fea1 = jax.random.normal(rng, (B, 256, 256, 64), dt)
    f = jax.jit(lambda x: chained(rselfcorr, x, K))
    s = timeit(f, fea1) / K
    print(f"{'rselfcorr 256^2x64 -> 64^2x256':38s} {s*1e3/B:7.3f} ms/img", flush=True)
    total += s

    print(f"\nsummed branch pieces: {total*1e3/B:.2f} ms/img", flush=True)

    # the real thing: full extract vs body-only through the Generator
    gen = Generator(cfg)
    sp = jax.random.normal(rng, (B, 64, 64, 256), dt)
    gls = [jax.random.normal(jax.random.PRNGKey(i), (B, 2048), dt) for i in range(4)]
    params = gen.init(
        {"params": jax.random.PRNGKey(2), "noise": jax.random.PRNGKey(3)},
        sp, gls, extract_features=True,
    )
    params = jax.tree.map(lambda a: a.astype(dt) if a.ndim >= 2 else a, params)

    def run(extract):
        def apply_fn(p, sp, gls):
            acc = jnp.float32(0.0)
            for _ in range(K):
                out = gen.apply(
                    p, sp + (acc * 1e-30).astype(sp.dtype), gls,
                    extract_features=extract,
                    rngs={"noise": jax.random.PRNGKey(3)},
                )
                leaf = out[1] if extract else out
                acc = jnp.mean(leaf.astype(jnp.float32))
            return acc
        f = jax.jit(apply_fn)
        return timeit(f, params, sp, gls) / K

    s_body = run(False)
    print(f"{'G body only (decode path)':38s} {s_body*1e3/B:7.3f} ms/img", flush=True)
    s_full = run(True)
    print(f"{'G body + full feature branch':38s} {s_full*1e3/B:7.3f} ms/img", flush=True)
    print(f"{'implied branch cost':38s} {(s_full-s_body)*1e3/B:7.3f} ms/img", flush=True)


if __name__ == "__main__":
    main()
