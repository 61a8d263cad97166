"""Probe cheaper formulations for the feature-branch glue ops.

Variants measured (B=16, bf16, chained x8):
  1. instance_norm: current (f32 materialize) vs fused-stats apply
  2. tap256 (IN+1x1 conv stack @512^2): current vs bf16-stats variant
  3. resize_bilinear 64->256 / 512->256: gather-based vs per-axis matmul
  4. rselfcorr: f32 einsum vs normalize-then-bf16 einsum
"""

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

from ppst_tpu.nn.layers import instance_norm
from ppst_tpu.ops.corr import resize_bilinear, adaptive_avg_pool, rselfcorr

B, K = 16, 8
dt = jnp.bfloat16
rng = jax.random.PRNGKey(0)


def timeit(fn, *args, iters=5):
    out = fn(*args)
    jax.tree.map(lambda a: np.asarray(a), out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree.map(lambda a: np.asarray(a), out)
    return (time.perf_counter() - t0) / iters


def chained(f, x):
    acc = jnp.float32(0.0)
    for _ in range(K):
        y = f(x + (acc * 1e-30).astype(x.dtype))
        acc = jnp.mean(y.astype(jnp.float32))
    return acc


def report(name, fn, x):
    s = timeit(jax.jit(lambda x: chained(fn, x)), x) / K
    print(f"{name:44s} {s*1e3/B:7.3f} ms/img", flush=True)
    return s


def in_fused(x, eps=1e-5):
    """One materialization: stats from bf16 reads, apply in compute dtype."""
    x32sum = jnp.sum(x.astype(jnp.float32), axis=(1, 2), keepdims=True)
    n = x.shape[1] * x.shape[2]
    mean = x32sum / n
    var = jnp.sum(jnp.square(x.astype(jnp.float32) - mean), axis=(1, 2), keepdims=True) / n
    scale = jax.lax.rsqrt(var + eps)
    return ((x.astype(jnp.float32) - mean) * scale).astype(x.dtype)


def in_onepass(x, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mean = x32.mean(axis=(1, 2), keepdims=True)
    msq = jnp.mean(jnp.square(x32), axis=(1, 2), keepdims=True)
    var = msq - jnp.square(mean)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


x512 = jax.random.normal(rng, (B, 512, 512, 128), jnp.float32).astype(dt)
report("IN current @512^2x128", instance_norm, x512)
report("IN fused-two-pass @512^2x128", in_fused, x512)
report("IN one-pass @512^2x128", in_onepass, x512)

# matmul resize: per-axis dense interpolation matrices
def resize_matrix(n_in, n_out):
    # torch/jax align_corners=False bilinear weights
    out = np.zeros((n_in, n_out), np.float32)
    scale = n_in / n_out
    for j in range(n_out):
        src = (j + 0.5) * scale - 0.5
        i0 = int(np.floor(src))
        f = src - i0
        i0c = min(max(i0, 0), n_in - 1)
        i1c = min(max(i0 + 1, 0), n_in - 1)
        out[i0c, j] += 1 - f
        out[i1c, j] += f
    return jnp.asarray(out)


def mk_resize_mm(n_in, n_out, dtype):
    M = resize_matrix(n_in, n_out).astype(dtype)

    def f(x):
        # (B,H,W,C) -> rows: contract H with M(H,Hout)
        y = jnp.einsum("bhwc,hH->bHwc", x, M)
        return jnp.einsum("bHwc,wW->bHWc", y, M)

    return f


for (s_in, ch) in ((64, 64), (128, 64), (256, 64), (512, 64)):
    x = jax.random.normal(rng, (B, s_in, s_in, ch), jnp.float32).astype(dt)
    report(f"resize gather {s_in}->256 ch{ch}", lambda x: resize_bilinear(x, (256, 256)), x)
    report(f"resize matmul {s_in}->256 ch{ch}", mk_resize_mm(s_in, 256, dt), x)
    # check parity
    a = np.asarray(resize_bilinear(x.astype(jnp.float32), (256, 256)))
    b = np.asarray(mk_resize_mm(s_in, 256, jnp.float32)(x.astype(jnp.float32)))
    print(f"  max abs diff f32: {np.abs(a-b).max():.2e}", flush=True)

# adaptive pool to 64
for s_in in (128, 256, 512):
    x = jax.random.normal(rng, (B, s_in, s_in, 64), jnp.float32).astype(dt)
    report(f"adaptive_avg_pool {s_in}->64", lambda x: adaptive_avg_pool(x, (64, 64)), x)

# rselfcorr variants
fea1 = jax.random.normal(rng, (B, 256, 256, 64), jnp.float32).astype(dt)


def rself_bf16(fea, patch=4):
    b, h, w, c = fea.shape
    f32 = fea.astype(jnp.float32)
    mean = f32.mean(axis=-1, keepdims=True)
    v = f32 - mean
    v = v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + np.finfo(np.float64).eps)
    v = v.astype(fea.dtype)
    ph, pw = h // patch, w // patch
    e = patch * patch
    v = v.reshape(b, ph, patch, pw, patch, c).transpose(0, 1, 3, 2, 4, 5)
    v = v.reshape(b, ph, pw, e, c)
    gram = jnp.einsum("bpqec,bpqfc->bpqef", v, v)
    return gram.reshape(b, ph, pw, e * e)


report("rselfcorr current 256^2x64", rselfcorr, fea1)
report("rselfcorr bf16-gram 256^2x64", rself_bf16, fea1)
a = np.asarray(rselfcorr(fea1).astype(jnp.float32))
bb = np.asarray(rself_bf16(fea1).astype(jnp.float32))
print(f"  rself bf16 max abs diff: {np.abs(a-bb).max():.2e}", flush=True)
