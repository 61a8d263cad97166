"""Standalone benchmark: fused StyledConv Pallas kernel vs the XLA
composite, forward and forward+backward, at the generator up-block
shapes (VERDICT r4 ask #1).

The composite here is the exact module math (EqualizedConv2d ->
noise -> biases -> fused lrelu -> instance norm -> StyleMod apply) as
XLA lowers it inside the G step — including whatever layout copies XLA
inserts around the conv, which is the point of the comparison.

Timing: K data-dependent chained applications inside ONE jit (the
output feeds the next input), so per-dispatch relay overhead (~1.1 ms)
amortizes away; device completion forced by a scalar fetch.

Run: python tools/bench_styled_conv.py [--shapes small] [--iters N]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def composite(x, w, noise, gain, b_total, s1, shift):
    # exactly the module lowering (nn/layers.py StyledConv): bf16 conv
    # (f32 internal accum on TPU), bf16 epilogue, f32 IN stats
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    pre = y + (gain.astype(x.dtype) * noise.astype(x.dtype)
               + b_total.astype(x.dtype))
    a = (jnp.where(pre >= 0, pre, pre * jnp.asarray(0.2, x.dtype))
         * jnp.asarray(math.sqrt(2.0), x.dtype))
    a32 = a.astype(jnp.float32)
    m = a32.mean((1, 2), keepdims=True)
    ms = jnp.mean(a32 * a32, (1, 2), keepdims=True)
    var = jnp.maximum(ms - m * m, 0.0)
    n = (a32 - m) * jax.lax.rsqrt(var + 1e-5)
    return (n * s1[:, None, None, :] + shift[:, None, None, :]).astype(x.dtype)


def fused(x, w, noise, gain, b_total, s1, shift):
    from ppst_tpu.ops.styled_conv_pallas import _styled_conv

    return _styled_conv(False, x, w, noise, gain, b_total, s1, shift)


def chain(op, k):
    def f(x, w, noise, gain, b_total, s1, shift):
        for i in range(k):
            x = op(x, w, noise, gain, b_total, s1, shift)
        return x

    return f


def chain_grad(op, k):
    def loss(x, w, noise, gain, b_total, s1, shift):
        out = chain(op, k)(x, w, noise, gain, b_total, s1, shift)
        return jnp.sum(out.astype(jnp.float32))

    return jax.grad(loss, argnums=(0, 1, 4, 5, 6))


def bench(fn, args, iters=6):
    out = fn(*args)
    first = jax.tree.leaves(out)[0]
    float(np.asarray(first.reshape(-1)[0]))  # device sync via fetch
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(np.asarray(jax.tree.leaves(out)[0].reshape(-1)[0]))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--chain", type=int, default=8)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--shapes", default="up")
    args = ap.parse_args()

    if args.shapes == "up":
        shapes = [(args.batch, 128, 128, 512), (args.batch, 256, 256, 256),
                  (args.batch, 512, 512, 128), (args.batch, 64, 64, 512)]
    else:
        shapes = [(2, 32, 32, 128)]

    rng = np.random.default_rng(0)
    k = args.chain
    for b, h, w, c in shapes:
        x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.bfloat16)
        wt = jnp.asarray(
            rng.standard_normal((3, 3, c, c)) * (1.0 / math.sqrt(9 * c)),
            jnp.float32,
        )
        noise = jnp.asarray(rng.standard_normal((b, h, w, 1)), jnp.float32)
        gain = jnp.float32(0.3)
        bt = jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32)
        s1 = jnp.asarray(1.0 + rng.standard_normal((b, c)) * 0.2, jnp.float32)
        sh = jnp.asarray(rng.standard_normal((b, c)) * 0.2, jnp.float32)
        a = (x, wt, noise, gain, bt, s1, sh)

        conv_tflop = 2 * b * h * w * c * c * 9 * k / 1e12

        for name, op in (("xla", composite), ("pallas", fused)):
            fwd = jax.jit(chain(op, k))
            t_f = bench(fwd, a, args.iters)
            bwd = jax.jit(chain_grad(op, k))
            t_b = bench(bwd, a, args.iters)
            print(
                f"B{b} {h}x{w}x{c} {name:6s}: fwd {t_f * 1e3 / k:7.2f} ms/op "
                f"({conv_tflop / t_f:6.1f} TF/s eff) | fwd+bwd "
                f"{t_b * 1e3 / k:7.2f} ms/op ({3 * conv_tflop / t_b:6.1f} TF/s)",
                flush=True,
            )


if __name__ == "__main__":
    main()
