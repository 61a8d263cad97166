"""Quantify the missing-pretrained-LPIPS risk (VERDICT r2 ask #8).

The reference gates its cycle-warp regularizer on pretrained AlexNet
LPIPS (reference models/ppst_model.py:48,176-179). This machine has no
egress, so ppst_tpu ships a deterministic random-weight AlexNet backbone
(ops/lpips.py) plus a tested torch-weight converter for when real
weights are available. This ablation bounds the impact: train the same
short on-chip run with

  A) random-backbone LPIPS cycle-warp (lambda_Cycwarp=5, the default)
  B) the term disabled (lambda_Cycwarp=0)

and compare loss trajectories — showing (1) the random-backbone term
carries real signal (nonzero, responsive, finite) and (2) the rest of
the training dynamics are unaffected by its presence.

Usage: python tools/lpips_ablation.py [--steps 150] [--crop 256]
Writes results/lpips_ablation/ablation.json and prints a summary table.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ppst_tpu.util.cache import setup_compile_cache

setup_compile_cache(jax)


def run(lambda_cycwarp: float, steps: int, crop: int, batch: int, seed: int):
    from ppst_tpu.models.config import PPSTConfig
    from ppst_tpu.models.ppst import PPSTModel
    from ppst_tpu.train.steps import build_train_steps

    cfg = PPSTConfig(
        crop_size=crop, lambda_Cycwarp=lambda_cycwarp, dtype="bfloat16"
    )
    model = PPSTModel(cfg)
    # REAL flax init (not util.fast_init): this tool studies training
    # DYNAMICS, and the fast uniform-std fill breaks equalized-lr signal
    # propagation — the StyleGAN2 D expects N(0,1) kernels with runtime
    # 1/sqrt(fan_in) scaling, so a 0.05-std fill attenuates ~20x per
    # layer and D degenerates to a constant (measured: identical score
    # for every input). Init compiles once and hits the persistent cache.
    params, state = model.init(jax.random.PRNGKey(0), crop)
    init_opt, d_step, d_step_r1, g_step = build_train_steps(model, donate=False)
    opt_states = init_opt(params)
    params, state, opt_states = jax.device_put((params, state, opt_states))

    rng = np.random.default_rng(seed)
    rows = []
    for i in range(steps):
        real = jnp.asarray(
            rng.standard_normal((batch, crop, crop, 3)).astype(np.float32) * 0.4
        ).clip(-1, 1)
        region = rng.integers(0, 3, (batch, crop // 16, crop // 16))
        region = np.kron(region, np.ones((1, 16, 16), np.int64))
        mask = jnp.asarray(
            np.stack([(region == k) for k in range(3)], -1).astype(np.float32)
        )
        key = jax.random.PRNGKey(1000 * seed + i)
        dstep = d_step_r1 if (i % 16) == 0 else d_step
        params, state, opt_states, d_losses = dstep(
            params, state, opt_states, real, mask, key
        )
        params, state, opt_states, g_losses = g_step(
            params, state, opt_states, real, mask, jax.random.fold_in(key, 1)
        )
        row = {k: float(v) for k, v in {**d_losses, **g_losses}.items()}
        rows.append(row)
        if i % 25 == 0:
            print(f"  [cycwarp={lambda_cycwarp}] step {i}: "
                  f"D_total={sum(row.get(k, 0) for k in ('D_real','D_rec','D_mix')):.3f} "
                  f"G_L1={row.get('G_L1', float('nan')):.3f} "
                  f"warp_reg={row.get('image_warp_reg', 0):.4f}", flush=True)
    return rows


def tail_mean(rows, key, frac=0.25):
    vals = [r[key] for r in rows if key in r]
    if not vals:
        return None
    k = max(1, int(len(vals) * frac))
    return float(np.mean(vals[-k:]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--crop", type=int, default=256)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--out", default="results/lpips_ablation")
    args = ap.parse_args()

    print("run A: random-backbone LPIPS cycle-warp (lambda=5)")
    rows_a = run(5.0, args.steps, args.crop, args.batch, seed=11)
    print("run B: lambda_Cycwarp=0")
    rows_b = run(0.0, args.steps, args.crop, args.batch, seed=11)

    keys = ["D_real", "D_rec", "D_mix", "G_L1", "G_L1_cyc", "Mask_warp",
            "image_warp_reg", "G_GAN_mix", "G_GAN_rec"]
    summary = {}
    print(f"{'loss':18s} {'A tail-mean':>12s} {'B tail-mean':>12s}")
    for k in keys:
        a, b = tail_mean(rows_a, k), tail_mean(rows_b, k)
        summary[k] = {"cycwarp5": a, "cycwarp0": b}
        print(f"{k:18s} {a if a is not None else float('nan'):12.4f} "
              f"{b if b is not None else float('nan'):12.4f}")
    finite_a = all(np.isfinite(list(r.values())).all() for r in rows_a)
    finite_b = all(np.isfinite(list(r.values())).all() for r in rows_b)
    print(f"finite: A={finite_a} B={finite_b}")

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "ablation.json"), "w") as f:
        json.dump(
            {"steps": args.steps, "crop": args.crop, "batch": args.batch,
             "summary": summary, "finite": {"A": finite_a, "B": finite_b},
             "rows_a": rows_a, "rows_b": rows_b},
            f, indent=1,
        )
    print(f"wrote {args.out}/ablation.json")


if __name__ == "__main__":
    main()
