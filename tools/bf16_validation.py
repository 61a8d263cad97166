"""f32-vs-bf16 training validation (VERDICT r2 ask #3).

Trains the full-stack model twice from the same init on the same
synthetic data stream — once with float32 compute, once with bfloat16
compute (params/optimizer state stay f32 in both; --dtype only switches
the activation/conv compute dtype, train/steps.py cast_batch) — then
reports per-loss tail means, max trajectory divergence, and steady-state
step times for both.

Usage: python tools/bf16_validation.py [--steps 120] [--crop 256]
Writes results/bf16_validation/curves.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ppst_tpu.util.cache import setup_compile_cache

setup_compile_cache(jax)


def run(dtype: str, steps: int, crop: int, batch: int, seed: int):
    from ppst_tpu.models.config import PPSTConfig
    from ppst_tpu.models.ppst import PPSTModel
    from ppst_tpu.train.steps import build_train_steps

    cfg = PPSTConfig(crop_size=crop, dtype=dtype)
    model = PPSTModel(cfg)
    # REAL flax init — see tools/lpips_ablation.py: fast_init's uniform
    # std breaks equalized-lr signal propagation and makes D a constant
    # function, which would invalidate a dynamics comparison.
    params, state = model.init(jax.random.PRNGKey(0), crop)
    init_opt, d_step, d_step_r1, g_step = build_train_steps(model, donate=False)
    opt_states = init_opt(params)
    params, state, opt_states = jax.device_put((params, state, opt_states))

    rng = np.random.default_rng(seed)
    rows, step_times = [], []
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
        t0 = time.perf_counter()
        params, state, opt_states, d_losses = dstep(
            params, state, opt_states, real, mask, key
        )
        params, state, opt_states, g_losses = g_step(
            params, state, opt_states, real, mask, jax.random.fold_in(key, 1)
        )
        # device sync via scalar fetch (relay does not honor block_until_ready)
        row = {k: float(v) for k, v in {**d_losses, **g_losses}.items()}
        if i >= 5:  # skip compile+warmup steps in the timing
            step_times.append(time.perf_counter() - t0)
        rows.append(row)
        if i % 25 == 0:
            print(f"  [{dtype}] step {i}: G_L1={row.get('G_L1', -1):.3f} "
                  f"D_real={row.get('D_real', -1):.3f}", flush=True)
    med = float(np.median(step_times)) if step_times else float("nan")
    img_s = 2 * batch / med  # one D + one G step consume two batches
    return rows, img_s


def plot(out_dir: str) -> None:
    """Overlay the f32/bf16 loss trajectories from curves.json -> curves.png."""
    with open(os.path.join(out_dir, "curves.json")) as f:
        data = json.load(f)
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    keys = [k for k in sorted(data["summary"]) if not k.startswith("D_R1")]
    cols = 3
    rows = (len(keys) + cols - 1) // cols
    fig, axes = plt.subplots(rows, cols, figsize=(4 * cols, 2.6 * rows))
    for ax, k in zip(axes.ravel(), keys):
        for rows_key, label, c in (("rows_f32", "f32", "#4477aa"),
                                   ("rows_bf16", "bf16", "#ee6677")):
            ys = [r[k] for r in data[rows_key] if k in r]
            ax.plot(ys, label=label, color=c, lw=1)
        ax.set_title(k, fontsize=9)
        ax.legend(fontsize=7)
    for ax in axes.ravel()[len(keys):]:
        ax.axis("off")
    fig.suptitle(f"f32 vs bf16 training, {data['crop']}px b{data['batch']}")
    fig.tight_layout()
    fig.savefig(os.path.join(out_dir, "curves.png"), dpi=110)
    print(f"wrote {out_dir}/curves.png")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=120)
    ap.add_argument("--crop", type=int, default=256)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--out", default="results/bf16_validation")
    ap.add_argument("--plot-only", action="store_true",
                    help="regenerate curves.png from an existing curves.json")
    args = ap.parse_args()
    if args.plot_only:
        plot(args.out)
        return

    print("f32 run:")
    rows_32, imgs_32 = run("float32", args.steps, args.crop, args.batch, 21)
    print("bf16 run:")
    rows_16, imgs_16 = run("bfloat16", args.steps, args.crop, args.batch, 21)

    keys = sorted(set(rows_32[-1]) | set(rows_16[-1]))
    print(f"{'loss':18s} {'f32 tail':>10s} {'bf16 tail':>10s} {'rel.diff':>9s}")
    summary = {}
    k_tail = max(1, len(rows_32) // 4)
    for k in keys:
        a = float(np.mean([r[k] for r in rows_32[-k_tail:] if k in r]))
        b = float(np.mean([r[k] for r in rows_16[-k_tail:] if k in r]))
        rel = abs(a - b) / (abs(a) + 1e-8)
        summary[k] = {"f32": a, "bf16": b, "rel": rel}
        print(f"{k:18s} {a:10.4f} {b:10.4f} {rel:9.3f}")
    fin32 = all(np.isfinite(list(r.values())).all() for r in rows_32)
    fin16 = all(np.isfinite(list(r.values())).all() for r in rows_16)
    print(f"finite: f32={fin32} bf16={fin16}")
    print(f"steady img/s @{args.crop}px b{args.batch}: "
          f"f32 {imgs_32:.2f}  bf16 {imgs_16:.2f}")

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "curves.json"), "w") as f:
        json.dump({"crop": args.crop, "batch": args.batch,
                   "img_per_sec": {"f32": imgs_32, "bf16": imgs_16},
                   "summary": summary, "finite": {"f32": fin32, "bf16": fin16},
                   "rows_f32": rows_32, "rows_bf16": rows_16}, f, indent=1)
    print(f"wrote {args.out}/curves.json")
    try:
        plot(args.out)
    except Exception as e:  # matplotlib optional
        print(f"plot skipped: {e}")


if __name__ == "__main__":
    main()
