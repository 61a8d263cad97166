"""Training-step roofline: XLA-counted FLOPs, steady step time, and MFU
for the d/g/r1 train steps (VERDICT r3 ask #3 — training previously had
no FLOP accounting, so nobody could say whether the G step's 862 ms was
30% or 70% of peak).

FLOPs come from the compiled executable's own cost analysis (XLA's
count over the optimized HLO — includes the backward pass and any remat
recompute, so MFU here is "useful+recompute FLOPs / peak"). Peak
defaults to v5e bf16 197 TF/s.

Also runs a G-step TERM ABLATION (each loss lambda zeroed in turn) to
attribute the step time to the loss terms feeding it.

Usage: python tools/train_roofline.py [--crop 512] [--batch 4]
       [--dtype bfloat16] [--iters 5] [--ablate]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("PPST_JAX_CACHE", "/root/.cache/jax_ppst_tpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

PEAK_TFLOPS = float(os.environ.get("PPST_PEAK_TFLOPS", "197"))


def _build(cfg, crop, batch):
    from ppst_tpu.models.ppst import PPSTModel
    from ppst_tpu.train.steps import build_train_steps
    from ppst_tpu.util.fast_init import random_params_like

    model = PPSTModel(cfg)
    params, state = random_params_like(
        lambda: model.init(jax.random.PRNGKey(0), crop), seed=0
    )
    init_opt, d_step, d_step_r1, g_step = build_train_steps(model, donate=False)
    opt_states = init_opt(params)
    params, state, opt_states = jax.device_put((params, state, opt_states))
    real = jax.random.normal(jax.random.PRNGKey(1), (batch, crop, crop, 3)) * 0.3
    mask = jnp.zeros((batch, crop, crop, 3)).at[..., 0].set(1.0)
    return (params, state, opt_states, real, mask,
            {"d_step": d_step, "g_step": g_step, "d_step_r1": d_step_r1})


def _sync(tree):
    np.asarray(jax.tree.leaves(tree)[0].ravel()[0])


def _measure(step, args_tuple, iters):
    params, state, opt_states, real, mask = args_tuple
    p, s, o, losses = step(params, state, opt_states, real, mask,
                           jax.random.PRNGKey(2))
    _sync(losses)
    t0 = time.time()
    for i in range(iters):
        p, s, o, losses = step(p, s, o, real, mask, jax.random.PRNGKey(3 + i))
    _sync(losses)
    return (time.time() - t0) / iters


def _flops(step, args_tuple):
    params, state, opt_states, real, mask = args_tuple
    compiled = step.lower(
        params, state, opt_states, real, mask, jax.random.PRNGKey(2)
    ).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns one dict per device
        ca = ca[0]
    return float(ca.get("flops", float("nan")))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--crop", type=int, default=512)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--ablate", action="store_true",
                    help="also time the G step with each loss term zeroed")
    args = ap.parse_args()

    from ppst_tpu.models.config import PPSTConfig

    cfg = PPSTConfig(crop_size=args.crop, dtype=args.dtype)
    params, state, opt_states, real, mask, steps = _build(
        cfg, args.crop, args.batch
    )
    at = (params, state, opt_states, real, mask)

    rows = {}
    for name, step in steps.items():
        fl = _flops(step, at)
        ms = _measure(step, at, args.iters) * 1000.0
        tf_s = fl / (ms / 1000.0) / 1e12
        rows[name] = {
            "tflop_per_step": round(fl / 1e12, 3),
            "steady_ms": round(ms, 1),
            "effective_tf_s": round(tf_s, 1),
            "mfu_pct": round(100.0 * tf_s / PEAK_TFLOPS, 1),
        }
        print(f"{name}: {fl/1e12:.2f} TFLOP, {ms:.0f} ms, "
              f"{tf_s:.0f} TF/s = {100*tf_s/PEAK_TFLOPS:.0f}% MFU", flush=True)

    d, g, r1 = (rows[k]["steady_ms"] for k in ("d_step", "g_step", "d_step_r1"))
    img_s = args.batch * 2 / ((d + g + (r1 - d) / 16.0) / 1000.0)
    print(json.dumps({
        "metric": f"train_roofline_{args.crop}px_b{args.batch}_{args.dtype}",
        "images_per_sec_incl_r1": round(img_s, 2),
        "peak_tf_s": PEAK_TFLOPS,
        "steps": rows,
    }))

    if args.ablate:
        # zero one loss family at a time; G-step time delta attributes
        # the cost (terms interact through shared passes, so deltas
        # overlap — read as upper bounds of each term's cost)
        variants = {
            "no_cycwarp_lpips": {"lambda_Cycwarp": 0.0},
            "no_maskwarp": {"lambda_Maskwarp": 0.0},
            "no_stylecon_rscl": {"lambda_StyleCon": 0.0},
            "no_gan": {"lambda_GAN": 0.0},
            "no_l1": {"lambda_L1": 0.0},
            "stage1": {"training_stage": 1},
        }
        base_ms = rows["g_step"]["steady_ms"]
        ab = {}
        for vname, patch in variants.items():
            vcfg = dataclasses.replace(cfg, **patch)
            _, _, _, _, _, vsteps = _build(vcfg, args.crop, args.batch)
            ms = _measure(vsteps["g_step"], at, args.iters) * 1000.0
            ab[vname] = {"g_ms": round(ms, 1),
                         "delta_ms": round(base_ms - ms, 1)}
            print(f"g_step[{vname}]: {ms:.0f} ms "
                  f"(-{base_ms - ms:.0f} vs full)", flush=True)
        print(json.dumps({"g_step_ablation_ms": ab, "g_full_ms": base_ms}))


if __name__ == "__main__":
    main()
