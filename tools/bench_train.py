"""Training-step benchmark: steady-state D/G step time on the current
device. Not driver-run (bench.py owns the headline inference metric);
used to populate BASELINE.md's training numbers.

Usage: python tools/bench_train.py [--crop 512] [--batch 2] [--iters 5]
"""

import argparse
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


def sync(tree):
    np.asarray(jax.tree.leaves(tree)[0].ravel()[0])


def measure_training(crop: int = 512, batch: int = 2, iters: int = 5,
                     dtype: str = "float32", remat=None,
                     remat_taps: bool = False,
                     remat_blocks: bool = False,
                     corr_blockwise: bool = False,
                     unbatch_passes: bool = False,
                     fused_styled_conv: bool = False,
                     fused_tap: bool = False,
                     include_r1: bool = True) -> float:
    """Steady-state training images/sec (one D + one G step consume two
    batches, reference train loop semantics; the lazy-R1 D step replaces
    every 16th plain D step, so its extra cost is amortized at
    (t_r1 - t_d)/16 — rounds 1-3 omitted this, overstating img/s ~2%).
    Importable by bench.py's secondary training metric."""
    from ppst_tpu.models.config import PPSTConfig
    from ppst_tpu.models.ppst import PPSTModel
    from ppst_tpu.train.steps import build_train_steps
    from ppst_tpu.util.fast_init import random_params_like

    kw = {} if remat is None else {"remat": remat}
    if isinstance(remat, str):
        kw = {"remat": True, "remat_nets": remat}
    cfg = PPSTConfig(crop_size=crop, dtype=dtype,
                     remat_taps=remat_taps, remat_blocks=remat_blocks,
                     corr_blockwise=corr_blockwise,
                     unbatch_passes=unbatch_passes,
                     fused_styled_conv=fused_styled_conv,
                     fused_tap=fused_tap, **kw)
    model = PPSTModel(cfg)
    params, state = random_params_like(
        lambda: model.init(jax.random.PRNGKey(0), crop), seed=0
    )
    # donate=True matches the real train loop (train.py threads the
    # donated pytrees through every step; measured ~3% faster at 512px
    # b4 than the non-donated variant rounds 1-3 benched)
    init_opt, d_step, d_step_r1, g_step = build_train_steps(model, donate=True)
    opt_states = init_opt(params)
    p, s, o = jax.device_put((params, state, opt_states))
    real = jax.random.normal(jax.random.PRNGKey(1), (batch, crop, crop, 3)) * 0.3
    mask = jnp.zeros((batch, crop, crop, 3)).at[..., 0].set(1.0)

    times = {}
    steps = [("d", d_step), ("g", g_step)]
    if include_r1:
        steps.append(("r1", d_step_r1))
    for name, step in steps:
        p, s, o, losses = step(p, s, o, real, mask, jax.random.PRNGKey(2))
        sync(losses)
        t0 = time.time()
        for i in range(iters):
            p, s, o, losses = step(p, s, o, real, mask, jax.random.PRNGKey(3 + i))
        sync(losses)
        times[name] = (time.time() - t0) / iters
    total = times["d"] + times["g"]
    if include_r1:
        total += (times["r1"] - times["d"]) / 16.0
    return batch * 2 / total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--crop", type=int, default=512)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--remat", default=None,
                    help="'on', 'off', or a remat_nets comma list "
                         "(e.g. 'g' or 'g,e2') for selective remat")
    ap.add_argument("--remat_taps", action="store_true",
                    help="nested remat of the generator feature branch "
                         "(extra HBM headroom beyond --remat all)")
    ap.add_argument("--remat_blocks", action="store_true",
                    help="nested per-resblock remat inside the generator")
    ap.add_argument("--corr_blockwise", action="store_true",
                    help="blockwise (never-materialized) training "
                         "correspondence — the 1024px path")
    ap.add_argument("--unbatch", action="store_true",
                    help="split batched G/D forwards into per-role "
                         "passes + remat D in the D loss (1024px HBM)")
    ap.add_argument("--fused_styled_conv", action="store_true",
                    help="route non-upsampled StyledConvs through the "
                         "Pallas conv+epilogue kernel (in-context "
                         "comparison knob; bf16 only)")
    ap.add_argument("--fused_tap", action="store_true",
                    help="fused Pallas 1x1 feature tap (now "
                         "differentiable) in the training graph")
    ap.add_argument("--donate", action="store_true",
                    help="donate params/state/opt buffers (real-training "
                         "memory footprint; outputs alias arguments)")
    args = ap.parse_args()

    from ppst_tpu.models.config import PPSTConfig
    from ppst_tpu.models.ppst import PPSTModel
    from ppst_tpu.train.steps import build_train_steps
    from ppst_tpu.util.fast_init import random_params_like

    if args.remat is None:
        kw = {}
    elif args.remat in ("on", "off"):
        kw = {"remat": args.remat == "on"}
    else:
        kw = {"remat": True, "remat_nets": args.remat}
    if args.remat_taps:
        kw["remat_taps"] = True
    if args.remat_blocks:
        kw["remat_blocks"] = True
    if args.corr_blockwise:
        kw["corr_blockwise"] = True
    if args.unbatch:
        kw["unbatch_passes"] = True
    if args.fused_styled_conv:
        kw["fused_styled_conv"] = True
    if args.fused_tap:
        kw["fused_tap"] = True
    cfg = PPSTConfig(crop_size=args.crop, dtype=args.dtype, **kw)
    model = PPSTModel(cfg)
    params, state = random_params_like(
        lambda: model.init(jax.random.PRNGKey(0), args.crop), seed=0
    )
    init_opt, d_step, d_step_r1, g_step = build_train_steps(
        model, donate=args.donate
    )
    opt_states = init_opt(params)
    params, state, opt_states = jax.device_put((params, state, opt_states))
    real = jax.random.normal(
        jax.random.PRNGKey(1), (args.batch, args.crop, args.crop, 3)
    ) * 0.3
    mask = jnp.zeros((args.batch, args.crop, args.crop, 3)).at[..., 0].set(1.0)

    # with --donate the steps consume their (params, state, opt) inputs,
    # so the evolving pytrees are threaded through every call (real
    # training-loop semantics); without it each step reuses the originals
    results = {}
    p, s, o = params, state, opt_states
    for name, step in [("d_step", d_step), ("g_step", g_step),
                       ("d_step_r1", d_step_r1)]:
        t0 = time.time()
        p, s, o, losses = step(p, s, o, real, mask, jax.random.PRNGKey(2))
        sync(losses)
        compile_s = time.time() - t0
        t0 = time.time()
        for i in range(args.iters):
            p, s, o, losses = step(p, s, o, real, mask, jax.random.PRNGKey(3 + i))
        sync(losses)
        ms = (time.time() - t0) / args.iters * 1000
        results[name] = {"compile_s": round(compile_s, 1), "steady_ms": round(ms, 1)}
        print(f"{name}: compile {compile_s:.0f}s steady {ms:.0f}ms", flush=True)
        if not args.donate:
            p, s, o = params, state, opt_states

    imgs_per_sec = args.batch / (
        (results["d_step"]["steady_ms"] + results["g_step"]["steady_ms"]) / 1000
    ) * 2  # one D + one G step consume two batches in the reference loop
    print(json.dumps({
        "metric": f"train_images_per_sec_{args.crop}px",
        "value": round(imgs_per_sec, 2),
        "unit": "img/s",
        "detail": results,
    }))


if __name__ == "__main__":
    main()
