"""Training-trajectory parity: reference torch vs ppst_tpu loss curves
(VERDICT r2 ask #5 / BASELINE.md measurement plan #3).

Runs N alternating D/G training steps on BOTH frameworks from the SAME
converted initial weights on the SAME synthetic data stream, with the
reference's optimizer semantics (4 Adams, D lr*c compensation, lazy R1
every 16 D-steps scaled x16, D-first alternation — reference
optimizers/ppst_optimizer.py:36-49,65-130), and writes both loss
trajectories + divergence stats to results/loss_parity/.

Config deviations (documented, both sides identical):
* 256px, training_stage=1: the reference's warp helpers hard-code the
  512px 64-grid (SURVEY.md 2.4) and full-stack 512px training on a 1-core
  CPU torch is infeasible; stage 1 exercises the GAN dynamics axis
  (D_real/D_rec/D_R1/G_L1/G_GAN) that VERDICT asked to validate.
* lambda_Cycwarp=0: reference LPIPS needs undownloadable weights.
* lambda_StyleCon=0: in stage 1 the reference's StyleCon branch reads an
  undefined ``gl_w`` (ppst_model.py:194 sits outside the stage-2 guard)
  and crashes — zeroed on both sides.
* netG_use_noise=False: noise-injection RNG streams cannot match across
  frameworks; the learned noise gain starts at 0 so the init-time loss
  surface is identical with or without it.

Usage: python tools/loss_curve_parity.py [--steps 120] [--crop 256]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

CROP = 256
B = 2


def make_batch(rng):
    real = (rng.standard_normal((B, CROP, CROP, 3)).astype(np.float32) * 0.4
            ).clip(-1, 1)
    region = rng.integers(0, 3, (B, CROP // 16, CROP // 16))
    region = np.kron(region, np.ones((1, 16, 16), np.int64))
    mask = np.stack([(region == i) for i in range(3)], -1).astype(np.float32)
    return real, mask


def run_reference(steps: int, data_seed: int):
    """Reference torch training loop (ppst_optimizer.py semantics)."""
    import torch

    from test_loss_parity import _stub_modules, ref_opt  # reuse scaffolding

    _stub_modules()
    torch.manual_seed(0)
    import importlib

    ppst_model = importlib.import_module("models.ppst_model")
    opt = ref_opt()
    opt.crop_size = CROP
    opt.training_stage = 1
    opt.lambda_Cycwarp = 0.0
    # stage 1 + StyleCon>0 hits the reference's undefined-gl_w bug
    # (ppst_model.py:194 runs outside the stage-2 guard); zero on BOTH sides
    opt.lambda_StyleCon = 0.0
    opt.netG_use_noise = False
    ref = ppst_model.PPSTModel(opt)
    ref.initialize()
    ref.train()

    lr, beta1, beta2 = 0.001, 0.0, 0.99
    r1_every = 16
    c = r1_every / (1 + r1_every)
    opt_D = torch.optim.Adam(ref.D.parameters(), lr=lr * c,
                             betas=(beta1**c, beta2**c))
    ge_params = (list(ref.G.parameters()) + list(ref.E1.parameters())
                 + list(ref.E2.parameters()))
    opt_G = torch.optim.Adam(ref.G.parameters(), lr=lr, betas=(beta1, beta2))
    opt_E1 = torch.optim.Adam(ref.E1.parameters(), lr=lr, betas=(beta1, beta2))
    opt_E2 = torch.optim.Adam(ref.E2.parameters(), lr=lr, betas=(beta1, beta2))

    def set_rg(module, flag):
        for p in module.parameters():
            p.requires_grad = flag

    rng = np.random.default_rng(data_seed)
    rows = []
    n_d = 0
    # snapshot the INITIAL weights (state_dict holds live references that
    # training mutates; the TPU side must start from the same init)
    sd = {k: v.detach().clone() for k, v in ref.state_dict().items()}
    for step in range(steps):
        real_np, mask_np = make_batch(rng)
        real = torch.from_numpy(np.moveaxis(real_np, -1, 1).copy())
        mask = torch.from_numpy(np.moveaxis(mask_np, -1, 1).copy())
        row = {"step": step}
        if step % 2 == 0:  # D step (reference trains D first)
            set_rg(ref.D, True)
            for m in (ref.G, ref.E1, ref.E2):
                set_rg(m, False)
            losses, *_ = ref.compute_discriminator_losses(real, mask)
            opt_D.zero_grad()
            sum(v.mean() for v in losses.values()).backward()
            opt_D.step()
            n_d += 1
            if n_d % r1_every == 0:
                r1 = ref.compute_R1_loss(real)
                opt_D.zero_grad()
                (sum(v.mean() for v in r1.values()) * r1_every).backward()
                opt_D.step()
                losses.update(r1)
            row.update({k: float(v.detach().float().mean())
                        for k, v in losses.items()})
        else:  # G step
            set_rg(ref.D, False)
            for m in (ref.G, ref.E1, ref.E2):
                set_rg(m, True)
            losses, metrics = ref.compute_generator_losses(
                real, None, None, mask
            )
            opt_G.zero_grad(); opt_E1.zero_grad(); opt_E2.zero_grad()
            sum(v.mean() for v in losses.values()).backward()
            opt_G.step(); opt_E1.step(); opt_E2.step()
            row.update({k: float(v.detach().float().mean())
                        for k, v in losses.items()})
        rows.append(row)
        if step % 10 == 0:
            print(f"[ref] step {step}: { {k: round(v, 4) for k, v in row.items() if k != 'step'} }",
                  flush=True)
    return rows, sd


def run_mine(steps: int, data_seed: int, init_sd):
    import jax
    import jax.numpy as jnp

    # the chip is single-client and the relay can be held by another
    # job; PPST_PARITY_PLATFORM=cpu forces the jax side onto the host
    platform = os.environ.get("PPST_PARITY_PLATFORM", "")
    if platform:
        jax.config.update("jax_platforms", platform)
    # TPU f32 matmuls/convs default to one-pass bf16 (~1e-2 rel error —
    # visibly shifts even step-0 losses vs the f32 torch reference);
    # numerical-parity runs want the multi-pass f32-accurate mode
    jax.config.update(
        "jax_default_matmul_precision",
        os.environ.get("PPST_PARITY_PRECISION", "highest"),
    )

    from ppst_tpu.models.config import PPSTConfig
    from ppst_tpu.models.ppst import PPSTModel
    from ppst_tpu.train.steps import build_train_steps
    from ppst_tpu.util.cache import setup_compile_cache
    from ppst_tpu.util.convert_torch import convert_reference_state_dict

    setup_compile_cache(jax)
    cfg = PPSTConfig(
        crop_size=CROP, training_stage=1, lambda_Cycwarp=0.0,
        lambda_StyleCon=0.0, netG_use_noise=False,
    )
    model = PPSTModel(cfg)
    import faulthandler
    import signal

    faulthandler.register(signal.SIGUSR1)  # kill -USR1 <pid> dumps stacks
    print("[tpu] converting weights...", flush=True)
    params = convert_reference_state_dict(init_sd, CROP)
    print("[tpu] weights converted", flush=True)
    # build the non-param state directly: the full model.init runs the
    # four networks eagerly (minutes of per-op dispatch through the axon
    # relay), and stage 1 never reads the RSCL queues anyway
    from ppst_tpu.models.losses import init_rscl_state

    state = {
        "rscl": init_rscl_state(
            jax.random.PRNGKey(0), code_dim=cfg.style_dim
        ),
        "num_d_iters": jnp.zeros((), jnp.int32),
    }
    init_opt, d_step, d_step_r1, g_step = build_train_steps(model, donate=False)
    print("[tpu] uploading params...", flush=True)
    params, state = jax.device_put((params, state))
    print("[tpu] init_opt...", flush=True)
    opt_states = init_opt(params)
    print("[tpu] compiling first step...", flush=True)

    rng = np.random.default_rng(data_seed)
    rows = []
    n_d = 0
    for step in range(steps):
        real_np, mask_np = make_batch(rng)
        real, mask = jnp.asarray(real_np), jnp.asarray(mask_np)
        key = jax.random.PRNGKey(100 + step)
        row = {"step": step}
        if step % 2 == 0:
            n_d += 1
            fn = d_step_r1 if n_d % 16 == 0 else d_step
            params, state, opt_states, losses = fn(
                params, state, opt_states, real, mask, key
            )
        else:
            params, state, opt_states, losses = g_step(
                params, state, opt_states, real, mask, key
            )
        row.update({k: float(np.asarray(v)) for k, v in losses.items()})
        rows.append(row)
        if step % 10 == 0:
            print(f"[tpu] step {step}: { {k: round(v, 4) for k, v in row.items() if k != 'step'} }",
                  flush=True)
    return rows


def ema_series(rows, key, decay=0.9):
    out, acc = [], None
    for r in rows:
        if key in r:
            acc = r[key] if acc is None else decay * acc + (1 - decay) * r[key]
            out.append(acc)
    return np.asarray(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=120)
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--out", default="results/loss_parity")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    # checkpoint the torch side immediately: it costs ~1 min/step on this
    # 1-core host and must survive a jax-side failure. A cached
    # reference.json + reference_init.npz with matching step count is
    # reused instead of re-running torch.
    ref_json = os.path.join(args.out, "reference.json")
    init_npz = os.path.join(args.out, "reference_init.npz")
    ref_rows = init_sd = None
    if os.path.exists(ref_json) and os.path.exists(init_npz):
        cached = json.load(open(ref_json))
        if len(cached) == args.steps:
            print("reusing cached reference run", flush=True)
            ref_rows = cached
            loaded = np.load(init_npz)
            import torch

            init_sd = {k: torch.from_numpy(loaded[k]) for k in loaded.files}
    if ref_rows is None:
        ref_rows, init_sd = run_reference(args.steps, args.seed)
        with open(ref_json, "w") as f:
            json.dump(ref_rows, f)
        np.savez(init_npz, **{k: v.detach().cpu().numpy()
                              for k, v in init_sd.items()})

    my_rows = run_mine(args.steps, args.seed, init_sd)
    with open(os.path.join(args.out, "ppst_tpu.json"), "w") as f:
        json.dump(my_rows, f)

    keys = ["D_real", "D_rec", "G_L1", "G_GAN_rec", "D_R1"]
    summary = {}
    for k in keys:
        a, b = ema_series(ref_rows, k), ema_series(my_rows, k)
        n = min(len(a), len(b))
        if n == 0:
            continue
        a, b = a[:n], b[:n]
        summary[k] = {
            "ref_first": round(float(a[0]), 4),
            "ref_last": round(float(a[-1]), 4),
            "tpu_first": round(float(b[0]), 4),
            "tpu_last": round(float(b[-1]), 4),
            "max_abs_ema_gap": round(float(np.abs(a - b).max()), 4),
            "mean_abs_ema_gap": round(float(np.abs(a - b).mean()), 4),
        }
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary, indent=1))

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, len(keys), figsize=(4 * len(keys), 3))
        for ax, k in zip(axes, keys):
            ax.plot(ema_series(ref_rows, k), label="reference (torch)")
            ax.plot(ema_series(my_rows, k), label="ppst_tpu")
            ax.set_title(k)
            ax.legend(fontsize=7)
        fig.tight_layout()
        fig.savefig(os.path.join(args.out, "curves.png"), dpi=110)
        print(f"wrote {args.out}/curves.png")
    except Exception as e:  # matplotlib optional
        print(f"plot skipped: {e}")


if __name__ == "__main__":
    main()
