"""Measure dryrun g_step/d_step compile+exec under XLA:CPU flag variants.

The multichip dryrun's cost on a 1-core host is dominated by the XLA:CPU
compile of the two train-step modules; this probe isolates (lower,
compile, execute) per step so flag experiments are cheap to compare.

Usage: PPST_PROBE_FLAGS="--xla_foo=1 --xla_bar=2" python tools/probe_dryrun_compile.py [d|g|both]
"""

import os
import sys
import time

extra = os.environ.get("PPST_PROBE_FLAGS", "")
base = (
    "--xla_force_host_platform_device_count=8 "
    "--xla_cpu_multi_thread_eigen=false "
    "--xla_cpu_collective_call_warn_stuck_timeout_seconds=120 "
    "--xla_cpu_collective_call_terminate_timeout_seconds=3600 "
)
os.environ["XLA_FLAGS"] = (base + extra).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_enable_async_dispatch", False)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    n = 8
    from ppst_tpu.models.config import PPSTConfig
    from ppst_tpu.models.ppst import PPSTModel
    from ppst_tpu.parallel.mesh import make_mesh, replicated_sharding, shard_batch
    from ppst_tpu.train.steps import build_train_steps
    from ppst_tpu.util.fast_init import random_params_like

    crop = 32
    cfg = PPSTConfig(
        crop_size=crop, remat=False,
        netE_scale_capacity=0.125, netE2_scale_capacity=0.125,
        netG_scale_capacity=0.125, netD_scale_capacity=0.125,
        global_code_ch=256, spatial_code_ch=32, netG_resnet_ch=32,
        netG_num_base_resnet_layers=2, netE_num_downsampling_sp=2,
    )
    model = PPSTModel(cfg)
    params, state = random_params_like(
        lambda: model.init(jax.random.PRNGKey(0), crop), seed=0
    )
    mesh = make_mesh(n)
    init_opt, d_step, d_step_r1, g_step = build_train_steps(
        model, n_dev=n, mesh=mesh, donate=False
    )
    opt_states = init_opt(params)
    params, state, opt_states = jax.device_put(
        (params, state, opt_states), replicated_sharding(mesh)
    )
    b = 2 * n
    real = jax.random.normal(jax.random.PRNGKey(1), (b, crop, crop, 3)) * 0.5
    mask = jnp.zeros((b, crop, crop, 3)).at[..., 0].set(1.0)
    real, mask = shard_batch(mesh, (real, mask))

    steps = {"d": d_step_r1, "g": g_step}
    sel = ["d", "g"] if which == "both" else [which]
    for name in sel:
        step = steps[name]
        t0 = time.time()
        low = step.lower(params, state, opt_states, real, mask,
                         jax.random.PRNGKey(2))
        t1 = time.time()
        comp = low.compile()
        t2 = time.time()
        out = comp(params, state, opt_states, real, mask, jax.random.PRNGKey(2))
        jax.block_until_ready(out[3])
        t3 = time.time()
        print(
            f"[{name}] lower {t1-t0:6.1f}s compile {t2-t1:6.1f}s "
            f"exec {t3-t2:6.1f}s   flags: {extra or '(none)'}",
            flush=True,
        )


if __name__ == "__main__":
    main()
