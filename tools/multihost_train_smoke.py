"""Two-process multi-host TRAIN-STEP smoke (VERDICT r2 ask #7).

Where tools/multihost_smoke.py validates raw collectives over a
two-process loopback mesh, this runs the REAL jitted train steps
(build_train_steps: D step with lazy R1, then G step) across the
two-process 8-device mesh and asserts every loss matches a
single-process 8-virtual-device run of the same global batch bit-for-bit
semantics (tolerance for reduction-order drift).

This is the TPU-native equivalent of validating the reference's DDP
step across nodes (reference models/__init__.py:78-91 NCCL DDP +
networks/rscl.py:67-90 all_gather), not just its backend handshake.

Run: python tools/multihost_train_smoke.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PORT = int(os.environ.get("PPST_MULTIHOST_PORT", "12991"))
N_PROC = 2
LOCAL_DEV = 4
N_GLOBAL = N_PROC * LOCAL_DEV

# Shared worker body: builds the slim model + steps, creates the global
# batch, runs one D+R1 and one G step, dumps losses as JSON.
COMMON = r"""
import os, sys, json
sys.path.insert(0, os.environ["PPST_REPO"])
import jax
import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

N_GLOBAL = int(os.environ["PPST_NGLOBAL"])

def build():
    from ppst_tpu.models.config import PPSTConfig
    from ppst_tpu.models.ppst import PPSTModel
    from ppst_tpu.train.steps import build_train_steps
    from ppst_tpu.parallel.mesh import make_mesh
    from ppst_tpu.util.fast_init import random_params_like

    cfg = PPSTConfig(
        crop_size=16,
        remat=False,
        netE_scale_capacity=0.125,
        netE2_scale_capacity=0.125,
        netG_scale_capacity=0.125,
        netD_scale_capacity=0.125,
        global_code_ch=64,
        spatial_code_ch=16,
        netG_resnet_ch=16,
        netG_num_base_resnet_layers=2,
        netE_num_downsampling_sp=2,
    )
    model = PPSTModel(cfg)
    params, state = random_params_like(
        lambda: model.init(jax.random.PRNGKey(0), cfg.crop_size), seed=0
    )
    mesh = make_mesh(N_GLOBAL)
    init_opt, d_step, d_step_r1, g_step = build_train_steps(
        model, n_dev=N_GLOBAL, mesh=mesh, donate=False
    )
    return cfg, model, params, state, mesh, init_opt, d_step_r1, g_step

def global_batch(cfg):
    rng = np.random.default_rng(7)
    b = 2 * N_GLOBAL
    real = (rng.standard_normal((b, cfg.crop_size, cfg.crop_size, 3))
            .astype(np.float32) * 0.5)
    mask = np.zeros((b, cfg.crop_size, cfg.crop_size, 3), np.float32)
    mask[..., 0] = 1.0
    return real, mask

def run_steps(params, state, mesh, init_opt, d_step_r1, g_step, real, mask,
              put_global, put_repl):
    opt_states = init_opt(params)
    params, state, opt_states = put_repl((params, state, opt_states))
    real, mask = put_global(real), put_global(mask)
    params, state, opt_states, d_losses = d_step_r1(
        params, state, opt_states, real, mask, jax.random.PRNGKey(2)
    )
    params, state, opt_states, g_losses = g_step(
        params, state, opt_states, real, mask, jax.random.PRNGKey(3)
    )
    return {k: float(v) for k, v in {**d_losses, **g_losses}.items()}
"""

SINGLE = COMMON + r"""
jax.config.update("jax_platforms", "cpu")
cfg, model, params, state, mesh, init_opt, d_step_r1, g_step = build()
from ppst_tpu.parallel.mesh import replicated_sharding, shard_batch
real, mask = global_batch(cfg)
repl = replicated_sharding(mesh)
losses = run_steps(
    params, state, mesh, init_opt, d_step_r1, g_step, real, mask,
    put_global=lambda x: shard_batch(mesh, (jnp.asarray(x),))[0],
    put_repl=lambda t: jax.device_put(t, repl),
)
with open(os.environ["PPST_OUT"], "w") as f:
    json.dump(losses, f)
print("SINGLE DONE", flush=True)
"""

WORKER = COMMON + r"""
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{os.environ['PPST_PORT']}",
    num_processes=int(os.environ["PPST_NPROC"]),
    process_id=int(os.environ["PPST_PID"]),
)
pid = jax.process_index()
cfg, model, params, state, mesh, init_opt, d_step_r1, g_step = build()
from jax.sharding import NamedSharding, PartitionSpec as P

repl_sh = NamedSharding(mesh, P())
batch_sh = NamedSharding(mesh, P("data"))

def put_global(x):
    # each process feeds its contiguous half of the global batch, split
    # contiguously over its local devices (DistributedSampler semantics)
    b = x.shape[0]
    per_proc = b // int(os.environ["PPST_NPROC"])
    local = x[pid * per_proc : (pid + 1) * per_proc]
    per_dev = per_proc // len(jax.local_devices())
    shards = [
        jax.device_put(local[i * per_dev : (i + 1) * per_dev], d)
        for i, d in enumerate(jax.local_devices())
    ]
    return jax.make_array_from_single_device_arrays(x.shape, batch_sh, shards)

def put_repl(tree):
    return jax.tree.map(
        lambda a: jax.make_array_from_callback(
            np.asarray(a).shape, repl_sh, lambda idx: np.asarray(a)[idx]
        ),
        tree,
    )

real, mask = global_batch(cfg)
losses = run_steps(
    params, state, mesh, init_opt, d_step_r1, g_step, real, mask,
    put_global, put_repl,
)
if pid == 0:
    with open(os.environ["PPST_OUT"], "w") as f:
        json.dump(losses, f)
    print("WORKER DONE", flush=True)
"""


def _spawn(code, extra_env, n_dev):
    env = dict(
        os.environ,
        PPST_REPO=REPO,
        PPST_NGLOBAL=str(N_GLOBAL),
        JAX_PLATFORMS="cpu",
        XLA_FLAGS=(
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={n_dev}"
            + " --xla_llvm_disable_expensive_passes=true"
            + " --xla_cpu_multi_thread_eigen=false"
            + " --xla_cpu_copy_insertion_use_region_analysis=false"
            + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
            + " --xla_cpu_collective_call_terminate_timeout_seconds=3600"
        ).strip(),
        **extra_env,
    )
    return subprocess.Popen(
        [sys.executable, "-c", code],
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
    )


def main() -> int:
    tmp = tempfile.mkdtemp(prefix="ppst_mh_")
    single_out = os.path.join(tmp, "single.json")
    multi_out = os.path.join(tmp, "multi.json")

    # Phase A: single-process oracle (8 virtual devices, same mesh size)
    p = _spawn(SINGLE, {"PPST_OUT": single_out}, N_GLOBAL)
    out, _ = p.communicate(timeout=900)
    if p.returncode != 0:
        print(out)
        print("MULTIHOST-TRAIN FAILED (single-process oracle)")
        return 1
    print("single-process oracle done")

    # Phase B: two processes x 4 local devices, same global computation
    procs = [
        _spawn(
            WORKER,
            {
                "PPST_OUT": multi_out,
                "PPST_PORT": str(PORT),
                "PPST_NPROC": str(N_PROC),
                "PPST_PID": str(pid),
            },
            LOCAL_DEV,
        )
        for pid in range(N_PROC)
    ]
    ok = True
    for pid, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            ok = False
        if p.returncode != 0:
            ok = False
        tail = "\n".join((out or "").strip().splitlines()[-6:])
        print(f"--- process {pid} rc={p.returncode} ---\n{tail}")
    if not ok:
        print("MULTIHOST-TRAIN FAILED")
        return 1

    with open(single_out) as f:
        single = json.load(f)
    with open(multi_out) as f:
        multi = json.load(f)
    assert set(single) == set(multi), (single.keys(), multi.keys())
    worst = 0.0
    for k in single:
        err = abs(single[k] - multi[k]) / (abs(single[k]) + 1e-8)
        worst = max(worst, err)
        # near-zero losses (e.g. Mask_warp ~1e-6 on synthetic masks)
        # make pure relative error meaningless: require an absolute
        # discrepancy as well before declaring a mismatch
        if err > 1e-4 and abs(single[k] - multi[k]) > 1e-6:
            print(f"MISMATCH {k}: single={single[k]:.8f} multi={multi[k]:.8f}")
            ok = False
    print(f"losses match across process boundaries (worst rel err {worst:.2e})")
    print("MULTIHOST-TRAIN OK" if ok else "MULTIHOST-TRAIN FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
