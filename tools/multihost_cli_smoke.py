"""Two-process multi-host smoke over the REAL ``train.py`` CLI
(VERDICT r4 ask #4).

Where tools/multihost_train_smoke.py inlines the train-step code, this
launches the actual production entry point — ``python train.py <flags>``
— once single-process (8 virtual CPU devices) and once as two processes
x 4 local devices rendezvousing through ``jax.distributed.initialize``
(PPST_NUM_PROCESSES/PPST_COORDINATOR/PPST_PROCESS_ID envs, read by
train.py before backend init), and asserts the per-step losses in the
two ``loss_log.txt`` files match. This exercises the full production
path: per-process batch slicing in ``ConfigurableDataLoader``
(DistributedSampler semantics, reference data/__init__.py:106,114-121),
global-array assembly in ``parallel.mesh.shard_batch``, replicated
params via ``replicate_tree``, multi-process loss fetch, and
process-0-gated checkpoint/log writes.

Run: python tools/multihost_cli_smoke.py
"""

from __future__ import annotations

import os
import re
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PORT = int(os.environ.get("PPST_MULTIHOST_PORT", "12993"))
N_PROC = 2
LOCAL_DEV = 4
N_GLOBAL = N_PROC * LOCAL_DEV
BATCH = 2 * N_GLOBAL  # model requires batch % (2 * n_dev) == 0
STEPS = 6

TRAIN_FLAGS = [
    "--dataset_mode", "synthetic",
    "--crop_size", "16", "--load_size", "16", "--preprocess", "resize",
    "--batch_size", str(BATCH), "--num_gpus", str(N_GLOBAL),
    "--total_nimgs", str(STEPS * BATCH),
    "--print_freq", str(BATCH),
    "--save_freq", "1000000", "--evaluation_freq", "1000000",
    "--display_freq", "1000000",
    "--netE_scale_capacity", "0.125", "--netE2_scale_capacity", "0.125",
    "--netG_scale_capacity", "0.125", "--netD_scale_capacity", "0.125",
    "--global_code_ch", "64", "--spatial_code_ch", "16",
    "--netG_resnet_ch", "16", "--netG_num_base_resnet_layers", "2",
    "--netE_num_downsampling_sp", "2",
    # crop 16 collapses LPIPS's AlexNet spatial dims -> image_warp_reg
    # would be NaN on BOTH sides (nan==nan trivially "matches"); zero it
    # so every compared term is meaningful
    "--lambda_Cycwarp", "0",
]


def _env(n_dev, extra):
    return dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        PPST_PLATFORM="cpu",
        XLA_FLAGS=(
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={n_dev}"
            + " --xla_llvm_disable_expensive_passes=true"
            + " --xla_cpu_multi_thread_eigen=false"
            + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
            + " --xla_cpu_collective_call_terminate_timeout_seconds=3600"
        ).strip(),
        **extra,
    )


def _parse_log(path):
    """loss_log.txt lines: '(iters: N, ...) k: v k: v ' -> [(N, {k: v})]"""
    rows = []
    with open(path) as f:
        for line in f:
            m = re.match(r"\(iters: (\d+)[^)]*\) (.*)", line.strip())
            if not m:
                continue
            losses = dict(
                (k, float(v))
                for k, v in re.findall(r"(\w+): ([-\d.eE]+)", m.group(2))
            )
            rows.append((int(m.group(1)), losses))
    return rows


def main() -> int:
    tmp = tempfile.mkdtemp(prefix="ppst_mhcli_")

    # Phase A: single-process oracle over the same 8-device mesh size
    single_dir = os.path.join(tmp, "single")
    cmd = [sys.executable, "train.py", "--name", "smoke",
           "--checkpoints_dir", single_dir] + TRAIN_FLAGS
    p = subprocess.run(
        cmd, cwd=REPO, env=_env(N_GLOBAL, {}), capture_output=True,
        text=True, timeout=1800,
    )
    if p.returncode != 0:
        print(p.stdout[-3000:])
        print(p.stderr[-3000:])
        print("MULTIHOST-CLI FAILED (single-process run)")
        return 1
    print("single-process train.py done")

    # Phase B: two processes x 4 local devices, same global computation
    multi_dir = os.path.join(tmp, "multi")
    procs = [
        subprocess.Popen(
            [sys.executable, "train.py", "--name", "smoke",
             "--checkpoints_dir", multi_dir] + TRAIN_FLAGS,
            cwd=REPO,
            env=_env(LOCAL_DEV, {
                "PPST_NUM_PROCESSES": str(N_PROC),
                "PPST_COORDINATOR": f"127.0.0.1:{PORT}",
                "PPST_PROCESS_ID": str(pid),
            }),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(N_PROC)
    ]
    ok = True
    for pid, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=1800)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            ok = False
        if p.returncode != 0:
            ok = False
        tail = "\n".join((out or "").strip().splitlines()[-8:])
        print(f"--- process {pid} rc={p.returncode} ---\n{tail}")
    if not ok:
        print("MULTIHOST-CLI FAILED")
        return 1

    single = _parse_log(os.path.join(single_dir, "smoke", "loss_log.txt"))
    multi = _parse_log(os.path.join(multi_dir, "smoke", "loss_log.txt"))
    if len(single) < STEPS - 1 or len(multi) < STEPS - 1:
        print(f"MULTIHOST-CLI FAILED: too few log rows "
              f"({len(single)} single, {len(multi)} multi)")
        return 1
    worst = 0.0
    for (it_s, ls), (it_m, lm) in zip(single, multi):
        assert it_s == it_m, (it_s, it_m)
        assert set(ls) == set(lm), (ls.keys(), lm.keys())
        for k in ls:
            err = abs(ls[k] - lm[k])
            worst = max(worst, err)
            # logged at 3 decimals; allow print-rounding + reduction-order
            if err > 5e-3:
                print(f"MISMATCH iters={it_s} {k}: "
                      f"single={ls[k]} multi={lm[k]}")
                ok = False
    print(f"{len(single)} logged steps match across process boundaries "
          f"(worst abs gap {worst:.2e})")
    print("MULTIHOST-CLI OK" if ok else "MULTIHOST-CLI FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
