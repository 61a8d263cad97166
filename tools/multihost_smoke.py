"""Two-process multi-host smoke test of the distributed layer.

The reference's multi-GPU story is torch.distributed NCCL with env://
rendezvous (reference models/__init__.py:78-91); the TPU-native
equivalent is ``jax.distributed.initialize()`` + a global mesh, with the
collectives compiled into the jitted step. This script validates that
path without a TPU pod: two host processes, each with 4 virtual CPU
devices, form one 8-device 'data' mesh over the loopback coordinator and
run a sharded computation whose psum/all_gather must match the
single-process result.

Run directly (spawns its own worker subprocesses):
    python tools/multihost_smoke.py
Exit code 0 + final "MULTIHOST OK" line on success. Also wrapped by
tests/test_multihost.py (slow marker).
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PORT = int(os.environ.get("PPST_MULTIHOST_PORT", "12987"))
N_PROC = 2
LOCAL_DEV = 4

WORKER = r"""
import os, sys
sys.path.insert(0, os.environ["PPST_REPO"])
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{os.environ['PPST_PORT']}",
    num_processes=int(os.environ["PPST_NPROC"]),
    process_id=int(os.environ["PPST_PID"]),
)
import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ppst_tpu.parallel.mesh import make_mesh

pid = jax.process_index()
LOCAL_DEV = int(os.environ["PPST_LOCAL"])
n_global = jax.device_count()
assert n_global == int(os.environ["PPST_NPROC"]) * int(os.environ["PPST_LOCAL"]), (
    f"expected {os.environ['PPST_NPROC']}x{os.environ['PPST_LOCAL']} global "
    f"devices, got {n_global}"
)
mesh = make_mesh(n_global)

# global batch 16; each host feeds its contiguous local slice
# (DistributedSampler semantics), split contiguously over local devices
b_global = 16
full = np.arange(b_global * 8, dtype=np.float32).reshape(b_global, 8)
sh = NamedSharding(mesh, P("data"))
local_rows = full[pid * (b_global // 2) : (pid + 1) * (b_global // 2)]
arrs = jax.device_put(np.split(local_rows, LOCAL_DEV), jax.local_devices())
x = jax.make_array_from_single_device_arrays((b_global, 8), sh, arrs)

@jax.jit
def step(x):
    # grad-allreduce analog (mean over the global batch) + the RSCL
    # queue's all_gather analog (globally visible batch)
    return jnp.mean(x, axis=0), jnp.sum(x * x)

mean, ss = step(x)
np.testing.assert_allclose(np.asarray(mean), full.mean(0), rtol=1e-6)
np.testing.assert_allclose(float(ss), float((full * full).sum()), rtol=1e-6)
if pid == 0:
    print("MULTIHOST OK", flush=True)
"""


def main() -> int:
    procs = []
    for pid in range(N_PROC):
        env = dict(
            os.environ,
            PPST_REPO=REPO,
            PPST_PORT=str(PORT),
            PPST_NPROC=str(N_PROC),
            PPST_PID=str(pid),
            PPST_LOCAL=str(LOCAL_DEV),
            JAX_PLATFORMS="cpu",
            XLA_FLAGS=(
                os.environ.get("XLA_FLAGS", "")
                + f" --xla_force_host_platform_device_count={LOCAL_DEV}"
            ).strip(),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", WORKER],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    ok = True
    for pid, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            ok = False
        if p.returncode != 0:
            ok = False
        if pid == 0 and "MULTIHOST OK" not in (out or ""):
            ok = False
        tail = "\n".join((out or "").strip().splitlines()[-5:])
        print(f"--- process {pid} rc={p.returncode} ---\n{tail}")
    print("MULTIHOST OK" if ok else "MULTIHOST FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
