"""Device-mesh utilities: the TPU-native replacement for the reference's
NCCL/DDP layer (reference models/__init__.py:75-91).

PPST's parallelism surface is data-parallel (SURVEY.md 2.6): a 1-D
'data' mesh, batch sharded over it, params/optimizer state replicated.
Gradient all-reduce is implicit in jit-of-mean-loss; the RSCL queue's
cross-device all_gather semantics are reproduced by indexing the global
batch (losses.enqueue_schedule). Multi-host extends this by calling
``jax.distributed.initialize()`` before ``make_mesh()``.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    if len(devices) < n:
        raise RuntimeError(
            f"make_mesh({n}): only {len(devices)} {jax.default_backend()} "
            f"device(s) visible. For a virtual multi-device CPU mesh set "
            f"XLA_FLAGS=--xla_force_host_platform_device_count={n} and "
            f"jax_platforms=cpu before backend init."
        )
    mesh = Mesh(np.asarray(devices[:n]), (axis,))
    if jax.process_count() > 1:
        _warmup_collectives(mesh, axis)
    return mesh


def _warmup_collectives(mesh: Mesh, axis: str):
    """Execute one tiny cross-process reduction over the mesh clique
    right after mesh creation, while the processes are still aligned
    from the `jax.distributed` rendezvous.

    The CPU collective backend (Gloo) builds its pair connections at the
    FIRST collective execution with a ~30 s window; in the production
    path that first execution comes after multi-minute XLA train-step
    compiles, whose duration can skew across processes (measured: a 45 s
    execution skew reliably kills the context handshake; a prior
    same-clique warmup reliably survives it). Once the clique context
    exists, later skewed executions reuse it. On TPU pods collectives
    ride ICI and this costs one microsecond-scale psum."""
    import jax.numpy as jnp

    sh = NamedSharding(mesh, P(axis))
    pid = jax.process_index()
    local = [d for d in mesh.devices.flat if d.process_index == pid]
    shards = [
        jax.device_put(np.ones((1,), np.float32), d) for d in local
    ]
    x = jax.make_array_from_single_device_arrays((mesh.size,), sh, shards)
    f = jax.jit(
        lambda v: jnp.sum(v),
        in_shardings=sh,
        out_shardings=NamedSharding(mesh, P()),
    )
    np.asarray(f(x).addressable_shards[0].data)


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def shard_batch(mesh: Mesh, tree):
    """Place a host batch with its leading axis sharded over the mesh.

    Single-process: ``tree`` holds the GLOBAL batch; a plain device_put
    splits it contiguously, so in-batch ``swap()`` pairing stays within a
    shard (matching the reference's per-GPU pairing) as long as the
    per-shard batch is even.

    Multi-process (``jax.process_count() > 1``): ``tree`` holds only THIS
    process's contiguous slice of the global batch — the
    DistributedSampler semantics of reference data/__init__.py:106,114-121,
    produced by ``ConfigurableDataLoader``'s per-process slicing — and the
    global jax.Array is assembled from per-device local shards via
    ``jax.make_array_from_single_device_arrays`` (no cross-host traffic;
    every process contributes its addressable shards).
    """
    sh = batch_sharding(mesh)
    nproc = jax.process_count()
    if nproc == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sh), tree)

    pid = jax.process_index()
    mesh_devs = list(mesh.devices.flat)
    local = [d for d in mesh_devs if d.process_index == pid]
    # contiguous-slice assembly assumes mesh order groups devices by
    # process (true for make_mesh over jax.devices(), which sorts by
    # process then local id)
    first = mesh_devs.index(local[0])
    assert mesh_devs[first : first + len(local)] == local, (
        "mesh device order must be contiguous per process for "
        "DistributedSampler-style batch assembly"
    )

    def put(x):
        x = np.asarray(x)
        per_dev = x.shape[0] // len(local)
        assert per_dev * len(local) == x.shape[0], (
            f"local batch {x.shape[0]} not divisible by "
            f"{len(local)} local devices"
        )
        shards = [
            jax.device_put(x[i * per_dev : (i + 1) * per_dev], d)
            for i, d in enumerate(local)
        ]
        gshape = (x.shape[0] * nproc,) + x.shape[1:]
        return jax.make_array_from_single_device_arrays(gshape, sh, shards)

    return jax.tree.map(put, tree)


def replicate_tree(mesh: Mesh, tree):
    """Replicate a host/device pytree over the mesh. Multi-process-safe:
    under multiple processes a plain ``device_put`` cannot produce a
    non-fully-addressable replicated array, so each process feeds its
    local devices and the global array is assembled shard-wise (every
    process must hold the same host values — true for params/opt-state
    built from the same seed or checkpoint)."""
    sh = replicated_sharding(mesh)
    if jax.process_count() == 1:
        return jax.device_put(tree, sh)

    pid = jax.process_index()
    local = [d for d in mesh.devices.flat if d.process_index == pid]

    def put(a):
        a = host_value(a)  # multi-process-safe for already-global leaves
        shards = [jax.device_put(a, d) for d in local]
        return jax.make_array_from_single_device_arrays(a.shape, sh, shards)

    return jax.tree.map(put, tree)


def host_value(a):
    """Fetch an array to host memory, multi-process-safe for REPLICATED
    arrays: a non-fully-addressable replicated jax.Array exposes the full
    value through any addressable shard."""
    if isinstance(a, jax.Array) and not a.is_fully_addressable:
        return np.asarray(a.addressable_shards[0].data)
    return np.asarray(a)
