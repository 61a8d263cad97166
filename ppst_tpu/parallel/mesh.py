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
    return Mesh(np.asarray(devices[:n]), (axis,))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def shard_batch(mesh: Mesh, tree):
    """Device-put a host batch with its leading axis sharded over the mesh.

    The split is contiguous, so in-batch ``swap()`` pairing stays within a
    shard (matching the reference's per-GPU pairing) as long as the
    per-shard batch is even.
    """
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
