"""Fast parameter construction for benchmarks/compile-checks.

``model.init`` traces and compiles the full four-network init graph —
minutes of XLA work that pure benchmarking doesn't need. This builds the
same pytree via ``jax.eval_shape`` (no compile) and fills it with seeded
host-side Gaussian noise. NOT for training (init distributions matter
there); bench numbers only measure compute cost, which is
distribution-independent.
"""

from __future__ import annotations

import jax
import numpy as np


def random_params_like(init_fn, scale: float = 0.05, seed: int = 0):
    """``init_fn`` is a no-arg callable returning a pytree (e.g.
    ``lambda: model.init(rng, size)``); returns a same-structure pytree of
    seeded random float arrays created without compiling the init graph."""
    shapes = jax.eval_shape(init_fn)
    rng = np.random.default_rng(seed)

    def fill(leaf):
        arr = rng.standard_normal(leaf.shape).astype(leaf.dtype) * scale
        if np.issubdtype(leaf.dtype, np.integer):
            arr = np.zeros(leaf.shape, leaf.dtype)
        return arr

    return jax.tree.map(fill, shapes)
