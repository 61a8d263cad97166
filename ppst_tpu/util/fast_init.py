"""Fast parameter construction for benchmarks/compile-checks.

``model.init`` traces and compiles the full four-network init graph —
minutes of XLA work that pure benchmarking doesn't need. This builds the
same pytree via ``jax.eval_shape`` (no compile) and fills it with seeded
host-side Gaussian noise. NOT for training or any loss/dynamics study
(init distributions matter there): the StyleGAN2 layers are equalized-lr
(N(0,1) kernels, runtime 1/sqrt(fan_in) scale), so the uniform 0.05-std
fill attenuates their signal path ~20x per layer — measured to make the
normalization-free discriminator a CONSTANT function of its input.
Bench numbers only measure compute cost, which is
distribution-independent; use ``model.init`` everywhere else
(tests/test_networks.py::test_init_discriminator_is_input_sensitive
guards the distinction).
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
