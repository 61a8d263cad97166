"""LPIPS perceptual distance (AlexNet backbone) in JAX.

The reference uses ``lpips.LPIPS(net='alex')`` (reference
models/ppst_model.py:48) to regularize the cycle-warp
(ppst_model.py:176-179). This port reproduces the published LPIPS
computation exactly given the same weights:

  scale input to [-1,1] -> channel-standardize with the LPIPS shift/scale
  constants -> AlexNet feature stack (5 relu taps) -> unit-normalize each
  tap over channels -> 1x1 non-negative linear head per tap -> spatial
  mean -> sum over taps.

Weights: this image has no network egress and no torchvision model zoo, so
pretrained AlexNet/LPIPS weights cannot be downloaded. Use
``load_torch_lpips(path)`` to convert a standard ``lpips`` package
checkpoint when one is available; otherwise ``init_params`` gives a
deterministic randomly-initialized backbone, which still provides a
usable perceptual-style training signal (random-feature perceptual
losses are an established fallback) but is NOT numerically LPIPS.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# (kernel, stride, pad, out_channels) of the AlexNet feature stack.
_ALEX = [
    (11, 4, 2, 64),
    (5, 1, 2, 192),
    (3, 1, 1, 384),
    (3, 1, 1, 256),
    (3, 1, 1, 256),
]
# Max-pool (3, stride 2) after taps 0 and 1 and before tap 2's conv... the
# torchvision layout pools after relu1, relu2, and relu5; only the first
# two pools sit between LPIPS taps.
_POOL_AFTER = {0, 1}

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class _AlexFeatures(nn.Module):
    @nn.compact
    def __call__(self, x):
        taps = []
        for i, (k, s, p, c) in enumerate(_ALEX):
            x = nn.Conv(
                c,
                (k, k),
                strides=(s, s),
                padding=((p, p), (p, p)),
                name=f"conv{i}",
            )(x)
            x = nn.relu(x)
            taps.append(x)
            if i in _POOL_AFTER:
                x = nn.max_pool(x, (3, 3), strides=(2, 2))
        return taps


class LPIPS(nn.Module):
    """Callable as ``lpips.apply(params, a, b)`` with NHWC images in
    [-1, 1]; returns (B,) distances."""

    @nn.compact
    def __call__(self, a, b):
        feats = _AlexFeatures(name="net")

        def normalize_input(x):
            return (x - _SHIFT) / _SCALE

        fa = feats(normalize_input(a))
        fb = feats(normalize_input(b))
        total = 0.0
        for i, (xa, xb) in enumerate(zip(fa, fb)):
            na = xa / jnp.sqrt(jnp.sum(xa**2, -1, keepdims=True) + 1e-10)
            nb = xb / jnp.sqrt(jnp.sum(xb**2, -1, keepdims=True) + 1e-10)
            diff = (na - nb) ** 2
            w = self.param(
                f"lin{i}",
                nn.initializers.constant(1.0 / diff.shape[-1]),
                (diff.shape[-1],),
                jnp.float32,
            )
            # lpips clamps head weights to be non-negative
            total = total + jnp.mean(
                jnp.sum(diff * jax.nn.relu(w), axis=-1), axis=(1, 2)
            )
        return total


def init_params(rng=None):
    model = LPIPS()
    rng = rng if rng is not None else jax.random.PRNGKey(1234)
    dummy = jnp.zeros((1, 64, 64, 3))
    return model.init(rng, dummy, dummy)


def load_torch_lpips(path: str) -> Dict[str, Any]:
    """Convert a torch ``lpips`` package state dict (net + lin heads) into
    LPIPS params. Accepts the combined state dict saved via
    ``torch.save(lpips_module.state_dict(), path)``."""
    import torch

    sd = torch.load(path, map_location="cpu")
    params = jax.tree.map(np.copy, init_params()["params"])
    for i in range(5):
        # torchvision alexnet features indices: 0,3,6,8,10
        tidx = [0, 3, 6, 8, 10][i]
        w = sd[f"net.slice{i + 1}.{tidx}.weight"].numpy()  # (O,I,kh,kw)
        b = sd[f"net.slice{i + 1}.{tidx}.bias"].numpy()
        params["net"][f"conv{i}"]["kernel"] = np.transpose(w, (2, 3, 1, 0))
        params["net"][f"conv{i}"]["bias"] = b
        lin = sd[f"lin{i}.model.1.weight"].numpy()  # (1, C, 1, 1)
        params[f"lin{i}"] = lin.reshape(-1)
    return {"params": params}
