"""Fused bias + LeakyReLU + gain.

Replaces the reference's fused_bias_act CUDA kernel
(reference: models/networks/stylegan2_op/fused_bias_act_kernel.cu; the
authoritative fallback is fused_act.py:93-96:
``F.leaky_relu(input + bias, negative_slope) * scale``).

On TPU there is nothing to hand-write: XLA fuses the add, the select and
the multiply into the producer (usually the preceding conv's epilogue), so
a jnp composite IS the fused kernel. Verified by inspecting compiled HLO:
the op leaves no intermediate HBM traffic.
"""

import math

import jax.numpy as jnp

SQRT2 = math.sqrt(2.0)


def fused_leaky_relu(x, bias=None, negative_slope: float = 0.2, scale: float = SQRT2):
    """``act(x + bias[channel]) * scale`` with act = LeakyReLU.

    ``x`` is NHWC (or (..., C)); ``bias`` has shape (C,).
    """
    if bias is not None:
        x = x + bias.astype(x.dtype)
    return jnp.where(x >= 0, x, x * negative_slope) * scale


def scaled_leaky_relu(x, negative_slope: float = 0.2):
    """ScaledLeakyReLU (reference stylegan2_layers.py:350-359)."""
    return jnp.where(x >= 0, x, x * negative_slope) * SQRT2
