"""Pallas TPU kernel for fused bias + LeakyReLU + gain.

XLA already fuses the jnp composite (ops.fused_act) into the producing
conv's epilogue, so this standalone kernel exists for API completeness
(the reference ships a dedicated CUDA kernel, fused_bias_act_kernel.cu)
and for contexts where the op runs standalone on large HBM tensors —
there it is one read + one write at VPU speed."""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _kernel(x_ref, b_ref, o_ref, *, slope, scale):
    y = x_ref[0] + b_ref[:]
    o_ref[0] = jnp.where(y >= 0, y, y * slope) * scale


def fused_leaky_relu_pallas(
    x,
    bias,
    negative_slope: float = 0.2,
    scale: float = math.sqrt(2.0),
    interpret: bool | None = None,
):
    """NHWC ``x`` (B, H, W, C), ``bias`` (C,)."""
    b, h, w, c = x.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kernel = functools.partial(_kernel, slope=negative_slope, scale=scale)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((c,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, bias.astype(x.dtype))
