"""Pallas TPU kernel for upfirdn2d (separable FIR resampling).

The production path rarely executes a standalone upfirdn2d: ConvLayer
folds the antialias blur into its conv kernel (layers.EqualConv2d
pre_blur), which is faster than any standalone filter because the blur
rides the MXU for free. This kernel covers the remaining standalone uses
(fuse_blur=False, explicit Blur/Upsample/Downsample calls) at
speed-of-light for the op: one HBM read + one write, all arithmetic as
statically-unrolled shifted multiply-adds on the VPU.

Supported: separable 1-D taps, up == 1, down in {1, 2}, non-negative
pads — the configurations the StyleGAN2 stack actually uses
(reference stylegan2_layers.py:55,86,162). Everything else falls back to
the XLA path in ppst_tpu.ops.upfirdn2d.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def _kernel(x_ref, o_ref, *, taps, pad, down, out_h, out_w):
    x = x_ref[0]  # (H, W, Cb)
    h, w, cb = x.shape
    t = len(taps)
    p0, p1 = pad
    xp = jnp.pad(x, ((p0, p1), (p0, p1), (0, 0)))
    # correlate with the flipped taps == convolve with taps, separable;
    # taps are python floats -> fully unrolled shifted adds
    hp = xp.shape[0]
    acc = None
    for i, tap in enumerate(taps):
        # flipped kernel: contribution of tap index i comes from offset
        # (t - 1 - i) in the padded array
        sl = xp[t - 1 - i : t - 1 - i + (hp - t + 1), :, :]
        acc = sl * tap if acc is None else acc + sl * tap
    wp = acc.shape[1]
    acc2 = None
    for i, tap in enumerate(taps):
        sl = acc[:, t - 1 - i : t - 1 - i + (wp - t + 1), :]
        acc2 = sl * tap if acc2 is None else acc2 + sl * tap
    if down == 2:
        acc2 = acc2[::2, ::2, :]
    o_ref[0] = acc2[:out_h, :out_w]


def upfirdn2d_pallas(
    x,
    taps,
    down: int = 1,
    pad=(0, 0),
    channel_block: int = 16,
    interpret: bool | None = None,
):
    """NHWC separable FIR + optional 2x downsample as a Pallas kernel.

    ``taps`` is the 1-D kernel (normalized by the caller)."""
    b, h, w, c = x.shape
    taps = [float(v) for v in np.asarray(taps, np.float64)]
    t = len(taps)
    p0, p1 = int(pad[0]), int(pad[1])
    assert p0 >= 0 and p1 >= 0 and down in (1, 2)
    out_h = (h + p0 + p1 - t) // down + 1
    out_w = (w + p0 + p1 - t) // down + 1

    cb = min(channel_block, c)
    if c % cb:
        cb = c
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    kernel = functools.partial(
        _kernel, taps=taps, pad=(p0, p1), down=down, out_h=out_h, out_w=out_w
    )
    return pl.pallas_call(
        kernel,
        grid=(b, c // cb),
        in_specs=[
            pl.BlockSpec((1, h, w, cb), lambda i, j: (i, 0, 0, j)),
        ],
        out_specs=pl.BlockSpec((1, out_h, out_w, cb), lambda i, j: (i, 0, 0, j)),
        out_shape=jax.ShapeDtypeStruct((b, out_h, out_w, c), x.dtype),
        interpret=interpret,
    )(x)
