"""upfirdn2d: fused upsample -> FIR filter -> downsample, TPU-native.

Replaces the reference's hand-written CUDA kernel
(reference: models/networks/stylegan2_op/upfirdn2d_kernel.cu and the
numerically-authoritative pure-torch fallback ``upfirdn2d_native`` at
models/networks/stylegan2_op/upfirdn2d.py:162-222).

Semantics: insert ``up-1`` zeros after every input sample (both spatial
axes), pad by (pad0, pad1) on each axis (negative pads crop), correlate with
the *flipped* FIR kernel, then keep every ``down``-th output sample.
Output size per axis: ``(in*up + pad0 + pad1 - k) // down + 1``.

TPU design notes
----------------
* Layout is NHWC (channel-last, the native TPU conv layout).
* The whole op maps onto ONE ``lax.conv_general_dilated`` call: zero
  insertion is lhs_dilation, the FIR filter is a depthwise conv, and the
  downsample is the window stride.  XLA lowers this directly to tiled
  VPU/MXU code; gradients (incl. the double-backward needed by the R1
  penalty, reference models/ppst_model.py:140-159) come from JAX autodiff
  of the conv, which reproduces the reference's manually-derived
  transposed-parameter backward (upfirdn2d.py:116-121) automatically.
* Blur kernels in this model family are outer products of 1-D kernels
  ([1,2,1], [1,3,3,1]); pass the 1-D kernel to take the separable
  fast path (two 1-D passes, O(k) instead of O(k^2) work per pixel).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def make_kernel(k, gain: float = 1.0) -> np.ndarray:
    """Normalized FIR kernel from a 1-D or 2-D tap list.

    Mirrors reference stylegan2_layers.py:28-36: a 1-D list becomes its
    outer product; the kernel is normalized to sum 1, then scaled by gain
    (the reference multiplies by factor**2 for upsampling).

    Returns a numpy array (static; kernels are compile-time constants).
    """
    k = np.asarray(k, dtype=np.float32)
    if k.ndim == 1:
        k = np.outer(k, k)
    k = k / k.sum()
    return k * gain


def _depthwise_fir(x, kernel, strides, padding, lhs_dilation):
    """Depthwise correlation of NHWC ``x`` with an (kh, kw) kernel shared
    across channels."""
    c = x.shape[-1]
    kh, kw = kernel.shape
    # Flip: the reference convolves (F.conv2d of the flipped kernel), and
    # lax.conv_general_dilated correlates, so flip to match.
    k = jnp.flip(kernel, (0, 1)).astype(x.dtype)
    k = jnp.broadcast_to(k[:, :, None, None], (kh, kw, 1, c))
    return jax.lax.conv_general_dilated(
        x,
        k,
        window_strides=strides,
        padding=padding,
        lhs_dilation=lhs_dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def upfirdn2d(x, kernel, up: int = 1, down: int = 1, pad=(0, 0)):
    """Apply upfirdn to NHWC ``x``.

    Args:
      x: (B, H, W, C) array.
      kernel: 1-D (separable fast path) or 2-D FIR kernel, numpy or jnp.
      up / down: integer resampling factors (both axes).
      pad: (pad0, pad1) applied to both spatial axes, may be negative.

    Returns (B, H', W', C) with H' = (H*up + pad0 + pad1 - kh)//down + 1.
    """
    kernel = jnp.asarray(kernel, dtype=jnp.float32)
    pad0, pad1 = int(pad[0]), int(pad[1])
    # lhs_dilation inserts zeros *between* samples; the reference appends
    # up-1 zeros after the last sample too, so shift them into trailing pad.
    tail = pad1 + up - 1
    padding = ((pad0, tail), (pad0, tail))
    if kernel.ndim == 1:
        # Separable: run the 1-D kernel along H then W. Each pass does its
        # own up/pad/fir/down for its axis; the composition equals the 2-D
        # op because every stage acts independently per axis.
        c = x.shape[-1]
        kv = jnp.flip(kernel).astype(x.dtype)
        kcol = jnp.broadcast_to(kv[:, None, None, None], (kernel.shape[0], 1, 1, c))
        krow = jnp.broadcast_to(kv[None, :, None, None], (1, kernel.shape[0], 1, c))
        y = jax.lax.conv_general_dilated(
            x, kcol, window_strides=(down, 1), padding=(padding[0], (0, 0)),
            lhs_dilation=(up, 1), dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c)
        y = jax.lax.conv_general_dilated(
            y, krow, window_strides=(1, down), padding=((0, 0), padding[1]),
            lhs_dilation=(1, up), dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c)
        return y
    return _depthwise_fir(x, kernel, (down, down), padding, (up, up))


# ---------------------------------------------------------------------------
# Module-level resampling helpers. Pad arithmetic mirrors the reference
# wrapper modules (stylegan2_layers.py:39-88 Upsample/Downsample, :142-164
# Blur); they are plain functions here because the kernels are static.
# ---------------------------------------------------------------------------


def upsample2d(x, kernel, factor: int = 2):
    """Upsample reference stylegan2_layers.py:39-57: kernel * factor**2,
    pad0 = (p+1)//2 + factor - 1, pad1 = p//2 with p = len(k) - factor."""
    k = np.asarray(kernel, dtype=np.float32)
    assert k.ndim == 1
    p = k.shape[0] - factor
    pad0 = (p + 1) // 2 + factor - 1
    pad1 = p // 2
    k1 = k / k.sum() * factor  # sqrt of the reference's factor**2 gain/axis
    return upfirdn2d(x, k1, up=factor, down=1, pad=(pad0, pad1))


def downsample2d(x, kernel, factor: int = 2, pad=None, reflection_pad: bool = False):
    """Downsample reference stylegan2_layers.py:60-88."""
    k = np.asarray(kernel, dtype=np.float32)
    assert k.ndim == 1
    p = (k.shape[0] - factor) if pad is None else pad
    pad0 = (p + 1) // 2
    pad1 = p // 2
    k1 = k / k.sum()
    if reflection_pad:
        x = jnp.pad(x, ((0, 0), (pad0, pad1), (pad0, pad1), (0, 0)), mode="reflect")
        return upfirdn2d(x, k1, up=1, down=factor, pad=(0, 0))
    return upfirdn2d(x, k1, up=1, down=factor, pad=(pad0, pad1))


def blur(x, kernel, pad, upsample_factor: int = 1, reflection_pad: bool = False):
    """Blur reference stylegan2_layers.py:142-164. ``pad`` is (pad0, pad1)."""
    k = np.asarray(kernel, dtype=np.float32)
    assert k.ndim == 1
    k1 = k / k.sum()
    if upsample_factor > 1:
        k1 = k1 * upsample_factor
    if reflection_pad:
        x = jnp.pad(
            x, ((0, 0), (pad[0], pad[1]), (pad[0], pad[1]), (0, 0)), mode="reflect"
        )
        pad = (0, 0)
    return upfirdn2d(x, k1, up=1, down=1, pad=pad)
