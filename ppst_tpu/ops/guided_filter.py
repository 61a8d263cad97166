"""Color guided filter, fully in-graph.

Replaces the reference's per-image CPU OpenCV post-processing round trip
(reference photo_gif.py:25-46: ``cv2.ximgproc.guidedFilter(guide=content,
src=stylized, radius=30, eps=(0.02*255)**2)``, invoked from
models/ppst_model.py:288-306) with a pure-JAX implementation that compiles
into the same XLA program as the generator — no host transfer per image.

Algorithm: He et al., "Guided Image Filtering", color-guide variant.
Box sums use integral images (cumsum), so cost is O(1) per pixel
independent of the radius; border windows are truncated and normalized by
their true pixel count (matching the canonical MATLAB/OpenCV behavior).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _box_sum_axis(x, r: int, axis: int):
    n = x.shape[axis]
    cs = jnp.cumsum(x, axis=axis)
    cs = jnp.concatenate(
        [jnp.zeros_like(jnp.take(cs, np.array([0]), axis=axis)), cs], axis=axis
    )
    hi = np.minimum(np.arange(n) + r, n - 1) + 1
    lo = np.maximum(np.arange(n) - r, 0)
    return jnp.take(cs, hi, axis=axis) - jnp.take(cs, lo, axis=axis)


def _box_mean(x, r: int, inv_count):
    """Mean over the (2r+1)^2 window (truncated at borders) for NHWC x."""
    s = _box_sum_axis(_box_sum_axis(x, r, 1), r, 2)
    return s * inv_count


def _window_inv_counts(h: int, w: int, r: int):
    def axis_counts(n):
        i = np.arange(n)
        return np.minimum(i + r, n - 1) - np.maximum(i - r, 0) + 1

    counts = np.outer(axis_counts(h), axis_counts(w)).astype(np.float32)
    return (1.0 / counts)[None, :, :, None]


def guided_filter(guide, src, radius: int = 30, eps: float = (0.02 * 255.0) ** 2):
    """Edge-preserving smoothing of ``src`` guided by ``guide``.

    Args:
      guide: (B, H, W, 3) color guide (the content image).
      src:   (B, H, W, C) image to filter (the stylized output).
      radius, eps: filter window radius and regularization; defaults match
        the reference's GIFSmoothing(r=30, eps=(0.02*255)**2). ``eps`` is in
        squared *pixel* units — scale it to your value range (the reference
        filters 0..255 uint8 images).

    Returns the filtered (B, H, W, C) array.
    """
    guide = guide.astype(jnp.float32)
    src = src.astype(jnp.float32)
    b, h, w, _ = guide.shape
    inv_n = jnp.asarray(_window_inv_counts(h, w, radius))

    mean_i = _box_mean(guide, radius, inv_n)  # (B,H,W,3)
    mean_p = _box_mean(src, radius, inv_n)  # (B,H,W,C)

    # 3x3 guide covariance (symmetric; 6 unique entries) + eps*I.
    corr_ii = _box_mean(guide[..., :, None] * guide[..., None, :], radius, inv_n[..., None])
    var_i = corr_ii - mean_i[..., :, None] * mean_i[..., None, :]
    var_i = var_i + eps * jnp.eye(3, dtype=var_i.dtype)

    # cross-covariance guide x src: (B,H,W,3,C)
    corr_ip = _box_mean(guide[..., :, None] * src[..., None, :], radius, inv_n[..., None])
    cov_ip = corr_ip - mean_i[..., :, None] * mean_p[..., None, :]

    # Solve (var_i) a = cov_ip per pixel via the explicit 3x3 adjugate —
    # cheaper on the VPU than a batched LU of tiny matrices.
    m = var_i
    c00 = m[..., 1, 1] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 1]
    c01 = m[..., 1, 2] * m[..., 2, 0] - m[..., 1, 0] * m[..., 2, 2]
    c02 = m[..., 1, 0] * m[..., 2, 1] - m[..., 1, 1] * m[..., 2, 0]
    det = m[..., 0, 0] * c00 + m[..., 0, 1] * c01 + m[..., 0, 2] * c02
    adj = jnp.stack(
        [
            jnp.stack([c00,
                       m[..., 0, 2] * m[..., 2, 1] - m[..., 0, 1] * m[..., 2, 2],
                       m[..., 0, 1] * m[..., 1, 2] - m[..., 0, 2] * m[..., 1, 1]], -1),
            jnp.stack([c01,
                       m[..., 0, 0] * m[..., 2, 2] - m[..., 0, 2] * m[..., 2, 0],
                       m[..., 0, 2] * m[..., 1, 0] - m[..., 0, 0] * m[..., 1, 2]], -1),
            jnp.stack([c02,
                       m[..., 0, 1] * m[..., 2, 0] - m[..., 0, 0] * m[..., 2, 1],
                       m[..., 0, 0] * m[..., 1, 1] - m[..., 0, 1] * m[..., 1, 0]], -1),
        ],
        axis=-2,
    )
    inv = adj / det[..., None, None]
    a = jnp.einsum("...ij,...jc->...ic", inv, cov_ip)  # (B,H,W,3,C)
    b_ = mean_p - jnp.einsum("...ic,...i->...c", a, mean_i)  # (B,H,W,C)

    mean_a = _box_mean(a.reshape(b, h, w, -1), radius, inv_n).reshape(a.shape)
    mean_b = _box_mean(b_, radius, inv_n)
    return jnp.einsum("...ic,...i->...c", mean_a, guide) + mean_b
