"""Photorealistic smoothing via local affine models, in-graph.

Capability parity with reference smooth_filter.py (three NVRTC CUDA
kernels, shipped but never wired into the live pipeline — SURVEY.md 2.5):

1. best local affine: per pixel, least-squares 3x4 affine A mapping
   content RGB -> stylized RGB over a (2r+1)^2 window, normal equations
   with 1e-3 diagonal regularization (best_local_affine_kernel,
   smooth_filter.py:149-238);
2. bilateral smoothing of the 12-dim affine field, spatial sigma
   f_radius/3 and range sigma f_edge on the content guide
   (bilateral_smooth_kernel, :240-288);
3. reconstruction out = A_smoothed [content; 1]
   (reconstruction_best_kernel, :291-321).

TPU design: step 1 uses integral-image window sums + a batched 4x4 solve;
step 2 is a lax.scan over window offsets with rolled tensors (the range
weight depends on the center pixel, so it is not a convolution).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ppst_tpu.ops.guided_filter import _box_sum_axis


def _box_sum(x, r):
    return _box_sum_axis(_box_sum_axis(x, r, 1), r, 2)


def _local_affine(content, stylized, radius: int = 1, diag: float = 1e-3):
    """Per-pixel 3x4 affine via windowed normal equations.
    content/stylized: (B, H, W, 3) in [0, 1]. Returns (B, H, W, 3, 4)."""
    b, h, w, _ = content.shape
    ones = jnp.ones((b, h, w, 1), content.dtype)
    basis = jnp.concatenate([content, ones], axis=-1)  # (B,H,W,4)

    mtm = _box_sum(basis[..., :, None] * basis[..., None, :], radius)
    mtm = mtm + diag * jnp.eye(4, dtype=mtm.dtype)
    mts = _box_sum(basis[..., :, None] * stylized[..., None, :], radius)
    # solve (4,4) @ (4,3): A^T per output channel
    at = jnp.linalg.solve(mtm, mts)  # (B,H,W,4,3)
    return jnp.swapaxes(at, -1, -2)  # (B,H,W,3,4)


def _bilateral_affine(affine, guide, radius: int, sigma1: float, sigma2: float):
    """Bilateral filter of the affine field using the content guide.
    affine: (B,H,W,12) flattened; guide: (B,H,W,3)."""
    offsets = np.stack(
        np.meshgrid(
            np.arange(-radius, radius + 1), np.arange(-radius, radius + 1),
            indexing="ij",
        ),
        -1,
    ).reshape(-1, 2)
    spatial = np.exp(
        -(offsets[:, 0] ** 2 + offsets[:, 1] ** 2) / (2.0 * sigma1 * sigma1)
    ).astype(np.float32)
    b, h, w, _ = guide.shape
    rows = jnp.arange(h)[None, :, None, None]
    cols = jnp.arange(w)[None, None, :, None]

    def step(carry, inp):
        acc, wsum = carry
        (dy, dx), sw = inp
        g = jnp.roll(guide, (-dy, -dx), axis=(1, 2))
        a = jnp.roll(affine, (-dy, -dx), axis=(1, 2))
        diff = jnp.mean((g - guide) ** 2, axis=-1, keepdims=True)
        wgt = sw * jnp.exp(-diff / (2.0 * sigma2 * sigma2))
        # mask out-of-bounds neighbors (roll wraps)
        valid_r = (rows + dy >= 0) & (rows + dy < h)
        valid_c = (cols + dx >= 0) & (cols + dx < w)
        wgt = jnp.where(valid_r & valid_c, wgt, 0.0)
        return (acc + wgt * a, wsum + wgt), None

    init = (jnp.zeros_like(affine), jnp.zeros(guide.shape[:3] + (1,), guide.dtype))
    (acc, wsum), _ = jax.lax.scan(
        step, init, (jnp.asarray(offsets), jnp.asarray(spatial))
    )
    return acc / wsum


@functools.partial(jax.jit, static_argnames=("f_radius", "patch"))
def smooth_local_affine(
    stylized, content, f_radius: int = 15, f_edge: float = 1e-1, patch: int = 3
):
    """NHWC [0,1] float images -> smoothed stylized image (B,H,W,3)."""
    affine = _local_affine(content, stylized, radius=(patch - 1) // 2)
    b, h, w = affine.shape[:3]
    flat = affine.reshape(b, h, w, 12)
    smoothed = _bilateral_affine(
        flat, content, radius=f_radius, sigma1=f_radius / 3.0, sigma2=f_edge
    ).reshape(b, h, w, 3, 4)
    ones = jnp.ones((b, h, w, 1), content.dtype)
    basis = jnp.concatenate([content, ones], axis=-1)
    return jnp.einsum("bhwij,bhwj->bhwi", smoothed, basis)
