"""In-graph guided filter vs a direct numpy implementation of He et al.'s
color guided filter (the algorithm behind the reference's post-processor,
photo_gif.py:43; cv2.ximgproc is not available in this image)."""

import numpy as np
import jax.numpy as jnp

from ppst_tpu.ops.guided_filter import guided_filter


def box_mean_np(x, r):
    """Truncated-window box mean, any trailing dims, HW leading."""
    h, w = x.shape[:2]
    out = np.empty_like(x)
    csum = np.cumsum(np.cumsum(x, axis=0), axis=1)
    csum = np.pad(csum, [(1, 0), (1, 0)] + [(0, 0)] * (x.ndim - 2))
    for i in range(h):
        y0, y1 = max(i - r, 0), min(i + r, h - 1) + 1
        for j in range(w):
            x0, x1 = max(j - r, 0), min(j + r, w - 1) + 1
            s = csum[y1, x1] - csum[y0, x1] - csum[y1, x0] + csum[y0, x0]
            out[i, j] = s / ((y1 - y0) * (x1 - x0))
    return out


def guided_filter_np(guide, src, r, eps):
    h, w, _ = guide.shape
    c = src.shape[-1]
    mean_i = box_mean_np(guide, r)
    mean_p = box_mean_np(src, r)
    corr_ii = box_mean_np(guide[..., :, None] * guide[..., None, :], r)
    corr_ip = box_mean_np(guide[..., :, None] * src[..., None, :], r)
    var_i = corr_ii - mean_i[..., :, None] * mean_i[..., None, :] + eps * np.eye(3)
    cov_ip = corr_ip - mean_i[..., :, None] * mean_p[..., None, :]
    a = np.linalg.solve(var_i, cov_ip)  # (H,W,3,C)
    b = mean_p - np.einsum("hwic,hwi->hwc", a, mean_i)
    mean_a = box_mean_np(a, r)
    mean_b = box_mean_np(b, r)
    return np.einsum("hwic,hwi->hwc", mean_a, guide) + mean_b


def test_matches_numpy_reference(rng):
    h = w = 24
    guide = (rng.random((h, w, 3)) * 255).astype(np.float32)
    src = np.clip(
        guide + rng.standard_normal((h, w, 3)).astype(np.float32) * 20, 0, 255
    )
    r, eps = 4, (0.02 * 255) ** 2
    want = guided_filter_np(guide.astype(np.float64), src.astype(np.float64), r, eps)
    got = np.asarray(
        guided_filter(jnp.asarray(guide)[None], jnp.asarray(src)[None], r, eps)
    )[0]
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=0.05)


def test_identity_when_src_equals_guide(rng):
    img = (rng.random((1, 32, 32, 3)) * 255).astype(np.float32)
    out = np.asarray(guided_filter(jnp.asarray(img), jnp.asarray(img), 4, 1e-2))
    # with tiny eps, filtering an image by itself is near-identity
    np.testing.assert_allclose(out, img, rtol=5e-2, atol=1.0)
