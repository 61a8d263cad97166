"""Image quality metrics for output-parity evaluation (BASELINE.md plan:
LPIPS/SSIM between reference and ppst_tpu outputs).

SSIM follows Wang et al. 2004 with the standard 11-tap Gaussian window
(sigma 1.5), K1=0.01, K2=0.03, on [0, 1]-range NHWC images, averaged over
channels. LPIPS lives in ppst_tpu.ops.lpips.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_window(size: int = 11, sigma: float = 1.5):
    x = np.arange(size) - size // 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def _filter2d(x, taps):
    c = x.shape[-1]
    k = jnp.asarray(taps, x.dtype)
    kcol = jnp.broadcast_to(k[:, None, None, None], (len(taps), 1, 1, c))
    krow = jnp.broadcast_to(k[None, :, None, None], (1, len(taps), 1, c))
    for kern in (kcol, krow):
        x = jax.lax.conv_general_dilated(
            x, kern, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
        )
    return x


def ssim(a, b, value_range: float = 1.0):
    """Mean SSIM over batch; a/b are (B, H, W, C) in [0, value_range]."""
    a = a.astype(jnp.float32) / value_range
    b = b.astype(jnp.float32) / value_range
    taps = _gaussian_window()
    c1, c2 = 0.01**2, 0.03**2
    mu_a = _filter2d(a, taps)
    mu_b = _filter2d(b, taps)
    # clamp variances: E[x^2]-mu^2 cancellation can go slightly negative on
    # near-flat windows, which pushes SSIM above 1
    saa = jnp.maximum(_filter2d(a * a, taps) - mu_a**2, 0.0)
    sbb = jnp.maximum(_filter2d(b * b, taps) - mu_b**2, 0.0)
    sab = _filter2d(a * b, taps) - mu_a * mu_b
    num = (2 * mu_a * mu_b + c1) * (2 * sab + c2)
    den = (mu_a**2 + mu_b**2 + c1) * (saa + sbb + c2)
    return jnp.mean(num / den, axis=(1, 2, 3))


def psnr(a, b, value_range: float = 1.0):
    mse = jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2,
                   axis=(1, 2, 3))
    return 10.0 * jnp.log10(value_range**2 / jnp.maximum(mse, 1e-12))


def lpips_distance(a, b, variables=None):
    """LPIPS on [-1,1] NHWC images (random-init backbone unless torch
    LPIPS weights are converted via ops.lpips.load_torch_lpips)."""
    from ppst_tpu.ops import lpips as lpips_mod

    model = lpips_mod.LPIPS()
    variables = variables or lpips_mod.init_params()
    return model.apply(variables, a, b)
