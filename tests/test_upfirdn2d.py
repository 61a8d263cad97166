"""upfirdn2d parity vs an independent numpy oracle + gradient checks.

Covers the mode specializations the reference CUDA kernel ships
(up/down in {1,2}, kernels [1,2,1] and [1,3,3,1], asymmetric and negative
pads) using the documented semantics: zero-insert, pad, correlate with the
flipped kernel, stride-downsample.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from numpy.lib.stride_tricks import sliding_window_view

from ppst_tpu.ops.upfirdn2d import upfirdn2d, make_kernel, upsample2d, downsample2d, blur


def upfirdn2d_oracle(x, k2d, up, down, pad0, pad1):
    """Independent NHWC numpy implementation of the upfirdn semantics."""
    b, h, w, c = x.shape
    kh, kw = k2d.shape
    z = np.zeros((b, h * up, w * up, c), x.dtype)
    z[:, ::up, ::up] = x
    # pad (negative pad crops)
    def ax_pad(a, axis, p0, p1):
        a = np.moveaxis(a, axis, 0)
        if p0 > 0 or p1 > 0:
            pads = [(max(p0, 0), max(p1, 0))] + [(0, 0)] * (a.ndim - 1)
            a = np.pad(a, pads)
        a = a[max(-p0, 0) : a.shape[0] - max(-p1, 0)]
        return np.moveaxis(a, 0, axis)

    z = ax_pad(z, 1, pad0, pad1)
    z = ax_pad(z, 2, pad0, pad1)
    win = sliding_window_view(z, (kh, kw), axis=(1, 2))  # (b, H', W', c, kh, kw)
    out = np.einsum("bijckl,kl->bijc", win, np.flip(k2d, (0, 1)))
    return out[:, ::down, ::down]


CASES = [
    # (up, down, kernel taps, pad)
    (1, 1, [1, 3, 3, 1], (2, 1)),      # Blur in ConvLayer downsample path
    (1, 1, [1, 2, 1], (1, 1)),         # antialias blur
    (2, 1, [1, 3, 3, 1], (3, 1)),      # Upsample factor 2
    (1, 2, [1, 3, 3, 1], (1, 1)),      # Downsample factor 2
    (1, 2, [1, 2, 1], (1, 0)),
    (1, 1, [1, 3, 3, 1], (0, 0)),
    (1, 1, [1, 2, 1], (-1, 2)),        # negative pad (crop) corner case
]


@pytest.mark.parametrize("up,down,taps,pad", CASES)
def test_separable_matches_oracle(rng, up, down, taps, pad):
    x = rng.standard_normal((2, 12, 10, 3)).astype(np.float32)
    k1 = np.asarray(taps, np.float32)
    k1n = k1 / k1.sum()
    k2d = np.outer(k1n, k1n)
    want = upfirdn2d_oracle(x, k2d, up, down, pad[0], pad[1])
    got = np.asarray(upfirdn2d(jnp.asarray(x), k1n, up=up, down=down, pad=pad))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("up,down,taps,pad", CASES[:4])
def test_dense2d_matches_oracle(rng, up, down, taps, pad):
    k2d = make_kernel(taps)
    x = rng.standard_normal((1, 9, 11, 2)).astype(np.float32)
    want = upfirdn2d_oracle(x, k2d, up, down, pad[0], pad[1])
    got = np.asarray(upfirdn2d(jnp.asarray(x), k2d, up=up, down=down, pad=pad))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_output_size_formula(rng):
    x = jnp.zeros((1, 16, 16, 1))
    for up, down, taps, pad in CASES:
        k = make_kernel(taps)
        out = upfirdn2d(x, k, up=up, down=down, pad=pad)
        expect = (16 * up + pad[0] + pad[1] - len(taps)) // down + 1
        assert out.shape[1] == out.shape[2] == expect, (up, down, taps, pad)


def test_wrappers_shapes(rng):
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 4)).astype(np.float32))
    assert upsample2d(x, [1, 3, 3, 1]).shape == (2, 32, 32, 4)
    assert downsample2d(x, [1, 3, 3, 1]).shape == (2, 8, 8, 4)
    assert blur(x, [1, 3, 3, 1], (2, 1)).shape == (2, 16, 16, 4)
    # reflection-padded blur keeps size with (2,1) pads too
    assert blur(x, [1, 3, 3, 1], (2, 1), reflection_pad=True).shape == (2, 16, 16, 4)


def test_upsample_preserves_dc(rng):
    # A constant image must stay (nearly) constant through up/down sampling
    # in the interior — checks kernel normalization and gain.
    x = jnp.ones((1, 16, 16, 1))
    up = upsample2d(x, [1, 3, 3, 1])
    np.testing.assert_allclose(np.asarray(up)[0, 4:-4, 4:-4, 0], 1.0, atol=1e-5)
    down = downsample2d(x, [1, 3, 3, 1])
    np.testing.assert_allclose(np.asarray(down)[0, 2:-2, 2:-2, 0], 1.0, atol=1e-5)


def test_gradients_first_and_second_order(rng):
    """R1 differentiates twice through the blur; make sure grad-of-grad
    exists and the first-order grad matches finite differences."""
    k = np.asarray([1.0, 3.0, 3.0, 1.0], np.float32)
    k = k / k.sum()
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 1)).astype(np.float32))

    def f(x):
        return jnp.sum(upfirdn2d(x, k, up=1, down=2, pad=(1, 1)) ** 2)

    g = jax.grad(f)(x)
    eps = 1e-3
    idx = (0, 3, 4, 0)
    xp = x.at[idx].add(eps)
    xm = x.at[idx].add(-eps)
    fd = (f(xp) - f(xm)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(g[idx]), np.asarray(fd), rtol=1e-2)

    # second order: grad of grad-norm (the R1 pattern)
    def r1(x):
        return jnp.sum(jax.grad(f)(x) ** 2)

    gg = jax.grad(r1)(x)
    assert np.all(np.isfinite(np.asarray(gg)))
