"""Correspondence ops vs torch oracles (semantics from
reference models/ppst_model.py:330-387, encoder_col.py:100-138)."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as TF

from ppst_tpu.ops.corr import (
    adaptive_avg_pool,
    corrm,
    rselfcorr,
    warp,
    warp_resize,
)


def nchw(x):
    return torch.from_numpy(np.ascontiguousarray(np.moveaxis(x, -1, 1)))


def nhwc(t):
    return np.moveaxis(t.detach().numpy(), 1, -1)


def rselfcorr_oracle(fea_t):
    """Torch oracle: per 4x4 patch, channelwise-centered/normalized pixel
    vectors, pairwise dot over channels -> 256-d patch descriptor."""
    b, c, h, w = fea_t.shape
    v = TF.unfold(fea_t, kernel_size=4, stride=4)  # (B, C*16, L)
    l = v.shape[-1]
    v = v.view(b, c, 16, l)
    v = v - v.mean(dim=1, keepdim=True)
    v = v / (v.norm(dim=1, keepdim=True) + np.finfo(np.float64).eps)
    g = torch.einsum("bcel,bcfl->blef", v, v).reshape(b, l, 256)
    side = int(l**0.5)
    return g.permute(0, 2, 1).view(b, 256, side, side)


def test_rselfcorr_matches_oracle(rng):
    x = rng.standard_normal((2, 16, 16, 8)).astype(np.float32)
    got = rselfcorr(jnp.asarray(x))
    assert got.shape == (2, 4, 4, 256)
    want = rselfcorr_oracle(nchw(x))
    np.testing.assert_allclose(np.asarray(got), nhwc(want), rtol=1e-4, atol=1e-5)


def corrm_oracle(fea_t, fea0_t):
    b, c, h, w = fea_t.shape

    def prep(z):
        z = z.reshape(b, c, -1)
        head = z[:, :256] - z[:, :256].mean(dim=1, keepdim=True)
        z = torch.cat([head, z[:, 256:]], dim=1)
        return z / (z.norm(dim=1, keepdim=True) + np.finfo(np.float64).eps)

    fea = prep(fea_t)
    fea0 = prep(fea0_t).permute(0, 2, 1)
    return TF.softmax(torch.bmm(fea0, fea) / 0.01, dim=-1)


def test_corrm_matches_oracle(rng):
    # 512 channels (256 feat + 256 selfcorr), 8x8 grid -> 64x64 matrix
    a = rng.standard_normal((2, 8, 8, 512)).astype(np.float32)
    b_ = rng.standard_normal((2, 8, 8, 512)).astype(np.float32)
    got = corrm(jnp.asarray(a), jnp.asarray(b_))
    want = corrm_oracle(nchw(a), nchw(b_))
    assert got.shape == (2, 64, 64)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-3, atol=1e-5)
    # rows sum to 1
    np.testing.assert_allclose(np.asarray(got).sum(-1), 1.0, rtol=1e-5)


def test_corrm_bf16_returns_compute_dtype_and_stays_stochastic(rng):
    # bf16 compute mode returns the matrix in bf16 (halves the L x L HBM
    # traffic); rows must still be a probability distribution up to bf16
    # rounding, and close to the f32 result
    a = rng.standard_normal((2, 8, 8, 512)).astype(np.float32)
    b_ = rng.standard_normal((2, 8, 8, 512)).astype(np.float32)
    got16 = corrm(jnp.asarray(a, jnp.bfloat16), jnp.asarray(b_, jnp.bfloat16))
    assert got16.dtype == jnp.bfloat16
    got32 = corrm(jnp.asarray(a), jnp.asarray(b_))
    rows = np.asarray(got16, np.float32).sum(-1)
    np.testing.assert_allclose(rows, 1.0, atol=0.02)
    # bf16 logits shift the softmax peak location occasionally; compare
    # the distributions in aggregate
    diff = np.abs(np.asarray(got16, np.float32) - np.asarray(got32))
    assert diff.mean() < 5e-3


def test_warp_direct_matches_oracle(rng):
    fea = rng.standard_normal((2, 8, 8, 5)).astype(np.float32)
    corr = rng.random((2, 64, 64)).astype(np.float32)
    got = warp(jnp.asarray(fea), jnp.asarray(corr))
    flat = nchw(fea).reshape(2, 5, 64).permute(0, 2, 1)
    want = torch.bmm(torch.from_numpy(corr), flat).permute(0, 2, 1).view(2, 5, 8, 8)
    np.testing.assert_allclose(np.asarray(got), nhwc(want), rtol=1e-4, atol=1e-5)


def test_warp_block_matches_unfold_fold_oracle(rng):
    """Resolution-mismatch path: s x s blocks move as units
    (reference ppst_model.py:366-383 unfold/matmul/fold)."""
    fea = rng.standard_normal((1, 16, 16, 3)).astype(np.float32)
    corr = rng.random((1, 64, 64)).astype(np.float32)  # grid 8x8, s=2
    got = warp(jnp.asarray(fea), jnp.asarray(corr))
    ft = nchw(fea)
    blocks = TF.unfold(ft, 2, stride=2).permute(0, 2, 1)  # (1, 64, C*4)
    out = torch.bmm(torch.from_numpy(corr), blocks).permute(0, 2, 1)
    want = TF.fold(out, (16, 16), 2, stride=2)
    np.testing.assert_allclose(np.asarray(got), nhwc(want), rtol=1e-4, atol=1e-5)


def test_adaptive_avg_pool_matches_torch(rng):
    x = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    got = adaptive_avg_pool(jnp.asarray(x), (8, 8))
    want = TF.adaptive_avg_pool2d(nchw(x), (8, 8))
    np.testing.assert_allclose(np.asarray(got), nhwc(want), rtol=1e-5, atol=1e-6)


def test_warp_resize_matches_torch(rng):
    """Pool to the corr grid, warp, bilinear-upsample back
    (reference encoder_col.py:116-131)."""
    grid = 8
    fea = rng.standard_normal((1, 32, 32, 4)).astype(np.float32)
    corr = rng.random((1, grid * grid, grid * grid)).astype(np.float32)
    got = warp_resize(jnp.asarray(fea), jnp.asarray(corr))
    pooled = TF.adaptive_avg_pool2d(nchw(fea), (grid, grid))
    flat = pooled.reshape(1, 4, -1).permute(0, 2, 1)
    warped = torch.bmm(torch.from_numpy(corr), flat).permute(0, 2, 1)
    warped = warped.view(1, 4, grid, grid)
    want = TF.interpolate(warped, scale_factor=4, mode="bilinear")
    np.testing.assert_allclose(np.asarray(got), nhwc(want), rtol=1e-3, atol=1e-4)


def test_resize_bilinear_matches_torch_up_and_down(rng):
    """resize_bilinear must track F.interpolate(mode='bilinear',
    align_corners=False) in BOTH directions — torch does NOT antialias
    on downscale (reference generator.py:274-277 downsizes the last
    feature tap this way), and the exact-2x case equals 2x2 mean."""
    from ppst_tpu.ops.corr import resize_bilinear

    x = rng.standard_normal((2, 32, 32, 5)).astype(np.float32)
    for out in [(64, 64), (16, 16), (8, 8), (48, 48), (20, 12)]:
        got = resize_bilinear(jnp.asarray(x), out)
        want = TF.interpolate(nchw(x), size=out, mode="bilinear",
                              align_corners=False)
        np.testing.assert_allclose(
            np.asarray(got), nhwc(want), rtol=1e-4, atol=1e-5,
            err_msg=f"out={out}",
        )
