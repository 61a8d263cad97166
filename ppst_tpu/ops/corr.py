"""Semantic correspondence ops: Rselfcorr, corrm, warp.

These are the heart of PPST (reference models/ppst_model.py:330-387): a
dense attention between content and style feature grids at 1/8 resolution,
used to warp style statistics onto the content layout.

All tensors are NHWC. The correspondence matrix ``corr`` has shape
(B, L, L) with L = H*W of the feature grid (4096 for 512px inputs);
``corr[b, i, :]`` is a softmax over source positions for target position i.

TPU notes: corrm is two (L, C)x(C, L) matmuls plus a softmax over L^2
entries — pure MXU work that XLA tiles well when materialized. For the
high-resolution regime where the L^2 matrix stops fitting, see
``ppst_tpu.ops.corr_pallas`` (blockwise flash-style softmax-matmul).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# The reference adds sys.float_info.epsilon to norms (ppst_model.py:333,357).
_NORM_EPS = np.finfo(np.float64).eps


def rselfcorr(fea, patch: int = 4):
    """Patchwise self-correlation descriptor (reference ppst_model.py:330-339).

    Splits ``fea`` (B, H, W, C) into non-overlapping ``patch x patch``
    windows; within each window, the C-dim vector at every pixel is centered
    and L2-normalized across channels, then the window's pixel-pixel cosine
    similarity Gram matrix (patch^2 x patch^2) becomes the output channels.

    Returns (B, H/patch, W/patch, patch^4); for the canonical 256x256/4
    case: (B, 64, 64, 256).
    """
    b, h, w, c = fea.shape
    ph, pw = h // patch, w // patch
    e = patch * patch
    # Centering/normalization is per-PIXEL (over channels), so it runs in
    # the natural (B, H, W, C) layout with f32 statistics (bf16-mode
    # stability). The normalized unit vectors are cast back to the
    # caller's compute dtype BEFORE the window shuffle + gram einsum: the
    # gram of unit vectors is bounded in [-1, 1], and keeping the
    # transpose+matmul in bf16 halves this op's time (0.51 -> 0.25 ms/img
    # @256^2x64, max abs diff 4e-3). float32 inputs are unchanged
    # (oracle/parity exactness).
    v = fea.astype(jnp.float32)
    v = v - v.mean(axis=-1, keepdims=True)
    v = v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + _NORM_EPS)
    v = v.astype(fea.dtype).reshape(b, ph, patch, pw, patch, c)
    v = v.transpose(0, 1, 3, 2, 4, 5).reshape(b, ph, pw, e, c)
    gram = jnp.einsum("bpqec,bpqfc->bpqef", v, v)
    return gram.reshape(b, ph, pw, e * e).astype(fea.dtype)


def corrm(fea, fea0, temperature: float = 0.01, split: int = 256):
    """Dense correspondence matrix (reference ppst_model.py:341-364).

    ``fea``/``fea0`` are (B, H, W, C) feature grids whose first ``split``
    channels (the generator feature branch) are mean-centered per position
    while the remainder (the Rselfcorr descriptor) is left as-is; both are
    then L2-normalized over channels.

    Returns softmax over the *fea* positions:
    corr[b, i, j] = softmax_j( <fea0_n[i], fea_n[j]> / temperature ),
    shape (B, L, L) with L = H*W.
    """

    in_dtype = fea.dtype

    def _norm(x):
        b, h, w, c = x.shape
        x = x.reshape(b, h * w, c).astype(jnp.float32)
        head, tail = x[..., :split], x[..., split:]
        head = head - head.mean(axis=-1, keepdims=True)
        x = jnp.concatenate([head, tail], axis=-1)
        x = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + _NORM_EPS)
        # matmul runs in the caller's compute dtype (bf16 MXU when asked);
        # accumulation stays f32 via preferred_element_type below
        return x.astype(in_dtype)

    q = _norm(fea0)  # target positions (rows)
    k = _norm(fea)  # source positions (cols)
    logits = jnp.einsum(
        "bic,bjc->bij", q, k, preferred_element_type=jnp.float32
    ) / temperature
    # softmax in f32; the result (entries in [0,1], rows sum to 1) is
    # returned in the caller's compute dtype — in bf16 mode that halves
    # the L x L matrix's HBM write and every downstream warp's read,
    # while f32 mode (parity/oracle paths) is unchanged.
    return jax.nn.softmax(logits, axis=-1).astype(in_dtype)


def warp(fea, corr, out_hw=None):
    """Attention-weighted resampling (reference ppst_model.py:366-387).

    ``fea`` is (B, h, w, C); ``corr`` is (B, Lq, Lk) with h*w == Lk (flat
    path) — or, when h*w > Lk with Lq == Lk, each image is treated as a
    grid of s x s blocks (s = sqrt(h*w/Lk)) that move as units: the block
    grid is flattened, multiplied by ``corr``, and reassembled (the
    reference's unfold/matmul/fold).

    ``out_hw`` shapes the output grid for the flat path when Lq != h*w
    (content/style grids of different sizes at inference).
    """
    b, h, w, c = fea.shape
    lq, lk = corr.shape[1], corr.shape[2]
    if h * w != lk:
        assert lq == lk, "block-warp requires a square correspondence"
        s = int(round((h * w / lk) ** 0.5))
        assert s * s * lk == h * w, (
            f"warp: feature grid {h}x{w} incompatible with corr length {lk}"
        )
        ph, pw = h // s, w // s
        blocks = fea.reshape(b, ph, s, pw, s, c)
        blocks = blocks.transpose(0, 1, 3, 2, 4, 5).reshape(b, ph * pw, s * s * c)
        out = jnp.einsum(
            "bij,bjd->bid", corr.astype(fea.dtype), blocks,
            preferred_element_type=jnp.float32,
        ).astype(fea.dtype)
        out = out.reshape(b, ph, pw, s, s, c).transpose(0, 1, 3, 2, 4, 5)
        return out.reshape(b, h, w, c)
    flat = fea.reshape(b, h * w, c)
    out = jnp.einsum(
        "bij,bjc->bic", corr.astype(fea.dtype), flat,
        preferred_element_type=jnp.float32,
    ).astype(fea.dtype)
    if out_hw is None:
        if lq == h * w:
            out_hw = (h, w)
        else:
            g = int(round(lq**0.5))
            assert g * g == lq, "pass out_hw for non-square target grids"
            out_hw = (g, g)
    return out.reshape(b, out_hw[0], out_hw[1], c)


def _pool_matrix(n_in: int, n_out: int, dtype):
    """(n_in, n_out) block-mean matrix; 1/k is exact in bfloat16 for the
    power-of-two factors used here."""
    k = n_in // n_out
    m = np.zeros((n_in, n_out), np.float32)
    for j in range(n_out):
        m[j * k : (j + 1) * k, j] = 1.0 / k
    return jnp.asarray(m, dtype)


def adaptive_avg_pool(x, out_hw):
    """Average-pool NHWC ``x`` to ``out_hw`` (must divide evenly;
    equivalent to torch adaptive_avg_pool2d in that case).

    bfloat16 inputs take a per-axis matmul form: on TPU the reshape-mean
    lowering is transpose/bandwidth-bound (~0.55 ms/img for 512^2x64 ->
    64^2) while the MXU pooling matmul runs ~7x faster AND accumulates
    in f32 (the reshape-mean path reduces in bf16). float32 inputs keep
    the reshape-mean (bit-exact parity with torch adaptive_avg_pool2d)."""
    b, h, w, c = x.shape
    oh, ow = out_hw
    assert h % oh == 0 and w % ow == 0, f"adaptive pool {h}x{w} -> {oh}x{ow}"
    if oh == h and ow == w:
        return x
    if x.dtype == jnp.bfloat16:
        y = jnp.einsum("bhwc,hH->bHwc", x, _pool_matrix(h, oh, x.dtype))
        return jnp.einsum("bHwc,wW->bHWc", y, _pool_matrix(w, ow, x.dtype))
    x = x.reshape(b, oh, h // oh, ow, w // ow, c)
    return x.mean(axis=(2, 4))


def resize_bilinear(x, out_hw):
    """Bilinear resize at half-pixel centers, matching torch
    ``F.interpolate(mode='bilinear', align_corners=False)`` — including
    its NON-antialiased downscaling (``jax.image.resize`` defaults to
    antialias=True, which widens the kernel on downscale and diverges
    from torch). An exact 2x downscale under these semantics equals 2x2
    mean pooling and takes that bandwidth-only path instead of resize's
    dense-matmul lowering."""
    b, h, w, c = x.shape
    oh, ow = out_hw
    if h == 2 * oh and w == 2 * ow:
        return adaptive_avg_pool(x, out_hw)
    return jax.image.resize(
        x, (b, oh, ow, c), method="linear", antialias=False
    )


def warp_resize(fea, corr, out_hw=None):
    """E2's warp for scales above the correspondence grid
    (reference encoder_col.py:100-131, resize=True branch): pool ``fea``
    down to the source grid (aspect-preserving, sqrt(Lk) scale), warp,
    then bilinear-upsample the target grid back by the same factor.

    ``out_hw`` is the target (content) grid; defaults to the source grid
    (the training case, where both sides share one grid)."""
    b, h, w, c = fea.shape
    lk = corr.shape[2]
    s = int(round((h * w / lk) ** 0.5))
    assert s >= 1 and (h // s) * (w // s) == lk, (
        f"warp_resize: features {h}x{w} do not pool onto corr source {lk}"
    )
    pooled = adaptive_avg_pool(fea, (h // s, w // s))
    warped = warp(pooled, corr, out_hw=out_hw)
    if s == 1:
        return warped
    oh, ow = warped.shape[1], warped.shape[2]
    return resize_bilinear(warped, (oh * s, ow * s))
