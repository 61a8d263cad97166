"""Differentiable blockwise correspondence-warp for TRAINING at high
resolution (the VJP-capable counterpart of ops.corr_pallas).

At 1024px the correspondence grid is L=16384 and the dense (B, L, L)
matrix of ops.corr.corrm is 0.5-1 GiB per sample per matrix — the
training losses build two of them plus their backward (reference
ppst_model.py:341-364 consumed at :113-123/:166-182), which cannot fit.
This module computes ``softmax(q @ k^T / T) @ v`` in row blocks under
``jax.checkpoint`` (``lax.map`` over blocks): the full matrix never
exists, JAX autodiff recomputes each block's logits/softmax in the
backward pass, and memory is O(block x Lk) instead of O(Lq x Lk).

This is the "remat-friendly dense fallback per row block" route to a
trainable blockwise correspondence (vs hand-writing a flash-attention
backward for the Pallas kernel); the Pallas kernel remains the faster
inference path. Numerics match the dense corrm+warp composition (same
f32 normalization/softmax, same preferred_element_type accumulation).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ppst_tpu.ops.corr import _NORM_EPS


def normalize_desc(fea, split: int = 256):
    """corrm's descriptor prep on NHWC features: center the first
    ``split`` channels (the generator feature branch), L2-normalize over
    channels in f32, return (B, L, C) in the input dtype — identical to
    the normalization inside ops.corr.corrm."""
    b, h, w, c = fea.shape
    x = fea.reshape(b, h * w, c).astype(jnp.float32)
    head, tail = x[..., :split], x[..., split:]
    head = head - head.mean(axis=-1, keepdims=True)
    x = jnp.concatenate([head, tail], axis=-1)
    x = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + _NORM_EPS)
    return x.astype(fea.dtype)


def corr_warp_scan(q, k, v, temperature: float = 0.01, block: int = 512):
    """softmax(q @ k^T / T) @ v by row blocks, differentiable in q, k, v.

    Args:
      q: (B, Lq, C) pre-normalized target descriptors (corrm rows).
      k: (B, Lk, C) pre-normalized source descriptors.
      v: (B, Lk, Cv) features to warp.
    Returns (B, Lq, Cv) in v's dtype.
    """
    b, lq, c = q.shape
    cv = v.shape[-1]
    block = min(block, lq)
    if lq % block:
        block = lq  # awkward sizes: single block (small grids only)
    nb = lq // block

    def one(qblk):  # (B, block, C) -> (B, block, Cv)
        logits = jnp.einsum(
            "bic,bjc->bij", qblk, k, preferred_element_type=jnp.float32
        ) / temperature
        p = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        return jnp.einsum(
            "bij,bjd->bid", p, v, preferred_element_type=jnp.float32
        ).astype(v.dtype)

    if nb == 1:
        return one(q)
    qb = q.reshape(b, nb, block, c).transpose(1, 0, 2, 3)
    out = jax.lax.map(jax.checkpoint(one, prevent_cse=False), qb)
    return out.transpose(1, 0, 2, 3).reshape(b, lq, cv)


def warp_qk(x, q, k, out_hw=None, temperature: float = 0.01,
            block: int = 512):
    """ops.corr.warp against an implicit correspondence given by (q, k)
    descriptors: both the flat path (h*w == Lk) and the reference's
    unfold/matmul/fold block path (h*w > Lk, s x s pixel blocks move as
    units — ppst_model.py:366-387), without materializing the matrix."""
    b, h, w, c = x.shape
    lq, lk = q.shape[1], k.shape[1]
    if h * w != lk:
        assert lq == lk, "block-warp requires a square correspondence"
        s = int(round((h * w / lk) ** 0.5))
        assert s * s * lk == h * w, (
            f"warp_qk: feature grid {h}x{w} incompatible with corr {lk}"
        )
        ph, pw = h // s, w // s
        blocks = x.reshape(b, ph, s, pw, s, c)
        blocks = blocks.transpose(0, 1, 3, 2, 4, 5).reshape(
            b, ph * pw, s * s * c
        )
        out = corr_warp_scan(q, k, blocks, temperature, block)
        out = out.reshape(b, ph, pw, s, s, c).transpose(0, 1, 3, 2, 4, 5)
        return out.reshape(b, h, w, c)
    flat = x.reshape(b, h * w, c)
    out = corr_warp_scan(q, k, flat, temperature, block)
    if out_hw is None:
        g = int(round(lq**0.5))
        assert g * g == lq, "pass out_hw for non-square target grids"
        out_hw = (g, g)
    return out.reshape(b, out_hw[0], out_hw[1], c)
