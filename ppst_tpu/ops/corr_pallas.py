"""Blockwise fused correspondence-warp Pallas kernel.

``warp(v, corrm(fea, fea0))`` without materializing the (L, L)
correspondence matrix: a flash-attention-style online-softmax kernel with
the PPST temperature (0.01). This is the high-resolution enabler
(SURVEY.md 5.7): at 1024px the dense matrix is L=16384 -> 1 GiB fp32 per
sample per matrix, while the blockwise kernel streams K/V tiles through
VMEM with O(L) memory.

The dense path (ops.corr.corrm + warp) stays the default at 512px where
the materialized matrix is reused across multiple warps; this kernel
backs ``fused_corr_warp`` for single-use warps and the 1024px regime.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ppst_tpu.ops.corr import _NORM_EPS

DEFAULT_BQ = 512
DEFAULT_BK = 512


def _normalize_desc(x, split: int = 256):
    """corrm's descriptor prep (center first ``split`` channels, L2
    normalize) on (B, L, C)."""
    head, tail = x[..., :split], x[..., split:]
    head = head - head.mean(axis=-1, keepdims=True)
    x = jnp.concatenate([head, tail], axis=-1)
    return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + _NORM_EPS)


def _kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref, *, inv_t, nk):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0]  # (BQ, C)
    k = k_ref[0]  # (BK, C)
    v = v_ref[0]  # (BK, Cv)
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * inv_t  # (BQ, BK)

    m_prev = m_ref[:]  # (BQ, 1)
    m_cur = jnp.max(logits, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    scale = jnp.exp(m_prev - m_new)
    p = jnp.exp(logits - m_new)  # (BQ, BK)
    l_ref[:] = l_ref[:] * scale + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * scale + jnp.dot(
        p, v.astype(jnp.float32), preferred_element_type=jnp.float32
    )
    m_ref[:] = m_new

    @pl.when(j == nk - 1)
    def _():
        o_ref[0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)


def corr_warp_blockwise(
    q_desc,
    k_desc,
    values,
    temperature: float = 0.01,
    block_q: int = DEFAULT_BQ,
    block_k: int = DEFAULT_BK,
    interpret: bool | None = None,
):
    """softmax(q_desc @ k_desc^T / T) @ values, streamed.

    Args:
      q_desc: (B, Lq, C) pre-normalized target descriptors (corrm rows).
      k_desc: (B, Lk, C) pre-normalized source descriptors.
      values: (B, Lk, Cv) features to warp.
    Returns (B, Lq, Cv).
    """
    b, lq, c = q_desc.shape
    lk = k_desc.shape[1]
    cv = values.shape[-1]
    block_q = min(block_q, lq)
    block_k = min(block_k, lk)
    if lq % block_q or lk % block_k:
        # fallback: dense path for awkward sizes
        logits = jnp.einsum(
            "bic,bjc->bij", q_desc, k_desc, preferred_element_type=jnp.float32
        ) / temperature
        return jnp.einsum("bij,bjd->bid", jax.nn.softmax(logits, -1), values)

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    nq, nk = lq // block_q, lk // block_k
    kernel = functools.partial(_kernel, inv_t=1.0 / temperature, nk=nk)
    return pl.pallas_call(
        kernel,
        grid=(b, nq, nk),
        in_specs=[
            pl.BlockSpec((1, block_q, c), lambda b_, i, j: (b_, i, 0)),
            pl.BlockSpec((1, block_k, c), lambda b_, i, j: (b_, j, 0)),
            pl.BlockSpec((1, block_k, cv), lambda b_, i, j: (b_, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, cv), lambda b_, i, j: (b_, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, lq, cv), values.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, cv), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
        ],
        interpret=interpret,
    )(q_desc, k_desc, values)


def fused_corr_warp(fea, fea0, values_hw, temperature: float = 0.01, **kw):
    """End-to-end: descriptors (B, H, W, C) NHWC + values (B, H, W, Cv)
    -> warped values (B, H0, W0, Cv), equal to
    ``warp(values, corrm(fea, fea0))`` without the L x L intermediate."""
    b, h, w, c = fea.shape
    h0, w0 = fea0.shape[1], fea0.shape[2]
    q = _normalize_desc(fea0.reshape(b, h0 * w0, c))
    k = _normalize_desc(fea.reshape(b, h * w, c))
    v = values_hw.reshape(b, h * w, -1)
    out = corr_warp_blockwise(q, k, v, temperature, **kw)
    return out.reshape(b, h0, w0, -1)
