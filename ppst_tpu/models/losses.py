"""Loss primitives: LSGAN loss and the RSCL style-contrastive loss.

References: models/networks/loss.py:11-18 (gan_loss, least-squares form)
and networks/rscl.py:17-90 (rsclLoss, MoCo-style queues).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def gan_loss(pred, should_be_classified_as_real: bool):
    """Least-squares GAN loss (reference loss.py:11-18). Reduction in
    float32 regardless of the compute dtype."""
    pred = pred.astype(jnp.float32)
    if should_be_classified_as_real:
        return jnp.mean((pred - 1.0) ** 2)
    return jnp.mean(pred**2)


def l1_loss(a, b):
    return jnp.mean(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))


# ---------------------------------------------------------------------------
# RSCL
# ---------------------------------------------------------------------------

QUEUE_SIZE = 128
NUM_QUEUES = 4
CODE_DIM = 2048


def init_rscl_state(rng, code_dim: int = CODE_DIM,
                    queue_size: int = QUEUE_SIZE) -> dict:
    """4 per-scale queues of 128 column-normalized 2048-d keys + ring
    pointers (reference rscl.py:23-40). ``code_dim``/``queue_size`` track
    the config's style_dim for slimmed configs (defaults match the
    reference)."""
    keys = jax.random.split(rng, NUM_QUEUES)
    queues = []
    for k in keys:
        q = jax.random.normal(k, (code_dim, queue_size), jnp.float32)
        q = q / jnp.linalg.norm(q, axis=0, keepdims=True)
        queues.append(q)
    return {
        "queues": jnp.stack(queues),  # (4, 2048, 128)
        "ptrs": jnp.zeros((NUM_QUEUES,), jnp.int32),
    }


def rscl_loss(feat_q, feat_k, feat_k0, queue, nce_T: float):
    """InfoNCE with queue + explicit-key negatives
    (reference rscl.py:42-65).

    The reference also appends an "in-batch negatives" block, but its
    diagonal mask — ``eye(1)`` broadcast over the whole matrix
    (rscl.py:58-59) — fills every entry with -10, so the block is a
    constant; it is reproduced as such for logit-level parity (its softmax
    contribution is ~e^-143).
    """
    n = feat_q.shape[0]
    # logits and softmax in f32 (bf16-compute-mode stability; the queue
    # is stored f32 already)
    feat_q = feat_q.astype(jnp.float32)
    feat_k = feat_k.astype(jnp.float32)
    feat_k0 = feat_k0.astype(jnp.float32)
    l_pos = jnp.sum(feat_q * feat_k, axis=-1, keepdims=True)  # (N, 1)
    negs = jnp.concatenate([queue.astype(jnp.float32), feat_k0.T], axis=1)
    l_neg2 = feat_q @ negs  # (N, K + N0)
    l_neg1 = jnp.full((n, n), -10.0, feat_q.dtype)
    logits = jnp.concatenate([l_pos, l_neg1, l_neg2], axis=1) / nce_T
    return -jnp.mean(jax.nn.log_softmax(logits, axis=-1)[:, 0])


def rscl_loss_sharded(feat_q, feat_k, feat_k0, queue, nce_T: float,
                      n_dev: int = 1):
    """Per-rank RSCL loss over region-major stacks, data-parallel faithful.

    ``feat_q``/``feat_k``/``feat_k0`` are (3, B_global, C) stacks of the
    three region projections. The reference computes the loss per GPU
    with that rank's LOCAL (3*B_local, C) rows — so the explicit-key
    negatives for a query are the rank's own 3*B_local keys, not the
    global batch (rscl.py:42-65 receives pre-DDP local tensors). This
    reproduces exactly that: rows are regrouped per shard and the
    k0-negative block is a shard-batched matmul. Under a 'data'-sharded
    batch every op here is shard-local (no collective-permute storms
    from concatenating along the sharded axis), and the final mean over
    equal-size shards equals DDP's mean-of-rank-means.

    For n_dev=1 this is numerically identical to ``rscl_loss`` on the
    region-concatenated (3B, C) tensors.
    """
    r, b, c = feat_q.shape
    per = b // n_dev

    def shard_fmt(x):
        # (3, B, C) -> (n_dev, per, 3, C); the transpose keeps the
        # sharded batch dim intact, the reshape splits it per shard
        return (
            x.astype(jnp.float32)
            .transpose(1, 0, 2)
            .reshape(n_dev, per, r, c)
        )

    q, k, k0 = map(shard_fmt, (feat_q, feat_k, feat_k0))
    n_local = per * r
    l_pos = jnp.sum(q * k, axis=-1, keepdims=True)  # (d, per, r, 1)
    l_queue = jnp.einsum("dprc,cn->dprn", q, queue.astype(jnp.float32))
    l_k0 = jnp.einsum("dprc,dqsc->dprqs", q, k0).reshape(
        n_dev, per, r, n_local
    )
    l_neg1 = jnp.full((n_dev, per, r, n_local), -10.0, jnp.float32)
    # reference column order: [pos | in-batch const | queue | k0]
    logits = jnp.concatenate([l_pos, l_neg1, l_queue, l_k0], axis=-1) / nce_T
    return -jnp.mean(jax.nn.log_softmax(logits, axis=-1)[..., 0])


def enqueue_schedule(batch_global: int, n_dev: int):
    """Static (region, sample) index pairs reproducing the reference's six
    sequential single-key enqueues per scale under data parallelism
    (reference ppst_model.py:214-219 + rscl.py:67-69 concat_all_gather).

    Per device, ``key0``/``keyw`` are (3*B_local, 2048) region-major
    stacks; the reference enqueues local rows 0..2 of each, and every
    enqueue all-gathers one row per device. In global terms row r of
    device d is (region=r // B_local, sample=d*B_local + r % B_local).

    Returns two (6 * n_dev, ) numpy index arrays (regions, samples); the
    first half indexes key0 projections, the second half keyw.
    """
    b_local = batch_global // n_dev
    regions, samples = [], []
    for r in range(3):  # three enqueue calls per source tensor
        for d in range(n_dev):
            regions.append(r // b_local)
            samples.append(d * b_local + r % b_local)
    regions = regions * 2
    samples = samples * 2
    return np.asarray(regions, np.int32), np.asarray(samples, np.int32)


def rscl_enqueue(state: dict, layer: int, key0_rs, keyw_rs, n_dev: int):
    """Ring-buffer write of the step's keys for one scale.

    ``key0_rs``/``keyw_rs`` are (3, B_global, 2048) region-major stacks of
    the masked projections (detached by the caller). Equivalent to six
    sequential reference enqueues of ``n_dev`` gathered keys each.
    """
    b_global = key0_rs.shape[1]
    regions, samples = enqueue_schedule(b_global, n_dev)
    half = len(regions) // 2
    k0 = key0_rs[regions[:half], samples[:half]]  # (3*n_dev, 2048)
    kw = keyw_rs[regions[half:], samples[half:]]
    keys = jnp.concatenate([k0, kw], axis=0).astype(
        state["queues"].dtype
    )  # (6*n_dev, 2048); queue storage stays f32 in bf16 compute mode

    n = keys.shape[0]
    queue_size = state["queues"].shape[-1]
    ptr = state["ptrs"][layer]
    pos = (ptr + jnp.arange(n, dtype=jnp.int32)) % queue_size
    q = state["queues"][layer].at[:, pos].set(keys.T)
    return {
        "queues": state["queues"].at[layer].set(q),
        "ptrs": state["ptrs"].at[layer].set((ptr + n) % queue_size),
    }
