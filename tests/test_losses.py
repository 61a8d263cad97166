"""Loss primitives: LSGAN, RSCL loss/enqueue semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from ppst_tpu.models.losses import (
    QUEUE_SIZE,
    enqueue_schedule,
    gan_loss,
    init_rscl_state,
    rscl_enqueue,
    rscl_loss,
    rscl_loss_sharded,
)


def test_gan_loss_values():
    pred = jnp.asarray([[0.0], [1.0]])
    np.testing.assert_allclose(float(gan_loss(pred, True)), 0.5)
    np.testing.assert_allclose(float(gan_loss(pred, False)), 0.5)


def test_rscl_state_normalized():
    st = init_rscl_state(jax.random.PRNGKey(0))
    assert st["queues"].shape == (4, 2048, QUEUE_SIZE)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(st["queues"]), axis=1), 1.0, rtol=1e-5
    )


def test_rscl_loss_prefers_aligned_keys(rng):
    q = jnp.asarray(rng.standard_normal((6, 2048)).astype(np.float32))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    queue = jnp.asarray(rng.standard_normal((2048, QUEUE_SIZE)).astype(np.float32))
    queue = queue / jnp.linalg.norm(queue, axis=0, keepdims=True)
    k0 = jnp.asarray(rng.standard_normal((6, 2048)).astype(np.float32))
    aligned = float(rscl_loss(q, q, k0, queue, 0.07))  # positives == queries
    misaligned = float(rscl_loss(q, -q, k0, queue, 0.07))
    assert aligned < misaligned


def test_rscl_loss_matches_torch_oracle(rng):
    """Logit-level parity with the reference rsclLoss forward
    (rscl.py:42-65): [l_pos | in-batch block | queue+k0 negatives] / T,
    cross-entropy on index 0. The in-batch block is constant -10 there
    because the eye(1) diagonal mask broadcasts over the whole matrix."""
    import torch
    import torch.nn.functional as TF

    n, k = 6, QUEUE_SIZE
    q = rng.standard_normal((n, 2048)).astype(np.float32)
    kk = rng.standard_normal((n, 2048)).astype(np.float32)
    k0 = rng.standard_normal((n, 2048)).astype(np.float32)
    queue = rng.standard_normal((2048, k)).astype(np.float32)

    tq, tk, tk0, tqueue = map(torch.from_numpy, (q, kk, k0, queue))
    l_pos = (tq * tk).sum(-1, keepdim=True)
    negs = torch.cat([tqueue, tk0.t()], dim=1)
    l_neg2 = tq @ negs
    l_neg1 = torch.full((n, n), -10.0)
    logits = torch.cat([l_pos, l_neg1, l_neg2], dim=1) / 0.07
    want = TF.cross_entropy(logits, torch.zeros(n, dtype=torch.long))

    got = rscl_loss(
        jnp.asarray(q), jnp.asarray(kk), jnp.asarray(k0), jnp.asarray(queue), 0.07
    )
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_rscl_loss_sharded_matches_flat_single_device(rng):
    """n_dev=1: the (3, B, C) stacked form must equal the reference-shaped
    flat rscl_loss on the region-concatenated (3B, C) tensors."""
    b = 4
    q = rng.standard_normal((3, b, 2048)).astype(np.float32)
    k = rng.standard_normal((3, b, 2048)).astype(np.float32)
    k0 = rng.standard_normal((3, b, 2048)).astype(np.float32)
    queue = rng.standard_normal((2048, QUEUE_SIZE)).astype(np.float32)
    flat = rscl_loss(
        jnp.asarray(q.reshape(-1, 2048)),
        jnp.asarray(k.reshape(-1, 2048)),
        jnp.asarray(k0.reshape(-1, 2048)),
        jnp.asarray(queue),
        0.07,
    )
    sharded = rscl_loss_sharded(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(k0), jnp.asarray(queue),
        0.07, n_dev=1,
    )
    np.testing.assert_allclose(float(sharded), float(flat), rtol=1e-5)


def test_rscl_loss_sharded_multi_device_per_rank_semantics(rng):
    """n_dev=2: must equal the mean of per-rank flat losses, each rank
    using only ITS local 3*B_local rows as explicit-key negatives (the
    reference's DDP behavior: rscl.py:42-65 gets pre-gather local
    tensors)."""
    b, n_dev = 4, 2
    per = b // n_dev
    q = rng.standard_normal((3, b, 2048)).astype(np.float32)
    k = rng.standard_normal((3, b, 2048)).astype(np.float32)
    k0 = rng.standard_normal((3, b, 2048)).astype(np.float32)
    queue = rng.standard_normal((2048, QUEUE_SIZE)).astype(np.float32)
    rank_losses = []
    for d in range(n_dev):
        sl = slice(d * per, (d + 1) * per)
        rank_losses.append(
            float(
                rscl_loss(
                    jnp.asarray(q[:, sl].reshape(-1, 2048)),
                    jnp.asarray(k[:, sl].reshape(-1, 2048)),
                    jnp.asarray(k0[:, sl].reshape(-1, 2048)),
                    jnp.asarray(queue),
                    0.07,
                )
            )
        )
    sharded = rscl_loss_sharded(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(k0), jnp.asarray(queue),
        0.07, n_dev=n_dev,
    )
    np.testing.assert_allclose(float(sharded), np.mean(rank_losses), rtol=1e-5)


def test_enqueue_schedule_single_device():
    regions, samples = enqueue_schedule(batch_global=2, n_dev=1)
    # reference order: key0 rows 0,1,2 then keyw rows 0,1,2 of the
    # (3B, 2048) region-major stack; B=2 -> (r0,s0),(r0,s1),(r1,s0)
    assert list(regions) == [0, 0, 1, 0, 0, 1]
    assert list(samples) == [0, 1, 0, 0, 1, 0]


def test_enqueue_schedule_multi_device():
    regions, samples = enqueue_schedule(batch_global=8, n_dev=4)  # B_local=2
    # call r gathers row r of each device: global samples d*2 + r%2
    assert list(samples[:4]) == [0, 2, 4, 6]  # r=0
    assert list(samples[4:8]) == [1, 3, 5, 7]  # r=1
    assert list(regions[8:12]) == [1, 1, 1, 1]  # r=2 -> region 1, sample 0
    assert list(samples[8:12]) == [0, 2, 4, 6]


def test_rscl_enqueue_ring(rng):
    st = init_rscl_state(jax.random.PRNGKey(0))
    key0 = jnp.asarray(rng.standard_normal((3, 2, 2048)).astype(np.float32))
    keyw = jnp.asarray(rng.standard_normal((3, 2, 2048)).astype(np.float32))
    st2 = rscl_enqueue(st, 1, key0, keyw, n_dev=1)
    assert int(st2["ptrs"][1]) == 6
    assert int(st2["ptrs"][0]) == 0
    # first three columns of queue 1 are key0 rows (r0,s0),(r0,s1),(r1,s0)
    got = np.asarray(st2["queues"][1][:, :3])
    want = np.stack(
        [np.asarray(key0[0, 0]), np.asarray(key0[0, 1]), np.asarray(key0[1, 0])], 1
    )
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # other queues untouched
    np.testing.assert_array_equal(
        np.asarray(st2["queues"][0]), np.asarray(st["queues"][0])
    )
    # wraparound: repeated enqueues cycle mod 128
    for _ in range(25):
        st2 = rscl_enqueue(st2, 1, key0, keyw, n_dev=1)
    assert int(st2["ptrs"][1]) == (6 * 26) % QUEUE_SIZE
