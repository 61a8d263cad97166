"""Unit tests for the shard-local batch concat/split helpers that let the
training steps run their several same-shape G/D forwards as single
batched conv passes (PPSTModel.shard_concat / shard_split).

The invariant: with n_dev shards, every row stays on its device — the
concat interleaves the parts' per-device chunks rather than appending
globally. Loss equivalence of the batched step itself is covered by the
torch-oracle parity tier (tests/test_loss_parity.py) and the mesh
equivalence tier (tests/test_mesh_equivalence.py).
"""

import numpy as np
import pytest

from ppst_tpu.models.ppst import PPSTModel


def _parts(sizes, tail=(3,)):
    rng = np.random.default_rng(0)
    return [rng.standard_normal((s,) + tail).astype(np.float32) for s in sizes]


@pytest.mark.parametrize("n_dev", [1, 2, 4])
@pytest.mark.parametrize("sizes", [(8, 8), (8, 4), (8, 8, 4)])
def test_concat_split_roundtrip(n_dev, sizes):
    parts = _parts(sizes)
    cat = PPSTModel.shard_concat(parts, n_dev)
    assert cat.shape[0] == sum(sizes)
    back = PPSTModel.shard_split(cat, list(sizes), n_dev)
    for a, b in zip(parts, back):
        np.testing.assert_array_equal(np.asarray(b), a)


def test_concat_is_shard_local():
    # 2 devices, parts A (4 rows) and B (2 rows): device 0 must hold
    # [A0 A1 | B0], device 1 [A2 A3 | B1] — no cross-device rows
    a = np.arange(4, dtype=np.float32).reshape(4, 1)
    b = np.arange(10, 12, dtype=np.float32).reshape(2, 1)
    cat = np.asarray(PPSTModel.shard_concat([a, b], 2)).ravel()
    np.testing.assert_array_equal(cat, [0, 1, 10, 2, 3, 11])


def test_n_dev_1_matches_plain_concat():
    parts = _parts((4, 2, 4))
    cat = PPSTModel.shard_concat(parts, 1)
    np.testing.assert_array_equal(
        np.asarray(cat), np.concatenate(parts, axis=0)
    )
