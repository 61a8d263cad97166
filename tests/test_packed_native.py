"""Packed dataset format + native IO kernels."""

import io
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

from ppst_tpu.data.packed import PackReader, write_pack


def test_pack_roundtrip(tmp_path, rng):
    imgs = {}
    items = []
    for i in range(4):
        arr = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        imgs[f"img{i}.png"] = arr
        items.append((f"img{i}.png", buf.getvalue()))
    pak = tmp_path / "data.pak"
    write_pack(str(pak), items)
    reader = PackReader(str(pak))
    assert len(reader) == 4
    for key, want in imgs.items():
        got = np.asarray(Image.open(io.BytesIO(reader.get(key))))
        np.testing.assert_array_equal(got, want)


def test_lmdb_dataset_mode(tmp_path, rng):
    """--dataset_mode lmdb reads .pak files through the registry."""
    items = []
    for i in range(4):
        arr = (rng.random((48, 48, 3)) * 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        items.append((f"{i}.png", buf.getvalue()))
    pak = tmp_path / "d.pak"
    write_pack(str(pak), items)

    import ppst_tpu.data as data

    class Opt:
        dataset_mode = "lmdb"
        dataroot = str(pak)
        preprocess = "resize"
        load_size = 32
        crop_size = 32
        isTrain = False
        no_flip = True
        phase = "test"
        batch_size = 2
        shuffle_dataset = None
        seed = 0

    loader = data.create_dataset(Opt())
    batch = next(loader)
    assert batch["real_A"].shape == (2, 32, 32, 3)
    loader._stop_worker()


def test_native_io_available():
    from ppst_tpu.data import native

    if not native.available():
        subprocess.run(["sh", "native/build.sh"], check=True, cwd="/root/repo")
        native._lib = None
    assert native.available()
    rng = np.random.default_rng(0)
    img = (rng.random((64, 48, 3)) * 255).astype(np.uint8)
    out = native.resize_u8(img, (32, 24))
    assert out.shape == (32, 24, 3)
    f = native.to_pm1(img, flip=True)
    np.testing.assert_allclose(f[:, ::-1], img.astype(np.float32) / 255 * 2 - 1,
                               atol=1e-6)
    lab = rng.integers(0, 3, (16, 16)).astype(np.uint8)
    oh = native.one_hot_mask(lab, 3)
    assert (oh.argmax(-1) == lab).all()
