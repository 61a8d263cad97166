"""Single-file / LMDB-backed image dataset (``--dataset_mode lmdb``).

The reference defaults to ``--dataset_mode lmdb`` but ships no
``lmdb_dataset.py`` (SURVEY.md 0.1-4); this completes the capability.
``--dataroot`` points at a ``.pak`` file (ppst_tpu.data.packed) or an
LMDB directory (when the lmdb module is available)."""

from __future__ import annotations

import io
import random

from PIL import Image

from ppst_tpu.data.base_dataset import (
    BaseDataset,
    apply_transform,
    sample_transform_params,
    to_tensor,
)
from ppst_tpu.data.packed import open_reader


class LMDBDataset(BaseDataset):
    def __init__(self, opt):
        super().__init__(opt)
        self.reader = open_reader(opt.dataroot)
        self.rng = random.Random(getattr(opt, "seed", 0))

    def __len__(self):
        return len(self.reader)

    def __getitem__(self, index):
        key = self.reader.keys[index % len(self)]
        img = Image.open(io.BytesIO(self.reader.get(key))).convert("RGB")
        params = sample_transform_params(self.opt, img.size, self.rng)
        img = apply_transform(self.opt, img, params)
        return {"real_A": to_tensor(img), "path_A": key}
