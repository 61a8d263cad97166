"""CelebAMask-HQ paired image+mask dataset (reference
data/CelebAMask_dataset.py): RGB image from ``dataroot``, aggregated
3-class mask (0 bg / 1 face / 2 hair) from ``dataroot2``, one-hot to 3
channels. Image and mask share one set of random transform decisions
(fixing the reference's desynchronized flips, SURVEY.md 2.7)."""

from __future__ import annotations

import random

import numpy as np
from PIL import Image

from ppst_tpu.data.base_dataset import (
    BaseDataset,
    apply_transform,
    sample_transform_params,
    to_tensor,
)
from ppst_tpu.data.image_folder import make_dataset


class CelebAMaskDataset(BaseDataset):
    NUM_CLASSES = 3

    @staticmethod
    def modify_commandline_options(parser, is_train):
        from ppst_tpu.util.util import str2bool

        parser.add_argument(
            "--native_io", type=str2bool, default=False,
            help="use the native C++ resize/normalize/one-hot kernels "
                 "(native/libppst_io.so) for the 'resize' preprocess path",
        )
        return parser

    def __init__(self, opt):
        super().__init__(opt)
        self.A_paths = sorted(make_dataset(opt.dataroot))
        self.B_paths = sorted(make_dataset(opt.dataroot2))
        assert len(self.A_paths) == len(self.B_paths), (
            f"image/mask count mismatch: {len(self.A_paths)} vs {len(self.B_paths)}"
        )
        self.rng = random.Random(getattr(opt, "seed", 0))
        from ppst_tpu.data import native as native_io

        self.native = (
            native_io
            if getattr(opt, "native_io", False)
            and native_io.available()
            and opt.preprocess == "resize"
            else None
        )

    def __len__(self):
        return len(self.A_paths)

    def __getitem__(self, index):
        a_path = self.A_paths[index % len(self)]
        b_path = self.B_paths[index % len(self)]
        try:
            img = Image.open(a_path).convert("RGB")
            msk = Image.open(b_path).convert("L")
        except OSError as err:
            print(err)
            return self[self.item_rng(index).randrange(len(self))]

        params = sample_transform_params(self.opt, img.size,
                                         self.item_rng(index))
        if self.native is not None:
            # GIL-free C++ hot path (resize preprocess only)
            size = (self.opt.load_size, self.opt.load_size)
            flip = bool(params.get("flip"))
            a = self.native.to_pm1(
                self.native.resize_u8(np.asarray(img), size), flip=flip
            )
            labels = self.native.resize_u8(
                np.asarray(msk), size, nearest=True
            )[..., 0]
            one_hot = self.native.one_hot_mask(labels, self.NUM_CLASSES, flip=flip)
            return {"real_A": a, "mask_A": one_hot, "path_A": a_path}

        img = apply_transform(self.opt, img, params)
        msk = apply_transform(self.opt, msk, params, method=Image.NEAREST)

        a = to_tensor(img)  # (H,W,3) in [-1,1]
        labels = np.asarray(msk)
        one_hot = np.stack(
            [(labels == i).astype(np.float32) for i in range(self.NUM_CLASSES)],
            axis=-1,
        )
        return {"real_A": a, "mask_A": one_hot, "path_A": a_path}
