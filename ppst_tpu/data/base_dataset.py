"""Dataset base class + preprocessing pipeline.

Transform semantics mirror reference data/base_dataset.py:85-153:
``--preprocess`` is keyword-matched (fixsize / resize / scale_width /
scale_shortside / scale_longside / zoom / centercrop / crop / patch /
trim), every image is then snapped to a multiple of 16, train-time
horizontal flip, and conversion to float32 NHWC in [-1, 1].

Unlike the reference — whose image and mask transforms draw independent
randomness so RandomCrop/flip desynchronize (SURVEY.md 2.7) — all random
decisions are sampled once per item into a ``params`` dict and shared by
every tensor of that item.
"""

from __future__ import annotations

import random
from abc import ABC, abstractmethod

import numpy as np
from PIL import Image

BICUBIC = Image.BICUBIC


class BaseDataset(ABC):
    def __init__(self, opt):
        self.opt = opt
        self.epoch = 0
        self.seed = getattr(opt, "seed", 0)

    def set_epoch(self, epoch: int):
        """Per-epoch augmentation stream (DistributedSampler-style);
        called by ConfigurableDataLoader."""
        self.epoch = epoch

    def item_rng(self, index: int) -> random.Random:
        """Per-(seed, epoch, item) RNG: augmentation draws depend only on
        the item identity, never on loader call ORDER — which makes the
        multi-threaded loader (--nThreads) bit-identical to the serial
        one, and per-process loading identical to global loading under
        multi-host (the reference's shared-Random draws are call-order-
        dependent, so its num_workers>0 batches are not reproducible)."""
        return random.Random(
            ((self.seed * 1000003) + self.epoch) * 1000003 + index
        )

    @staticmethod
    def modify_commandline_options(parser, is_train):
        return parser

    @abstractmethod
    def __len__(self):
        ...

    @abstractmethod
    def __getitem__(self, index):
        ...


def sample_transform_params(opt, image_size, rng: random.Random):
    """Draw all stochastic choices once so paired tensors transform
    identically."""
    w, h = image_size
    params = {"flip": False, "crop_pos": None, "zoom": None}
    if getattr(opt, "isTrain", False) and not getattr(opt, "no_flip", False):
        params["flip"] = rng.random() < 0.5
    if "zoom" in opt.preprocess:
        params["zoom"] = (rng.uniform(0.8, 1.0), rng.uniform(0.8, 1.0))
    if "crop" in opt.preprocess and "centercrop" not in opt.preprocess:
        params["crop_pos"] = (rng.random(), rng.random())  # relative; resolved later
    return params


def _scale_shortside(img, target, method):
    w, h = img.size
    s = min(w, h)
    if s == target:
        return img
    r = target / s
    return img.resize((round(w * r), round(h * r)), method)


def _scale_longside(img, target, method):
    w, h = img.size
    s = max(w, h)
    if s == target:
        return img
    r = target / s
    return img.resize((round(w * r), round(h * r)), method)


def _scale_width(img, target, method):
    w, h = img.size
    if w == target:
        return img
    return img.resize((target, round(h * target / w)), method)


def _make_power_2(img, base=16, method=BICUBIC):
    w, h = img.size
    nw, nh = round(w / base) * base, round(h / base) * base
    if (nw, nh) == (w, h):
        return img
    return img.resize((nw, nh), method)


def apply_transform(opt, img: Image.Image, params=None, method=BICUBIC):
    """PIL -> PIL through the configured geometric pipeline."""
    p = opt.preprocess
    if "fixsize" in p:
        img = img.resize((opt.load_size, opt.crop_size), method)
    if "resize" in p:
        img = img.resize((opt.load_size, opt.load_size), method)
    elif "scale_width" in p:
        img = _scale_width(img, opt.load_size, method)
    elif "scale_shortside" in p:
        img = _scale_shortside(img, opt.load_size, method)
    elif "scale_longside" in p:
        img = _scale_longside(img, opt.load_size, method)

    if "zoom" in p and params and params.get("zoom"):
        zw, zh = params["zoom"]
        w, h = img.size
        img = img.resize((max(opt.crop_size, round(w * zw)),
                          max(opt.crop_size, round(h * zh))), method)

    if "centercrop" in p:
        w, h = img.size
        c = opt.crop_size
        left, top = (w - c) // 2, (h - c) // 2
        img = img.crop((left, top, left + c, top + c))
    elif "crop" in p:
        w, h = img.size
        c = opt.crop_size
        if params and params.get("crop_pos") is not None:
            rx, ry = params["crop_pos"]
            left, top = int(rx * max(w - c, 0)), int(ry * max(h - c, 0))
        else:
            left, top = max(w - c, 0) // 2, max(h - c, 0) // 2
        img = img.crop((left, top, left + c, top + c))

    if "trim" in p:
        w, h = img.size
        c = opt.crop_size
        img = img.crop(((w - min(w, c)) // 2, (h - min(h, c)) // 2,
                        (w + min(w, c)) // 2, (h + min(h, c)) // 2))

    img = _make_power_2(img, 16, method)

    if params and params.get("flip"):
        img = img.transpose(Image.FLIP_LEFT_RIGHT)
    return img


def to_tensor(img: Image.Image, normalize=True) -> np.ndarray:
    """PIL -> float32 HWC; RGB in [-1,1] when normalized."""
    arr = np.asarray(img, dtype=np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if normalize:
        arr = (arr - 0.5) * 2.0
    return arr


def get_transform(opt, params=None, grayscale=False, method=BICUBIC, convert=True):
    """Callable parity helper matching the reference's get_transform."""

    def run(img):
        if grayscale and img.mode != "L":
            img = img.convert("L")
        img = apply_transform(opt, img, params, method)
        if convert:
            return to_tensor(img)
        return img

    return run
