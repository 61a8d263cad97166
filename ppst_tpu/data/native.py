"""ctypes bindings for the native data-layer library (native/ppst_io.cpp).

The loader uses these kernels (GIL-free, OpenMP-parallel) when
``native/libppst_io.so`` has been built (``native/build.sh``); otherwise
it falls back to the pure PIL/numpy pipeline.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "libppst_io.so",
)

_lib: Optional[ctypes.CDLL] = None


def _load():
    global _lib
    if _lib is None and os.path.exists(_LIB_PATH):
        lib = ctypes.CDLL(_LIB_PATH)
        u8 = ctypes.POINTER(ctypes.c_uint8)
        f32 = ctypes.POINTER(ctypes.c_float)
        i = ctypes.c_int
        lib.resize_bilinear_u8.argtypes = [u8, i, i, i, u8, i, i]
        lib.resize_nearest_u8.argtypes = [u8, i, i, i, u8, i, i]
        lib.u8_to_pm1_f32.argtypes = [u8, i, i, i, i, f32]
        lib.labels_to_onehot_f32.argtypes = [u8, i, i, i, i, f32]
        _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _u8p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _f32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def resize_u8(img: np.ndarray, out_hw, nearest: bool = False) -> np.ndarray:
    lib = _load()
    img = np.ascontiguousarray(img)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    oh, ow = out_hw
    if (oh, ow) == (h, w):
        return img
    out = np.empty((oh, ow, c), np.uint8)
    fn = lib.resize_nearest_u8 if nearest else lib.resize_bilinear_u8
    fn(_u8p(img), h, w, c, _u8p(out), oh, ow)
    return out


def to_pm1(img: np.ndarray, flip: bool = False) -> np.ndarray:
    lib = _load()
    img = np.ascontiguousarray(img)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    out = np.empty((h, w, c), np.float32)
    lib.u8_to_pm1_f32(_u8p(img), h, w, c, int(flip), _f32p(out))
    return out


def one_hot_mask(labels: np.ndarray, num_classes: int, flip: bool = False):
    lib = _load()
    labels = np.ascontiguousarray(labels)
    h, w = labels.shape
    out = np.empty((h, w, num_classes), np.float32)
    lib.labels_to_onehot_f32(_u8p(labels), h, w, num_classes, int(flip), _f32p(out))
    return out
