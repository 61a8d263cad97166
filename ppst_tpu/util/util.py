"""General utilities (live subset of reference util/util.py)."""

from __future__ import annotations

import argparse
import importlib
import os
from typing import Dict

import numpy as np


def str2bool(v):
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError("Boolean value expected.")


def normalize(v, eps: float = 1e-12):
    """L2-normalize over the last axis (style vectors)."""
    import jax.numpy as jnp

    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v / jnp.maximum(n, eps)


def lerp(a, b, r):
    """Texture-code interpolation (reference util/util.py:32-35); works on
    single arrays or (nested) lists of style vectors."""
    if isinstance(a, (list, tuple)):
        return type(a)(lerp(x, y, r) for x, y in zip(a, b))
    return a * (1 - r) + b * r


def tensor2im(x, tile: bool = False):
    """NHWC float [-1,1] -> uint8 HWC numpy (batch preserved)."""
    x = np.asarray(x)
    x = np.clip((x + 1.0) * 127.5, 0, 255).astype(np.uint8)
    if tile:
        return tile_images(x)
    return x


def tile_images(imgs, picturesPerRow: int = 4):
    """(B,H,W,C) -> one tiled image."""
    b = imgs.shape[0]
    rows = []
    for i in range(0, b, picturesPerRow):
        row = imgs[i : i + picturesPerRow]
        if row.shape[0] < picturesPerRow:
            pad = np.zeros(
                (picturesPerRow - row.shape[0],) + row.shape[1:], row.dtype
            )
            row = np.concatenate([row, pad], 0)
        rows.append(np.concatenate(list(row), axis=1))
    return np.concatenate(rows, axis=0)


def save_image(img: np.ndarray, path: str):
    from PIL import Image

    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(img).save(path)


def mkdirs(paths):
    if isinstance(paths, (list, tuple)):
        for p in paths:
            os.makedirs(p, exist_ok=True)
    else:
        os.makedirs(paths, exist_ok=True)


def find_class_in_module(target_cls_name: str, module_name: str):
    """Case/underscore-insensitive class lookup (the reference's plugin
    idiom, util/util.py:61-71)."""
    target = target_cls_name.replace("_", "").lower()
    module = importlib.import_module(module_name)
    for name, cls in vars(module).items():
        if name.lower() == target and isinstance(cls, type):
            return cls
    raise ValueError(f"class {target_cls_name} not found in {module_name}")


def to_numpy(metrics: Dict):
    return {k: np.asarray(v) for k, v in metrics.items()}


def copyconf(default_opt, **kwargs):
    import copy

    conf = copy.copy(default_opt)
    for k, v in kwargs.items():
        setattr(conf, k, v)
    return conf


def visualize_spatial_code(sp):
    """PCA the structure code to 3 channels for snapshots
    (reference util/util.py:231-255). sp is NHWC numpy/jax."""
    sp = np.asarray(sp)
    b, h, w, c = sp.shape
    flat = sp.reshape(-1, c)
    flat = flat - flat.mean(0)
    # top-3 principal directions via SVD of the covariance
    _, _, vt = np.linalg.svd(flat, full_matrices=False)
    proj = flat @ vt[:3].T
    lo, hi = proj.min(0), proj.max(0)
    proj = (proj - lo) / np.maximum(hi - lo, 1e-8) * 2.0 - 1.0
    return proj.reshape(b, h, w, 3)


def print_architecture(net_name: str, params, verbose: bool = True):
    """Startup parameter-count printout, format-compatible with the
    reference's BaseNetwork.print_architecture (reference
    models/networks/base_network.py:13-28, called from
    models/networks/__init__.py:47-48 on rank 0 at network creation)."""
    import jax

    result = "-------------------%s---------------------\n" % net_name
    total = 0
    for child, sub in sorted(params.items()) if isinstance(params, dict) else []:
        n = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(sub))
        total += n
        if verbose:
            result += "%s: %3.3fM\n" % (child, n / 1e6)
            if isinstance(sub, dict):
                for gname, gsub in sorted(sub.items()):
                    gn = sum(
                        int(np.prod(l.shape)) for l in jax.tree.leaves(gsub)
                    )
                    result += "\t%s: %3.3fM\n" % (gname, gn / 1e6)
    result += (
        "[Network %s] Total number of parameters : %.3f M\n"
        % (net_name, total / 1e6)
    )
    result += "-----------------------------------------------\n"
    print(result)
