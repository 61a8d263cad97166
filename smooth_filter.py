"""PIL-level smooth_filter API (parity with reference smooth_filter.py's
``smooth_filter(initImg, contentImg, f_radius, f_edge)`` wrapper; the
computation runs in-graph on TPU via ppst_tpu.ops.smooth_filter)."""

from __future__ import annotations

import numpy as np
from PIL import Image

from ppst_tpu.ops.smooth_filter import smooth_local_affine


def smooth_filter(initImg, contentImg, f_radius: int = 15, f_edge: float = 1e-1):
    """initImg: stylized output (path or PIL). contentImg: content image
    (path or PIL). Returns the smoothed PIL image."""
    if isinstance(initImg, str):
        initImg = Image.open(initImg).convert("RGB")
    if isinstance(contentImg, str):
        contentImg = Image.open(contentImg).convert("RGB")
    w, h = initImg.size
    contentImg = contentImg.resize((w, h))
    stylized = np.asarray(initImg, np.float32)[None] / 255.0
    content = np.asarray(contentImg, np.float32)[None] / 255.0
    out = np.asarray(
        smooth_local_affine(stylized, content, f_radius=f_radius, f_edge=f_edge)
    )[0]
    return Image.fromarray(np.uint8(np.clip(out * 255.0, 0, 255)))
