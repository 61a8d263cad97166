"""CelebAMask-HQ mask aggregation tool: 19-category per-part annotation
PNGs -> single 3-class masks {0: background, 1: face/skin/etc, 2: hair/hat}
(capability parity with reference g_mask.py; rewritten as a proper CLI
with PIL instead of hard-coded paths + OpenCV).

Usage:
  python g_mask.py --anno_dir .../CelebAMask-HQ-mask-anno \\
                   --out_dir  .../CelebAMask-HQ-img-mask-3 \\
                   [--num_images 30000] [--size 512]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
from PIL import Image

# part -> aggregated class, in the reference's label_list overlay order
# (reference g_mask.py:8-28): parts later in the dict overwrite earlier
# ones where they overlap, so ear_r/neck_l/neck/cloth (class 1) must come
# AFTER hair/hat (class 2) to reproduce the same 3-class masks.
LABEL_MAP = {
    "skin": 1, "nose": 1, "eye_g": 1, "l_eye": 1, "r_eye": 1,
    "l_brow": 1, "r_brow": 1, "l_ear": 1, "r_ear": 1, "mouth": 1,
    "u_lip": 1, "l_lip": 1, "hair": 2, "hat": 2,
    "ear_r": 1, "neck_l": 1, "neck": 1, "cloth": 1,
}


def aggregate_one(anno_dir: str, index: int, size: int = 512) -> np.ndarray:
    """Merge the per-part binary masks of image ``index`` into one
    3-class mask. CelebAMask-HQ groups 2000 images per annotation folder."""
    folder = str(index // 2000)
    base = np.zeros((size, size), np.uint8)
    for label, cls in LABEL_MAP.items():
        path = os.path.join(anno_dir, folder, f"{index:05d}_{label}.png")
        if os.path.exists(path):
            part = np.asarray(Image.open(path).convert("L"))
            base[part != 0] = cls
    return base


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--anno_dir", required=True)
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--num_images", type=int, default=30000)
    ap.add_argument("--size", type=int, default=512)
    args = ap.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    for k in range(args.num_images):
        mask = aggregate_one(args.anno_dir, k, args.size)
        out = os.path.join(args.out_dir, f"{k}.png")
        Image.fromarray(mask, mode="L").save(out)
        if k % 100 == 0:
            print(out)


if __name__ == "__main__":
    main()
