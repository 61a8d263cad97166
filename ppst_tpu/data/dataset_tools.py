"""Dataset packaging CLI (capability parity with reference
data/dataset_tools.py): re-encode an image folder into a single-file
``.pak`` (or LMDB when the lmdb module is available).

Usage:
  python -m ppst_tpu.data.dataset_tools --input <image_dir> \\
         --output <out.pak | lmdb_dir> [--format pak|lmdb]
"""

from __future__ import annotations

import argparse
import io
import os

from PIL import Image

from ppst_tpu.data.image_folder import make_dataset
from ppst_tpu.data.packed import write_pack


def images_to_pack(input_dir: str, output: str):
    paths = sorted(make_dataset(input_dir))
    print(f'Packing {len(paths)} images into "{output}"')

    def items():
        for idx, path in enumerate(paths):
            if idx % 50 == 0:
                print(f"{idx}\r", end="", flush=True)
            img = Image.open(path).convert("RGB")
            buf = io.BytesIO()
            img.save(buf, format="PNG")
            yield os.path.relpath(path, input_dir), buf.getvalue()

    write_pack(output, items())


def images_to_lmdb(input_dir: str, output: str):
    import lmdb

    paths = sorted(make_dataset(input_dir))
    os.makedirs(output, exist_ok=True)
    env = lmdb.open(output, map_size=1 << 40)
    with env.begin(write=True) as txn:
        for idx, path in enumerate(paths):
            if idx % 50 == 0:
                print(f"{idx}\r", end="", flush=True)
            img = Image.open(path).convert("RGB")
            buf = io.BytesIO()
            img.save(buf, format="PNG")
            txn.put(os.path.relpath(path, input_dir).encode(), buf.getvalue())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--format", choices=("pak", "lmdb"), default="pak")
    args = ap.parse_args()
    if args.format == "lmdb":
        images_to_lmdb(args.input, args.output)
    else:
        images_to_pack(args.input, args.output)


if __name__ == "__main__":
    main()
