"""Packed single-file image datasets.

Capability parity with the reference's LMDB tooling
(data/dataset_tools.py: images -> LMDB; the reference's default
``--dataset_mode lmdb`` dataset file is missing from its repo —
SURVEY.md 0.1-4). ``lmdb`` is not in this image, so the primary format is
a self-contained ``.pak``: a JSON index (key -> offset/length) followed
by concatenated encoded image blobs. When the ``lmdb`` module IS
importable, the same API reads/writes LMDB directories transparently.
"""

from __future__ import annotations

import json
import os
import struct
from typing import Dict, List

MAGIC = b"PPSTPAK1"


def write_pack(path: str, items):
    """``items``: iterable of (key, bytes). Writes index + blobs."""
    index: Dict[str, List[int]] = {}
    blob_parts = []
    offset = 0
    for key, data in items:
        index[key] = [offset, len(data)]
        blob_parts.append(data)
        offset += len(data)
    index_bytes = json.dumps(index).encode()
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<Q", len(index_bytes)))
        f.write(index_bytes)
        for part in blob_parts:
            f.write(part)


class PackReader:
    def __init__(self, path: str):
        self.path = path
        with open(path, "rb") as f:
            magic = f.read(8)
            assert magic == MAGIC, f"{path} is not a ppst pack"
            (n,) = struct.unpack("<Q", f.read(8))
            self.index = json.loads(f.read(n))
            self.data_start = 16 + n
        self.keys = sorted(self.index)

    def __len__(self):
        return len(self.keys)

    def get(self, key: str) -> bytes:
        off, ln = self.index[key]
        with open(self.path, "rb") as f:
            f.seek(self.data_start + off)
            return f.read(ln)


def open_reader(path: str):
    """Open a .pak file or (if lmdb is importable) an LMDB directory."""
    if os.path.isdir(path):
        import lmdb  # optional dependency

        class _LmdbReader:
            def __init__(self, d):
                self.env = lmdb.open(
                    d, readonly=True, lock=False, readahead=False
                )
                with self.env.begin() as txn:
                    self.keys = sorted(
                        k.decode() for k, _ in txn.cursor() if not k.startswith(b"__")
                    )

            def __len__(self):
                return len(self.keys)

            def get(self, key):
                with self.env.begin() as txn:
                    return txn.get(key.encode())

        return _LmdbReader(path)
    return PackReader(path)
