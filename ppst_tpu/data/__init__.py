"""Data package: dataset registry + loader.

Registry idiom parity with reference data/__init__.py:19-49
(``--dataset_mode foo`` -> module ``foo_dataset`` -> class
``FooDataset``). The loader replaces torch's DataLoader/DistributedSampler
with a thread-pool prefetcher producing global numpy batches; under a
device mesh the train step shards the leading axis, so per-shard batches
correspond to the reference's per-GPU ``batch_size / num_gpus`` slices
(data/dataset wrapper at data/__init__.py:114-121)."""

from __future__ import annotations

import importlib
import queue
import random
import threading
from typing import Dict, List

import numpy as np

from ppst_tpu.data.base_dataset import BaseDataset


def find_dataset_using_name(dataset_name: str):
    module = importlib.import_module(
        f"ppst_tpu.data.{dataset_name.lower()}_dataset"
    )
    target = dataset_name.replace("_", "") + "dataset"
    for name, cls in vars(module).items():
        if name.lower() == target.lower() and issubclass(cls, BaseDataset):
            return cls
    raise NotImplementedError(
        f"no BaseDataset subclass matching {dataset_name!r} in ppst_tpu.data"
    )


def get_option_setter(dataset_name: str):
    return find_dataset_using_name(dataset_name).modify_commandline_options


def create_dataset(opt):
    return ConfigurableDataLoader(opt)


def _collate(items: List[Dict]) -> Dict:
    out: Dict = {}
    for key in items[0]:
        vals = [it[key] for it in items]
        if isinstance(vals[0], np.ndarray):
            out[key] = np.stack(vals, 0)
        else:
            out[key] = vals
    return out


class ConfigurableDataLoader:
    """Phase-switchable loader with background prefetch
    (capability parity with reference ConfigurableDataLoader,
    data/__init__.py:90-149: infinite re-iteration with per-epoch
    reshuffle for train, single pass otherwise)."""

    PREFETCH = 2

    def __init__(self, opt):
        self.opt = opt
        self.initialize(opt.phase)

    def initialize(self, phase: str):
        opt = self.opt
        self.phase = phase
        import ppst_tpu.util.util as uu

        dataset_cls = find_dataset_using_name(opt.dataset_mode)
        self.underlying_dataset = dataset_cls(
            uu.copyconf(opt, phase=phase, isTrain=phase == "train")
        )
        self.repeat = phase == "train"
        if phase == "train":
            self.shuffle = True
        else:
            self.shuffle = (
                getattr(opt, "shuffle_dataset", None) == "true"
            )
        self.batch_size = opt.batch_size
        # Multi-process (multi-host) training: each process loads only its
        # contiguous slice of every global batch — the DistributedSampler
        # semantics of reference data/__init__.py:106,114-121 (per-rank
        # batch = batch_size / world). The shuffle RNG is seeded by epoch
        # only, so all processes agree on the global index order.
        # parallel.mesh.shard_batch assembles the global jax.Array from
        # these per-process slices.
        self.num_shards, self.shard_rank = 1, 0
        if phase == "train":
            try:
                import jax

                self.num_shards = jax.process_count()
                self.shard_rank = jax.process_index()
            except Exception:
                pass
        if self.batch_size % self.num_shards != 0:
            raise ValueError(
                f"batch_size {self.batch_size} must be divisible by the "
                f"process count {self.num_shards}"
            )
        self.length = len(self.underlying_dataset)
        self.epoch = 0
        self._start_epoch()
        print(
            f"dataset [{type(self.underlying_dataset).__name__}] of size "
            f"{self.length} was created. shuffled={self.shuffle}"
        )

    def set_phase(self, target_phase: str):
        if self.phase != target_phase:
            self._stop_worker()
            self.initialize(target_phase)

    # -- iteration -------------------------------------------------------

    def _epoch_indices(self) -> List[int]:
        idx = list(range(self.length))
        if self.shuffle:
            random.Random(1000 + self.epoch).shuffle(idx)
        return idx

    def _start_epoch(self):
        self._stop_worker()
        if hasattr(self.underlying_dataset, "set_epoch"):
            self.underlying_dataset.set_epoch(self.epoch)
        self._queue: queue.Queue = queue.Queue(maxsize=self.PREFETCH)
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._produce, daemon=True)
        self._worker.start()

    def _produce(self):
        idx = self._epoch_indices()
        n = len(idx)
        bs = self.batch_size
        end = (n // bs) * bs if self.repeat else n
        per = bs // self.num_shards
        lo = self.shard_rank * per
        # --nThreads (reference data/__init__.py:114-121 num_workers):
        # per-item load+decode fans out over a thread pool; PIL decode
        # and the native C++ IO kernels release the GIL, so threads (not
        # processes) suffice to feed the chip. Batch order and content
        # are IDENTICAL to the serial path: executor.map preserves
        # order, and item augmentations draw from per-item RNGs
        # (BaseDataset.item_rng), never from shared call-order state.
        n_threads = max(1, int(getattr(self.opt, "nThreads", 1) or 1))
        pool = None
        if n_threads > 1:
            from concurrent.futures import ThreadPoolExecutor

            pool = ThreadPoolExecutor(max_workers=n_threads)
        try:
            ds = self.underlying_dataset
            for i in range(0, end, bs):
                if self._stop.is_set():
                    return
                take = idx[i + lo : i + lo + per] if self.num_shards > 1 \
                    else idx[i : i + bs]
                if pool is not None:
                    items = list(pool.map(ds.__getitem__, take))
                else:
                    items = [ds[j] for j in take]
                self._queue.put(_collate(items))
        finally:
            if pool is not None:
                pool.shutdown(wait=False)
            self._queue.put(None)  # end-of-epoch sentinel

    def _stop_worker(self):
        if getattr(self, "_worker", None) is not None and self._worker.is_alive():
            self._stop.set()
            try:
                while True:
                    self._queue.get_nowait()
            except queue.Empty:
                pass
            self._worker.join(timeout=5)
        self._worker = None

    def __iter__(self):
        if not self.repeat:
            self._start_epoch()
        return self

    def __len__(self):
        return self.length

    def __next__(self):
        batch = self._queue.get()
        if batch is None:
            if self.repeat:
                self.epoch += 1
                self._start_epoch()
                return self.__next__()
            raise StopIteration
        return batch
