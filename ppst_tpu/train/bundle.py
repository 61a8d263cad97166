"""ModelBundle: model + params + mutable state + checkpointing.

This is the functional replacement for the reference's
``models.create_model`` -> ``MultiGPUModelWrapper`` (reference
models/__init__.py:57-91) and BaseModel's checkpoint save/load
(models/base_model.py:33-112): instead of a DDP-wrapped nn.Module, a
bundle of pytrees plus a mesh.

Checkpoint scheme keeps the reference's naming for CLI parity:
``<steps//1000>k_checkpoint.msgpack`` + a ``latest_checkpoint.msgpack``
symlink under ``<checkpoints_dir>/<name>/``. Unlike the reference, the
optimizer state IS saved (the reference silently restarts Adam moments on
resume — SURVEY.md 5.4 flags this as a fidelity gap to fix).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from ppst_tpu.models.config import PPSTConfig
from ppst_tpu.parallel.mesh import (
    host_value,
    make_mesh,
    replicate_tree,
    replicated_sharding,
)


class ModelBundle:
    def __init__(self, opt, cfg: Optional[PPSTConfig] = None):
        from ppst_tpu.models import find_model_using_name

        self.opt = opt
        self.cfg = cfg or PPSTConfig.from_options(opt)
        model_cls = find_model_using_name(getattr(opt, "model", "ppst"))
        self.model = model_cls(self.cfg)
        self.mesh = make_mesh(getattr(opt, "num_gpus", None) or None)
        self.rng = jax.random.PRNGKey(getattr(opt, "seed", 0))
        self.rng, init_key = jax.random.split(self.rng)
        with jax.default_device(jax.local_devices()[0]):
            self.params, self.state = self.model.init(init_key, self.cfg.crop_size)
        self.opt_states: Optional[Dict[str, Any]] = None  # set by the optimizer
        if jax.process_index() == 0:
            # startup param-count printout (reference base_network.py:13-28,
            # printed at network creation via networks/__init__.py:47-48)
            from ppst_tpu.util.util import print_architecture

            for key in ("E1", "E2", "G", "D"):
                net = {"E1": "e1", "E2": "e2", "G": "g", "D": "d"}[key]
                print_architecture(
                    type(getattr(self.model, net, None)).__name__
                    if getattr(self.model, net, None) is not None else key,
                    self.params.get(key, {}),
                    verbose=getattr(opt, "verbose", False),
                )

    # -- rng ------------------------------------------------------------

    def next_rng(self):
        self.rng, k = jax.random.split(self.rng)
        return k

    # -- checkpoint -----------------------------------------------------

    @property
    def save_dir(self) -> str:
        return os.path.join(self.opt.checkpoints_dir, self.opt.name)

    def _ckpt_payload(self) -> Dict[str, Any]:
        payload = {"params": self.params, "state": self.state}
        if self.opt_states is not None:
            payload["opt_states"] = self.opt_states
        return payload

    def _write_checkpoint(self, payload, steps: int):
        os.makedirs(self.save_dir, exist_ok=True)
        name = f"{steps // 1000}k_checkpoint.msgpack"
        path = os.path.join(self.save_dir, name)
        data = jax.tree.map(np.asarray, payload)  # no-op if already on host
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(serialization.to_bytes(data))
        os.replace(tmp, path)  # atomic save (SURVEY.md 5.3)
        latest = os.path.join(self.save_dir, "latest_checkpoint.msgpack")
        if os.path.islink(latest) or os.path.exists(latest):
            os.remove(latest)
        os.symlink(name, latest)
        print(f"Saved checkpoint at {path}")

    @staticmethod
    def _snapshot_leaf(a):
        """Fresh device buffer holding the leaf's (replicated) value —
        multi-process-safe: non-fully-addressable replicated arrays are
        snapshotted through a local addressable shard."""
        if isinstance(a, jax.Array) and not a.is_fully_addressable:
            return a.addressable_shards[0].data.copy()
        return a.copy() if isinstance(a, jax.Array) else a

    def save(self, steps: int, blocking: bool = True):
        """Checkpoint. With ``blocking=False`` the training thread only
        snapshots the payload into FRESH device buffers (an O(device
        memcpy) `.copy()` per leaf — immune to the train steps' buffer
        donation deleting the originals); the slow device->host fetch
        through the relay AND serialization + disk IO all run on the
        background thread. One save in flight at a time; writer failures
        are re-raised at the next join/save.

        Multi-process: only process 0 writes (reference train.py:43-44
        rank-gates saves); params/state/opt are replicated, so its local
        shards carry the full values. No collectives run here, so the
        other processes simply skip."""
        self.join_pending_save()
        if jax.process_index() != 0:
            return
        if blocking:
            payload = jax.tree.map(host_value, self._ckpt_payload())
            self._write_checkpoint(payload, steps)
            return
        snap = jax.tree.map(self._snapshot_leaf, self._ckpt_payload())
        import threading

        def _write():
            try:
                payload = jax.tree.map(np.asarray, jax.device_get(snap))
                self._write_checkpoint(payload, steps)
            except BaseException as e:  # surfaced by join_pending_save
                self._save_error = e

        t = threading.Thread(target=_write, daemon=True)
        t.start()
        self._save_thread = t

    def join_pending_save(self):
        t = getattr(self, "_save_thread", None)
        if t is not None and t.is_alive():
            t.join()
        self._save_thread = None
        err = getattr(self, "_save_error", None)
        if err is not None:
            self._save_error = None
            raise RuntimeError("async checkpoint save failed") from err

    def load(self, resume_iter: str = "latest", pretrained_name: Optional[str] = None):
        """Tolerant load (reference base_model.py:43-112): entries whose
        path/shape do not match current params are skipped with a warning;
        at test time D weights are skipped like the reference (:61)."""
        load_dir = self.save_dir
        if pretrained_name:
            load_dir = os.path.join(self.opt.checkpoints_dir, pretrained_name)
        if resume_iter == "latest":
            name = "latest_checkpoint.msgpack"
        else:
            name = f"{resume_iter.replace('k', '')}k_checkpoint.msgpack"
        path = os.path.join(load_dir, name)
        with open(path, "rb") as f:
            raw = serialization.msgpack_restore(f.read())

        skip_d = not getattr(self.opt, "isTrain", True)

        def merge(cur, new, prefix=""):
            if isinstance(cur, dict):
                return {
                    k: merge(v, new.get(k) if isinstance(new, dict) else None,
                             f"{prefix}/{k}")
                    for k, v in cur.items()
                }
            if new is None:
                print(f"[load] missing {prefix}, keeping initialization")
                return cur
            new = jnp.asarray(new)
            if cur is not None and hasattr(cur, "shape") and cur.shape != new.shape:
                print(f"[load] shape mismatch at {prefix}: "
                      f"{cur.shape} vs {new.shape}, keeping initialization")
                return cur
            return new

        payload = self._ckpt_payload()
        for key in ("params", "state"):
            if key not in raw:
                continue
            if key == "params" and skip_d:
                raw[key].pop("D", None)
            merged = merge(payload[key], raw[key], key)
            if key == "params":
                self.params = merged
            else:
                self.state = merged
        # optax states are tuples/namedtuples; they cannot go through the
        # tolerant dict merge. Stash the raw tree; the optimizer restores
        # it against its freshly-built structure (restore_opt_states).
        self._pending_opt_states = raw.get("opt_states")
        print(f"Loaded checkpoint from {path}")

    def restore_opt_states(self):
        """Called by the optimizer after building opt_states: restores the
        Adam moments saved in the checkpoint (the reference silently
        restarts them on resume — SURVEY.md 5.4)."""
        pending = getattr(self, "_pending_opt_states", None)
        if pending is None or self.opt_states is None:
            return False
        try:
            self.opt_states = serialization.from_state_dict(
                self.opt_states, pending
            )
            print("[load] optimizer state restored")
            return True
        except Exception as e:  # tolerate structure drift across versions
            print(f"[load] could not restore optimizer state ({e}); "
                  "restarting moments")
            return False

    def replicate(self):
        """Place params/state on the mesh (replicated; multi-process-safe
        via parallel.mesh.replicate_tree)."""
        self.params = replicate_tree(self.mesh, self.params)
        self.state = replicate_tree(self.mesh, self.state)
        if self.opt_states is not None:
            self.opt_states = replicate_tree(self.mesh, self.opt_states)

    # ------------------------------------------------------------------
    # jitted inference API (reference ppst_model.py:264-315 command verbs)
    # ------------------------------------------------------------------

    def _jit(self, name, fn):
        cache = self.__dict__.setdefault("_jit_cache", {})
        if name not in cache:
            cache[name] = jax.jit(fn)
        return cache[name]

    def encode(self, image):
        fn = self._jit("encode", lambda p, x: self.model.encode(p, x))
        return fn(self.params, jnp.asarray(image))

    def extract_feat_from_image(self, image):
        fn = self._jit(
            "extract",
            lambda p, x, r: self.model.extract_feat_from_image(p, x, r),
        )
        return fn(self.params, jnp.asarray(image), self.next_rng())

    def rselfcorr(self, fea1):
        from ppst_tpu.ops.corr import rselfcorr

        return self._jit("rselfcorr", rselfcorr)(fea1)

    def corrm(self, fea, fea0):
        return self._jit("corrm", self.model.corrm)(fea, fea0)

    def encode2(self, image, corrmatrix, corr_out_hw=None):
        def fn(p, x, c):
            out = self.model.e2.apply(
                {"params": p["E2"]}, x, corrmatrix=c, corr_out_hw=corr_out_hw
            )
            return out.vectors, out.vectors_w

        return self._jit(f"encode2{corr_out_hw}", fn)(
            self.params, jnp.asarray(image), corrmatrix
        )

    def grid_extract(self, images):
        """Extraction stage of amortized grid serving (one batched pass
        per image set; see PPSTModel.grid_extract)."""
        fn = self._jit(
            "grid_extract",
            lambda p, x, r: self.model.grid_extract(p, x, r),
        )
        return fn(self.params, jnp.asarray(images), self.next_rng())

    def grid_pairs(self, content_bank, style_bank, ci, si, smooth_target=None):
        """Pair stage of amortized grid serving: stylize the batch of
        (ci[k], si[k]) pairs from precomputed banks — per pair only
        corrm + style warp + decode run (see PPSTModel.grid_pairs)."""
        ci = jnp.asarray(ci, jnp.int32)
        si = jnp.asarray(si, jnp.int32)
        if smooth_target is None:
            fn = self._jit(
                "grid_pairs",
                lambda p, cb, sb, i, j, r: self.model.grid_pairs(
                    p, cb, sb, i, j, r
                ),
            )
            return fn(self.params, content_bank, style_bank, ci, si,
                      self.next_rng())
        fn = self._jit(
            "grid_pairs_smooth",
            lambda p, cb, sb, i, j, r, t: self.model.grid_pairs(
                p, cb, sb, i, j, r, smooth_target=t
            ),
        )
        return fn(self.params, content_bank, style_bank, ci, si,
                  self.next_rng(), jnp.asarray(smooth_target))

    def to_uint8(self, images):
        """Device-side [-1,1] float -> uint8 (tensor2im's math); keeps
        the relay fetch 4x smaller for serving rows."""
        fn = self._jit(
            "to_uint8",
            lambda x: jnp.clip(
                (x.astype(jnp.float32) + 1.0) * 127.5, 0, 255
            ).astype(jnp.uint8),
        )
        return fn(images)

    def decode(self, sp, gl, target=None):
        if target is None:
            fn = self._jit(
                "decode", lambda p, s, g, r: self.model.decode(p, s, g, r)
            )
            return fn(self.params, sp, tuple(gl), self.next_rng())
        fn = self._jit(
            "decode_smooth",
            lambda p, s, g, r, t: self.model.decode(p, s, g, r, target=t),
        )
        return fn(self.params, sp, tuple(gl), self.next_rng(), jnp.asarray(target))


def create_model(opt) -> ModelBundle:
    bundle = ModelBundle(opt)
    is_train = getattr(opt, "isTrain", True)
    if (not is_train) or getattr(opt, "continue_train", False):
        try:
            bundle.load(
                getattr(opt, "resume_iter", "latest"),
                getattr(opt, "pretrained_name", None),
            )
        except FileNotFoundError as e:
            if is_train:
                print(f"[load] {e}; starting from scratch")
            else:
                raise
    return bundle
