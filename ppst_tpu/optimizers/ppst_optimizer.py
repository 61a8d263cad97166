"""PPSTOptimizer: host-side driver alternating the jitted D/G steps.

Parity with reference optimizers/ppst_optimizer.py:
* four Adam optimizers with the D-side lazy-R1 compensation (:36-49)
* strict 1:1 D/G alternation starting with a D step (:60-70; the
  reference's mode labels are swapped there — behavior, not labels, is
  reproduced)
* R1 every ``R1_once_every`` D-steps as a *second* D update scaled by
  R1_once_every (:116-126)
* ``train_one_step(data_i, steps)`` returning a numpy loss dict.
"""

from __future__ import annotations

from typing import Dict

import jax
import numpy as np

from ppst_tpu.models.config import PPSTConfig
from ppst_tpu.parallel.mesh import shard_batch
from ppst_tpu.train.steps import build_train_steps


class PPSTOptimizer:
    @staticmethod
    def modify_commandline_options(parser, is_train):
        parser.add_argument("--lr", default=0.001, type=float)
        parser.add_argument("--beta1", default=0.0, type=float)
        parser.add_argument("--beta2", default=0.99, type=float)
        parser.add_argument(
            "--R1_once_every", default=16, type=int,
            help="lazy R1 regularization: computed once every N D-steps",
        )
        return parser

    def __init__(self, opt, bundle):
        self.opt = opt
        self.bundle = bundle
        self.cfg: PPSTConfig = bundle.cfg
        self.train_mode_counter = 0
        self.discriminator_iter_counter = 0

        n_dev = bundle.mesh.size
        (init_opt_states, self.d_step, self.d_step_r1, self.g_step) = (
            build_train_steps(bundle.model, n_dev=n_dev, mesh=bundle.mesh)
        )
        if bundle.opt_states is None:
            bundle.opt_states = init_opt_states(bundle.params)
            bundle.restore_opt_states()  # from a loaded checkpoint, if any
        bundle.replicate()

    def prepare_images(self, data_i):
        return data_i["real_A"], data_i["mask_A"]

    def toggle_training_mode(self) -> str:
        # 1:1 alternation; first call -> discriminator (reference :60-70)
        modes = ["discriminator", "generator"]
        mode = modes[self.train_mode_counter]
        self.train_mode_counter = (self.train_mode_counter + 1) % len(modes)
        return mode

    def train_one_step(self, data_i, total_steps_so_far) -> Dict[str, float]:
        images, mask = self.prepare_images(data_i)
        images, mask = shard_batch(self.bundle.mesh, (images, mask))
        if self.toggle_training_mode() == "discriminator":
            losses = self.train_discriminator_one_step(images, mask)
        else:
            losses = self.train_generator_one_step(images, mask)
        if not losses:  # e.g. --lambda_GAN 0 skips the D step entirely
            return {}
        # one stacked transfer: fetching ~17 scalars individually costs a
        # host round trip EACH (~30 ms through the axon relay), which
        # dominated measured step time
        keys = list(losses)
        if jax.process_count() == 1:
            stacked = np.asarray(jax.numpy.stack([losses[k] for k in keys]))
        else:
            # eager ops cannot consume non-fully-addressable arrays; the
            # replicated loss scalars are read through a local shard
            from ppst_tpu.parallel.mesh import host_value

            stacked = np.asarray([host_value(losses[k]) for k in keys])
        out = dict(zip(keys, stacked))
        if getattr(self.opt, "debug_nan", False):
            bad = [k for k, v in out.items() if not np.isfinite(v).all()]
            if bad:
                raise FloatingPointError(
                    f"non-finite losses at step {total_steps_so_far}: {bad}"
                )
        return out

    def train_discriminator_one_step(self, images, mask):
        if self.cfg.lambda_GAN == 0.0:
            return {}
        self.discriminator_iter_counter += 1
        needs_r1 = (
            self.cfg.lambda_R1 > 0.0
            and self.discriminator_iter_counter % self.cfg.R1_once_every == 0
        )
        step = self.d_step_r1 if needs_r1 else self.d_step
        b = self.bundle
        b.params, b.state, b.opt_states, losses = step(
            b.params, b.state, b.opt_states, images, mask, b.next_rng()
        )
        return losses

    def train_generator_one_step(self, images, mask):
        b = self.bundle
        b.params, b.state, b.opt_states, losses = self.g_step(
            b.params, b.state, b.opt_states, images, mask, b.next_rng()
        )
        return losses

    def get_visuals_for_snapshot(self, data_i):
        images, _ = self.prepare_images(data_i)
        b = self.bundle
        # limit like the reference (ppst_model.py:238-240)
        images = jax.numpy.asarray(images[:4])
        from ppst_tpu.ops.corr import resize_bilinear
        from ppst_tpu.util.util import visualize_spatial_code

        fn = b._jit(
            "snapshot_core", lambda p, x, r: b.model.snapshot_core(p, x, r)
        )
        sp, rec, mix = fn(b.params, images, b.next_rng())
        layout = resize_bilinear(
            jax.numpy.asarray(visualize_spatial_code(sp)), images.shape[1:3]
        )
        return {"real": images, "layout": layout, "rec": rec, "mix": mix}

    def save(self, total_steps_so_far, blocking: bool = True):
        self.bundle.save(total_steps_so_far, blocking=blocking)
