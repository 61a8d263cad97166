"""D: StyleGAN2 discriminator wrapper (reference
models/networks/discriminator.py:5-31: core at 2.0 * netD_scale_capacity)."""

from __future__ import annotations

import flax.linen as nn

from ppst_tpu.models.config import PPSTConfig
from ppst_tpu.nn.discriminator_core import StyleGAN2DiscriminatorCore


class Discriminator(nn.Module):
    cfg: PPSTConfig

    @nn.compact
    def __call__(self, x):
        return StyleGAN2DiscriminatorCore(
            size=self.cfg.crop_size,
            channel_multiplier=2.0 * self.cfg.netD_scale_capacity,
            blur_kernel=self.cfg.gd_blur_kernel,
            name="core",
        )(x)
