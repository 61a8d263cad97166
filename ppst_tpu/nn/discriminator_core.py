"""StyleGAN2 discriminator pyramid (reference stylegan2_layers.py:582-649)."""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn

from ppst_tpu.nn.layers import ConvLayer, EqualLinear, ResBlock


def channel_schedule(channel_multiplier: float) -> dict:
    return {
        4: 512,
        8: 512,
        16: min(512, int(512 * channel_multiplier)),
        32: min(512, int(512 * channel_multiplier)),
        64: int(256 * channel_multiplier),
        128: int(128 * channel_multiplier),
        256: int(64 * channel_multiplier),
        512: int(32 * channel_multiplier),
        1024: int(16 * channel_multiplier),
    }


class StyleGAN2DiscriminatorCore(nn.Module):
    """Log2 pyramid of ResBlocks from image resolution down to 4x4, then a
    3x3 conv and a two-layer equalized MLP head. The reference's
    minibatch-stddev is commented out there and omitted here too."""

    size: int
    channel_multiplier: float = 2.0
    blur_kernel: Sequence[int] = (1, 3, 3, 1)

    @nn.compact
    def __call__(self, x):
        channels = channel_schedule(self.channel_multiplier)
        size = 2 ** int(round(math.log2(self.size)))
        log_size = int(math.log2(size))

        y = ConvLayer(channels[size], 1, name="from_rgb")(x)
        for i in range(log_size, 2, -1):
            y = ResBlock(
                channels[2 ** (i - 1)],
                blur_kernel=self.blur_kernel,
                name=f"res{2 ** i}",
            )(y)
        y = ConvLayer(channels[4], 3, name="final_conv")(y)

        b = y.shape[0]
        # NHWC -> match torch's NCHW flatten order (C, H, W) so converted
        # checkpoints keep the same linear-head weight layout.
        y = y.transpose(0, 3, 1, 2).reshape(b, -1)
        y = EqualLinear(channels[4], activation="fused_lrelu", name="fc0")(y)
        return EqualLinear(1, name="fc1")(y)
