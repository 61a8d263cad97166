"""E1: content (structure) encoder.

Architecture parity with reference models/networks/encoder_con.py:12-92
(StyleGAN2ResnetEncodercon): FromRGB 1x1 -> N downsampling ResBlocks
(reflection pad, instance norm, antialias blur) -> two 1x1 convs ->
structure code (B, H/2^N, W/2^N, spatial_code_ch).

The reference's dead members (mlp_01, addcoords, CoordWarpNet, gap —
see SURVEY.md section 2.10) are intentionally not rebuilt.
"""

from __future__ import annotations

import flax.linen as nn

from ppst_tpu.models.config import PPSTConfig
from ppst_tpu.nn.layers import ConvLayer, ResBlock


class ContentEncoder(nn.Module):
    cfg: PPSTConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        y = ConvLayer(cfg.nc_e1(0), 1, name="from_rgb")(x)
        for i in range(cfg.netE_num_downsampling_sp):
            y = ResBlock(
                cfg.nc_e1(i + 1),
                blur_kernel=cfg.e_blur_kernel,
                reflection_pad=True,
                norm="in",
                name=f"down{2 ** i}",
            )(y)
        nch = cfg.nc_e1(cfg.netE_num_downsampling_sp)
        y = ConvLayer(nch, 1, activate=True, use_bias=True, norm="in", name="to_sp0")(y)
        y = ConvLayer(
            cfg.spatial_code_ch,
            1,
            activate=False,
            use_bias=True,
            norm="in",
            name="to_sp1",
        )(y)
        return y
