from ppst_tpu.ops.upfirdn2d import (
    upfirdn2d,
    make_kernel,
    blur,
    upsample2d,
    downsample2d,
)
from ppst_tpu.ops.fused_act import fused_leaky_relu, scaled_leaky_relu
from ppst_tpu.ops.corr import rselfcorr, corrm, warp
from ppst_tpu.ops.guided_filter import guided_filter

__all__ = [
    "upfirdn2d",
    "make_kernel",
    "blur",
    "upsample2d",
    "downsample2d",
    "fused_leaky_relu",
    "scaled_leaky_relu",
    "rselfcorr",
    "corrm",
    "warp",
    "guided_filter",
]
