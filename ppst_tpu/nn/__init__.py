from ppst_tpu.nn.layers import (
    EqualConv2d,
    EqualLinear,
    EqualizedConv2d,
    EqualizedLinear,
    ConvLayer,
    ResBlock,
    StyleMod,
    LayerEpilogue,
    NoiseInjection,
    StyledConv,
    ToRGB,
    PReLU,
    TorchConv2d,
    instance_norm,
    pixel_norm,
)
from ppst_tpu.nn.discriminator_core import StyleGAN2DiscriminatorCore
