from ppst_tpu.models.config import PPSTConfig
from ppst_tpu.models.encoder_con import ContentEncoder
from ppst_tpu.models.encoder_col import ColorEncoder, E2Output
from ppst_tpu.models.generator import Generator
from ppst_tpu.models.discriminator import Discriminator

__all__ = [
    "PPSTConfig",
    "ContentEncoder",
    "ColorEncoder",
    "E2Output",
    "Generator",
    "Discriminator",
]
