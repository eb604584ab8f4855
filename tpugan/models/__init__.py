from tpugan.models.stylegan1 import (
    StyleGANv1Generator,
    StyleGANv1Mapping,
    StyleGANv1Discriminator,
    truncation_coefs,
)
from tpugan.models.stylegan2 import StyleGAN2Generator
from tpugan.models.pggan import PGGANGenerator, PGGANDiscriminator
from tpugan.models.biggan import BigGAN, BigGANConfig, BigGANGenerator
from tpugan.models.encoders import (
    Encoder,
    PGEncoder,
    BigGANEncoder,
)

__all__ = [
    "StyleGANv1Generator",
    "StyleGANv1Mapping",
    "StyleGANv1Discriminator",
    "truncation_coefs",
    "StyleGAN2Generator",
    "PGGANGenerator",
    "PGGANDiscriminator",
    "BigGAN",
    "BigGANConfig",
    "BigGANGenerator",
    "Encoder",
    "PGEncoder",
    "BigGANEncoder",
]
