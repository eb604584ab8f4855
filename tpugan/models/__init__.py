from tpugan.models.stylegan1 import (
    StyleGANv1Generator,
    StyleGANv1Mapping,
    StyleGANv1Discriminator,
    truncation_coefs,
)
from tpugan.models.encoders import Encoder

__all__ = [
    "StyleGANv1Generator",
    "StyleGANv1Mapping",
    "StyleGANv1Discriminator",
    "truncation_coefs",
    "Encoder",
]
