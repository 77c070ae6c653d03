from stylerenderer_tpu.models.discriminator import Discriminator
from stylerenderer_tpu.models.generator import (
    Generator,
    GeneratorWithMap,
    MappingNetwork,
    StyledConv,
    StyledMapConv,
    ToRGB,
    channel_table,
)
from stylerenderer_tpu.models.regressor import Regressor

__all__ = [
    "Discriminator",
    "Generator",
    "GeneratorWithMap",
    "MappingNetwork",
    "Regressor",
    "StyledConv",
    "StyledMapConv",
    "ToRGB",
    "channel_table",
]
