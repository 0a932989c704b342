from gigagan_tpu.models.conditioning import StyleNetwork, TextEncoder
from gigagan_tpu.models.discriminator import (
    Discriminator,
    Predictor,
    SimpleDecoder,
)
from gigagan_tpu.models.generator import BaseGenerator, Generator
from gigagan_tpu.models import layers

__all__ = [
    "StyleNetwork",
    "TextEncoder",
    "Discriminator",
    "Predictor",
    "SimpleDecoder",
    "BaseGenerator",
    "Generator",
    "layers",
]
