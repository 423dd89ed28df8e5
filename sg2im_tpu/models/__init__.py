"""Model composites: generator + discriminators."""

from sg2im_tpu.models.discriminators import (
    AcCropDiscriminator,
    AcDiscriminator,
    PatchDiscriminator,
)
from sg2im_tpu.models.sg2im import MaskNet, Sg2ImGenerator

__all__ = [
    "AcCropDiscriminator",
    "AcDiscriminator",
    "MaskNet",
    "PatchDiscriminator",
    "Sg2ImGenerator",
]
