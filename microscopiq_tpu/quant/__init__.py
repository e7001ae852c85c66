"""Calibration layer: GPTQ engine, quantizer configs, VQ quantizer."""

from .gptq import GPTQ  # noqa: F401
from .quantizer import (  # noqa: F401
    MXQuantizer,
    UniformQuantizer,
    quantize_uniform,
)
