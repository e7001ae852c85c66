"""microscopiq_tpu — TPU-native outlier-aware microscaling quantization.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
MicroScopiQ reference implementation (ISCA 2025): MX block formats with
shared power-of-two scales, two-level outlier-aware quantization with
GPTQ prune-and-redistribute calibration, GEAR-style quantized KV caches,
posit codecs, and a quantized-inference runtime with fused dequant-matmul
Pallas kernels sharded over TPU meshes.
"""

__version__ = "0.1.0"

from .formats import (  # noqa: F401
    ElemFormat,
    FormatParams,
    RoundingMode,
    FP32_EXPONENT_BIAS,
    FP32_MIN_NORMAL,
    get_format_params,
)
