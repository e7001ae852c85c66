"""Pallas TPU kernels: fused dequant-GEMM, block quantize, quantized-KV
attention. Each kernel has a pure-JAX twin for differential testing."""

from .dequant_matmul import (  # noqa: F401
    dequant_matmul,
    dequant_matmul_nb,
    dequant_matmul_nb_reference,
    dequant_matmul_outlier,
    dequant_matmul_outlier_reference,
    dequant_matmul_reference,
    dequant_matmul_sad,
)
from .mx_quant import quantize_mx_pallas  # noqa: F401
