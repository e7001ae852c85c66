"""Quantization ops: element-wise codecs, MX block quant, outlier quant,
bit-packing, and the Pallas fused kernels."""

from .elemwise import (  # noqa: F401
    floor_log2,
    exp2_exact,
    quantize_elemwise_core,
    quantize_elemwise,
    quantize_bfloat,
    quantize_fp,
    quantize_elemwise_op,
)
from .mx import (  # noqa: F401
    reshape_to_blocks,
    undo_reshape_to_blocks,
    shared_exponents,
    quantize_mx,
    quantize_mx_op,
)
from .outlier import (  # noqa: F401
    extract_outlier_indices,
    quantize_mx_outlier_hessian,
    quantize_mx_outlier_v1,
    quantize_mx_outlier_op_v1,
    quantize_mx_outlier_op,
)
