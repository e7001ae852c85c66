"""MX nn-layer library (the reference's number_system/mx layer zoo,
re-expressed as JAX functions + flax modules with STE custom-VJPs)."""

from .activations import (  # noqa: F401
    GELU, LeakyReLU, ReLU, ReLU6, Sigmoid, SiLU, Tanh,
    gelu, leaky_relu, relu, relu6, sigmoid, silu, tanh,
)
from .conv import (  # noqa: F401
    Conv2d, adaptive_avg_pool2d, conv1d, conv2d, conv3d, conv_transpose2d,
)
from .functional import ste_elemwise, ste_mx, ste_mx_outlier  # noqa: F401
from .linear import (  # noqa: F401
    MXLinear, QuantizedLinear, bmm, linear, matmul, mx_linear,
)
from .mapping import (  # noqa: F401
    find_linear_params, fuse_projections, mx_op_table, pack_params,
    quantize_params,
)
from .norms import BatchNorm, GroupNorm, LayerNorm, RMSNorm  # noqa: F401
from .rnn import LSTM, LSTMCell  # noqa: F401
from .simd_ops import (  # noqa: F401
    simd_add, simd_div, simd_exp, simd_log, simd_mul, simd_norm,
    simd_reduce_mean, simd_reduce_sum, simd_split, simd_sqrt, simd_square,
    simd_sub,
)
from .softmax import Softmax, softmax  # noqa: F401
from .vector_ops import (  # noqa: F401
    vec_div, vec_exp, vec_exp2, vec_recip, vec_sqrt, vec_tanh,
)
