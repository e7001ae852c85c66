"""MX-quantized convolutions and pooling.

Parity targets: ``number_system/mx/convolution.py`` (Conv1d/2d/3d),
``mx/transpose_convolution.py`` (ConvTranspose2d),
``mx/adaptive_avg_pooling.py`` (AdaptiveAvgPool2d).

Layout follows the reference's torch convention: (N, C, *spatial) inputs,
(O, I, *kernel) weights. Input and weight are elemwise-quantized, then
MX-quantized along the contraction (input-channel) axis, convolved via
``lax.conv_general_dilated``, and the output elemwise-quantized.
Gradients pass straight through the quantizers (STE).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import flax.linen as fnn
import jax
import jax.numpy as jnp
from jax import lax

from ..specs import MxSpecs
from .functional import ste_elemwise, ste_mx


def _tuple(v, n):
    return (v,) * n if isinstance(v, int) else tuple(v)


def _conv_nd(x, w, stride, padding, dilation, groups, nd,
             mx_specs: Optional[MxSpecs], transpose: bool = False):
    if mx_specs is not None:
        x = ste_elemwise(x, mx_specs, mx_specs["round_output"])
        w = ste_elemwise(w, mx_specs, mx_specs["round_weight"])
        # quantize along the input-channel (contraction) axis
        x = ste_mx(x, mx_specs, mx_specs["a_elem_format"], (1,),
                   mx_specs["round_mx_output"])
        w = ste_mx(w, mx_specs, mx_specs["w_elem_format"], (1,),
                   mx_specs["round_mx_output"])

    stride = _tuple(stride, nd)
    dilation = _tuple(dilation, nd)
    if isinstance(padding, int):
        padding = [(padding, padding)] * nd
    elif isinstance(padding, (tuple, list)) and padding and \
            isinstance(padding[0], int):
        padding = [(p, p) for p in padding]

    dn_in = "N" + "C" + "DHW"[-nd:]
    dn_k = "OI" + "DHW"[-nd:]
    dn = lax.conv_dimension_numbers(x.shape, w.shape, (dn_in, dn_k, dn_in))
    if transpose:
        out = lax.conv_transpose(x, jnp.swapaxes(w, 0, 1), stride, padding,
                                 rhs_dilation=dilation, dimension_numbers=dn,
                                 transpose_kernel=True)
    else:
        out = lax.conv_general_dilated(
            x, w, stride, padding, rhs_dilation=dilation,
            dimension_numbers=dn, feature_group_count=groups)
    if mx_specs is not None:
        out = ste_elemwise(out, mx_specs, mx_specs["round_output"])
    return out


def conv1d(x, w, bias=None, stride=1, padding=0, dilation=1, groups=1,
           mx_specs: Optional[MxSpecs] = None):
    out = _conv_nd(x, w, stride, padding, dilation, groups, 1, mx_specs)
    if bias is not None:
        b = (ste_elemwise(bias, mx_specs, mx_specs["round_weight"])
             if mx_specs is not None else bias)
        out = out + b[None, :, None]
        if mx_specs is not None:
            out = ste_elemwise(out, mx_specs, mx_specs["round_output"])
    return out


def conv2d(x, w, bias=None, stride=1, padding=0, dilation=1, groups=1,
           mx_specs: Optional[MxSpecs] = None):
    out = _conv_nd(x, w, stride, padding, dilation, groups, 2, mx_specs)
    if bias is not None:
        b = (ste_elemwise(bias, mx_specs, mx_specs["round_weight"])
             if mx_specs is not None else bias)
        out = out + b[None, :, None, None]
        if mx_specs is not None:
            out = ste_elemwise(out, mx_specs, mx_specs["round_output"])
    return out


def conv3d(x, w, bias=None, stride=1, padding=0, dilation=1, groups=1,
           mx_specs: Optional[MxSpecs] = None):
    out = _conv_nd(x, w, stride, padding, dilation, groups, 3, mx_specs)
    if bias is not None:
        b = (ste_elemwise(bias, mx_specs, mx_specs["round_weight"])
             if mx_specs is not None else bias)
        out = out + b[None, :, None, None, None]
        if mx_specs is not None:
            out = ste_elemwise(out, mx_specs, mx_specs["round_output"])
    return out


def conv_transpose2d(x, w, bias=None, stride=1, padding=0, dilation=1,
                     mx_specs: Optional[MxSpecs] = None):
    """w: (I, O, kH, kW) torch ConvTranspose convention."""
    out = _conv_nd(x, jnp.swapaxes(w, 0, 1), stride, padding, dilation, 1, 2,
                   mx_specs, transpose=True)
    if bias is not None:
        out = out + bias[None, :, None, None]
        if mx_specs is not None:
            out = ste_elemwise(out, mx_specs, mx_specs["round_output"])
    return out


def adaptive_avg_pool2d(x, output_size: Union[int, Tuple[int, int]],
                        mx_specs: Optional[MxSpecs] = None):
    """Reference: mx/adaptive_avg_pooling.py — quantized mean pooling."""
    oh, ow = _tuple(output_size, 2)
    N, C, H, W = x.shape
    assert H % oh == 0 and W % ow == 0, \
        "adaptive pooling requires divisible sizes"
    if mx_specs is not None:
        x = ste_elemwise(x, mx_specs, mx_specs["round_output"])
    out = x.reshape(N, C, oh, H // oh, ow, W // ow).mean(axis=(3, 5))
    if mx_specs is not None:
        out = ste_elemwise(out, mx_specs, mx_specs["round_output"])
    return out


class Conv2d(fnn.Module):
    """Module wrapper (reference: mx/convolution.py Conv2d)."""

    in_features: int
    out_features: int
    kernel_size: Union[int, Tuple[int, int]]
    stride: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int]] = 0
    dilation: Union[int, Tuple[int, int]] = 1
    groups: int = 1
    use_bias: bool = True
    mx_specs: Optional[MxSpecs] = None

    @fnn.compact
    def __call__(self, x):
        kh, kw = _tuple(self.kernel_size, 2)
        w = self.param("kernel", fnn.initializers.lecun_normal(),
                       (self.out_features, self.in_features // self.groups,
                        kh, kw))
        b = (self.param("bias", fnn.initializers.zeros, (self.out_features,))
             if self.use_bias else None)
        return conv2d(x, w, b, self.stride, self.padding, self.dilation,
                      self.groups, self.mx_specs)
