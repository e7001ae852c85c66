"""MX-quantized convolutions and pooling.

Parity targets: ``number_system/mx/convolution.py`` (Conv1d/2d/3d,
forward :120-205, backward :209-326),
``mx/transpose_convolution.py`` (ConvTranspose2d),
``mx/adaptive_avg_pooling.py`` (AdaptiveAvgPool2d).

Layout follows the reference's torch convention: (N, C, *spatial) inputs,
(O, I, *kernel) weights. Forward: input and weight elemwise-quantized,
MX-quantized along the contraction (input-channel) axis, convolved via
``lax.conv_general_dilated`` with the quantized bias added inside the
conv step, and the result elemwise-quantized once.

Backward is the reference's per-axis re-quantized scheme
(convolution.py:209-326), not plain STE: the cotangent is elemwise
re-quantized under the backwards specs, grad_weight contracts
batch-axis-MX-quantized input/cotangent, grad_input contracts
out-channel-axis-MX-quantized weight/cotangent, and each grad is
elemwise-quantized with its own rounding knob. The transposed convs the
reference hand-writes (``torch.nn.grad.conv*_input`` / ``conv_weight``)
are obtained here by transposing XLA's own conv — ``jax.vjp`` of the
raw conv applied to the *quantized* operands, which is the same bilinear
contraction without a hand-scheduled kernel.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple, Union

import flax.linen as fnn
import jax
import jax.numpy as jnp
from jax import lax

from ..ops.elemwise import quantize_elemwise_op
from ..ops.mx import quantize_mx_op
from ..specs import MxSpecs, get_backwards_mx_specs
from .functional import ste_elemwise


def _tuple(v, n):
    return (v,) * n if isinstance(v, int) else tuple(v)


def _norm_args(stride, padding, dilation, nd):
    """Normalize to hashable tuples (custom_vjp nondiff args)."""
    stride = _tuple(stride, nd)
    dilation = _tuple(dilation, nd)
    if isinstance(padding, int):
        padding = ((padding, padding),) * nd
    elif isinstance(padding, (tuple, list)) and padding and \
            isinstance(padding[0], int):
        padding = tuple((p, p) for p in padding)
    else:
        padding = tuple(tuple(p) for p in padding)
    return stride, padding, dilation


def _raw_conv(x, w, stride, padding, dilation, groups, nd, transpose):
    dn_in = "NC" + "DHW"[-nd:]
    dn_k = "OI" + "DHW"[-nd:]
    dn = lax.conv_dimension_numbers(x.shape, w.shape, (dn_in, dn_k, dn_in))
    if transpose:
        return lax.conv_transpose(x, jnp.swapaxes(w, 0, 1), stride,
                                  list(padding), rhs_dilation=dilation,
                                  dimension_numbers=dn,
                                  transpose_kernel=True)
    return lax.conv_general_dilated(
        x, w, stride, list(padding), rhs_dilation=dilation,
        dimension_numbers=dn, feature_group_count=groups)


def _bias_shape(nd):
    return (1, -1) + (1,) * nd


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9))
def mx_conv(x, w, bias, stride, padding, dilation, groups, nd, transpose,
            mx_specs: Optional[MxSpecs]):
    """Quantized N-d conv (+bias) with the reference's quantized VJP."""
    y, _ = _mx_conv_fwd(x, w, bias, stride, padding, dilation, groups, nd,
                        transpose, mx_specs)
    return y


def _mx_conv_fwd(x, w, bias, stride, padding, dilation, groups, nd,
                 transpose, mx_specs):
    has_bias = bias is not None
    if mx_specs is None:
        out = _raw_conv(x, w, stride, padding, dilation, groups, nd,
                        transpose)
        if has_bias:
            out = out + bias.reshape(_bias_shape(nd))
        return out, (x, w, has_bias)

    bf_x = quantize_elemwise_op(x, mx_specs,
                                round=mx_specs["round_output"])
    bf_w = quantize_elemwise_op(w, mx_specs,
                                round=mx_specs["round_weight"])
    bf_b = (quantize_elemwise_op(bias, mx_specs,
                                 round=mx_specs["round_weight"])
            if has_bias else None)

    # quantize along the input-channel (contraction) axis
    # (convolution.py:178-193; transpose weight already swapped to OI)
    qid_x = quantize_mx_op(bf_x, mx_specs,
                           elem_format=mx_specs["a_elem_format"], axes=[1])
    qid_w = quantize_mx_op(bf_w, mx_specs,
                           elem_format=mx_specs["w_elem_format"], axes=[1])
    out = _raw_conv(qid_x, qid_w, stride, padding, dilation, groups, nd,
                    transpose)
    if has_bias:
        out = out + bf_b.reshape(_bias_shape(nd))
    out = quantize_elemwise_op(out, mx_specs,
                               round=mx_specs["round_output"])
    res = ((bf_x, bf_w, has_bias) if mx_specs["quantize_backprop"]
           else (x, w, has_bias))
    return out, res


def _mx_conv_bwd(stride, padding, dilation, groups, nd, transpose,
                 mx_specs, res, g):
    x, w, has_bias = res
    conv = lambda x_, w_: _raw_conv(x_, w_, stride, padding, dilation,
                                    groups, nd, transpose)

    if mx_specs is None:
        _, vjp_w = jax.vjp(lambda w_: conv(x, w_), w)
        _, vjp_x = jax.vjp(lambda x_: conv(x_, w), x)
        grad_b = (g.sum(axis=(0, *range(2, g.ndim)))
                  if has_bias else None)
        return vjp_x(g)[0], vjp_w(g)[0], grad_b

    bspecs = get_backwards_mx_specs(mx_specs)
    g = quantize_elemwise_op(g, bspecs, round=bspecs["round_grad_input"])

    # grad_weight: MX-quantize input/cotangent along the batch axis
    # (convolution.py:222-257)
    qex_x = quantize_mx_op(x, bspecs,
                           elem_format=bspecs["a_elem_format"], axes=[0])
    qex_g = quantize_mx_op(g, bspecs,
                           elem_format=bspecs["a_elem_format"], axes=[0])
    _, vjp_w = jax.vjp(lambda w_: conv(qex_x, w_), w)
    grad_w = quantize_elemwise_op(vjp_w(qex_g)[0], bspecs,
                                  round=bspecs["round_grad_weight"])

    # grad_input: MX-quantize weight/cotangent along the out-channel
    # axis — the reduction dim of the transposed conv (:259-295)
    qod_w = quantize_mx_op(w, bspecs,
                           elem_format=bspecs["w_elem_format"], axes=[0])
    qod_g = quantize_mx_op(g, bspecs,
                           elem_format=bspecs["a_elem_format"], axes=[1])
    _, vjp_x = jax.vjp(lambda x_: conv(x_, qod_w), x)
    grad_x = quantize_elemwise_op(vjp_x(qod_g)[0], bspecs,
                                  round=bspecs["round_grad_input"])

    grad_b = None
    if has_bias:
        grad_b = quantize_elemwise_op(
            g.sum(axis=(0, *range(2, g.ndim))), bspecs,
            round=bspecs["round_grad_weight"])
    return grad_x, grad_w, grad_b


mx_conv.defvjp(_mx_conv_fwd, _mx_conv_bwd)


def _conv_nd(x, w, bias, stride, padding, dilation, groups, nd,
             mx_specs: Optional[MxSpecs], transpose: bool = False):
    stride, padding, dilation = _norm_args(stride, padding, dilation, nd)
    return mx_conv(x, w, bias, stride, padding, dilation, groups, nd,
                   transpose, mx_specs)


def conv1d(x, w, bias=None, stride=1, padding=0, dilation=1, groups=1,
           mx_specs: Optional[MxSpecs] = None):
    return _conv_nd(x, w, bias, stride, padding, dilation, groups, 1,
                    mx_specs)


def conv2d(x, w, bias=None, stride=1, padding=0, dilation=1, groups=1,
           mx_specs: Optional[MxSpecs] = None):
    return _conv_nd(x, w, bias, stride, padding, dilation, groups, 2,
                    mx_specs)


def conv3d(x, w, bias=None, stride=1, padding=0, dilation=1, groups=1,
           mx_specs: Optional[MxSpecs] = None):
    return _conv_nd(x, w, bias, stride, padding, dilation, groups, 3,
                    mx_specs)


def conv_transpose2d(x, w, bias=None, stride=1, padding=0, dilation=1,
                     mx_specs: Optional[MxSpecs] = None):
    """w: (I, O, kH, kW) torch ConvTranspose convention. The swap puts
    it in OI layout so the contraction axis (in_channels) is axis 1,
    matching transpose_convolution.py's axes=[1]/axes=[0] pair."""
    return _conv_nd(x, jnp.swapaxes(w, 0, 1), bias, stride, padding,
                    dilation, 1, 2, mx_specs, transpose=True)


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
