"""MX linear / matmul / bmm with custom VJPs.

Parity targets: ``number_system/mx/linear.py`` (LinearFunction + MXLinear),
``mx/matmul.py`` (mode_config aa/aw/wa), ``mx/bmm.py``.

Forward (linear.py:29-108): elemwise-quantize input/weight/bias, MX-outlier
quantize input and weight along the contraction axis, dot, elemwise-quantize
the output (and again after the bias add). Backward (linear.py:111-201
intent — the reference's backward calls quantize_mx_op with kwargs it does
not accept, i.e. it is unrunnable as shipped; we implement the documented
intent): straight-through with the gradients and saved activations
re-quantized per the backward specs along the reference's axes.

The serving fast path (:class:`QuantizedLinear`) holds packed weights and
calls the fused Pallas dequant-GEMM instead of fake-quantizing.

Note: the reference quantizes the *input* with axes=[1], which for 3D
(B, S, D) inputs is the sequence axis — an apparent bug (its 2D eval path
is unaffected). We quantize along the contraction axis (axes=[-1]),
identical for 2D inputs.
"""

from __future__ import annotations

import functools
from typing import Optional

import flax.linen as fnn
import jax
import jax.numpy as jnp

from ..ops.mx import quantize_mx_op
from ..ops.elemwise import quantize_elemwise_op
from ..specs import MxSpecs, get_backwards_mx_specs
from .functional import ste_elemwise, ste_mx, ste_mx_outlier


# ---------------------------------------------------------------------------
# linear
# ---------------------------------------------------------------------------
@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def mx_linear(x, weight, bias, mx_specs: Optional[MxSpecs]):
    """y = x @ Wᵀ (+ b), fully fake-quantized. weight: (out, in)."""
    y, _ = _mx_linear_fwd(x, weight, bias, mx_specs)
    return y


def _mx_linear_fwd(x, weight, bias, mx_specs):
    if mx_specs is None:
        y = x @ weight.T
        if bias is not None:
            y = y + bias
        return y, (x, weight, bias is not None)

    bf_in = quantize_elemwise_op(x, mx_specs, round=mx_specs["round_output"])
    bf_weight = quantize_elemwise_op(weight, mx_specs,
                                     round=mx_specs["round_weight"])
    bf_bias = None
    if bias is not None:
        bf_bias = quantize_elemwise_op(bias, mx_specs,
                                       round=mx_specs["round_weight"])

    from ..ops.outlier import quantize_mx_outlier_op
    a_axes = mx_specs.get("a_axes")
    qis_input = quantize_mx_outlier_op(
        bf_in, mx_specs,
        inlier_elem_format=mx_specs["a_elem_format"],
        outlier_elem_format=mx_specs["a_elem_format"],
        axes=[-1 if a_axes is None else a_axes],
        round=mx_specs["round_mx_output"])
    qis_weight = quantize_mx_outlier_op(
        bf_weight, mx_specs,
        inlier_elem_format=mx_specs["w_elem_format"],
        outlier_elem_format=mx_specs["w_elem_format"],
        axes=[-1], round=mx_specs["round_mx_output"])

    out = qis_input @ qis_weight.T
    out = quantize_elemwise_op(out, mx_specs, round=mx_specs["round_output"])
    if bias is not None:
        out = quantize_elemwise_op(out + bf_bias, mx_specs,
                                   round=mx_specs["round_output"])

    if mx_specs["quantize_backprop"]:
        res = (bf_in, bf_weight, bias is not None)
    else:
        res = (x, weight, bias is not None)
    return out, res


def _mx_linear_bwd(mx_specs, res, g):
    x, weight, has_bias = res
    if mx_specs is None:
        grad_in = g @ weight
        grad_w = jnp.einsum("...o,...i->oi", g, x)
        grad_b = g.reshape(-1, g.shape[-1]).sum(0) if has_bias else None
        return grad_in, grad_w, grad_b

    bspecs = get_backwards_mx_specs(mx_specs)
    out_dim, in_dim = weight.shape

    g = quantize_elemwise_op(g, bspecs, round=bspecs["round_grad_input"])

    # grad_weight: quantize along the example axis (linear.py:130-156)
    qex_input = quantize_mx_op(
        x, bspecs, elem_format=bspecs["a_elem_format_bp_ex"], axes=[-2],
        round=bspecs["round_mx_input_grad_weight"])
    qex_g = quantize_mx_op(
        g, bspecs, elem_format=bspecs["a_elem_format_bp_ex"], axes=[-2],
        round=bspecs["round_mx_grad_output_grad_weight"])
    grad_w = qex_g.reshape(-1, out_dim).T @ qex_input.reshape(-1, in_dim)
    grad_w = quantize_elemwise_op(grad_w, bspecs,
                                  round=bspecs["round_grad_weight"])

    # grad_input: quantize weight along out axis (linear.py:158-184)
    qos_weight = quantize_mx_op(
        weight, bspecs, elem_format=bspecs["w_elem_format_bp"], axes=[0],
        round=bspecs["round_mx_weight_grad_input"])
    qos_g = quantize_mx_op(
        g, bspecs, elem_format=bspecs["a_elem_format_bp_os"], axes=[-1],
        round=bspecs["round_mx_grad_output_grad_input"])
    grad_in = qos_g @ qos_weight
    grad_in = quantize_elemwise_op(grad_in, bspecs,
                                   round=bspecs["round_grad_input"])

    grad_b = None
    if has_bias:
        grad_b = g.reshape(-1, out_dim).sum(0)
        grad_b = quantize_elemwise_op(grad_b, bspecs,
                                      round=bspecs["round_grad_weight"])
    return grad_in, grad_w, grad_b


mx_linear.defvjp(_mx_linear_fwd, _mx_linear_bwd)


def linear(x, weight, bias=None, mx_specs: Optional[MxSpecs] = None):
    """Functional MX linear (reference: mx/linear.py:204-218)."""
    if mx_specs is None:
        y = x @ weight.T
        return y + bias if bias is not None else y
    return mx_linear(x, weight, bias, mx_specs)


# ---------------------------------------------------------------------------
# matmul / bmm (reference: mx/matmul.py:31-94, mx/bmm.py:17-134)
# ---------------------------------------------------------------------------
def matmul(a, b, mx_specs: Optional[MxSpecs] = None,
           mode_config: str = "aa"):
    """MX matmul a @ b. mode_config picks per-operand elem formats:
    'aa' both activations, 'aw' a=act b=weight, 'wa' a=weight b=act."""
    if mx_specs is None:
        return a @ b
    fmt_a = mx_specs["a_elem_format" if mode_config in ("aa", "aw")
                     else "w_elem_format"]
    fmt_b = mx_specs["a_elem_format" if mode_config in ("aa", "wa")
                     else "w_elem_format"]
    round_a = "round_mx_output" if mode_config[0] == "a" else "round_weight"

    qa = ste_elemwise(a, mx_specs, mx_specs["round_output"])
    qb = ste_elemwise(b, mx_specs, mx_specs["round_output"])
    qa = ste_mx(qa, mx_specs, fmt_a, (-1,), mx_specs["round_mx_output"])
    qb = ste_mx(qb, mx_specs, fmt_b, (-2,), mx_specs["round_mx_output"])
    out = qa @ qb
    return ste_elemwise(out, mx_specs, mx_specs["round_output"])


bmm = matmul  # batched semantics are identical under jnp broadcasting


# ---------------------------------------------------------------------------
# flax modules
# ---------------------------------------------------------------------------
class MXLinear(fnn.Module):
    """Fake-quant linear module (reference: mx/linear.py:220-254).

    kernel is stored flax-style (in, out); computation follows the
    reference's (out, in) convention internally.
    """

    features: int
    use_bias: bool = True
    mx_specs: Optional[MxSpecs] = None
    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", fnn.initializers.lecun_normal(),
            (x.shape[-1], self.features), self.dtype)
        bias = (self.param("bias", fnn.initializers.zeros,
                           (self.features,), self.dtype)
                if self.use_bias else None)
        return linear(x, kernel.T, bias, self.mx_specs)


class QuantizedLinear(fnn.Module):
    """Serving linear over packed weights via the fused Pallas GEMM.

    Weights arrive pre-packed (PackedMX / PackedMXOutlier with (K, N)
    axis=0 layout) through flax variables; `use_pallas=False` falls back
    to the pure-JAX twin (CPU tests / interpret)."""

    features: int
    use_pallas: bool = True
    out_dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, x, packed):
        from ..ops.pallas import (dequant_matmul, dequant_matmul_nb,
                                  dequant_matmul_nb_reference,
                                  dequant_matmul_outlier,
                                  dequant_matmul_outlier_reference,
                                  dequant_matmul_reference)
        from ..ops.packing import PackedMX, PackedOutlierNB
        if isinstance(packed, PackedMX):
            f = dequant_matmul if self.use_pallas else dequant_matmul_reference
        elif isinstance(packed, PackedOutlierNB):
            f = (dequant_matmul_nb if self.use_pallas
                 else dequant_matmul_nb_reference)
        else:
            f = (dequant_matmul_outlier if self.use_pallas
                 else dequant_matmul_outlier_reference)
        return f(x, packed, out_dtype=self.out_dtype)
