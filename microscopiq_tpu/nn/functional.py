"""Straight-through quantization primitives for the nn layers.

The reference's nn layers (``number_system/mx/*.py``) implement fake-quant
forward passes with custom backward functions that (a) pass gradients
straight through the (zero-derivative) rounding ops and (b) re-quantize
the gradients according to the backward specs. Here that contract is
factored into two reusable custom-VJP primitives so every layer can be a
plain composition:

* :func:`ste_elemwise` — element-wise (bfloat/fp container) quantization
  with identity gradient, gradient re-quantized per backward specs.
* :func:`ste_mx` / :func:`ste_mx_outlier` — MX (outlier) block quant with
  identity gradient.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.elemwise import quantize_elemwise_op
from ..ops.mx import quantize_mx_op
from ..ops.outlier import quantize_mx_outlier_op
from ..specs import MxSpecs, get_backwards_mx_specs


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def ste_elemwise(x, mx_specs: Optional[MxSpecs], round: Optional[str]):
    """Element-wise quantize; gradient passes straight through and is
    itself elemwise-quantized when quantize_backprop is set
    (reference pattern: e.g. linear.py:29-31 fwd / :119-123 bwd)."""
    return quantize_elemwise_op(x, mx_specs, round=round)


def _ste_elemwise_fwd(x, mx_specs, round):
    return quantize_elemwise_op(x, mx_specs, round=round), None


def _ste_elemwise_bwd(mx_specs, round, _, g):
    bspecs = get_backwards_mx_specs(mx_specs)
    g = quantize_elemwise_op(
        g, bspecs, round=None if bspecs is None else bspecs["round_grad_input"])
    return (g,)


ste_elemwise.defvjp(_ste_elemwise_fwd, _ste_elemwise_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def ste_mx(x, mx_specs, elem_format, axes, round: str = "nearest"):
    """MX block quantize with straight-through gradient."""
    return quantize_mx_op(x, mx_specs, elem_format=elem_format, axes=list(axes),
                          round=round)


def _ste_mx_fwd(x, mx_specs, elem_format, axes, round):
    return ste_mx(x, mx_specs, elem_format, axes, round), None


def _ste_mx_bwd(mx_specs, elem_format, axes, round, _, g):
    return (g,)


ste_mx.defvjp(_ste_mx_fwd, _ste_mx_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5))
def ste_mx_outlier(x, mx_specs, inlier_elem_format, outlier_elem_format,
                   axes, round: str = "nearest"):
    """Outlier-aware MX quantize with straight-through gradient
    (forward path of linear.py:66-85)."""
    return quantize_mx_outlier_op(
        x, mx_specs, inlier_elem_format=inlier_elem_format,
        outlier_elem_format=outlier_elem_format, axes=list(axes), round=round)


def _ste_mxo_fwd(x, mx_specs, ifmt, ofmt, axes, round):
    return ste_mx_outlier(x, mx_specs, ifmt, ofmt, axes, round), None


def _ste_mxo_bwd(mx_specs, ifmt, ofmt, axes, round, _, g):
    return (g,)


ste_mx_outlier.defvjp(_ste_mxo_fwd, _ste_mxo_bwd)
