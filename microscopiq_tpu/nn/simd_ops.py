"""SIMD element-wise op models (low-precision vector units).

Parity target: ``number_system/mx/simd_ops.py:85-557`` — add/sub/mul/div/
sqrt/square/exp/log/reduce_sum/reduce_mean/norm/split, each quantizing its
inputs and output to the container format, with gradients re-quantized per
backward specs (handled by the STE primitive).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp

from ..specs import MxSpecs
from .functional import ste_elemwise
from .vector_ops import vec_div, vec_exp, vec_recip, vec_sqrt


def _q(x, specs):
    return ste_elemwise(x, specs, None if specs is None else specs["round_output"])


def _binary(fn):
    def op(a, b, mx_specs: Optional[MxSpecs] = None):
        if mx_specs is None:
            return fn(a, b)
        a = _q(a, mx_specs)
        b = _q(b, mx_specs)
        return _q(fn(a, b), mx_specs)
    return op


simd_add = _binary(jnp.add)
simd_sub = _binary(jnp.subtract)
simd_mul = _binary(jnp.multiply)


def simd_div(a, b, mx_specs: Optional[MxSpecs] = None):
    if mx_specs is None:
        return a / b
    return vec_div(_q(a, mx_specs), _q(b, mx_specs), mx_specs)


def simd_sqrt(x, mx_specs: Optional[MxSpecs] = None):
    if mx_specs is None:
        return jnp.sqrt(x)
    return vec_sqrt(_q(x, mx_specs), mx_specs)


def simd_square(x, mx_specs: Optional[MxSpecs] = None):
    if mx_specs is None:
        return x * x
    x = _q(x, mx_specs)
    return _q(x * x, mx_specs)


def simd_exp(x, mx_specs: Optional[MxSpecs] = None):
    if mx_specs is None:
        return jnp.exp(x)
    return vec_exp(_q(x, mx_specs), mx_specs)


def simd_log(x, mx_specs: Optional[MxSpecs] = None):
    if mx_specs is None:
        return jnp.log(x)
    return _q(jnp.log(_q(x, mx_specs)), mx_specs)


def simd_reduce_sum(x, axis=None, keepdims: bool = False,
                    mx_specs: Optional[MxSpecs] = None):
    if mx_specs is None:
        return jnp.sum(x, axis=axis, keepdims=keepdims)
    return _q(jnp.sum(_q(x, mx_specs), axis=axis, keepdims=keepdims),
              mx_specs)


def simd_reduce_mean(x, axis=None, keepdims: bool = False,
                     mx_specs: Optional[MxSpecs] = None):
    if mx_specs is None:
        return jnp.mean(x, axis=axis, keepdims=keepdims)
    return _q(jnp.mean(_q(x, mx_specs), axis=axis, keepdims=keepdims),
              mx_specs)


def simd_norm(x, axis=None, keepdims: bool = False,
              mx_specs: Optional[MxSpecs] = None):
    """L2 norm with quantized square/sum/sqrt chain."""
    if mx_specs is None:
        return jnp.linalg.norm(x, axis=axis, keepdims=keepdims)
    sq = simd_square(x, mx_specs)
    s = simd_reduce_sum(sq, axis=axis, keepdims=keepdims, mx_specs=mx_specs)
    return vec_sqrt(s, mx_specs)


def simd_split(x, indices_or_sections, axis: int = 0,
               mx_specs: Optional[MxSpecs] = None):
    parts = jnp.split(x, indices_or_sections, axis=axis)
    if mx_specs is None:
        return parts
    return [_q(p, mx_specs) for p in parts]
