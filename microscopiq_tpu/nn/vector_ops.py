"""Low-precision vector-unit op models.

Parity target: ``number_system/mx/vector_ops.py:38-126`` — exp/exp2/
reciprocal/sqrt/tanh helpers honoring the ``vec_use_exp2`` (compute e^x as
2^(x·log2e)) and ``vec_use_recip`` (Newton-Raphson reciprocal) spec knobs,
with every intermediate elemwise-quantized.
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp

from ..specs import MxSpecs
from .functional import ste_elemwise

_LOG2_E = math.log2(math.e)


def _q(x, specs, round=None):
    return ste_elemwise(x, specs, round)


def vec_exp2(x, mx_specs: Optional[MxSpecs]):
    return _q(jnp.exp2(x), mx_specs)


def vec_exp(x, mx_specs: Optional[MxSpecs]):
    if mx_specs is not None and mx_specs["vec_use_exp2"]:
        x = _q(x * _LOG2_E, mx_specs)
        return vec_exp2(x, mx_specs)
    return _q(jnp.exp(x), mx_specs)


def vec_recip(x, mx_specs: Optional[MxSpecs]):
    if mx_specs is not None and mx_specs["vec_use_recip"]:
        # one Newton-Raphson refinement of a quantized seed, as the
        # reference models a low-precision reciprocal unit
        seed = _q(1.0 / x, mx_specs)
        y = _q(seed * (2.0 - _q(x * seed, mx_specs)), mx_specs)
        return y
    return _q(1.0 / x, mx_specs)


def vec_div(a, b, mx_specs: Optional[MxSpecs]):
    return _q(a * vec_recip(b, mx_specs), mx_specs) \
        if (mx_specs is not None and mx_specs["vec_use_recip"]) \
        else _q(a / b, mx_specs)


def vec_sqrt(x, mx_specs: Optional[MxSpecs]):
    return _q(jnp.sqrt(x), mx_specs)


def vec_tanh(x, mx_specs: Optional[MxSpecs]):
    return _q(jnp.tanh(x), mx_specs)
