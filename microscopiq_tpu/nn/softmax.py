"""MX-quantized softmax with optional base-2 exponent.

Parity target: ``number_system/mx/softmax.py:18-124`` — quantizes input,
computes exp (or 2^x when ``softmax_exp2`` is set, modeling hardware that
only has a base-2 exponential unit), quantized normalization.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as fnn
import jax.numpy as jnp

from ..specs import MxSpecs
from .functional import ste_elemwise
from .vector_ops import vec_exp, vec_exp2, vec_recip


def softmax(x, axis: int = -1, mx_specs: Optional[MxSpecs] = None):
    if mx_specs is None:
        import jax
        return jax.nn.softmax(x, axis=axis)
    x = ste_elemwise(x, mx_specs, mx_specs["round_output"])
    m = jnp.max(x, axis=axis, keepdims=True)
    shifted = ste_elemwise(x - m, mx_specs, mx_specs["round_output"])
    if mx_specs["softmax_exp2"]:
        e = vec_exp2(shifted, mx_specs)
    else:
        e = vec_exp(shifted, mx_specs)
    denom = ste_elemwise(jnp.sum(e, axis=axis, keepdims=True), mx_specs,
                         mx_specs["round_output"])
    out = e * vec_recip(denom, mx_specs)
    return ste_elemwise(out, mx_specs, mx_specs["round_output"])


class Softmax(fnn.Module):
    axis: int = -1
    mx_specs: Optional[MxSpecs] = None

    def __call__(self, x):
        return softmax(x, self.axis, self.mx_specs)
