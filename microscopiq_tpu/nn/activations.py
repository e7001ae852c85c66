"""MX-quantized activations.

Parity target: ``number_system/mx/activations.py:28-108`` — each activation
elemwise-quantizes its input and output; backward passes the true
derivative re-quantized per backward specs (via the STE primitive).
Provides both functional forms and flax modules.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as fnn
import jax
import jax.numpy as jnp

from ..specs import MxSpecs
from .functional import ste_elemwise
from .vector_ops import vec_exp, vec_recip, vec_tanh


def _wrap(fn):
    def quantized(x, mx_specs: Optional[MxSpecs] = None):
        if mx_specs is None:
            return fn(x)
        x = ste_elemwise(x, mx_specs, mx_specs["round_output"])
        y = fn(x)
        return ste_elemwise(y, mx_specs, mx_specs["round_output"])
    return quantized


relu = _wrap(lambda x: jnp.maximum(x, 0))
relu6 = _wrap(lambda x: jnp.clip(x, 0, 6))
gelu = _wrap(jax.nn.gelu)
tanh = _wrap(jnp.tanh)


def leaky_relu(x, negative_slope: float = 0.01,
               mx_specs: Optional[MxSpecs] = None):
    if mx_specs is None:
        return jax.nn.leaky_relu(x, negative_slope)
    x = ste_elemwise(x, mx_specs, mx_specs["round_output"])
    y = jnp.where(x >= 0, x, negative_slope * x)
    return ste_elemwise(y, mx_specs, mx_specs["round_output"])


def sigmoid(x, mx_specs: Optional[MxSpecs] = None):
    """Reference computes sigmoid through the vector-op exp/recip chain."""
    if mx_specs is None:
        return jax.nn.sigmoid(x)
    x = ste_elemwise(x, mx_specs, mx_specs["round_output"])
    e = vec_exp(-x, mx_specs)
    return vec_recip(1.0 + e, mx_specs)


def silu(x, mx_specs: Optional[MxSpecs] = None):
    if mx_specs is None:
        return jax.nn.silu(x)
    x = ste_elemwise(x, mx_specs, mx_specs["round_output"])
    y = x * sigmoid(x, mx_specs)
    return ste_elemwise(y, mx_specs, mx_specs["round_output"])


class _ActModule(fnn.Module):
    mx_specs: Optional[MxSpecs] = None
    _fn = None

    def __call__(self, x):
        return type(self)._fn(x, self.mx_specs)


class ReLU(_ActModule):
    _fn = staticmethod(relu)


class ReLU6(_ActModule):
    _fn = staticmethod(relu6)


class GELU(_ActModule):
    _fn = staticmethod(gelu)


class SiLU(_ActModule):
    _fn = staticmethod(silu)


class Sigmoid(_ActModule):
    _fn = staticmethod(sigmoid)


class Tanh(_ActModule):
    _fn = staticmethod(tanh)


class LeakyReLU(fnn.Module):
    negative_slope: float = 0.01
    mx_specs: Optional[MxSpecs] = None

    def __call__(self, x):
        return leaky_relu(x, self.negative_slope, self.mx_specs)
