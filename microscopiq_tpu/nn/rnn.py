"""MX-quantized LSTM.

Parity target: ``number_system/mx/rnn.py`` (MX LSTM): the gate matmuls go
through the MX linear, gate nonlinearities through the quantized
sigmoid/tanh chain, recurrence via ``lax.scan``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as fnn
import jax
import jax.numpy as jnp
from jax import lax

from ..specs import MxSpecs
from .activations import sigmoid, tanh
from .linear import linear
from .simd_ops import simd_add, simd_mul


class LSTMCell(fnn.Module):
    hidden_size: int
    mx_specs: Optional[MxSpecs] = None

    @fnn.compact
    def __call__(self, carry, x):
        h, c = carry
        H = self.hidden_size
        w_ih = self.param("w_ih", fnn.initializers.lecun_normal(),
                          (4 * H, x.shape[-1]))
        w_hh = self.param("w_hh", fnn.initializers.lecun_normal(),
                          (4 * H, H))
        b = self.param("bias", fnn.initializers.zeros, (4 * H,))
        gates = simd_add(linear(x, w_ih, None, self.mx_specs),
                         linear(h, w_hh, b, self.mx_specs), self.mx_specs)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = sigmoid(i, self.mx_specs)
        f = sigmoid(f, self.mx_specs)
        g = tanh(g, self.mx_specs)
        o = sigmoid(o, self.mx_specs)
        c_new = simd_add(simd_mul(f, c, self.mx_specs),
                         simd_mul(i, g, self.mx_specs), self.mx_specs)
        h_new = simd_mul(o, tanh(c_new, self.mx_specs), self.mx_specs)
        return (h_new, c_new), h_new


class LSTM(fnn.Module):
    """Single-layer MX LSTM over (T, B, D) sequences."""

    hidden_size: int
    mx_specs: Optional[MxSpecs] = None

    @fnn.compact
    def __call__(self, xs, init_carry: Optional[Tuple] = None):
        B = xs.shape[1]
        if init_carry is None:
            init_carry = (jnp.zeros((B, self.hidden_size), xs.dtype),
                          jnp.zeros((B, self.hidden_size), xs.dtype))
        cell = LSTMCell(self.hidden_size, self.mx_specs)
        scan = fnn.scan(lambda m, carry, x: m(carry, x),
                        variable_broadcast="params",
                        split_rngs={"params": False})
        carry, ys = scan(cell, init_carry, xs)
        return ys, carry
