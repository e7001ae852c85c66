"""MX-quantized normalization layers.

Parity targets: ``number_system/mx/layernorm.py`` (LayerNorm, RMSNorm over
``norm_utils._norm_forward/_norm_backward``), ``mx/batchnorm.py`` (BN1d/2d/3d),
``mx/groupnorm.py``.

The reference quantizes every intermediate of the normalization (mean,
centered values, variance, rsqrt, normalized values, affine output) to the
container format. Here each step goes through the straight-through
elemwise quantizer; gradients flow through the real derivative chain and
are re-quantized per the backward specs by the STE primitive.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as fnn
import jax
import jax.numpy as jnp

from ..specs import MxSpecs
from .functional import ste_elemwise
from .vector_ops import vec_recip, vec_sqrt


def _q(x, specs, round=None):
    return ste_elemwise(x, specs, round)


def norm_forward(x, axes, weight, bias, eps, mx_specs,
                 use_mean: bool = True):
    """Quantized normalization core (reference: norm_utils.py:25-120)."""
    if use_mean:
        mean = _q(jnp.mean(x, axis=axes, keepdims=True), mx_specs)
        xc = _q(x - mean, mx_specs)
    else:
        xc = x
    var = _q(jnp.mean(xc * xc, axis=axes, keepdims=True), mx_specs)
    rstd = vec_recip(vec_sqrt(var + eps, mx_specs), mx_specs)
    rstd = _q(rstd, mx_specs)
    xn = _q(xc * rstd, mx_specs)
    if weight is not None:
        xn = _q(xn * weight, mx_specs)
    if bias is not None:
        xn = _q(xn + bias, mx_specs)
    return xn


class LayerNorm(fnn.Module):
    """Reference: mx/layernorm.py LayerNorm."""

    features: int
    eps: float = 1e-5
    use_scale: bool = True
    use_bias: bool = True
    mx_specs: Optional[MxSpecs] = None

    @fnn.compact
    def __call__(self, x):
        w = (self.param("scale", fnn.initializers.ones, (self.features,))
             if self.use_scale else None)
        b = (self.param("bias", fnn.initializers.zeros, (self.features,))
             if self.use_bias else None)
        if self.mx_specs is None:
            mean = jnp.mean(x, axis=-1, keepdims=True)
            var = jnp.var(x, axis=-1, keepdims=True)
            xn = (x - mean) * jax.lax.rsqrt(var + self.eps)
            if w is not None:
                xn = xn * w
            if b is not None:
                xn = xn + b
            return xn
        return norm_forward(_q(x, self.mx_specs), (-1,), w, b, self.eps,
                            self.mx_specs, use_mean=True)


class RMSNorm(fnn.Module):
    """Reference: mx/layernorm.py RMSNorm (no mean subtraction)."""

    features: int
    eps: float = 1e-6
    use_scale: bool = True
    mx_specs: Optional[MxSpecs] = None

    @fnn.compact
    def __call__(self, x):
        w = (self.param("scale", fnn.initializers.ones, (self.features,))
             if self.use_scale else None)
        if self.mx_specs is None:
            var = jnp.mean(x * x, axis=-1, keepdims=True)
            xn = x * jax.lax.rsqrt(var + self.eps)
            return xn * w if w is not None else xn
        return norm_forward(_q(x, self.mx_specs), (-1,), w, None, self.eps,
                            self.mx_specs, use_mean=False)


class GroupNorm(fnn.Module):
    """Reference: mx/groupnorm.py."""

    num_groups: int
    features: int
    eps: float = 1e-5
    mx_specs: Optional[MxSpecs] = None

    @fnn.compact
    def __call__(self, x):
        # x: (N, C, ...) channel-second like the reference
        w = self.param("scale", fnn.initializers.ones, (self.features,))
        b = self.param("bias", fnn.initializers.zeros, (self.features,))
        N, C = x.shape[0], x.shape[1]
        g = self.num_groups
        xg = x.reshape((N, g, C // g) + x.shape[2:])
        axes = tuple(range(2, xg.ndim))
        if self.mx_specs is None:
            mean = jnp.mean(xg, axis=axes, keepdims=True)
            var = jnp.var(xg, axis=axes, keepdims=True)
            xn = (xg - mean) * jax.lax.rsqrt(var + self.eps)
        else:
            xn = norm_forward(_q(xg, self.mx_specs), axes, None, None,
                              self.eps, self.mx_specs, use_mean=True)
        xn = xn.reshape(x.shape)
        shape = (1, C) + (1,) * (x.ndim - 2)
        return xn * w.reshape(shape) + b.reshape(shape)


class BatchNorm(fnn.Module):
    """Reference: mx/batchnorm.py (BN1d/2d/3d unified; channel axis 1).

    Running statistics live in the 'batch_stats' collection like flax's
    BatchNorm.
    """

    features: int
    eps: float = 1e-5
    momentum: float = 0.1
    use_running_average: bool = True
    mx_specs: Optional[MxSpecs] = None

    @fnn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None):
        use_ra = (self.use_running_average if use_running_average is None
                  else use_running_average)
        w = self.param("scale", fnn.initializers.ones, (self.features,))
        b = self.param("bias", fnn.initializers.zeros, (self.features,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(self.features))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(self.features))

        axes = (0,) + tuple(range(2, x.ndim))
        if use_ra:
            mean, var = ra_mean.value, ra_var.value
        else:
            mean = jnp.mean(x, axis=axes)
            var = jnp.var(x, axis=axes)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * var

        shape = (1, self.features) + (1,) * (x.ndim - 2)
        if self.mx_specs is None:
            xn = (x - mean.reshape(shape)) * jax.lax.rsqrt(
                var.reshape(shape) + self.eps)
            return xn * w.reshape(shape) + b.reshape(shape)
        specs = self.mx_specs
        xq = _q(x, specs)
        xc = _q(xq - mean.reshape(shape), specs)
        rstd = _q(vec_recip(vec_sqrt(var.reshape(shape) + self.eps, specs),
                            specs), specs)
        xn = _q(xc * rstd, specs)
        xn = _q(xn * w.reshape(shape), specs)
        return _q(xn + b.reshape(shape), specs)
