"""Element-wise (scalar-format) fake quantization, pure JAX.

Bit-exact re-implementation of the reference's element-wise quantizer
semantics (``number_system/mx/elemwise_ops.py:84-174`` and the CUDA
bit-twiddling path ``number_system/mx/cpp/quantize.cuh:88-149``):

  1. compute a private exponent ``floor(log2(|x|))`` per element,
  2. left-shift the mantissa so ``bits-2`` bits sit above the binary point,
  3. round (floor / nearest / even / dither),
  4. undo the shift,
  5. saturate or overflow-to-Inf, and preserve Inf/NaN of the input.

TPU-first notes: ``floor(log2(|x|))`` is computed by *integer exponent
extraction* from the float32 bit pattern (the same approach as the
reference's CUDA ``get_biased_exponent``) instead of a transcendental
``log2`` — this is exact, deterministic across backends, and VPU-friendly.
Powers of two are materialized by bit-assembly (exact for exponents in
[-126, 127]) rather than ``exp2`` so no transcendental error can leak in.

All functions are traceable/jittable; format parameters are Python-level
static values.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..formats import (
    _get_min_norm,
    _get_max_norm,
    get_format_params,
)


# -------------------------------------------------------------------------
# Exact float32 exponent helpers
# -------------------------------------------------------------------------
def floor_log2(x: jax.Array) -> jax.Array:
    """Exact ``floor(log2(x))`` for x >= 0, via float32 bit extraction.

    Matches ``torch.floor(torch.log2(x))`` for positive finite x (including
    subnormals), returns +Inf for +Inf and NaN for NaN — the values the
    reference's transcendental path produces. x == 0 maps to -150 (callers
    offset zeros before calling, so this is only a sentinel).
    """
    xf = x.astype(jnp.float32)
    bits = lax.bitcast_convert_type(xf, jnp.int32)
    biased = jnp.bitwise_and(lax.shift_right_logical(bits, 23), 0xFF)
    mant = jnp.bitwise_and(bits, 0x7FFFFF)
    exp_normal = biased - 127
    # subnormal: x = mant * 2^-149 -> floor(log2 x) = bitlength(mant) - 150
    bitlen = 32 - lax.clz(mant)
    exp_subnormal = bitlen - 150
    out = jnp.where(biased > 0, exp_normal, exp_subnormal).astype(jnp.float32)
    out = jnp.where(jnp.isinf(xf), jnp.float32(jnp.inf), out)
    out = jnp.where(jnp.isnan(xf), jnp.float32(jnp.nan), out)
    return out


def exp2_exact(e: jax.Array) -> jax.Array:
    """Exact ``2.0**e`` for integer-valued float e in [-126, 127].

    Assembled directly into the float32 exponent field; propagates NaN and
    maps +/-Inf like the reference's ``2**e`` (2**Inf = Inf, 2**-Inf = 0).
    Out-of-range finite exponents are clamped to [-126, 127]; callers clamp
    shared/private exponents into this range beforehand, so the clamp only
    guards Inf/NaN bit-casting UB.
    """
    ef = e.astype(jnp.float32)
    ei = jnp.clip(ef, -126.0, 127.0).astype(jnp.int32)
    p = lax.bitcast_convert_type(lax.shift_left(ei + 127, 23), jnp.float32)
    p = jnp.where(ef == jnp.inf, jnp.float32(jnp.inf), p)
    p = jnp.where(ef == -jnp.inf, jnp.float32(0.0), p)
    p = jnp.where(jnp.isnan(ef), jnp.float32(jnp.nan), p)
    return p


def mul_pow2(x: jax.Array, e: jax.Array) -> jax.Array:
    """Exact ``x * 2**e`` for integer-valued float e in [-254, 254].

    Split into two half-exponent factors so each factor is a *normal*
    float32: XLA lowers ``x / 2**e`` to multiply-by-reciprocal and flushes
    subnormal intermediates (e.g. ``rcp(2**127)``) to zero, which would
    diverge from the reference's IEEE division. Two exact power-of-two
    multiplies give the identical correctly-rounded result for all normal
    outputs. NaN/Inf exponents propagate like ``x / 2**e`` does.
    """
    ef = e.astype(jnp.float32) if hasattr(e, "astype") else jnp.float32(e)
    e1 = jnp.trunc(ef / 2)
    e2 = ef - e1
    return x * exp2_exact(e1) * exp2_exact(e2)


# -------------------------------------------------------------------------
# Shift / round helpers (reference: elemwise_ops.py:33-78)
# -------------------------------------------------------------------------
def _safe_lshift(x, bits: int, exp):
    if exp is None:
        return x * (2 ** bits)
    return mul_pow2(x, -exp) * (2 ** bits)


def _safe_rshift(x, bits: int, exp):
    if exp is None:
        return x / (2 ** bits)
    return mul_pow2(x / (2 ** bits), exp)


def round_mantissa(A: jax.Array, bits: int, round: str = "nearest",
                   clamp: bool = False,
                   key: Optional[jax.Array] = None) -> jax.Array:
    """Round the scaled mantissa. Modes: floor, nearest, even, dither."""
    if round == "dither":
        if key is None:
            raise ValueError("round='dither' requires a PRNG key")
        rand_A = jax.random.uniform(key, A.shape, dtype=A.dtype)
        out = jnp.sign(A) * jnp.floor(jnp.abs(A) + rand_A)
    elif round == "floor":
        out = jnp.sign(A) * jnp.floor(jnp.abs(A))
    elif round == "nearest":
        out = jnp.sign(A) * jnp.floor(jnp.abs(A) + 0.5)
    elif round == "even":
        absA = jnp.abs(A)
        # ties at 0.5, 2.5, 4.5, ... round down to even
        maskA = ((absA - 0.5) % 2 == 0).astype(A.dtype)
        out = jnp.sign(A) * (jnp.floor(absA + 0.5) - maskA)
    else:
        raise ValueError(f"Unrecognized round method {round}")

    if clamp:
        max_mantissa = 2 ** (bits - 1) - 1
        out = jnp.clip(out, -max_mantissa, max_mantissa)
    return out


# -------------------------------------------------------------------------
# Core element-wise quantizer
# -------------------------------------------------------------------------
def quantize_elemwise_core(A: jax.Array, bits: int, exp_bits: int,
                           max_norm: float, round: str = "nearest",
                           saturate_normals: bool = False,
                           allow_denorm: bool = True,
                           key: Optional[jax.Array] = None) -> jax.Array:
    """Quantize each element to a (sign, exp_bits, bits-2 mantissa) format.

    ``bits`` counts the sign bit and implicit leading one, as in the
    reference (``elemwise_ops.py:84``). Computation runs in float32 and is
    cast back to the input dtype.
    """
    A = jnp.asarray(A)
    orig_dtype = A.dtype
    A = A.astype(jnp.float32)

    # Flush values below min_norm to zero if denorms are not allowed.
    # Mask-multiply (not `where`) so NaN inputs stay NaN, as in the ref.
    if not allow_denorm and exp_bits > 0:
        min_norm = _get_min_norm(exp_bits)
        out = (jnp.abs(A) >= min_norm).astype(A.dtype) * A
    else:
        out = A

    if exp_bits != 0:
        private_exp = floor_log2(jnp.abs(A) + (A == 0).astype(A.dtype))
        # minimum representable exponent (e.g. -126 for 8 exp bits)
        min_exp = -(2 ** (exp_bits - 1)) + 2
        private_exp = jnp.maximum(private_exp, jnp.float32(min_exp))
    else:
        private_exp = None

    # Scale so `bits` worth of mantissa sit in the integer portion
    out = _safe_lshift(out, bits - 2, private_exp)
    out = round_mantissa(out, bits, round, clamp=False, key=key)
    out = _safe_rshift(out, bits - 2, private_exp)

    # Saturate, or overflow to Inf
    if saturate_normals or exp_bits == 0:
        out = jnp.clip(out, -max_norm, max_norm)
    else:
        out = jnp.where(jnp.abs(out) > max_norm,
                        jnp.sign(out) * jnp.float32(jnp.inf), out)

    # Preserve Inf/NaN of the input
    out = jnp.where(jnp.isinf(A), A, out)
    out = jnp.where(jnp.isnan(A), jnp.float32(jnp.nan), out)

    return out.astype(orig_dtype)


def quantize_elemwise(A: jax.Array, elem_format, round: str = "nearest",
                      saturate_normals: bool = False,
                      allow_denorm: bool = True) -> jax.Array:
    """Quantize to a named element format (None = passthrough)."""
    if elem_format is None:
        return A
    ebits, mbits, _, max_norm, _ = get_format_params(elem_format)
    return quantize_elemwise_core(
        A, mbits, ebits, max_norm, round=round,
        saturate_normals=saturate_normals, allow_denorm=allow_denorm)


def quantize_bfloat(A: jax.Array, bfloat: int, round: str = "nearest",
                    allow_denorm: bool = True) -> jax.Array:
    """Quantize to bfloatX (1 sign + 8 exp + (bfloat-9) mantissa bits)."""
    if bfloat == 0 or bfloat == 32:
        return A
    max_norm = _get_max_norm(8, bfloat - 7)
    return quantize_elemwise_core(
        A, bits=bfloat - 7, exp_bits=8, max_norm=max_norm, round=round,
        allow_denorm=allow_denorm)


def quantize_fp(A: jax.Array, exp_bits: Optional[int] = None,
                mantissa_bits: Optional[int] = None,
                round: str = "nearest", allow_denorm: bool = True) -> jax.Array:
    """Quantize to IEEE-like fpX (NaN/Inf defined as in fp16/fp32)."""
    if exp_bits is None or mantissa_bits is None:
        return A
    max_norm = _get_max_norm(exp_bits, mantissa_bits + 2)
    return quantize_elemwise_core(
        A, bits=mantissa_bits + 2, exp_bits=exp_bits, max_norm=max_norm,
        round=round, allow_denorm=allow_denorm)


def quantize_elemwise_op(A: jax.Array, mx_specs, round: Optional[str] = None) -> jax.Array:
    """Spec-driven element-wise quantization (bfloat / fp knobs).

    Mirrors ``elemwise_ops.py:237-266``: `bfloat` and `fp` are mutually
    exclusive; bfloat must be > 9 and fp > 6 when set.
    """
    if mx_specs is None:
        return A
    if round is None:
        round = mx_specs["round"]
    bfloat = mx_specs["bfloat"]
    fp = mx_specs["fp"]
    if bfloat > 0 and fp > 0:
        raise ValueError("Cannot set both [bfloat] and [fp] in mx_specs.")
    if bfloat > 9:
        return quantize_bfloat(A, bfloat=bfloat, round=round,
                               allow_denorm=mx_specs["bfloat_subnorms"])
    if 0 < bfloat <= 9:
        raise ValueError("Cannot set [bfloat] <= 9 in mx_specs.")
    if fp > 6:
        return quantize_fp(A, exp_bits=5, mantissa_bits=fp - 6, round=round,
                           allow_denorm=mx_specs["bfloat_subnorms"])
    if 0 < fp <= 6:
        raise ValueError("Cannot set [fp] <= 6 in mx_specs.")
    return A
