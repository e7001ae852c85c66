"""Microscaling (MX) block quantization, pure JAX.

Re-implements the reference block quantizer semantics
(``number_system/mx/mx_ops.py:332-457``): tile the shared axes into
``block_size`` blocks, compute one shared power-of-two scale per block from
the max magnitude, clamp the scale exponent to ``scale_bits`` (overflow ->
NaN poison, underflow -> clamp), quantize elements against the scaled
values, and rescale.

This module is the *reference semantics twin* used for parity tests and for
calibration; the serving fast path uses the fused Pallas kernels in
``microscopiq_tpu.ops.pallas`` which consume the packed representation
produced by :mod:`microscopiq_tpu.ops.packing`.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from ..formats import FP32_EXPONENT_BIAS, FP32_MIN_NORMAL, get_format_params
from .elemwise import exp2_exact, floor_log2, mul_pow2, quantize_elemwise_core


Axes = Union[int, Sequence[int], None]


def _normalize_axes(axes: Axes, ndim: int) -> List[int]:
    axes = [axes] if isinstance(axes, int) else list(axes)
    return [x + ndim if x < 0 else x for x in axes]


# -------------------------------------------------------------------------
# Block tiling (reference: mx_ops.py:132-208)
# -------------------------------------------------------------------------
def reshape_to_blocks(A: jax.Array, axes: Sequence[int], block_size: int
                      ) -> Tuple[jax.Array, List[int], Tuple[int, ...], Tuple[int, ...]]:
    """Tile `axes` of A into (num_blocks, block_size) pairs with zero pad.

    Returns (blocked array, shifted axes, orig shape (post-unsqueeze),
    padded shape). Shapes are static so this is pure metadata + reshape.
    """
    if axes is None:
        raise ValueError("axes required to determine block dimension")
    if block_size == 0:
        raise ValueError("block_size == 0 in reshape_to_blocks")

    axes = sorted(_normalize_axes(axes, A.ndim))

    # Add one extra (length-1) dim after each shared axis for the block dim
    axes = list(axes)
    for i in range(len(axes)):
        axes[i] += i
        A = jnp.expand_dims(A, axis=axes[i] + 1)

    orig_shape = A.shape
    pad_widths = [(0, 0)] * A.ndim
    do_padding = False
    for axis in axes:
        size = orig_shape[axis]
        if size % block_size != 0:
            pad_widths[axis] = (0, block_size - size % block_size)
            do_padding = True
    if do_padding:
        A = jnp.pad(A, pad_widths, mode="constant")

    padded_shape = A.shape
    shape = list(padded_shape)
    for axis in axes:
        if shape[axis] >= block_size:
            assert shape[axis] % block_size == 0
            shape[axis + 1] = block_size
            shape[axis] = shape[axis] // block_size
        else:
            # Short axis: keep it whole inside a single block
            shape[axis + 1] = shape[axis]
            shape[axis] = 1
    return A.reshape(shape), axes, orig_shape, padded_shape


def undo_reshape_to_blocks(A: jax.Array, padded_shape: Sequence[int],
                           orig_shape: Sequence[int], axes: Sequence[int]
                           ) -> jax.Array:
    """Inverse of :func:`reshape_to_blocks`."""
    A = A.reshape(padded_shape)
    if list(padded_shape) != list(orig_shape):
        A = A[tuple(slice(0, x) for x in orig_shape)]
    for axis in reversed(list(axes)):
        A = jnp.squeeze(A, axis=axis + 1)
    return A


# -------------------------------------------------------------------------
# Shared exponent selection (reference: mx_ops.py:86-129)
# -------------------------------------------------------------------------
def shared_exponents(A: jax.Array, method: str = "max",
                     axes: Optional[Sequence[int]] = None,
                     ebits: int = 0) -> jax.Array:
    """Shared exponent per block: floor(log2(max |A| over axes))."""
    if method == "max":
        if axes is None:
            shared_exp = jnp.max(jnp.abs(A))
        else:
            shared_exp = jnp.abs(A)
            for axis in axes:
                shared_exp = jnp.max(shared_exp, axis=axis, keepdims=True)
    elif method == "none":
        shared_exp = jnp.abs(A)
    else:
        raise ValueError(f"Unrecognized shared exponent method {method}")

    shared_exp = floor_log2(
        shared_exp
        + FP32_MIN_NORMAL * (shared_exp == 0).astype(shared_exp.dtype)
    )

    if ebits > 0:
        emax = 2 ** (ebits - 1) - 1
        # Overflow poisons the block with NaN; underflow clamps.
        shared_exp = jnp.where(shared_exp > emax, jnp.float32(jnp.nan), shared_exp)
        shared_exp = jnp.where(shared_exp < -emax, jnp.float32(-emax), shared_exp)
    return shared_exp


# -------------------------------------------------------------------------
# MX block quantization (reference: mx_ops.py:332-457)
# -------------------------------------------------------------------------
def quantize_mx(A: jax.Array, scale_bits: int, elem_format,
                shared_exp_method: str = "max", axes: Axes = None,
                block_size: int = 0, round: str = "nearest",
                flush_fp32_subnorms: bool = False) -> jax.Array:
    """Fake-quantize A to an MX format with per-block shared scales."""
    if elem_format is None:
        return A
    assert scale_bits > 0

    axes = _normalize_axes(axes, A.ndim)
    ebits, mbits, emax, max_norm, _ = get_format_params(elem_format)

    orig_shape = padded_shape = None
    if block_size > 0:
        A, axes, orig_shape, padded_shape = reshape_to_blocks(A, axes, block_size)

    shared_exp_axes = [x + 1 for x in axes] if block_size > 0 else axes

    shared_exp = shared_exponents(A, shared_exp_method, shared_exp_axes, ebits=0)

    if flush_fp32_subnorms:
        A = A * (shared_exp > -FP32_EXPONENT_BIAS).astype(A.dtype)

    shared_exp = shared_exp - emax
    scale_emax = 2 ** (scale_bits - 1) - 1
    shared_exp = jnp.where(shared_exp > scale_emax, jnp.float32(jnp.nan), shared_exp)
    shared_exp = jnp.where(shared_exp < -scale_emax, jnp.float32(-scale_emax), shared_exp)

    # The reference adds 1e-6 to the scale before dividing (mx_ops.py:444);
    # reproduced for bit parity with its pure-Python path.
    A = A / (exp2_exact(shared_exp) + 1e-6)

    A = quantize_elemwise_core(
        A, mbits, ebits, max_norm, round=round,
        allow_denorm=True, saturate_normals=True)

    A = mul_pow2(A, shared_exp)

    if block_size:
        A = undo_reshape_to_blocks(A, padded_shape, orig_shape, axes)
    return A


def quantize_mx_op(A: jax.Array, mx_specs, elem_format=None,
                   block_size: Optional[int] = None, axes: Axes = None,
                   round: str = "nearest") -> jax.Array:
    """Spec-driven MX quantization (reference: mx_ops.py:460-490)."""
    if elem_format is None:
        return A
    if block_size is None:
        block_size = mx_specs["block_size"]
    scale_bits = mx_specs["scale_bits"] if mx_specs["scale_bits"] != 0 else 8
    return quantize_mx(
        A, scale_bits, elem_format, block_size=block_size, axes=axes,
        round=round, shared_exp_method=mx_specs["shared_exp_method"],
        flush_fp32_subnorms=mx_specs["mx_flush_fp32_subnorms"])
