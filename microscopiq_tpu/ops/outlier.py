"""Outlier-aware two-level MX quantization (the MicroScopiQ core), pure JAX.

Re-implements the reference's outlier quantizers:

* :func:`quantize_mx_outlier_hessian` — ``utils/quant.py:23-146``. Used
  inside the GPTQ column loop; splits each block into inliers/outliers by a
  mean±k·std rule over |A|, quantizes inliers with a level-1 shared
  power-of-two scale, quantizes outliers with an additional level-2 shared
  scale (after multiplying by the level-1 scale), and returns the per-block
  outlier counts that drive GPTQ's prune-and-redistribute step.
* :func:`quantize_mx_outlier_v1` — ``utils/quant.py:147-266``; identical
  but without the outlier count.
* :func:`quantize_mx_outlier_op_v1` — ``number_system/mx/mx_ops.py:210-330``;
  the nn-layer variant whose outlier statistics are computed over the raw
  values (not |A|), with Bessel-corrected std, along the *block-count* axes.

The two-level scale structure mirrors the MicroScopiQ accelerator's scale
pipeline (``rtl/MicroScopiQ/scale_compute.v:55-57``): inlier scale = L1,
outlier scale = L2 applied on top of L1.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..formats import FP32_EXPONENT_BIAS, get_format_params
from .elemwise import mul_pow2, quantize_elemwise_core
from ..specs import mx_assert_finite
from .mx import (
    _normalize_axes,
    reshape_to_blocks,
    shared_exponents,
    undo_reshape_to_blocks,
)


def extract_outlier_indices(A: jax.Array, std_dev: float = 1.0,
                            axes: Optional[Sequence[int]] = None,
                            use_abs: bool = True,
                            unbiased: bool = False) -> jax.Array:
    """Per-block outlier mask: 1.0 where A falls outside mean ± k·std.

    ``use_abs=True, unbiased=False`` matches ``utils/quant.py:460-495``
    (statistics of |A|, population std); ``use_abs=False, unbiased=True``
    matches ``number_system/mx/mx_ops.py:49-83`` (statistics of raw A,
    Bessel-corrected std). Note the reference compares the *raw* values A
    against the bounds in both variants, even when the statistics are of
    |A| — reproduced faithfully.
    """
    if axes is not None:
        axes = tuple(axes)
        X = jnp.abs(A) if use_abs else A
        mean = jnp.mean(X, axis=axes, keepdims=True)
        var = jnp.var(X, axis=axes, keepdims=True, ddof=1 if unbiased else 0)
        std = jnp.sqrt(var)
    else:
        X = A
        mean = jnp.mean(X)
        std = jnp.std(X, ddof=1 if unbiased else 0)

    lower_bound = mean - (std_dev * std)
    upper_bound = mean + (std_dev * std)
    outliers = (A < lower_bound) | (A > upper_bound)
    return outliers.astype(A.dtype)


def _clamp_shared_exp(shared_exp: jax.Array, emax_elem: int, scale_bits: int,
                      underflow_floor_20: bool) -> jax.Array:
    """Offset by the element format's emax and clamp to scale_bits range.

    Overflow poisons to NaN. Underflow clamps to -scale_emax, or to -20 when
    ``underflow_floor_20`` and scale_emax > 20 (utils/quant.py:89,120 quirk).
    """
    shared_exp = shared_exp - emax_elem
    scale_emax = 2 ** (scale_bits - 1) - 1
    if underflow_floor_20:
        floor = -20 if (-scale_emax < -20) else -scale_emax
    else:
        floor = -scale_emax
    shared_exp = jnp.where(shared_exp > scale_emax, jnp.float32(jnp.nan), shared_exp)
    shared_exp = jnp.where(shared_exp < -scale_emax, jnp.float32(floor), shared_exp)
    return shared_exp


def _outlier_quantize_core(
    A: jax.Array,
    inlier_scale_bits: int,
    outlier_scale_bits: int,
    inlier_elem_format,
    outlier_elem_format,
    shared_exp_method: str,
    std_dev: float,
    axes,
    block_size: int,
    round: str,
    flush_fp32_subnorms: bool,
    *,
    stats_use_abs: bool,
    stats_unbiased: bool,
    stats_on_block_axis: bool,
    underflow_floor_20: bool,
    want_num_outliers: bool,
    want_decisions: bool = False,
    max_outliers_per_block: int = 0,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    assert inlier_scale_bits > 0 and outlier_scale_bits > 0

    axes = _normalize_axes(axes, A.ndim)

    ebits_in, mbits_in, emax_in, max_norm_in, _ = get_format_params(inlier_elem_format)
    ebits_out, mbits_out, emax_out, max_norm_out, _ = get_format_params(outlier_elem_format)

    orig_shape = padded_shape = None
    if block_size > 0:
        A, axes, orig_shape, padded_shape = reshape_to_blocks(A, axes, block_size)

    shared_exp_axes = [x + 1 for x in axes] if block_size > 0 else axes

    # Outlier statistics axes: intra-block axis for the GPTQ variants
    # (utils/quant.py:65), block-count axis for the nn-op variant
    # (mx_ops.py:248 passes the pre-shift `axes`).
    stats_axes = axes if stats_on_block_axis else shared_exp_axes
    outlier_pos = extract_outlier_indices(
        A, std_dev, stats_axes, use_abs=stats_use_abs, unbiased=stats_unbiased)

    if max_outliers_per_block:
        # Hardware-faithful outlier cap (the SCOPE NoC routes a bounded
        # number of outliers per block, rtl/MicroScopiQ/scope.v:22-50 /
        # NUM_SCOPES, microscopiq_top.v:22-44): keep only the
        # `max_outliers_per_block` largest-|A| outliers per block; the
        # rest quantize as inliers. Stable index tie-break so the kept
        # COUNT is exact (the compact serving transport's slot budget).
        assert block_size > 0 and len(shared_exp_axes) == 1
        ba = shared_exp_axes[0]
        Am = jnp.moveaxis(jnp.abs(A) * outlier_pos, ba, -1)
        flat = Am.reshape(-1, Am.shape[-1])
        order = jnp.argsort(-flat, axis=1, stable=True)
        ranks = jnp.argsort(order, axis=1, stable=True)  # inverse perm
        keep = (ranks < max_outliers_per_block).reshape(Am.shape)
        outlier_pos = outlier_pos * jnp.moveaxis(keep, -1, ba).astype(
            outlier_pos.dtype)

    num_outliers = None
    if want_num_outliers:
        # Reference quirk (utils/quant.py:66): subsamples every
        # `block_size`-th block along axis 0 before counting. Reproduced
        # exactly — GPTQ's prune budget depends on it.
        num_outliers = (
            outlier_pos[::block_size]
            .sum(axis=-2)
            .flatten()
            .astype(jnp.int8)
        )

    inlier_val = A * (1.0 - outlier_pos)
    outlier_val = A * outlier_pos

    # ---- Level-1 (inlier) shared scale --------------------------------
    shared_exp_in = shared_exponents(
        inlier_val, method=shared_exp_method, axes=shared_exp_axes, ebits=0)

    if flush_fp32_subnorms:
        inlier_val = inlier_val * (
            shared_exp_in > -FP32_EXPONENT_BIAS).astype(inlier_val.dtype)

    shared_exp_in = _clamp_shared_exp(
        shared_exp_in, emax_in, inlier_scale_bits, underflow_floor_20)

    inlier_val = mul_pow2(inlier_val, -shared_exp_in)
    # Level-1 scaling of outliers (multiplied, undone at reconstruction —
    # mirrors scale_compute.v:55-57's L2-L1 scale merge)
    outlier_val = mul_pow2(outlier_val, shared_exp_in)

    inlier_val = quantize_elemwise_core(
        inlier_val, mbits_in, ebits_in, max_norm_in, round=round,
        allow_denorm=True, saturate_normals=True)
    inlier_code = inlier_val            # pre-L1-scale value == the code
    inlier_val = mul_pow2(inlier_val, shared_exp_in)
    # NaN guards at the reference's check points (utils/quant.py:103-128)
    inlier_val = mx_assert_finite(inlier_val, "inlier_val")
    outlier_val = mx_assert_finite(outlier_val, "outlier_val (level-1)")

    # ---- Level-2 (outlier) shared scale -------------------------------
    shared_exp_out = shared_exponents(
        outlier_val, method=shared_exp_method, axes=shared_exp_axes, ebits=0)
    shared_exp_out = _clamp_shared_exp(
        shared_exp_out, emax_out, outlier_scale_bits, underflow_floor_20)
    # catches the deliberate NaN-poisoning of overflowed level-2 scales
    shared_exp_out = mx_assert_finite(shared_exp_out, "shared_exp_out")

    outlier_val = mul_pow2(outlier_val, -shared_exp_out)
    outlier_val = quantize_elemwise_core(
        outlier_val, mbits_out, ebits_out, max_norm_out, round=round,
        allow_denorm=True, saturate_normals=True)
    outlier_val = mx_assert_finite(outlier_val, "outlier_val (quantized)")
    outlier_code = outlier_val          # pre-scale value == the code
    outlier_val = mul_pow2(mul_pow2(outlier_val, shared_exp_out), -shared_exp_in)

    # ---- Reconstruct ----------------------------------------------------
    A = inlier_val + outlier_val
    if block_size:
        A = undo_reshape_to_blocks(A, padded_shape, orig_shape, axes)
    if want_decisions:
        # Everything a lossless packer needs (codes are pre-scale grid
        # values; scatter masks + both shared exponents). Shapes follow
        # the ORIGINAL (unblocked) layout for codes/mask; exponents keep
        # one entry per block along each quantized axis.
        undo = lambda x: (undo_reshape_to_blocks(
            x, padded_shape, orig_shape, axes) if block_size else x)
        decisions = {
            "inl_code": undo(inlier_code),
            "out_code": undo(outlier_code),
            "mask": undo(outlier_pos),
            "se_in": jnp.squeeze(shared_exp_in, axis=shared_exp_axes),
            "se_out": jnp.squeeze(shared_exp_out, axis=shared_exp_axes),
        }
        return A, num_outliers, decisions
    return A, num_outliers


def quantize_mx_outlier_hessian(
    A: jax.Array,
    inlier_scale_bits: int,
    outlier_scale_bits: int,
    inlier_elem_format,
    outlier_elem_format,
    shared_exp_method: str = "max",
    std_dev: float = 2,
    axes=None,
    block_size: int = 0,
    round: str = "nearest",
    flush_fp32_subnorms: bool = False,
    max_outliers_per_block: int = 0,
) -> Tuple[jax.Array, jax.Array]:
    """GPTQ-loop outlier quantizer; returns (quantized A, outlier counts).

    Parity target: ``utils/quant.py:23-146``. ``max_outliers_per_block``
    (0 = reference behavior, unbounded) keeps only the k largest-|A|
    outliers per block — the hardware's bounded SCOPE routing, and the
    slot budget of the compact serving transport.
    """
    if inlier_elem_format is None:
        return A, jnp.zeros((), jnp.int8)
    return _outlier_quantize_core(
        A, inlier_scale_bits, outlier_scale_bits,
        inlier_elem_format, outlier_elem_format,
        shared_exp_method, std_dev, axes, block_size, round,
        flush_fp32_subnorms,
        stats_use_abs=True, stats_unbiased=False, stats_on_block_axis=False,
        underflow_floor_20=True, want_num_outliers=True,
        max_outliers_per_block=max_outliers_per_block)


def quantize_mx_outlier_hessian_decisions(
    A: jax.Array,
    inlier_scale_bits: int,
    outlier_scale_bits: int,
    inlier_elem_format,
    outlier_elem_format,
    shared_exp_method: str = "max",
    std_dev: float = 2,
    axes=None,
    block_size: int = 0,
    round: str = "nearest",
    flush_fp32_subnorms: bool = False,
    max_outliers_per_block: int = 0,
):
    """Like :func:`quantize_mx_outlier_hessian` but also returns the
    quantization *decisions* (pre-scale codes, outlier mask, both shared
    exponents) so a packer can reproduce the quantized tensor losslessly.

    Re-deriving the outlier mask from the already-quantized values is NOT
    faithful: int2 quantization collapses the distribution, so a post-hoc
    mean±k·std re-extraction labels ~5.6 elements/block as outliers where
    the original quantization saw ~0.7 (measured on a GPTQ'd OPT layer) —
    the root cause of a 113→148 ppl regression in the packed transport
    before decisions-threading existed.
    """
    if inlier_elem_format is None:
        return A, jnp.zeros((), jnp.int8), None
    return _outlier_quantize_core(
        A, inlier_scale_bits, outlier_scale_bits,
        inlier_elem_format, outlier_elem_format,
        shared_exp_method, std_dev, axes, block_size, round,
        flush_fp32_subnorms,
        stats_use_abs=True, stats_unbiased=False, stats_on_block_axis=False,
        underflow_floor_20=True, want_num_outliers=True,
        want_decisions=True, max_outliers_per_block=max_outliers_per_block)


def quantize_mx_outlier_v1(
    A: jax.Array,
    inlier_scale_bits: int,
    outlier_scale_bits: int,
    inlier_elem_format,
    outlier_elem_format,
    shared_exp_method: str = "max",
    std_dev: float = 2,
    axes=None,
    block_size: int = 0,
    round: str = "nearest",
    flush_fp32_subnorms: bool = False,
) -> jax.Array:
    """RTN outlier quantizer (no counts). Parity: ``utils/quant.py:147-266``."""
    if inlier_elem_format is None:
        return A
    out, _ = _outlier_quantize_core(
        A, inlier_scale_bits, outlier_scale_bits,
        inlier_elem_format, outlier_elem_format,
        shared_exp_method, std_dev, axes, block_size, round,
        flush_fp32_subnorms,
        stats_use_abs=True, stats_unbiased=False, stats_on_block_axis=False,
        underflow_floor_20=True, want_num_outliers=False)
    return out


def quantize_mx_outlier_op_v1(
    A: jax.Array,
    inlier_scale_bits: int,
    outlier_scale_bits: int,
    inlier_elem_format,
    outlier_elem_format,
    shared_exp_method: str = "max",
    std_dev: float = 5,
    axes=None,
    block_size: int = 0,
    round: str = "nearest",
    flush_fp32_subnorms: bool = False,
) -> jax.Array:
    """nn-layer outlier quantizer. Parity: ``mx_ops.py:210-330``.

    Differs from the GPTQ variants: outlier statistics use raw values with
    Bessel-corrected std along the block-count axes, and the underflow
    clamp has no -20 floor.
    """
    if inlier_elem_format is None:
        return A
    out, _ = _outlier_quantize_core(
        A, inlier_scale_bits, outlier_scale_bits,
        inlier_elem_format, outlier_elem_format,
        shared_exp_method, std_dev, axes, block_size, round,
        flush_fp32_subnorms,
        stats_use_abs=False, stats_unbiased=True, stats_on_block_axis=True,
        underflow_floor_20=False, want_num_outliers=False)
    return out


def quantize_mx_outlier_op(
    A: jax.Array,
    mx_specs,
    inlier_elem_format=None,
    outlier_elem_format=None,
    block_size: Optional[int] = None,
    axes=None,
    round: str = "nearest",
) -> jax.Array:
    """Spec-driven wrapper (reference: mx_ops.py:492-533)."""
    if inlier_elem_format is None or outlier_elem_format is None:
        return A
    if block_size is None:
        block_size = mx_specs["block_size"]
    scale_bits = mx_specs["scale_bits"] if mx_specs["scale_bits"] != 0 else 4
    return quantize_mx_outlier_op_v1(
        A, scale_bits, scale_bits, inlier_elem_format, outlier_elem_format,
        block_size=block_size, axes=axes, round=round,
        shared_exp_method=mx_specs["shared_exp_method"],
        flush_fp32_subnorms=mx_specs["mx_flush_fp32_subnorms"])
