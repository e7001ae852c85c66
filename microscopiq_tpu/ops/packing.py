"""Packed MX weight storage — the real (non-fake-quant) representation.

The reference simulates quantization by fake-quantizing dense fp32 tensors
everywhere (``mx/linear.py:29-108``). The TPU framework instead *stores*
packed representations and fuses dequantization into the matmul:

* Element codes live in a hardware-native **container dtype**:
  ``float8_e4m3fn`` for the sub-byte fp formats (every fp4/fp6 value is
  exactly representable in e4m3 — same trick the MicroScopiQ PE plays with
  its mixed-precision multiplier), ``float8_e5m2``/``int8`` otherwise.
  Dequant is then a native dtype-convert + per-block power-of-two scale,
  which XLA fuses straight into the MXU matmul.
* Per-block shared exponents are ``int8``.
* Outliers are a fixed-budget side-band ``(values, positions)`` per block
  with a second-level exponent — the static-shape TPU equivalent of the
  reference's in-place dense outliers and the SCOPE NoC's redistribution
  (``rtl/MicroScopiQ/scope.v:22-50``): the budget is what the butterfly
  network routes per block.
* For HBM-bandwidth-bound serving there are true sub-byte *transport*
  packings (2×int4/byte, 4×int2/byte, 2×fp4/byte, 4×fp6 → 3 bytes) that
  the Pallas kernels unpack in VMEM.

Bit-parity: ``dequantize(pack_mx(W, cfg))`` reproduces the fake-quant
``quantize_mx(W, cfg)`` output bit-exactly (both use the same scaled
divide, including the reference's ``+1e-6`` quirk), so calibration and
serving agree.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
from jax import lax

from ..formats import ElemFormat, get_format_params
from .elemwise import exp2_exact, floor_log2, mul_pow2, quantize_elemwise_core
from .mx import shared_exponents
from .outlier import extract_outlier_indices, _clamp_shared_exp

# ---------------------------------------------------------------------------
# Container dtypes
# ---------------------------------------------------------------------------
_FP8_E4M3 = jnp.float8_e4m3fn
_FP8_E5M2 = jnp.float8_e5m2

_CONTAINERS = {
    ElemFormat.int8: jnp.int8,
    ElemFormat.int4: jnp.int8,
    ElemFormat.int2: jnp.int8,
    ElemFormat.fp8_e4m3: _FP8_E4M3,
    ElemFormat.fp8_e5m2: _FP8_E5M2,
    ElemFormat.fp6_e3m2: _FP8_E4M3,
    ElemFormat.fp6_e2m3: _FP8_E4M3,
    ElemFormat.fp4: _FP8_E4M3,
    ElemFormat.float16: jnp.float16,
    ElemFormat.bfloat16: jnp.bfloat16,
}


def container_dtype(fmt) -> jnp.dtype:
    """Smallest native dtype that exactly holds every value of ``fmt``."""
    if isinstance(fmt, str):
        fmt = ElemFormat.from_str(fmt)
    return _CONTAINERS[fmt]


def _is_int_format(fmt) -> bool:
    if isinstance(fmt, str):
        fmt = ElemFormat.from_str(fmt)
    return fmt in (ElemFormat.int8, ElemFormat.int4, ElemFormat.int2)


# ---------------------------------------------------------------------------
# emi8 GEMM transport: fp4/fp6 code -> one int8 byte = (m̂ << (8-mw)) | e'
# ---------------------------------------------------------------------------
def emi8_params(fmt) -> Tuple[int, int, int]:
    """(mw, mm, emin) for the emi8 byte layout of a sub-byte fp format.

    Every fp4/fp6 value is exactly ``m̂ · 2^(e' + emin - mm)`` with integer
    mantissa ``m̂`` (two's-complement in the low ``mw = mbits`` bits,
    |m̂| ≤ 2^(mbits-1)-1) and biased exponent ``e' = max(e, emin) - emin``
    in the high bits. Normals have |m̂| ≥ 2^mm, subnormals e' = 0 and
    |m̂| < 2^mm — one shared formula, no special cases. The Pallas GEMV
    decodes this with 4 integer VPU ops (sign-extend, shift-extract,
    variable left-shift, convert), avoiding Mosaic's slow float8 convert
    path entirely; the remaining 2^(emin - mm) factor folds into the
    per-block scale (the TPU analog of the two-level scale merge,
    rtl/MicroScopiQ/scale_compute.v:55-57).
    """
    if isinstance(fmt, str):
        fmt = ElemFormat.from_str(fmt)
    if fmt not in (ElemFormat.fp4, ElemFormat.fp6_e3m2,
                   ElemFormat.fp6_e2m3):
        raise ValueError(f"emi8 transport only supports fp4/fp6, got {fmt}")
    ebits, mbits, emax, _, _ = get_format_params(fmt)
    emin = 2 - (2 ** (ebits - 1))
    mw = mbits                      # signed integer-mantissa field
    assert (emax - emin) < (1 << (8 - mw)), "fields must fit one byte"
    return mw, mbits - 2, emin


def _emi8_encode(q: jax.Array, fmt) -> jax.Array:
    """Exact fp values q (already fake-quantized to fmt) -> emi8 bytes."""
    mw, mm, emin = emi8_params(fmt)
    aq = jnp.abs(q)
    e = jnp.clip(floor_log2(jnp.maximum(aq, 2.0 ** (emin - mm))),
                 emin, None).astype(jnp.int32)
    mhat = jnp.round(q * exp2_exact((mm - e).astype(jnp.float32))
                     ).astype(jnp.int32)
    eprime = e - emin
    # m̂ lives in the HIGH bits (sign at bit 7): the in-kernel decode is
    # then a plain int8 sign-extension + arithmetic shift — two fewer
    # VPU ops per element than the (e'|m̂) layout
    return (((mhat & ((1 << mw) - 1)) << (8 - mw)) | eprime
            ).astype(jnp.int8)


def _emi8_decode_f32(codes: jax.Array, fmt) -> jax.Array:
    """emi8 bytes -> q · 2^(mm - emin); the caller applies the
    2^(emin - mm) fold (usually merged into the block scale)."""
    mw, mm, emin = emi8_params(fmt)
    c = codes.astype(jnp.int32)               # int8 sign-extends m̂
    mhat = c >> (8 - mw)                      # arithmetic: signed m̂
    eprime = c & ((1 << (8 - mw)) - 1)        # low bits of the raw byte
    return (mhat << eprime).astype(jnp.float32)


def emi8_fold(fmt) -> int:
    """Scale fold for emi8 codes: value = decoded · 2^(-fold)."""
    mw, mm, emin = emi8_params(fmt)
    return mm - emin


# ---------------------------------------------------------------------------
# emi8m: the two-level outlier format merged into one emi8-style stream
#
# The reference's serving story for the MicroScopiQ format is hardware: the
# SCOPE butterfly NoC routes outlier partial sums into pruned inlier slots
# (rtl/MicroScopiQ/scope.v:22-50) and scale_compute.v:55-57 merges the
# L2/L1 scales. The TPU analog below does the merge ONCE at pack time:
# every element (inlier or outlier) of value m̂·2^E is stored as one int8
# byte (m̂ << (8−mw)) | e' with e' = E + fold − se relative to the block's L1
# exponent. Serving then needs NO side-band and NO in-kernel scatter — the
# plain scale-after-dot GEMV streams one byte per element at the chip's
# DMA rate. Encoding is exact (both levels are small-mantissa × power-of-
# two); merge_outlier_emi8 verifies representability and raises otherwise.
# ---------------------------------------------------------------------------
def emi8m_decode_f32(codes: jax.Array, mw: int) -> jax.Array:
    """emi8m bytes -> value · 2^fold (caller folds 2^(se - fold))."""
    c = codes.astype(jnp.int32)               # int8 sign-extends m̂
    mhat = c >> (8 - mw)
    return (mhat << (c & ((1 << (8 - mw)) - 1))).astype(jnp.float32)


def _pow2_decompose(t: "np.ndarray"):
    """Exact integer decomposition t = m0 · 2^e0 with m0 odd (0 for 0)."""
    import numpy as np

    m, e = np.frexp(t)
    m53 = np.round(m * (2.0 ** 53)).astype(np.int64)     # exact for f64
    e0 = e.astype(np.int64) - 53
    nz = m53 != 0
    low = np.ones_like(m53)
    low[nz] = m53[nz] & -m53[nz]                          # lowest set bit
    tz = np.log2(low.astype(np.float64)).astype(np.int64)
    m0 = np.where(nz, m53 >> tz, 0)
    e0 = np.where(nz, e0 + tz, 0)
    return m0, e0, nz


def _emi8m_fields(decomp, mw: int, fold: int):
    """Exact (e', m̂) int fields for values m0·2^(e0+fold), or None if the
    (mw, fold) split cannot represent them exactly."""
    import numpy as np

    m0, e0, nz = decomp
    g = e0 + fold                                         # required shift
    if np.any(nz & (g < 0)):
        return None                                       # sub-fold values
    efield_max = (1 << (8 - mw)) - 1
    j = np.maximum(0, g - efield_max)                     # excess into m̂
    if np.any(nz & (j > 32)):
        return None
    mhat = np.where(nz, m0 << np.minimum(j, 32), 0)
    eprime = np.where(nz, g - j, 0)
    if np.any((mhat > (1 << (mw - 1)) - 1) | (mhat < -(1 << (mw - 1)))):
        return None
    # in-kernel decode does m̂ << e' in int32: keep it exactly representable
    with np.errstate(over="ignore"):
        if np.any(nz & (np.abs(mhat.astype(np.float64))
                        * np.exp2(eprime.astype(np.float64)) >= 2.0 ** 31)):
            return None
    return eprime.astype(np.int64), mhat.astype(np.int64)


def _emi8m_bytes(eprime, mhat, mw: int):
    import numpy as np

    byte = ((mhat & ((1 << mw) - 1)) << (8 - mw)) | eprime
    return (byte & 0xFF).astype(np.uint8).view(np.int8)


def merge_outlier_emi8(p: "PackedMXOutlier", mw: int = 0, fold: int = -1,
                       ) -> "PackedMX":
    """Collapse a PackedMXOutlier into one emi8m PackedMX (exact).

    With mw/fold defaulted, the smallest feasible mantissa width and scale
    fold are chosen per tensor. Raises ValueError when the values cannot be
    represented exactly (degenerate scale gaps; keep the side-band then).
    """
    import numpy as np

    inl = p.inlier
    bs = inl.block_size
    codes = np.asarray(inl.codes)
    se_in = np.asarray(inl.scale_exp).astype(np.int64)
    oc = np.asarray(jnp.asarray(p.out_codes, jnp.float32))
    pos = np.asarray(p.out_pos)
    se_out = np.asarray(p.out_scale_exp).astype(np.int64)
    axis_n = inl.axis % codes.ndim
    if axis_n != codes.ndim - 1:
        codes = np.moveaxis(codes, axis_n, -1)
        se_in = np.moveaxis(se_in, axis_n, -1)
        oc = np.moveaxis(oc, axis_n, -2)
        pos = np.moveaxis(pos, axis_n, -2)
        se_out = np.moveaxis(se_out, axis_n, -1)

    nb = codes.shape[-1] // bs
    t = np.asarray(jnp.asarray(_code_decode(jnp.asarray(codes),
                                            inl.elem_format))
                   ).astype(np.float64)
    t = t.reshape(t.shape[:-1] + (nb, bs))
    # Outlier absolute value is oc · 2^(L2 − L1): pack_mx_outlier scales
    # outliers by 2^{+L1} before the L2 exponent is taken (the reference's
    # utils/quant.py:94-136 convention). Relative to the block's L1
    # exponent that is oc · 2^(L2 − 2·L1).
    rel = oc.astype(np.float64) * np.exp2((se_out - 2 * se_in)[..., None]
                                          .astype(np.float64))
    # Scatter outliers into their block rows. Valid positions are unique
    # within a block (argsort-selected), so a vectorized put_along_axis
    # suffices; invalid slots land in a dump column. (np.add.at here was
    # ~20x slower at model scale.)
    valid = pos >= 0
    nrows = t.size // bs
    addv = np.zeros((nrows, bs + 1), t.dtype)
    np.put_along_axis(addv, np.where(valid, pos, bs).reshape(nrows, -1),
                      np.where(valid, rel, 0.0).reshape(nrows, -1),
                      axis=-1)
    t = t + addv[:, :bs].reshape(t.shape)

    flat = t.reshape(-1)
    decomp = _pow2_decompose(flat)                # once; reused per mw
    if fold < 0:
        m0, e0, nz = decomp
        fold = max(0, int(-e0[nz].min())) if nz.any() else 0
    tried = []
    for mw_c in ([mw] if mw else range(2, 8)):
        fields = _emi8m_fields(decomp, mw_c, fold)
        tried.append((mw_c, fold))
        if fields is not None:
            eprime, mhat = fields
            out = _emi8m_bytes(eprime, mhat, mw_c).reshape(
                codes.shape)
            if axis_n != codes.ndim - 1:
                out = np.moveaxis(out, -1, axis_n)
            import dataclasses as _dc

            return _dc.replace(
                inl, codes=jnp.asarray(out), transport="emi8m",
                transport_mw=mw_c, transport_fold=fold)
    raise ValueError(f"values not exactly emi8m-representable {tried}")


def pack_emi8m_absolute(A: jax.Array, block_size: int = 32, mw: int = 0,
                        axis: int = 0, elem_format: str = "int2"
                        ) -> "PackedMX":
    """Encode EXACT (already fake-quantized) values as an *absolute*
    emi8m stream: one (e'|m̂) byte per element, a single per-tensor scale
    fold, and all-zero per-block exponents.

    Because each element's full exponent lives in its own byte, this is
    geometry-free: it serves quantized tensors of ANY block structure —
    in particular the GPTQ drivers' 16-element blocks along the
    *out-features* axis (llm/opt.py:87-94 axes=[0]), which the
    contraction-axis-blocked scale-after-dot kernels cannot otherwise
    express. It is exact by construction (every MX/outlier grid value is
    a small odd mantissa × power of two); raises ValueError when the
    tensor's dynamic range or mantissas don't fit a byte (fall back to
    the per-block side-band form then). The block_size/scale_exp here
    exist only to satisfy the kernels' block layout; the exponents are 0.
    """
    import numpy as np

    t = np.asarray(jnp.asarray(A, jnp.float32)).astype(np.float64)
    axis_n = axis % t.ndim
    if axis_n != t.ndim - 1:
        t = np.moveaxis(t, axis_n, -1)
    n = t.shape[-1]
    pad = (-n) % block_size
    if pad:
        t = np.concatenate(
            [t, np.zeros(t.shape[:-1] + (pad,), t.dtype)], axis=-1)
    decomp = _pow2_decompose(t.reshape(-1))
    m0, e0, nz = decomp
    fold = max(0, int(-e0[nz].min())) if nz.any() else 0
    tried = []
    for mw_c in ([mw] if mw else range(2, 8)):
        fields = _emi8m_fields(decomp, mw_c, fold)
        tried.append((mw_c, fold))
        if fields is None:
            continue
        eprime, mhat = fields
        codes = _emi8m_bytes(eprime, mhat, mw_c).reshape(t.shape)
        nb = t.shape[-1] // block_size
        se = np.zeros(t.shape[:-1] + (nb,), np.int8)
        if axis_n != A.ndim - 1:
            codes = np.moveaxis(codes, -1, axis_n)
            se = np.moveaxis(se, -1, axis_n)
        return PackedMX(
            codes=jnp.asarray(codes), scale_exp=jnp.asarray(se),
            elem_format=elem_format, block_size=block_size,
            scale_bits=8, orig_dim=n, axis=axis_n,
            transport="emi8m", transport_mw=mw_c, transport_fold=fold)
    raise ValueError(f"values not exactly emi8m-representable {tried}")


def emi8m_rebase(p: "PackedMX", mw: int, fold: int) -> "PackedMX":
    """Re-encode an emi8m tensor to a common (mw, fold) — used before
    concatenating fused projections. Exact or raises ValueError."""
    import numpy as np

    assert p.transport == "emi8m"
    if mw == p.transport_mw and fold == p.transport_fold:
        return p
    c = np.asarray(p.codes).view(np.uint8).astype(np.int64)
    omw = p.transport_mw
    mhat = ((c >> (8 - omw)) ^ (1 << (omw - 1))) - (1 << (omw - 1))
    eprime = (c & ((1 << (8 - omw)) - 1)) + (fold - p.transport_fold)
    # renormalize into the new fields
    efield_max = (1 << (8 - mw)) - 1
    j = np.maximum(0, eprime - efield_max)
    if np.any((mhat != 0) & ((eprime < 0) | (j > 32))):
        raise ValueError("emi8m rebase infeasible")
    mhat = np.where(mhat != 0, mhat << np.minimum(j, 32), 0)
    eprime = np.where(mhat != 0, eprime - j, 0)
    if np.any((mhat > (1 << (mw - 1)) - 1) | (mhat < -(1 << (mw - 1)))):
        raise ValueError("emi8m rebase infeasible")
    import dataclasses as _dc

    return _dc.replace(
        p, codes=jnp.asarray(_emi8m_bytes(eprime, mhat, mw)
                             .reshape(c.shape)),
        transport_mw=mw, transport_fold=fold)


def subbyte_params(fmt) -> Tuple[int, int]:
    """(codes_per_byte, bits) for the sb4/sb2 GEMM transports."""
    if isinstance(fmt, str):
        fmt = ElemFormat.from_str(fmt)
    if fmt == ElemFormat.int4:
        return 2, 4
    if fmt == ElemFormat.int2:
        return 4, 2
    raise ValueError(f"sub-byte transport only for int4/int2, got {fmt}")


def transport_rows_per_block(transport: str, block_size: int) -> int:
    """Packed storage rows spanned by one block along the blocked axis."""
    return {"sb4": block_size // 2, "sb2": block_size // 4,
            "pf4": block_size // 2, "pf6": 3 * block_size // 4}.get(
                transport, block_size)


def _pf_pack(q: jax.Array, fmt, block_size: int, transport: str
             ) -> jax.Array:
    """Raw fp-bit sub-byte packing for the pf4/pf6 GEMM transports.

    q: fake-quantized grid values (..., nb, B). pf4 stores the 4-bit
    s|e|m code sb4-style (2/byte, blockwise interleave). pf6 splits the
    6-bit code into a low-4-bit plane (sb4-style, B/2 rows) and a
    high-2-bit plane (sb2-style, B/4 rows, carrying sign|e2) stored
    after it within the block — 6 bits/element, all sublane regroups in
    the kernel. Requires block_size % 32 == 0 for pf6 (the hi plane's
    B/4 rows must stay 8-aligned); the paper's fp6 config is block 32
    (examples/run_mx_fp6.sh:2)."""
    B = block_size
    c = encode_fp_bits(q, fmt).astype(jnp.int8)      # (..., nb, B)
    flat = c.reshape(c.shape[:-2] + (-1,))
    if transport == "pf4":
        assert B % 16 == 0, "pf4 needs block_size % 16 == 0"
        return _subbyte_pack(flat, B, 2, 4)
    assert B % 32 == 0, "pf6 needs block_size % 32 == 0"
    lo = _subbyte_pack(flat & 0xF, B, 2, 4)          # (..., nb·B/2)
    hi = _subbyte_pack((flat.astype(jnp.int32) >> 4).astype(jnp.int8),
                       B, 4, 2)                      # (..., nb·B/4)
    nb = flat.shape[-1] // B
    lo = lo.reshape(lo.shape[:-1] + (nb, B // 2))
    hi = hi.reshape(hi.shape[:-1] + (nb, B // 4))
    out = jnp.concatenate([lo, hi], axis=-1)         # (..., nb, 3B/4)
    return out.reshape(out.shape[:-2] + (-1,))


def _pf_unpack(packed: jax.Array, fmt, block_size: int, transport: str
               ) -> jax.Array:
    """Inverse of :func:`_pf_pack` -> sign-extended int8 fp-bit codes."""
    B = block_size
    if transport == "pf4":
        return _subbyte_unpack(packed, B, 2, 4)      # arith-extended 4b
    rows = 3 * B // 4
    nb = packed.shape[-1] // rows
    p = packed.reshape(packed.shape[:-1] + (nb, rows))
    lo4 = _subbyte_unpack(
        p[..., :B // 2].reshape(p.shape[:-2] + (nb * (B // 2),)),
        B, 2, 4).astype(jnp.int32) & 0xF
    hi2 = _subbyte_unpack(
        p[..., B // 2:].reshape(p.shape[:-2] + (nb * (B // 4),)),
        B, 4, 2).astype(jnp.int32)                   # arith-extended 2b
    return ((hi2 << 4) | lo4).astype(jnp.int8)       # sign-extended 6b


def pf_decode_int(c: jax.Array, ebits: int, mm: int) -> jax.Array:
    """Sign-extended raw fp-bit codes -> integer values = q · 2^fold
    (fold = emi8_fold): mag = (m | implicit<<mm) << max(e-1, 0), sign
    applied two's-complement. Pure int32 VPU ops — the kernel decode."""
    c = c.astype(jnp.int32)
    e = lax.shift_right_arithmetic(c, mm) & ((1 << ebits) - 1)
    m = c & ((1 << mm) - 1)
    ne = jnp.minimum(e, 1)
    mag = lax.shift_left(m | lax.shift_left(ne, mm), e - ne)
    smask = lax.shift_right_arithmetic(c, 31)
    return (mag ^ smask) - smask


def _subbyte_pack(codes: jax.Array, block_size: int, per: int,
                  bits: int) -> jax.Array:
    """Blockwise-interleaved sub-byte packing along the blocked axis.

    codes: (..., K) int8 with K % block_size == 0. Byte row r of block b
    packs the codes at offsets r, r + B/per, ..., r + (per-1)·B/per —
    the layout the SAD kernel reassembles with one sublane concat after
    `per` shift-extracts (no lane ops). Returns (..., K//per) int8.
    """
    B = block_size
    assert B % per == 0
    *lead, K = codes.shape
    nb = K // B
    c = codes.astype(jnp.int32).reshape(*lead, nb, per, B // per)
    mask = (1 << bits) - 1
    out = jnp.zeros(c.shape[:-2] + (B // per,), jnp.int32)
    for i in range(per):
        out = out | ((c[..., i, :] & mask) << (bits * i))
    return out.astype(jnp.int8).reshape(*lead, nb * (B // per))


def _subbyte_unpack(packed: jax.Array, block_size: int, per: int,
                    bits: int) -> jax.Array:
    """Inverse of :func:`_subbyte_pack` (pure JAX; the kernel twin)."""
    B = block_size
    *lead, Kp = packed.shape
    nb = Kp // (B // per)
    p = packed.astype(jnp.int32).reshape(*lead, nb, B // per)
    shift = 32 - bits
    fields = []
    for i in range(per):
        f = (p >> (bits * i)) & ((1 << bits) - 1)
        fields.append(((f << shift) >> shift))      # sign-extend
    c = jnp.stack(fields, axis=-2)                  # (..., nb, per, B/per)
    return c.reshape(*lead, nb * B).astype(jnp.int8)


def to_serving_layout(p: "PackedMX") -> "PackedMX":
    """Pre-block a (K, N) axis=0 PackedMX into the exact operand forms
    the scale-after-dot GEMV consumes: codes (K/B, rows, N); scale_exp
    stays 2D (K/B, N) — its natural int8 tiling. Done once at load
    time — XLA otherwise materializes the codes 2D→3D retiling as a
    full-tensor copy on EVERY kernel call (measured 1.6 ms/step on a
    12-layer Llama-8B decode)."""
    if p.codes.ndim == 3:
        if p.scale_exp.ndim == 3:        # legacy (K/B, 1, N) scales
            import dataclasses as _dc

            nb, _, N = p.scale_exp.shape
            return _dc.replace(p, scale_exp=p.scale_exp.reshape(nb, N))
        return p
    assert p.axis == 0 and p.codes.ndim == 2
    # sub-byte transports store packed bytes: a block spans `rows` rows
    rows = transport_rows_per_block(p.transport, p.block_size)
    K, N = p.codes.shape
    nb = K // rows
    import dataclasses as _dc

    return _dc.replace(
        p, codes=jnp.asarray(p.codes).reshape(nb, rows, N))


def from_serving_layout(p: "PackedMX") -> "PackedMX":
    """Inverse of :func:`to_serving_layout` (used by fallback paths)."""
    if p.codes.ndim == 2:
        return p
    nb, B, N = p.codes.shape
    import dataclasses as _dc

    se = p.scale_exp
    if se.ndim == 3:
        se = se.reshape(nb, N)
    return _dc.replace(p, codes=p.codes.reshape(nb * B, N),
                       scale_exp=se)


# ---------------------------------------------------------------------------
# Packed containers (pytrees; config fields are static)
# ---------------------------------------------------------------------------
@flax.struct.dataclass
class PackedMX:
    """MX-quantized tensor: codes + per-block shared exponents.

    codes:     same shape as the source tensor (padded to block multiple
               along `axis`), container dtype; for int formats the integer
               mantissa (value × 2^(mbits-2)).
    scale_exp: int8 shared exponent per block; shape = codes' with `axis`
               reduced by block_size. For int formats the mantissa shift
               is folded in at dequant.
    axis:      the blocked axis. Weights for the fused GEMM are stored
               transposed (K, N) with axis=0 so block expansion is a
               sublane (second-minor) broadcast — the layout the MXU and
               Mosaic want; activations block their last axis.
    """

    codes: jax.Array
    scale_exp: jax.Array
    elem_format: str = flax.struct.field(pytree_node=False)
    block_size: int = flax.struct.field(pytree_node=False)
    scale_bits: int = flax.struct.field(pytree_node=False)
    orig_dim: int = flax.struct.field(pytree_node=False)
    axis: int = flax.struct.field(pytree_node=False, default=-1)
    # "native": container dtype per _CONTAINERS (f8 for sub-byte fp).
    # "emi8":   fp4/fp6 codes as (e'|m̂) int8 bytes — the GEMM transport
    #           (integer decode in-kernel; see emi8_params).
    # "emi8m":  merged two-level outlier stream (see merge_outlier_emi8):
    #           per-element (e'|m̂) bytes with tensor-specific field split
    #           transport_mw and scale fold transport_fold.
    transport: str = flax.struct.field(pytree_node=False, default="native")
    transport_mw: int = flax.struct.field(pytree_node=False, default=0)
    transport_fold: int = flax.struct.field(pytree_node=False, default=0)

    @property
    def bits_per_element(self) -> float:
        if self.transport in ("emi8", "emi8m"):
            elem_bits = 8          # one byte per element, whatever the fmt
        elif self.transport in ("sb4", "sb2", "pf4", "pf6"):
            elem_bits = 8 * transport_rows_per_block(
                self.transport, self.block_size) / self.block_size
        else:
            # native: realized container bytes (int8/f8/f16), not the
            # format's nominal width
            elem_bits = 8 * jnp.dtype(container_dtype(
                self.elem_format)).itemsize
        return elem_bits + self.scale_bits / self.block_size


@flax.struct.dataclass
class PackedMXOutlier:
    """Two-level outlier-aware packed tensor (the MicroScopiQ format).

    inlier:        PackedMX of the inliers (outlier slots hold code 0).
    out_codes:     (..., nblocks, K) outlier codes (container dtype).
    out_pos:       (..., nblocks, K) int32 position within block; -1 = empty.
    out_scale_exp: (..., nblocks) int8 level-2 exponent.
    """

    inlier: PackedMX
    out_codes: jax.Array
    out_pos: jax.Array
    out_scale_exp: jax.Array
    outlier_format: str = flax.struct.field(pytree_node=False)
    outlier_scale_bits: int = flax.struct.field(pytree_node=False)


# ---------------------------------------------------------------------------
# Pack / dequantize (last-axis blocking; transpose beforehand for others)
# ---------------------------------------------------------------------------
def _block_last_axis(A: jax.Array, block_size: int) -> Tuple[jax.Array, int]:
    n = A.shape[-1]
    pad = (-n) % block_size
    if pad:
        A = jnp.pad(A, [(0, 0)] * (A.ndim - 1) + [(0, pad)])
    nb = A.shape[-1] // block_size
    return A.reshape(A.shape[:-1] + (nb, block_size)), n


def _code_cast(vals_scaled: jax.Array, fmt) -> jax.Array:
    """Cast scaled fake-quantized values into the container dtype."""
    if _is_int_format(fmt):
        _, mbits, _, _, _ = get_format_params(fmt)
        return jnp.round(vals_scaled * (2 ** (mbits - 2))).astype(jnp.int8)
    return vals_scaled.astype(container_dtype(fmt))


def _code_decode(codes: jax.Array, fmt) -> jax.Array:
    """Container codes -> scaled float values."""
    if _is_int_format(fmt):
        _, mbits, _, _, _ = get_format_params(fmt)
        return codes.astype(jnp.float32) * (2.0 ** -(mbits - 2))
    return codes.astype(jnp.float32)


def pack_mx(A: jax.Array, scale_bits: int, elem_format, block_size: int,
            round: str = "nearest", exact_scale: bool = False,
            axis: int = -1, transport: str = "native") -> PackedMX:
    """Quantize A (blocking the last axis) into packed storage.

    With ``exact_scale=False`` (default) uses the same math as
    :func:`microscopiq_tpu.ops.mx.quantize_mx` (incl. the reference's
    +1e-6 scale quirk, mx_ops.py:444) so that
    ``dequantize(pack_mx(A)) == quantize_mx(A)`` bit-exactly.
    ``exact_scale=True`` divides by the exact power-of-two scale — the
    production packed path and the Pallas kernel twin.
    """
    if isinstance(elem_format, str):
        fmt = ElemFormat.from_str(elem_format)
        fmt_name = elem_format
    else:
        fmt = elem_format
        fmt_name = fmt.name
    ebits, mbits, emax, max_norm, _ = get_format_params(fmt)

    axis_n = axis % A.ndim
    A_ = A if axis_n == A.ndim - 1 else jnp.moveaxis(A, axis_n, -1)

    blocked, orig_dim = _block_last_axis(A_.astype(jnp.float32), block_size)
    se = shared_exponents(blocked, "max", axes=[blocked.ndim - 1], ebits=0)
    se = se - emax
    scale_emax = 2 ** (scale_bits - 1) - 1
    se = jnp.clip(se, -scale_emax, scale_emax)

    if exact_scale:
        scaled = mul_pow2(blocked, -se)
    else:
        scaled = blocked / (exp2_exact(se) + 1e-6)
    q = quantize_elemwise_core(scaled, mbits, ebits, max_norm, round=round,
                               allow_denorm=True, saturate_normals=True)
    if transport == "emi8":
        codes = _emi8_encode(q, fmt)
        codes = codes.reshape(blocked.shape[:-2] + (-1,))
    elif transport in ("pf4", "pf6"):
        want = ElemFormat.fp4 if transport == "pf4" else (
            ElemFormat.fp6_e3m2, ElemFormat.fp6_e2m3)
        assert (fmt == want if transport == "pf4" else fmt in want), \
            f"{transport} transport needs a matching fp format, got {fmt}"
        codes = _pf_pack(q, fmt, block_size, transport)
    elif transport in ("sb4", "sb2"):
        per, bits = subbyte_params(fmt)
        assert per == {"sb4": 2, "sb2": 4}[transport], \
            f"{transport} transport needs {'int4' if per == 2 else 'int2'}"
        codes = _code_cast(q, fmt).reshape(blocked.shape[:-2] + (-1,))
        codes = _subbyte_pack(codes, block_size, per, bits)
    elif transport == "native":
        codes = _code_cast(q, fmt)
        codes = codes.reshape(blocked.shape[:-2] + (-1,))
    else:
        raise ValueError(f"unknown transport {transport!r}")
    se = se[..., 0].astype(jnp.int8)
    if axis_n != A.ndim - 1:
        codes = jnp.moveaxis(codes, -1, axis_n)
        se = jnp.moveaxis(se, -1, axis_n)
    return PackedMX(
        codes=codes, scale_exp=se,
        elem_format=fmt_name, block_size=block_size,
        scale_bits=scale_bits, orig_dim=orig_dim, axis=axis_n,
        transport=transport)


def dequantize_mx(p: PackedMX, dtype=jnp.float32) -> jax.Array:
    """Dense tensor from packed storage (bit-exact vs quantize_mx)."""
    if p.axis == 0 and p.codes.ndim == 3 and p.scale_exp.ndim in (2, 3):
        p = from_serving_layout(p)
    codes = p.codes
    se = p.scale_exp
    axis_n = p.axis % codes.ndim
    if axis_n != codes.ndim - 1:
        codes = jnp.moveaxis(codes, axis_n, -1)
        se = jnp.moveaxis(se, axis_n, -1)
    if p.transport in ("sb4", "sb2"):
        per, bits = subbyte_params(p.elem_format)
        codes = _subbyte_unpack(codes, p.block_size, per, bits)
    elif p.transport in ("pf4", "pf6"):
        codes = _pf_unpack(codes, p.elem_format, p.block_size, p.transport)
    nb = codes.shape[-1] // p.block_size
    if p.transport == "emi8":
        vals = _emi8_decode_f32(codes, p.elem_format)
        se = se.astype(jnp.int32) - emi8_fold(p.elem_format)
    elif p.transport == "emi8m":
        vals = emi8m_decode_f32(codes, p.transport_mw)
        se = se.astype(jnp.int32) - p.transport_fold
    elif p.transport in ("pf4", "pf6"):
        ebits, mbits, _, _, _ = get_format_params(p.elem_format)
        vals = pf_decode_int(codes, ebits, mbits - 2).astype(jnp.float32)
        se = se.astype(jnp.int32) - emi8_fold(p.elem_format)
    else:
        vals = _code_decode(codes, p.elem_format)
    vals = vals.reshape(vals.shape[:-1] + (nb, p.block_size))
    vals = mul_pow2(vals, se[..., None].astype(jnp.float32))
    vals = vals.reshape(vals.shape[:-2] + (-1,))
    vals = vals[..., :p.orig_dim]
    if axis_n != codes.ndim - 1:
        vals = jnp.moveaxis(vals, -1, axis_n)
    return vals.astype(dtype)


def pack_mx_outlier(A: jax.Array, inlier_scale_bits: int,
                    outlier_scale_bits: int, inlier_elem_format,
                    outlier_elem_format, std_dev: float = 2.0,
                    block_size: int = 16, outlier_budget: int = 4,
                    round: str = "nearest", axis: int = -1
                    ) -> PackedMXOutlier:
    """Pack with the two-level outlier scheme (utils/quant.py:23-146
    semantics, hessian/GPTQ variant statistics) into static-shape storage.

    Per block at most ``outlier_budget`` outliers are kept (largest |value|
    first); the reference keeps all outliers in its dense simulation, so
    choose ``outlier_budget`` >= max observed count for exact parity. The
    fixed budget is what makes the fused GEMM's scatter a static-shape
    gather (cf. SURVEY.md §7 hard-part 3).
    """
    fmt_in = inlier_elem_format
    fmt_out = outlier_elem_format
    eb_i, mb_i, emax_i, mn_i, _ = get_format_params(fmt_in)
    eb_o, mb_o, emax_o, mn_o, _ = get_format_params(fmt_out)

    axis_n = axis % A.ndim
    A_ = A if axis_n == A.ndim - 1 else jnp.moveaxis(A, axis_n, -1)
    blocked, orig_dim = _block_last_axis(A_.astype(jnp.float32), block_size)
    K = outlier_budget

    mask = extract_outlier_indices(blocked, std_dev, axes=[blocked.ndim - 1],
                                   use_abs=True, unbiased=False)
    inl = blocked * (1.0 - mask)
    outl = blocked * mask

    se_in = shared_exponents(inl, "max", axes=[blocked.ndim - 1], ebits=0)
    se_in = _clamp_shared_exp(se_in, emax_i, inlier_scale_bits, True)

    inl_scaled = mul_pow2(inl, -se_in)
    inl_q = quantize_elemwise_core(inl_scaled, mb_i, eb_i, mn_i, round=round,
                                   allow_denorm=True, saturate_normals=True)

    outl_l1 = mul_pow2(outl, se_in)
    se_out = shared_exponents(outl_l1, "max", axes=[blocked.ndim - 1], ebits=0)
    se_out = _clamp_shared_exp(se_out, emax_o, outlier_scale_bits, True)
    outl_scaled = mul_pow2(outl_l1, -se_out)
    outl_q = quantize_elemwise_core(outl_scaled, mb_o, eb_o, mn_o, round=round,
                                    allow_denorm=True, saturate_normals=True)

    # Top-K outlier selection per block by |scaled value| (stable, static)
    neg_mag = jnp.where(mask > 0, -jnp.abs(outl_scaled), 1.0)
    order = jnp.argsort(neg_mag, axis=-1)[..., :K]
    sel_mask = jnp.take_along_axis(mask, order, axis=-1) > 0
    out_codes = jnp.take_along_axis(outl_q, order, axis=-1)
    out_codes = jnp.where(sel_mask, out_codes, 0.0)
    out_pos = jnp.where(sel_mask, order, -1).astype(jnp.int32)

    inl_codes = _code_cast(inl_q, ElemFormat.from_str(fmt_in) if
                           isinstance(fmt_in, str) else fmt_in
                           ).reshape(blocked.shape[:-2] + (-1,))
    se_in8 = se_in[..., 0].astype(jnp.int8)
    oc = _code_cast(out_codes, ElemFormat.from_str(fmt_out) if
                    isinstance(fmt_out, str) else fmt_out)
    se_out8 = se_out[..., 0].astype(jnp.int8)
    if axis_n != A.ndim - 1:
        inl_codes = jnp.moveaxis(inl_codes, -1, axis_n)
        se_in8 = jnp.moveaxis(se_in8, -1, axis_n)
        oc = jnp.moveaxis(oc, -2, axis_n)        # block axis to axis_n
        out_pos = jnp.moveaxis(out_pos, -2, axis_n)
        se_out8 = jnp.moveaxis(se_out8, -1, axis_n)

    inlier = PackedMX(
        codes=inl_codes, scale_exp=se_in8,
        elem_format=fmt_in if isinstance(fmt_in, str) else fmt_in.name,
        block_size=block_size, scale_bits=inlier_scale_bits,
        orig_dim=orig_dim, axis=axis_n)
    return PackedMXOutlier(
        inlier=inlier,
        out_codes=oc,
        out_pos=out_pos,
        out_scale_exp=se_out8,
        outlier_format=fmt_out if isinstance(fmt_out, str) else fmt_out.name,
        outlier_scale_bits=outlier_scale_bits)


def dequantize_mx_outlier(p: PackedMXOutlier, dtype=jnp.float32) -> jax.Array:
    """Dense tensor: inlier·2^L1 + outlier·2^(L2-L1) scattered into blocks
    (the scale_compute.v:55-57 merge)."""
    inl = p.inlier
    bs = inl.block_size
    codes, se_in8 = inl.codes, inl.scale_exp
    oc, pos, se_out8 = p.out_codes, p.out_pos, p.out_scale_exp
    axis_n = inl.axis % codes.ndim
    if axis_n != codes.ndim - 1:
        codes = jnp.moveaxis(codes, axis_n, -1)
        se_in8 = jnp.moveaxis(se_in8, axis_n, -1)
        oc = jnp.moveaxis(oc, axis_n, -2)
        pos = jnp.moveaxis(pos, axis_n, -2)
        se_out8 = jnp.moveaxis(se_out8, axis_n, -1)

    nb = codes.shape[-1] // bs
    vals = _code_decode(codes, inl.elem_format)
    vals = vals.reshape(vals.shape[:-1] + (nb, bs))
    se_in = se_in8.astype(jnp.float32)
    vals = mul_pow2(vals, se_in[..., None])

    out_vals = _code_decode(oc, p.outlier_format)
    se_out = se_out8.astype(jnp.float32)
    out_vals = mul_pow2(mul_pow2(out_vals, se_out[..., None]),
                        -se_in[..., None])
    # scatter outliers into their block positions (out-of-budget slots have
    # pos -1 -> dropped via mode='drop')
    valid = pos >= 0
    safe_pos = jnp.where(valid, pos, 0)
    upd = jnp.where(valid, out_vals, 0.0)
    # vals: (..., nb, bs); scatter along last axis per block
    vals = jax.vmap(
        lambda v, i, u: v.at[i].add(u),
        in_axes=(0, 0, 0))(
            vals.reshape(-1, bs),
            safe_pos.reshape(-1, pos.shape[-1]),
            upd.reshape(-1, pos.shape[-1]),
        ).reshape(vals.shape)
    vals = vals.reshape(vals.shape[:-2] + (-1,))
    vals = vals[..., :inl.orig_dim]
    if axis_n != vals.ndim - 1:
        vals = jnp.moveaxis(vals, -1, axis_n)
    return vals.astype(dtype)


# ---------------------------------------------------------------------------
# Sub-byte transport packing (HBM bandwidth; unpacked in VMEM by kernels)
# ---------------------------------------------------------------------------
def pack_int4(codes: jax.Array) -> jax.Array:
    """Pack int8 codes in [-8, 7] pairwise into uint8 (2 per byte, low
    nibble = even index). Last axis must be even."""
    lo = codes[..., 0::2].astype(jnp.uint8) & 0xF
    hi = codes[..., 1::2].astype(jnp.uint8) & 0xF
    return lo | (hi << 4)


def unpack_int4(packed: jax.Array) -> jax.Array:
    """Inverse of pack_int4 -> int8 with sign extension."""
    lo = (packed & 0xF).astype(jnp.int8)
    hi = ((packed >> 4) & 0xF).astype(jnp.int8)
    lo = jnp.where(lo >= 8, lo - 16, lo)
    hi = jnp.where(hi >= 8, hi - 16, hi)
    out = jnp.stack([lo, hi], axis=-1)
    return out.reshape(out.shape[:-2] + (-1,))


def pack_int2(codes: jax.Array) -> jax.Array:
    """Pack int8 codes in [-2, 1] four per byte."""
    c = codes.astype(jnp.uint8) & 0x3
    return (c[..., 0::4] | (c[..., 1::4] << 2) | (c[..., 2::4] << 4)
            | (c[..., 3::4] << 6))


def unpack_int2(packed: jax.Array) -> jax.Array:
    parts = []
    for shift in (0, 2, 4, 6):
        v = ((packed >> shift) & 0x3).astype(jnp.int8)
        parts.append(jnp.where(v >= 2, v - 4, v))
    out = jnp.stack(parts, axis=-1)
    return out.reshape(out.shape[:-2] + (-1,))


def _fp_bias(ebits: int, emax: int) -> int:
    # Universal IEEE-style bias; holds both for formats that reserve the
    # top exponent for Inf/NaN (e5m2, fp16, bf16) and those that don't
    # (fp4/fp6/e4m3): emin = 1 - bias in every case.
    del emax
    return 2 ** (ebits - 1) - 1


def encode_fp_bits(vals: jax.Array, fmt) -> jax.Array:
    """Encode on-grid values into the format's n-bit field encoding
    (sign | exp | mantissa) as uint8. Values must already lie on the
    format's grid (i.e. be outputs of quantize_elemwise_core)."""
    ebits, mbits, emax, max_norm, min_norm = get_format_params(fmt)
    fbits = mbits - 2  # stored fraction bits
    bias = _fp_bias(ebits, emax)
    emin = 2 - 2 ** (ebits - 1)

    a = jnp.abs(vals.astype(jnp.float32))
    sign = (vals < 0) | ((vals == 0) & (jnp.signbit(vals)))
    e_real = jnp.maximum(floor_log2(a + (a == 0)), emin)
    is_sub = a < min_norm
    e_field = jnp.where(is_sub, 0, e_real + bias).astype(jnp.int32)
    # fraction: normal -> (a/2^e - 1)·2^f ; subnormal -> a/2^emin·2^f
    frac = jnp.where(
        is_sub,
        mul_pow2(a, -jnp.float32(emin)),
        mul_pow2(a, -e_real) - 1.0,
    ) * (2 ** fbits)
    m_field = jnp.round(frac).astype(jnp.int32)
    code = (sign.astype(jnp.int32) << (ebits + fbits)) | \
           (e_field << fbits) | m_field
    return code.astype(jnp.uint8)


def decode_fp_bits(codes: jax.Array, fmt) -> jax.Array:
    """Decode n-bit field encodings back to float32 grid values."""
    ebits, mbits, emax, _, _ = get_format_params(fmt)
    fbits = mbits - 2
    bias = _fp_bias(ebits, emax)
    emin = 2 - 2 ** (ebits - 1)

    c = codes.astype(jnp.int32)
    m = (c & (2 ** fbits - 1)).astype(jnp.float32)
    e = (c >> fbits) & (2 ** ebits - 1)
    s = (c >> (ebits + fbits)) & 1
    normal = e > 0
    mag = jnp.where(
        normal,
        mul_pow2(1.0 + m * (2.0 ** -fbits), (e - bias).astype(jnp.float32)),
        mul_pow2(m * (2.0 ** -fbits), jnp.float32(emin)),
    )
    return jnp.where(s == 1, -mag, mag)


def pack_fp4(vals: jax.Array) -> jax.Array:
    """Pack fp4_e2m1 grid values 2 per byte (transport packing)."""
    codes = encode_fp_bits(vals, "fp4_e2m1")
    lo = codes[..., 0::2] & 0xF
    hi = codes[..., 1::2] & 0xF
    return lo | (hi << 4)


def unpack_fp4(packed: jax.Array) -> jax.Array:
    lo = decode_fp_bits(packed & 0xF, "fp4_e2m1")
    hi = decode_fp_bits((packed >> 4) & 0xF, "fp4_e2m1")
    out = jnp.stack([lo, hi], axis=-1)
    return out.reshape(out.shape[:-2] + (-1,))


def pack_fp6(vals: jax.Array, fmt: str = "fp6_e3m2") -> jax.Array:
    """Pack fp6 grid values 4 -> 3 bytes (transport packing).

    Layout: c0[5:0] | c1[1:0] << 6 ; c1[5:2] | c2[3:0] << 4 ;
            c2[5:4] | c3[5:0] << 2.
    """
    codes = encode_fp_bits(vals, fmt).astype(jnp.uint32)
    c0, c1, c2, c3 = (codes[..., i::4] for i in range(4))
    b0 = c0 | ((c1 & 0x3) << 6)
    b1 = (c1 >> 2) | ((c2 & 0xF) << 4)
    b2 = (c2 >> 4) | (c3 << 2)
    out = jnp.stack([b0, b1, b2], axis=-1).astype(jnp.uint8)
    return out.reshape(out.shape[:-2] + (-1,))


def unpack_fp6(packed: jax.Array, fmt: str = "fp6_e3m2") -> jax.Array:
    p = packed.astype(jnp.uint32)
    b0, b1, b2 = (p[..., i::3] for i in range(3))
    c0 = b0 & 0x3F
    c1 = ((b0 >> 6) | (b1 << 2)) & 0x3F
    c2 = ((b1 >> 4) | (b2 << 4)) & 0x3F
    c3 = (b2 >> 2) & 0x3F
    codes = jnp.stack([c0, c1, c2, c3], axis=-1)
    codes = codes.reshape(codes.shape[:-2] + (-1,))
    return decode_fp_bits(codes, fmt)


# ---------------------------------------------------------------------------
# Compact N-blocked serving transport (the paper's bit budget)
# ---------------------------------------------------------------------------
@flax.struct.dataclass
class PackedOutlierNB:
    """MicroScopiQ compact serving transport: the GPTQ drivers' out-axis
    16-element blocks (``llm/opt.py:87-94`` axes=[0]) at the paper's bit
    budget (~3.5 bits/element for int2+fp4 budget-1), replacing the 8-bit
    absolute emi8m stream.

    The out axis cannot ride the scale-after-dot kernels (its shared
    exponents vary along the contraction axis), so storage is transposed
    ``(N, K)`` with N on sublanes: the per-block scale expansion and the
    sub-byte unpack are then free sublane regroups, mirroring how the RTL
    streams one block per PE column (``microscopiq_top.v:22-44``), and the
    budget-slot outlier scatter is the SCOPE-NoC routing
    (``scope.v:22-50``) as masked sublane selects.

    codes:         (Np//4, K) int8 — sb2-packed int2 inlier codes along N
                   (blockwise interleave, :func:`_subbyte_pack` layout).
    scale_exp:     (NB, K) int8 — level-1 (inlier) shared exponents.
    out_byte:      (budget, NB, K) int8 — ``pos<<4 | fp4_bits``; an empty
                   slot stores fp4 code 0 (+0), which contributes nothing.
    out_scale_exp: (NB, K) int8 — level-2 (outlier) shared exponents.

    Dequant: ``W[n,k] = inl·2^L1 + fp4(code)·2^(L2-L1)`` at the slot
    positions — the ``scale_compute.v:55-57`` two-level merge.
    """

    codes: jax.Array
    scale_exp: jax.Array
    out_byte: jax.Array
    out_scale_exp: jax.Array
    elem_format: str = flax.struct.field(pytree_node=False)
    outlier_format: str = flax.struct.field(pytree_node=False)
    block_size: int = flax.struct.field(pytree_node=False)
    orig_n: int = flax.struct.field(pytree_node=False)
    orig_k: int = flax.struct.field(pytree_node=False)

    @property
    def budget(self) -> int:
        return self.out_byte.shape[0]

    @property
    def bits_per_element(self) -> float:
        """Realized bits per weight element (all streams)."""
        n_el = self.orig_n * self.orig_k
        bits = (self.codes.size * 8 + self.scale_exp.size * 8
                + self.out_byte.size * 8 + self.out_scale_exp.size * 8)
        return bits / n_el


def pack_outlier_nb(decisions: dict, budget: int = 0,
                    elem_format: str = "int2",
                    outlier_format: str = "fp4_e2m1") -> PackedOutlierNB:
    """Build the compact transport from GPTQ quantization *decisions*
    (:func:`..outlier.quantize_mx_outlier_hessian_decisions` via
    ``GPTQ.fasterquant(collect_decisions=True)``). Exact by construction:
    re-deriving outlier masks from fake-quant values is not faithful.

    decisions arrays follow the GPTQ weight layout ``(out=N, in=K)`` with
    blocks along N. ``budget=0`` auto-sizes to the max per-block outlier
    count (lossless); a smaller explicit budget raises if any block
    overflows — cap at quantization time instead
    (``MXQuantizer(max_outliers_per_block=...)``).
    """
    import numpy as np

    bs = int(decisions["block_size"])
    inl = np.asarray(decisions["inl_code"], np.float32)      # (N, K)
    out = np.asarray(decisions["out_code"], np.float32)      # (N, K)
    mask = np.asarray(decisions["mask"]) != 0                # (N, K)
    se_in = np.asarray(decisions["se_in"]).astype(np.int8)   # (NB, K)
    se_out = np.asarray(decisions["se_out"]).astype(np.int8)
    N, K = inl.shape
    assert bs == 16, "compact transport is specified for block 16"
    pad = (-N) % bs
    if pad:
        z = np.zeros((pad, K), np.float32)
        inl = np.concatenate([inl, z]); out = np.concatenate([out, z])
        mask = np.concatenate([mask, z.astype(bool)])
    Np = inl.shape[0]
    nb = Np // bs

    # inlier codes -> int2 container codes, sb2-packed along N
    _, mbits, _, _, _ = get_format_params(elem_format)
    icodes = np.round(inl * (2.0 ** (mbits - 2))).astype(np.int8)
    packed = np.asarray(_subbyte_pack(jnp.asarray(icodes.T), bs, 4, 2)).T

    # outlier side-band: stable-order gather of up to `budget` per block.
    # A nonzero fp4 code with value 0 cannot occur (codes are grid values),
    # so empty slot == byte 0 is unambiguous and contributes +0.
    mb = mask.reshape(nb, bs, K)
    counts = mb.sum(axis=1)
    maxc = int(counts.max()) if counts.size else 0
    if budget == 0:
        budget = max(maxc, 1)
    elif maxc > budget:
        raise ValueError(
            f"{maxc} outliers in a block exceed budget {budget}; quantize "
            "with max_outliers_per_block to cap at calibration time")
    order = np.argsort(~mb, axis=1, kind="stable")[:, :budget, :]  # (nb,b,K)
    ob = out.reshape(nb, bs, K)
    sel_val = np.take_along_axis(ob, order, axis=1)
    sel_msk = np.take_along_axis(mb, order, axis=1)
    fp4 = np.asarray(encode_fp_bits(jnp.asarray(sel_val), outlier_format))
    fp4 = np.where(sel_msk, fp4, 0).astype(np.uint8)
    pos = np.where(sel_msk, order, 0).astype(np.uint8)
    out_byte = ((pos << 4) | (fp4 & 0xF)).astype(np.int8)    # (nb, b, K)
    out_byte = np.moveaxis(out_byte, 1, 0)                   # (b, nb, K)

    return PackedOutlierNB(
        codes=jnp.asarray(packed), scale_exp=jnp.asarray(se_in),
        out_byte=jnp.asarray(out_byte), out_scale_exp=jnp.asarray(se_out),
        elem_format=elem_format, outlier_format=outlier_format,
        block_size=bs, orig_n=N, orig_k=K)


def dequantize_outlier_nb(p: PackedOutlierNB, dtype=jnp.float32) -> jax.Array:
    """Dense (N, K) tensor from the compact transport (pure-JAX twin of
    the kernel decode; bit-exact vs the GPTQ fake-quant output)."""
    bs = p.block_size
    icodes = _subbyte_unpack(p.codes.T, bs, 4, 2).T          # (Np, K)
    Np, K = icodes.shape
    nb = Np // bs
    vals = _code_decode(icodes, p.elem_format)               # f32
    se_in = p.scale_exp.astype(jnp.float32)                  # (nb, K)
    v3 = mul_pow2(vals.reshape(nb, bs, K), se_in[:, None, :])

    b = p.out_byte.astype(jnp.int32) & 0xFF                  # (budget, nb, K)
    pos = b >> 4
    oval = decode_fp_bits(b & 0xF, p.outlier_format)         # f32 grid
    rel = p.out_scale_exp.astype(jnp.float32) - se_in        # (nb, K)
    contrib = mul_pow2(oval, rel[None])                      # (budget, nb, K)
    row = lax.broadcasted_iota(jnp.int32, (nb, bs, K), 1)
    for s in range(p.out_byte.shape[0]):
        v3 = v3 + jnp.where(row == pos[s][:, None, :],
                            contrib[s][:, None, :], 0.0)
    return v3.reshape(Np, K)[:p.orig_n].astype(dtype)
