"""Fused dequantize + matmul Pallas TPU kernel.

The serving-path replacement for the reference's fake-quant linear
(``number_system/mx/linear.py:29-108``) and for the external packed-GEMM
CUDA wheel it depends on (``quant_cuda`` / ``Quant3Linear``,
``llm/opt.py:255-294``): packed MX codes + per-block exponents (+ optional
outlier side-band) stay packed in HBM, are dequantized in VMEM tile by
tile, and feed the MXU directly. HBM traffic is the packed bytes, not
dense bf16 — on bandwidth-bound decode this is the speed-of-light path.

Layout: weights are stored **transposed** ``(K, N)`` with the contraction
axis K blocked (``PackedMX(axis=0)``). The per-block scale expansion is
then a second-minor (sublane) broadcast — free in Mosaic's layout system —
and the matmul is a plain ``(M,K)x(K,N)`` MXU contraction.

Grid: (M/TM, N/TN, K/TK) with a float32 VMEM accumulator carried across
the K dimension. Outlier scatter uses the fixed per-block budget (static
shapes, SURVEY.md §7 hard-part 3): each budget slot is one masked VPU
select, the TPU analog of one SCOPE-NoC routing stage
(``rtl/MicroScopiQ/scope.v:22-50``).

Every kernel has a pure-JAX twin (:func:`dequant_matmul_reference`) used
for differential testing, mirroring the reference's CPU-vs-CUDA strategy
(``number_system/mx/tests/test_quantize_mx.py:37-66``).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...formats import get_format_params
from .. import packing as pk
from ..packing import PackedMX, PackedMXOutlier


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _exp2_i32(e: jax.Array) -> jax.Array:
    """Exact 2.0**e for int32 e in [-126, 127] (bit assembly, VPU-native)."""
    return lax.bitcast_convert_type(
        lax.shift_left(jnp.clip(e, -126, 127) + 127, 23), jnp.float32)


def _scale_fold(fmt: str) -> int:
    """Extra exponent shift folded into the scale for int formats
    (code = value * 2^(mbits-2))."""
    if fmt in ("int8", "int4", "int2"):
        _, mbits, _, _, _ = get_format_params(fmt)
        return mbits - 2
    return 0


def _expand_blocks(a: jax.Array, B: int) -> jax.Array:
    """(K//B, N) -> (K, N) by repeating each row B times (sublane bcast)."""
    nb, n = a.shape
    return jnp.broadcast_to(a[:, None, :], (nb, B, n)).reshape(nb * B, n)


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------
def _dq_matmul_kernel(x_ref, codes_ref, se_ref, out_ref, acc_ref,
                      *, nk: int, block_size: int, fold: int, out_dtype,
                      decode: str = "native2d", mw: int = 0):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    if decode == "native2d":                 # legacy 2D (TK, TN) codes
        codes = codes_ref[:].astype(jnp.bfloat16)
        se = se_ref[:].astype(jnp.int32) - fold          # (TK//B, TN)
        scale = _exp2_i32(se).astype(jnp.bfloat16)
        w = codes * _expand_blocks(scale, block_size)
    else:
        # serving-layout (nbt, B, TN) codes; prefill is compute-bound so
        # the per-element decode+scale rides under the MXU time. emi8
        # products are EXACT in bf16 (<=3 mantissa bits x power of two).
        c3 = codes_ref[:]
        nbt, B_, tn = c3.shape
        if decode == "emi8":
            c = c3.astype(jnp.int32)
            mhat = lax.shift_right_arithmetic(c, 8 - mw)
            w3 = lax.shift_left(
                mhat, c & ((1 << (8 - mw)) - 1)).astype(jnp.bfloat16)
        else:                                # int containers
            w3 = c3.astype(jnp.bfloat16)
        se = se_ref[:].astype(jnp.int32) - fold          # (nbt, TN)
        w3 = w3 * _exp2_i32(se)[:, None, :].astype(jnp.bfloat16)
        w = w3.reshape(nbt * B_, tn)
    x = x_ref[:].astype(jnp.bfloat16)                    # (TM, TK)
    acc_ref[:] += lax.dot_general(
        x, w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_dtype)


def _dq_matmul_outlier_kernel(refs, *, nk: int, block_size: int, fold: int,
                              budget: int, out_dtype):
    (x_ref, codes_ref, se_ref, seo_ref, *oc_pos_refs, out_ref, acc_ref) = refs
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    B = block_size
    codes = codes_ref[:].astype(jnp.float32)             # (TK, TN)
    se = se_ref[:].astype(jnp.int32)                     # (TK//B, TN)
    w = codes * _expand_blocks(_exp2_i32(se - fold), B)

    # outlier side-band: value = oc * 2^(se_out - se_in), scattered to the
    # in-block row via one masked select per budget slot
    seo = seo_ref[:].astype(jnp.int32)
    scale_rel = _exp2_i32(seo - se)                      # (TK//B, TN)
    tk, tn = w.shape
    row_in_block = lax.broadcasted_iota(jnp.int32, (tk, tn), 0) % B
    for kk in range(budget):
        oc = oc_pos_refs[kk][:].astype(jnp.float32)      # (TK//B, TN)
        pos = oc_pos_refs[budget + kk][:].astype(jnp.int32)
        val = _expand_blocks(oc * scale_rel, B)
        posx = _expand_blocks(pos, B)
        w = w + jnp.where(row_in_block == posx, val, 0.0)

    x = x_ref[:].astype(jnp.bfloat16)
    acc_ref[:] += lax.dot_general(
        x, w.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_dtype)


# ---------------------------------------------------------------------------
# Scale-after-dot GEMV kernel (the decode serving path)
#
# Measured on v5e: the dequant-then-dot kernel is VPU-bound (one convert +
# one scale multiply per weight element caps it at ~260 GB/s of codes),
# and Mosaic's float8->bf16 convert is ~4x slower still. This kernel
# instead feeds raw codes to batched MXU dots — one (TM, B) x (B, TN) dot
# per block — and applies the per-block power-of-two scale to the (TM, TN)
# partial products, which is O(K*N/B) work instead of O(K*N). With int8
# codes it runs DMA-bound at the chip's streaming rate (~380 GB/s
# measured), beating the dense bf16 GEMV that must move 2x the bytes.
# fp4/fp6 use the emi8 transport (packing.emi8_params): decode is 4
# integer VPU ops, never touching the float8 path.
# ---------------------------------------------------------------------------
def _sad_kernel(x_ref, c_ref, s_ref, o_ref, acc_ref, *, nk: int,
                fold: int, decode: str, mw: int, block_size: int,
                out_dtype, ebits: int = 0):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # codes arrive PRE-BLOCKED (nbt, rows, TN) — the exact serving
    # layout to_serving_layout stores. Consuming that 3D form directly
    # matters a lot: flattening it to 2D on the host (the old
    # from_serving_layout path) made XLA materialize a retiling copy of
    # the ENTIRE codes array on every call — ~200 µs for a 117 MB
    # weight, half the kernel's own runtime (measured on v5e; ablation
    # showed the kernel body itself streams at ~294 GB/s).
    #
    # Decoded weights stay in FLOAT32, not bf16: the int32->bf16 convert
    # carries a register repack (2 lanes -> 1) that cost ~11% of kernel
    # time; int32->f32 is a 1:1-width convert. The mixed bf16 x f32 MXU
    # dot is negligible at decode M, and every product is exact in f32
    # either way (scripts/exp_decode_variants.py: 607 -> 674 GB/s of
    # codes, bit-identical output, vs a 693 GB/s zero-decode floor).
    p3 = c_ref[:]
    _, _, tn = p3.shape
    if decode in ("sb4", "sb2"):
        # sub-byte: `per` codes per byte, blockwise-interleaved
        # (packing._subbyte_pack); reassemble with shift-extracts and
        # one sublane concat — no lane ops.
        per = 2 if decode == "sb4" else 4
        bits = 8 // per
        p32 = p3.astype(jnp.int32)
        fields = []
        for i in range(per):
            f = lax.shift_left(p32 >> (bits * i), 32 - bits)
            fields.append(lax.shift_right_arithmetic(f, 32 - bits))
        w = jnp.concatenate(fields, axis=1).astype(jnp.float32)
    elif decode in ("pf4", "pf6"):
        # raw fp-bit sub-byte transports (packing._pf_pack layout): all
        # sublane regroups + int32 VPU ops; mw carries the stored
        # mantissa bits, fold = emi8_fold(fmt)
        B_ = block_size
        if decode == "pf6":
            p3 = p3.astype(jnp.int32)
            lo_p, hi_p = p3[:, :B_ // 2], p3[:, B_ // 2:]
            lo = jnp.concatenate(
                [(lo_p >> (4 * i)) & 0xF for i in range(2)], axis=1)
            hi_f = []
            for i in range(4):
                f = lax.shift_left(hi_p >> (2 * i), 30)
                hi_f.append(lax.shift_right_arithmetic(f, 30))
            c = lax.shift_left(jnp.concatenate(hi_f, axis=1), 4) | lo
        else:
            p3 = p3.astype(jnp.int32)
            fields = []
            for i in range(2):
                f = lax.shift_left(p3 >> (4 * i), 28)
                fields.append(lax.shift_right_arithmetic(f, 28))
            c = jnp.concatenate(fields, axis=1)
        e = lax.shift_right_arithmetic(c, mw) & ((1 << ebits) - 1)
        m = c & ((1 << mw) - 1)
        ne = jnp.minimum(e, 1)
        mag = lax.shift_left(m | lax.shift_left(ne, mw), e - ne)
        smask = lax.shift_right_arithmetic(c, 31)
        w = ((mag ^ smask) - smask).astype(jnp.float32)
    else:
        if decode == "emi8":
            # m̂-high byte layout: the int8->int32 sign extension IS the
            # mantissa sign handling, so decode is 3 integer ops
            c = p3.astype(jnp.int32)
            mhat = lax.shift_right_arithmetic(c, 8 - mw)
            w = lax.shift_left(
                mhat, c & ((1 << (8 - mw)) - 1)).astype(jnp.float32)
        elif p3.dtype == jnp.int8:    # int8 container
            w = p3.astype(jnp.float32)
        else:                         # bf16 / fp16 containers: as-is
            w = p3.astype(jnp.bfloat16)
    part = lax.dot_general(
        x_ref[:], w, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)          # (nbt, TM, TN)
    sc = _exp2_i32(s_ref[:].astype(jnp.int32) - fold)  # (nbt, TN)
    acc_ref[:] += jnp.sum(part * sc[:, None, :], axis=0)

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(out_dtype)


def _sad_fold(w: PackedMX) -> Tuple[str, int, int]:
    """(decode_mode, fold, mw) for the scale-after-dot kernel."""
    if w.transport == "emi8":
        mw, _, _ = pk.emi8_params(w.elem_format)
        return "emi8", pk.emi8_fold(w.elem_format), mw
    if w.transport == "emi8m":
        # merged outlier stream: same in-kernel decode as emi8, with the
        # tensor-specific field split chosen by merge_outlier_emi8
        return "emi8", w.transport_fold, w.transport_mw
    if w.transport in ("sb4", "sb2"):
        return w.transport, _scale_fold(w.elem_format), 0
    if w.transport in ("pf4", "pf6"):
        _, mbits, _, _, _ = get_format_params(w.elem_format)
        return w.transport, pk.emi8_fold(w.elem_format), mbits - 2
    return "native", _scale_fold(w.elem_format), 0


def _sad_s8_kernel(x_ref, c_ref, s_ref, o_ref, acc_ref, *, nk: int,
                   fold: int, decode: str, block_size: int, out_dtype):
    """W8A8 scale-after-dot: int8 activations x int8 codes on the MXU
    (s32 accumulate), per-block power-of-two scale applied to the
    partials. The weight-side int->bf16 convert of the bf16 kernel
    disappears; per-code VPU work is the partial-scale multiply only
    (O(TM/B) of the code count)."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    c2 = c_ref[:]
    tk, tn = c2.shape
    if decode == "sb4":
        rows = block_size // 2
        p32 = c2.reshape(tk // rows, rows, tn).astype(jnp.int32)
        fields = []
        for i in range(2):
            f = lax.shift_left(p32 >> (4 * i), 28)
            fields.append(lax.shift_right_arithmetic(f, 28))
        w = jnp.concatenate(fields, axis=1).astype(jnp.int8)
    else:
        w = c2.reshape(tk // block_size, block_size, tn)
    part = lax.dot_general(
        x_ref[:], w, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)            # (nbt, TM, TN) s32
    sc = _exp2_i32(s_ref[:].astype(jnp.int32) - fold)  # (nbt, TN)
    acc_ref[:] += jnp.sum(part.astype(jnp.float32) * sc[:, None, :],
                          axis=0)

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(out_dtype)


def quantize_activations_int8(x: jax.Array):
    """Per-token symmetric int8 quantization: (codes, scale).
    x: (..., K) -> int8 codes same shape, f32 scale (..., 1)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-30) / 127.0
    codes = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return codes, scale


def dequant_matmul_sad_s8(x: jax.Array, w: PackedMX,
                          out_dtype=jnp.float32,
                          interpret: bool = False) -> jax.Array:
    """y ≈ x @ dequant(w) with int8 activations (W8A8 decode path).

    Integer-exact given the quantized operands: the only approximation is
    the per-token int8 activation grid. Supports int-format weights
    (native int8 container or sb4)."""
    assert w.axis == 0, "fused GEMM expects transposed (K, N) weights"
    assert w.elem_format in ("int8", "int4", "int2"), \
        "s8xs8 path needs integer weight codes"
    B = w.block_size
    decode, fold, _ = _sad_fold(w)
    assert decode in ("native", "sb4", "sb2")
    if decode == "sb2":                       # 4-field unpack not worth it
        decode = "native"
        w = pk.PackedMX(
            codes=pk._subbyte_unpack(pk.from_serving_layout(w).codes.T,
                                     B, 4, 2).T,
            scale_exp=pk.from_serving_layout(w).scale_exp,
            elem_format=w.elem_format, block_size=B,
            scale_bits=w.scale_bits, orig_dim=w.orig_dim, axis=0)
    per = 2 if decode == "sb4" else 1
    lead = x.shape[:-1]
    ww = pk.from_serving_layout(w)
    Krows, N = ww.codes.shape
    Kp = Krows * per

    x2 = x.reshape(-1, x.shape[-1])
    xq, xscale = quantize_activations_int8(x2)
    M = x2.shape[0]

    TM = _round_up(max(M, 1), 32)            # int8 native sublane tile
    TN = next((t for t in (1024, 896, 768, 640, 512, 384, 256, 128)
               if N % t == 0), None)
    if TN is None:
        TN = 1024 if N >= 1024 else _round_up(N, 128)
    TK = max(4 * B, 1024)
    while TK > Kp and TK > B:
        TK //= 2
    TK = max(TK, B)
    while TK // B * TM * TN * 4 > 8 * 1024 * 1024:
        TK //= 2
    Mp, Np, Kp2 = _round_up(M, TM), _round_up(N, TN), _round_up(Kp, TK)
    nbt, NBp = TK // B, Kp2 // B

    xq = jnp.pad(xq, ((0, Mp - M), (0, Kp2 - xq.shape[-1])))
    xb = xq.reshape(Mp, NBp, B).transpose(1, 0, 2)   # (NBp, Mp, B) int8
    codes = jnp.pad(ww.codes, ((0, (Kp2 - Kp) // per), (0, Np - N)))
    se = jnp.pad(ww.scale_exp, ((0, (Kp2 - Kp) // B), (0, Np - N)))

    nk = Kp2 // TK
    grid = (Mp // TM, Np // TN, nk)

    out = pl.pallas_call(
        functools.partial(_sad_s8_kernel, nk=nk, fold=fold, decode=decode,
                          block_size=B, out_dtype=jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((nbt, TM, B), lambda i, j, k: (k, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TK // per, TN), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TK // B, TN), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, TN), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TM, TN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Np * Kp2,
            bytes_accessed=Mp * Kp2 + Np * Kp2 // per + Mp * Np * 4,
            transcendentals=0),
        interpret=interpret,
    )(xb, codes, se)
    y = out[:M, :N] * xscale
    return y.astype(out_dtype).reshape(lead + (N,))


def dequant_matmul_sad_s8_reference(x: jax.Array, w: PackedMX,
                                    out_dtype=jnp.float32) -> jax.Array:
    """Pure-JAX twin: same per-token int8 activation grid, f32 math."""
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    xq, xscale = quantize_activations_int8(x2)
    dense = pk.dequantize_mx(w, dtype=jnp.float32)
    y = (xq.astype(jnp.float32) @ dense) * xscale
    return y.astype(out_dtype).reshape(lead + (dense.shape[1],))


def dequant_matmul_sad(x: jax.Array, w: PackedMX, out_dtype=jnp.float32,
                       interpret: bool = False) -> jax.Array:
    """y = x @ dequant(w), scale-after-dot form. Decode path for small M
    (token counts); numerically equal to the reference twin up to f32
    summation order."""
    assert w.axis == 0, "fused GEMM expects transposed (K, N) weights"
    B = w.block_size
    decode, fold, mw = _sad_fold(w)
    rows = pk.transport_rows_per_block(decode, B)   # packed rows / block
    ebits = (get_format_params(w.elem_format)[0]
             if decode in ("pf4", "pf6") else 0)
    lead = x.shape[:-1]
    # consume the PRE-BLOCKED serving layout (NB, rows, N) directly —
    # see the kernel note: flattening to 2D here copied the whole codes
    # array every call
    ww = pk.to_serving_layout(w)
    NB, _, N = ww.codes.shape
    Kp = NB * B
    x2 = x.reshape(-1, x.shape[-1])
    M = x2.shape[0]

    # tile-shape experiment knobs (scripts/exp_sad_tiles.py sweeps these
    # on the real chip; production defaults below are the sweep winners)
    import os
    env = os.environ.get
    # TM=8 (the f32 8-sublane minimum) halves the per-k-step VPU
    # partial-scale work vs the bf16 16-sublane tile at decode M<=8:
    # sweep tm8_tn2048_tk1024 = 715 GB/s of codes vs 615 at tm16_tn1024
    # (scripts/exp_sad_tiles.py, v5e, (4096, 28672) M=8)
    TM = int(env("MICROSCOPIQ_SAD_TM", 0)) or (
        8 if M <= 8 else _round_up(M, 16))
    if TM >= 16:
        x2 = x2.astype(jnp.bfloat16)
    else:
        # the f32 8-sublane tile, but with x pre-rounded to bf16 values
        # so the kernel stays numerically equal to the reference twin
        # (which computes bf16-x dots) in both interpret and TPU modes
        x2 = x2.astype(jnp.bfloat16).astype(jnp.float32)
    # TN=2048 first: the wider N-burst against the (NB, rows, N) layout
    # is half of the r3 sweep win (644 -> 715 GB/s at TM=8). N need NOT
    # be divisible: Pallas masks the ragged edge tile (OOB code/scale
    # reads land only in output columns >= N, which are sliced off, and
    # _exp2_i32 clips garbage exponents so nothing non-finite appears).
    # This replaced the old divisor ladder whose TN=128 fallback ran the
    # lm_head (N=128256, largest divisor 128) at 373.6 GB/s of codes vs
    # 692.0 ragged-TN=2048 — 1.85x, bit-identical (r5, /tmp sweep).
    TN = int(env("MICROSCOPIQ_SAD_TN", 0)) or min(2048, _round_up(N, 128))
    TK = int(env("MICROSCOPIQ_SAD_TK", 0)) or max(4 * B, 1024)
    while TK > Kp and TK > B:
        TK //= 2
    TK = max(TK, B)
    while TK // B * TM * TN * 4 > 8 * 1024 * 1024:   # cap the partials
        TK //= 2
    Mp, Kp2 = _round_up(M, TM), _round_up(Kp, TK)
    nbt, NBp = TK // B, Kp2 // B

    x2 = jnp.pad(x2, ((0, Mp - M), (0, Kp2 - x2.shape[-1])))
    xb = x2.reshape(Mp, NBp, B).transpose(1, 0, 2)   # (NBp, Mp, B), tiny
    codes = jnp.pad(ww.codes, ((0, NBp - NB), (0, 0), (0, 0)))
    se = jnp.pad(ww.scale_exp, ((0, NBp - NB), (0, 0)))

    nk = Kp2 // TK
    grid = (Mp // TM, -(-N // TN), nk)

    out = pl.pallas_call(
        functools.partial(_sad_kernel, nk=nk, fold=fold, decode=decode,
                          mw=mw, block_size=B, out_dtype=out_dtype,
                          ebits=ebits),
        grid=grid,
        in_specs=[
            pl.BlockSpec((nbt, TM, B), lambda i, j, k: (k, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nbt, rows, TN), lambda i, j, k: (k, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nbt, TN), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, TN), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((TM, TN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * N * Kp2,
            bytes_accessed=Mp * Kp2 * 2 + N * Kp2 + Mp * N * 4,
            transcendentals=0),
        interpret=interpret,
    )(xb, codes, se)
    return out[:M].reshape(lead + (N,))


# ---------------------------------------------------------------------------
# Host wrappers
# ---------------------------------------------------------------------------
def _prefill_vmem_estimate(TM: int, TN: int, TK: int, B: int):
    """(stack, blocks) VMEM bytes for the fused-decode prefill kernel.

    The in-kernel emi8 decode materializes ~4 int32 temps of (TK, TN)
    plus bf16 intermediates and the (TM, TN) dot partial on the Mosaic
    VMEM stack; blocks are the double-buffered pipeline buffers.
    Calibrated against the compiler's own report: TM=1024/TN=1024/TK=512
    (B=32) is measured at 16.25 MB of stack on v5e."""
    stack = (4 * TK * TN * 4        # int32 decode temps
             + 2 * TK * TN * 2      # bf16 decoded tiles
             + TM * TN * 4          # dot partial (f32)
             + TM * TK * 2          # x tile copy
             + (1 << 20))           # slack
    blocks = 2 * (TM * TK * 2               # x, double-buffered
                  + TK * TN + TK // B * TN  # codes + scales
                  + TM * TN * 4)            # out
    return stack, blocks


def _prefill_tiles(M: int, N: int, B: int):
    """(TM, TN, TK, vmem_limit_bytes) for the fused-decode prefill tier.

    Mosaic's DEFAULT scoped-vmem limit is 16 MB — at TM=1024/TN=1024/
    TK=512 the decode stack needs 16.25 MB and the compile dies with
    "scoped allocation 16.25M > 16.00M" (reproduced on v5e; VERDICT r3
    weak #1: the bench prefill shape B=8 x S=128 on the 8B gate_up
    (4096, 28672) was uncompilable for a round). v5e has 128 MB of VMEM,
    so RAISE the limit to a computed estimate and walk TN/TK/TM down
    only if the total exceeds the budget. The TM>=1024 tier matters: the
    in-kernel decode re-runs once per M-tile sweep, and at TM=1024 the
    VPU decode (~1.0 ms at the gate_up shape) rides mostly under the MXU
    time — measured 1575 us vs 1280 us dense, vs 2178+ us for every
    double-buffered software-pipeline variant tried
    (scripts/exp_prefill_pipe.py, v5e, honest full-N baseline)."""
    import os
    env = os.environ.get
    TM = int(env("MICROSCOPIQ_PREFILL_TM", 0)) or (
        1024 if M >= 1024 else
        512 if M >= 512 else (128 if M >= 128
                              else _round_up(max(M, 1), 16)))
    TM = min(TM, _round_up(M, 16))
    # TM>=1024 tile sweep winners at the 8B gate_up shape (v5e, honest
    # full-N baseline, /tmp sweep recorded in STATUS.md): TN=2048/TK=1024
    # = 1489 us vs 1575 (TN=1024/TK=512), 1520 (TN=2048/TK=512), 1505
    # (TK=2048), dense 1280 us.
    big = TM >= 1024
    TK = int(env("MICROSCOPIQ_PREFILL_TK", 0)) or max(
        8 * B, 1024 if big else 512)
    tn_ladder = ((2048, 1024, 768, 512, 384, 256, 128) if big
                 else (1024, 768, 512, 384, 256, 128))
    TN = int(env("MICROSCOPIQ_PREFILL_TN", 0)) or next(
        (t for t in tn_ladder if N % t == 0), 128)
    VMEM_BUDGET = 96 * 1024 * 1024
    stack, blocks = _prefill_vmem_estimate(TM, TN, TK, B)
    while stack + blocks + TM * TN * 4 > VMEM_BUDGET:
        if TN > 128:
            TN = next((t for t in tn_ladder
                       if t < TN and N % t == 0), 128)
        elif TK > 8 * B:
            TK //= 2
        elif TM > 128:
            TM //= 2
        else:
            break
        stack, blocks = _prefill_vmem_estimate(TM, TN, TK, B)
    vmem_limit = min(int((stack + blocks) * 1.25) + TM * TN * 4,
                     128 * 1024 * 1024)
    return TM, TN, TK, vmem_limit


def _tiles(M: int, block_size: int):
    TM = 128 if M >= 128 else _round_up(max(M, 1), 16)
    TN = 128
    # TK/B >= 8 keeps the per-block scale tile a legal (>=8, 128) TPU tile
    TK = max(8 * block_size, 512)
    return TM, TN, TK


def dequant_matmul(x: jax.Array, w: PackedMX, out_dtype=jnp.float32,
                   interpret: bool = False) -> jax.Array:
    """y = x @ dequant(w) with dequant fused into the GEMM.

    x: (..., K); w: PackedMX of a (K, N) matrix with axis=0 blocking.
    Dispatches to the scale-after-dot kernel (DMA-bound) for small token
    counts; f8-container codes fall back to the dequant-then-dot kernel.
    """
    M = 1
    for d in x.shape[:-1]:
        M *= d
    if M <= 64 and (w.transport in ("emi8", "emi8m", "pf4", "pf6")
                    or w.codes.dtype in (jnp.int8, jnp.bfloat16,
                                         jnp.float16)):
        return dequant_matmul_sad(x, w, out_dtype=out_dtype,
                                  interpret=interpret)
    if jax.default_backend() != "tpu" and not interpret:
        # CPU/GPU callers (tests, eval runs with use_pallas left on):
        # XLA twin — compiled pallas kernels are TPU-only
        return dequant_matmul_reference(
            x, pk.from_serving_layout(w), out_dtype=out_dtype)
    if w.transport in ("emi8", "emi8m", "native") and \
            w.codes.dtype == jnp.int8:
        # prefill path: dequant-then-dot with the decode fused in-kernel
        # (the XLA twin materializes every dense weight in HBM — 66 ms
        # for a 6L prefill, measured)
        decode, fold, mw = _sad_fold(w)
        ww = pk.to_serving_layout(w)
        NB, rows, N = ww.codes.shape
        B = w.block_size
        Kp = NB * B
        lead = x.shape[:-1]
        # x rides in bf16: the kernel dots in bf16 anyway, and an f32 x
        # tile both doubled the dominant DMA (the x tile is re-fetched
        # for every N-sweep) and re-ran the f32->bf16 convert per grid
        # step (M*K*(N/TN) converts). Ablated on v5e: 3386 -> 2871 us at
        # (4096, 28672) M=1024 (scripts/exp_prefill_pipe.py notes).
        x2 = x.reshape(-1, x.shape[-1]).astype(jnp.bfloat16)
        M = x2.shape[0]

        # the in-kernel decode re-runs once per M-tile sweep (w depends
        # on (j, k) but the grid re-visits it for every i): a big TM
        # amortizes the VPU decode against more MXU work per element —
        # at TM=128 the decode dominates 4x, at TM=512 they balance
        TM, TN, TK, vmem_limit = _prefill_tiles(M, N, B)
        Mp, Np, Kp2 = _round_up(M, TM), _round_up(N, TN), _round_up(Kp, TK)
        nbt = TK // B

        x2 = jnp.pad(x2, ((0, Mp - M), (0, Kp2 - x2.shape[-1])))
        codes = jnp.pad(ww.codes,
                        ((0, (Kp2 - Kp) // B), (0, 0), (0, Np - N)))
        se = jnp.pad(ww.scale_exp, ((0, (Kp2 - Kp) // B), (0, Np - N)))
        nk = Kp2 // TK
        grid = (Mp // TM, Np // TN, nk)
        out = pl.pallas_call(
            functools.partial(_dq_matmul_kernel, nk=nk, block_size=B,
                              fold=fold, out_dtype=out_dtype,
                              decode=decode, mw=mw),
            grid=grid,
            in_specs=[
                pl.BlockSpec((TM, TK), lambda i, j, k: (i, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nbt, rows, TN), lambda i, j, k: (k, 0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nbt, TN), lambda i, j, k: (k, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TM, TN), lambda i, j, k: (i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Mp, Np), out_dtype),
            scratch_shapes=[pltpu.VMEM((TM, TN), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
                vmem_limit_bytes=vmem_limit),
            cost_estimate=pl.CostEstimate(
                flops=2 * Mp * Np * Kp2,
                bytes_accessed=Mp * Kp2 * 2 + Np * Kp2 + Mp * Np * 4,
                transcendentals=0),
            interpret=interpret,
        )(x2, codes, se)
        return out[:M, :N].reshape(lead + (N,))
    if w.transport != "native" or w.codes.ndim == 3:
        # sub-byte transports: XLA dequant-then-dot fallback
        return dequant_matmul_reference(
            x, pk.from_serving_layout(w), out_dtype=out_dtype)
    assert w.axis == 0, "fused GEMM expects transposed (K, N) weights"
    B = w.block_size
    fold = _scale_fold(w.elem_format)
    lead = x.shape[:-1]
    Kp, N = w.codes.shape
    x2 = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    M = x2.shape[0]

    TM, TN, TK = _tiles(M, B)
    Mp, Np, Kp2 = _round_up(M, TM), _round_up(N, TN), _round_up(Kp, TK)

    x2 = jnp.pad(x2, ((0, Mp - M), (0, Kp2 - x2.shape[-1])))
    codes = jnp.pad(w.codes, ((0, Kp2 - Kp), (0, Np - N)))
    se = jnp.pad(w.scale_exp, ((0, (Kp2 - Kp) // B), (0, Np - N)))

    nk = Kp2 // TK
    grid = (Mp // TM, Np // TN, nk)

    out = pl.pallas_call(
        functools.partial(_dq_matmul_kernel, nk=nk, block_size=B,
                          fold=fold, out_dtype=out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TM, TK), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TK, TN), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TK // B, TN), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, TN), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), out_dtype),
        scratch_shapes=[pltpu.VMEM((TM, TN), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Np * Kp2,
            bytes_accessed=Mp * Kp2 * 2 + Np * Kp2 + Mp * Np * 4,
            transcendentals=0),
        interpret=interpret,
    )(x2, codes, se)
    return out[:M, :N].reshape(lead + (N,))


def dequant_matmul_outlier(x: jax.Array, w: PackedMXOutlier,
                           out_dtype=jnp.float32,
                           interpret: bool = False) -> jax.Array:
    """y = x @ dequant(w) for the two-level outlier format ((K, N) layout)."""
    inl = w.inlier
    assert inl.axis == 0, "fused GEMM expects transposed (K, N) weights"
    B = inl.block_size
    fold = _scale_fold(inl.elem_format)
    budget = w.out_codes.shape[-1]
    lead = x.shape[:-1]
    Kp, N = inl.codes.shape
    x2 = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    M = x2.shape[0]

    TM, TN, TK = _tiles(M, B)
    Mp, Np, Kp2 = _round_up(M, TM), _round_up(N, TN), _round_up(Kp, TK)
    nb_pad = (Kp2 - Kp) // B

    x2 = jnp.pad(x2, ((0, Mp - M), (0, Kp2 - x2.shape[-1])))
    codes = jnp.pad(inl.codes, ((0, Kp2 - Kp), (0, Np - N)))
    se = jnp.pad(inl.scale_exp, ((0, nb_pad), (0, Np - N)))
    seo = jnp.pad(w.out_scale_exp, ((0, nb_pad), (0, Np - N)))
    ocs = [jnp.pad(w.out_codes[..., kk], ((0, nb_pad), (0, Np - N)))
           for kk in range(budget)]
    poss = [jnp.pad(w.out_pos[..., kk], ((0, nb_pad), (0, Np - N)),
                    constant_values=-1).astype(jnp.int32)
            for kk in range(budget)]

    nk = Kp2 // TK
    grid = (Mp // TM, Np // TN, nk)
    nb_spec = pl.BlockSpec((TK // B, TN), lambda i, j, k: (k, j),
                           memory_space=pltpu.VMEM)

    def kernel(*refs):
        _dq_matmul_outlier_kernel(
            refs, nk=nk, block_size=B, fold=fold, budget=budget,
            out_dtype=out_dtype)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TM, TK), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TK, TN), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            nb_spec, nb_spec,
            *([nb_spec] * (2 * budget)),
        ],
        out_specs=pl.BlockSpec((TM, TN), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), out_dtype),
        scratch_shapes=[pltpu.VMEM((TM, TN), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Np * Kp2,
            bytes_accessed=Mp * Kp2 * 2 + Np * Kp2 + Mp * Np * 4,
            transcendentals=0),
        interpret=interpret,
    )(x2, codes, se, seo, *ocs, *poss)
    return out[:M, :N].reshape(lead + (N,))


# ---------------------------------------------------------------------------
# Pure-JAX twins (differential-test reference; also the CPU fallback)
# ---------------------------------------------------------------------------
def dequant_matmul_reference(x: jax.Array, w: PackedMX,
                             out_dtype=jnp.float32) -> jax.Array:
    """Same math as the kernel: dequant to bf16, bf16 MXU dot, f32 acc."""
    dense = pk.dequantize_mx(w, dtype=jnp.bfloat16)      # (K, N)
    y = lax.dot_general(
        x.astype(jnp.bfloat16), dense,
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return y.astype(out_dtype)


def dequant_matmul_outlier_reference(x: jax.Array, w: PackedMXOutlier,
                                     out_dtype=jnp.float32) -> jax.Array:
    dense = pk.dequantize_mx_outlier(w, dtype=jnp.bfloat16)
    y = lax.dot_general(
        x.astype(jnp.bfloat16), dense,
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return y.astype(out_dtype)


# ---------------------------------------------------------------------------
# Compact N-blocked kernel (the paper-bit-budget int2+fp4 serving GEMV)
#
# The GPTQ drivers' outlier format blocks along the OUT-features axis
# (llm/opt.py:87-94 axes=[0]), so its shared exponents vary along the
# contraction axis and cannot ride the scale-after-dot kernels. Storage is
# transposed (N, K) with N on sublanes. Measured on v5e (r4): the naive
# decode — unpack + scale + per-slot masked scatter, all on full-size
# (TN, TK) tiles — runs 165 µs at (4096, 4096, M=8), 0.28x dense, pure
# VPU-bound. This kernel keeps EVERY VPU op on quarter- or
# sixteenth-size arrays and lets the MXU do all expansion:
#
#   inliers — packing._subbyte_pack's blockwise interleave puts the 4
#     fields of one packed byte at rows {r, r+4, r+8, r+12} of a single
#     16-row block, so all 4 fields share that block's scale. Each field
#     is shift-extracted, converted and scaled on the (TN/4, TK) quarter
#     array and hits the MXU as its own dot into a FIELD-MAJOR
#     accumulator (row = i*TN/4 + b*4 + r  <->  n = b*16 + 4i + r).
#   outliers — the SCOPE-NoC routing (rtl/MicroScopiQ/scope.v:22-50)
#     becomes a one-hot-weighted SECOND dot: position-major planes
#     A[p*TNB + b, k] = sum_s [pos_s==p]·val_s are built with 16 tiny
#     (TNB, TK) compares per slot (sixteenth-size; no sublane broadcast
#     relayouts) and the MXU expands them into a p-major accumulator.
#
# Both accumulators are un-permuted once, at the final K step. Measured:
# 75 µs = 0.61x dense GEMV at 4.0 bits/element (scripts/exp_nb_variants
# .py; 2.2x the previous scatter kernel, ≥2x params/chip vs emi8m).
# ---------------------------------------------------------------------------
def _nb_kernel(xt_ref, c_ref, se_ref, seo_ref, ob_ref, out_ref, acc_ref,
               acc2_ref, *, nk: int, block_size: int, budget: int,
               fold: int, out_dtype):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        acc2_ref[:] = jnp.zeros_like(acc2_ref)

    B = block_size
    assert B == 16, "compact transport is specified for block 16"
    p2 = c_ref[:]                                       # (TN//4, TK) int8
    tn4, tk = p2.shape
    tnb = tn4 // 4
    pi = p2.astype(jnp.int32)
    se = se_ref[:].astype(jnp.int32)                    # (TNB, TK)
    sc4 = jnp.broadcast_to(
        _exp2_i32(se - fold)[:, None, :], (tnb, 4, tk)
    ).reshape(tn4, tk).astype(jnp.bfloat16)
    xt = xt_ref[:]                                      # (TM, TK) bf16

    # outlier side-band decode: byte = pos<<4 | fp4 bits; value is
    # sign·M·2^(max(e-1,0)) · 2^(L2-L1-1)  (the 2^-1 is fp4's grid
    # step). All on the sixteenth-size (TNB, TK) planes.
    seo = seo_ref[:].astype(jnp.int32)
    osc = _exp2_i32(seo - se - 1).astype(jnp.bfloat16)  # (TNB, TK)
    slots = []
    for s in range(budget):
        b = ob_ref[s].astype(jnp.int32) & 0xFF          # (TNB, TK)
        pos = b >> 4
        e = (b >> 1) & 3
        m = b & 1
        sgn = (b >> 3) & 1
        mag = lax.shift_left(m + 2 * jnp.minimum(e, 1),
                             jnp.maximum(e - 1, 0))
        slots.append((pos, (mag * (1 - 2 * sgn)).astype(jnp.bfloat16)
                      * osc))

    # inlier field dots (field-major accumulator)
    for i in range(4):
        f = lax.shift_right_arithmetic(lax.shift_left(pi, 30 - 2 * i), 30)
        acc_ref[i * tn4:(i + 1) * tn4] += lax.dot_general(
            f.astype(jnp.bfloat16) * sc4, xt, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)         # (TN//4, TM)

    # outlier one-hot correction dot (p-major accumulator)
    if budget:
        rows = []
        for p in range(B):
            ap = None
            for pos, val in slots:
                a = jnp.where(pos == p, val, jnp.bfloat16(0))
                ap = a if ap is None else ap + a
            rows.append(ap)
        acc2_ref[:] += lax.dot_general(
            jnp.concatenate(rows, axis=0), xt, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)         # (TN, TM)

    @pl.when(k == nk - 1)
    def _():
        tm = acc_ref.shape[1]
        y = acc_ref[:].reshape(4, tnb, 4, tm).transpose(
            1, 0, 2, 3).reshape(tn4 * 4, tm)            # n = b*16+4i+r
        if budget:
            y = y + acc2_ref[:].reshape(B, tnb, tm).transpose(
                1, 0, 2).reshape(tn4 * 4, tm)           # n = b*16+p
        out_ref[:] = y.astype(out_dtype)


def dequant_matmul_nb(x: jax.Array, w: "pk.PackedOutlierNB",
                      out_dtype=jnp.float32,
                      interpret: bool = False) -> jax.Array:
    """y = x @ dequant(w)^T-layout for the compact N-blocked transport.

    x: (..., K); w stores the (N, K) transposed weight. Output (..., N).
    """
    B = w.block_size
    budget = w.budget
    fold = _scale_fold(w.elem_format)
    lead = x.shape[:-1]
    Np4, K = w.codes.shape
    Np = Np4 * 4
    NB = Np // B
    N = w.orig_n
    x2 = x.reshape(-1, x.shape[-1]).astype(jnp.bfloat16)
    M = x2.shape[0]

    import os
    env = os.environ.get
    # tile M: a (TN, TM) f32 accumulator PAIR lives in VMEM scratch, so
    # an unbounded TM (prefill-sized M) would blow VMEM silently
    # (ADVICE r4). TM<=256 keeps both accumulators <= 1 MB; the tile
    # splits M EVENLY so M just above a multiple of 256 doesn't pad to
    # a whole extra tile (M=272 -> 2 tiles of 136-pad-to-136, not
    # 2x256).
    Mq = max(M, 1)
    n_mtiles = -(-Mq // 256)
    TM = int(env("MICROSCOPIQ_NB_TM", 0)) or _round_up(
        -(-Mq // n_mtiles), 8)
    TN = min(512, Np)
    # r4 sweep: TK=1024 beats 512 (75 vs 77 us)
    TK = int(env("MICROSCOPIQ_NB_TK", 0)) or 1024
    while TK > K and TK > 128:
        TK //= 2
    Mp, Np2, Kp = _round_up(M, TM), _round_up(Np, TN), _round_up(K, TK)

    x2 = jnp.pad(x2, ((0, Mp - M), (0, Kp - K)))
    codes = jnp.pad(w.codes, ((0, (Np2 - Np) // 4), (0, Kp - K)))
    se = jnp.pad(w.scale_exp, ((0, (Np2 - Np) // B), (0, Kp - K)))
    seo = jnp.pad(w.out_scale_exp, ((0, (Np2 - Np) // B), (0, Kp - K)))
    ob = jnp.pad(w.out_byte, ((0, 0), (0, (Np2 - Np) // B), (0, Kp - K)))

    nk = Kp // TK
    grid = (Mp // TM, Np2 // TN, nk)
    tnb = TN // B

    out = pl.pallas_call(
        functools.partial(_nb_kernel, nk=nk, block_size=B, budget=budget,
                          fold=fold, out_dtype=out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TM, TK), lambda m, i, k: (m, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TN // 4, TK), lambda m, i, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tnb, TK), lambda m, i, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tnb, TK), lambda m, i, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((budget, tnb, TK), lambda m, i, k: (0, i, k),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TN, TM), lambda m, i, k: (i, m),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Np2, Mp), out_dtype),
        scratch_shapes=[pltpu.VMEM((TN, TM), jnp.float32),
                        pltpu.VMEM((TN, TM), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Np2 * Kp,
            bytes_accessed=(Np2 * Kp) // 4 + 3 * NB * Kp + Mp * Kp * 2
            + Np2 * Mp * 4,
            transcendentals=0),
        interpret=interpret,
    )(x2, codes, se, seo, ob)
    return out[:N, :M].T.reshape(lead + (N,))


def dequant_matmul_nb_reference(x: jax.Array, w: "pk.PackedOutlierNB",
                                out_dtype=jnp.float32) -> jax.Array:
    """Pure-JAX twin: dequant to bf16, bf16 dot, f32 accumulate."""
    dense = pk.dequantize_outlier_nb(w, dtype=jnp.bfloat16)   # (N, K)
    y = lax.dot_general(
        x.astype(jnp.bfloat16), dense,
        (((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    return y.astype(out_dtype)
