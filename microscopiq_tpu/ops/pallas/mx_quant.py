"""Fused MX block-quantize Pallas kernel.

TPU equivalent of the reference's CUDA tile quantizer
(``number_system/mx/cpp/mx.cu`` / ``mx.cuh:63-170``): one pass computes the
per-block max-exponent reduction, the clamped shared scale, and the
element cast, writing container codes + int8 scale exponents. The
lane-parallel in-block reduction plays the role of the CUDA
``__shfl_xor_sync`` allreduce (``mx.cuh:63-100``).

Layout note: the host passes x as a (M, K//B, B) *view* (a free row-major
reshape); inside the kernel the block axis is a real array dimension, so
no lane-splitting ``tpu.reshape`` is ever needed (Mosaic rejects those).

Pure-JAX twin: :func:`microscopiq_tpu.ops.packing.pack_mx` with
``exact_scale=True`` — the kernel is differential-tested against it
(bit-exact).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...formats import get_format_params
from ..packing import PackedMX, container_dtype, _is_int_format


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _floor_log2_f32(x):
    """Exact floor(log2(x)) for x >= 0 via bit extraction (ints on VPU)."""
    bits = lax.bitcast_convert_type(x, jnp.int32)
    biased = jnp.bitwise_and(lax.shift_right_logical(bits, 23), 0xFF)
    mant = jnp.bitwise_and(bits, 0x7FFFFF)
    bitlen = 32 - lax.clz(mant)
    return jnp.where(biased > 0, biased - 127, bitlen - 150)


def _exp2_i32(e):
    return lax.bitcast_convert_type(
        lax.shift_left(jnp.clip(e, -126, 127) + 127, 23), jnp.float32)


def _quantize_block_kernel(x_ref, codes_ref, se_ref, *, scale_bits: int,
                           ebits: int, mbits: int, emax: int,
                           max_norm: float, is_int: bool, code_dtype):
    xb = x_ref[:].astype(jnp.float32)                   # (TM, NB, B)
    amax = jnp.max(jnp.abs(xb), axis=-1)                # (TM, NB)
    amax = amax + jnp.float32(2.0 ** -126) * (amax == 0)
    se = _floor_log2_f32(amax) - emax
    scale_emax = 2 ** (scale_bits - 1) - 1
    se = jnp.clip(se, -scale_emax, scale_emax)
    se_ref[:] = se.astype(jnp.int8)

    xs = xb * _exp2_i32(-se)[:, :, None]                # exact 2^-se

    # element quantize (private exponent + mantissa round, nearest)
    if ebits > 0:
        pe = _floor_log2_f32(jnp.abs(xs) + (xs == 0))
        pe = jnp.maximum(pe, -(2 ** (ebits - 1)) + 2)
        up = _exp2_i32(-pe) * (2 ** (mbits - 2))
        down = _exp2_i32(pe) * (2.0 ** -(mbits - 2))
        q = jnp.sign(xs) * jnp.floor(jnp.abs(xs * up) + 0.5) * down
    else:
        q = jnp.sign(xs) * jnp.floor(jnp.abs(xs) * (2 ** (mbits - 2)) + 0.5)
        q = q * (2.0 ** -(mbits - 2))
    q = jnp.clip(q, -max_norm, max_norm)

    if is_int:
        codes_ref[:] = jnp.round(q * (2 ** (mbits - 2))).astype(code_dtype)
    else:
        codes_ref[:] = q.astype(code_dtype)


def quantize_mx_pallas(x: jax.Array, scale_bits: int, elem_format: str,
                       block_size: int, interpret: bool = False) -> PackedMX:
    """Block-quantize the last axis of an array into packed storage.

    Scale semantics: exact power-of-two divide (no +1e-6 — the packed fast
    path, not the fake-quant parity path).
    """
    ebits, mbits, emax, max_norm, _ = get_format_params(elem_format)
    is_int = _is_int_format(elem_format)
    cdt = container_dtype(elem_format)
    B = block_size

    orig_dim = x.shape[-1]
    lead, K = x.shape[:-1], x.shape[-1]
    x2 = x.reshape(-1, K).astype(jnp.float32)
    M = x2.shape[0]

    # The block axis B sits in the lane dimension and pads to 128 lanes,
    # so a (TM, TNB, B) f32 tile occupies TM*TNB*128*4 bytes of VMEM
    # regardless of B — keep TM*TNB <= 8192 (~4 MB padded + temps).
    TM = 64 if M >= 64 else _round_up(max(M, 1), 8)
    Kp = _round_up(K, B)
    NB = Kp // B
    TNB = NB if NB <= 128 else 128
    NBp = _round_up(NB, TNB)
    Mp = _round_up(M, TM)
    x2 = jnp.pad(x2, ((0, Mp - M), (0, NBp * B - K)))
    x3 = x2.reshape(Mp, NBp, B)  # free row-major view

    grid = (Mp // TM, NBp // TNB)
    codes, se = pl.pallas_call(
        functools.partial(
            _quantize_block_kernel, scale_bits=scale_bits, ebits=ebits,
            mbits=mbits, emax=emax, max_norm=max_norm, is_int=is_int,
            code_dtype=cdt),
        grid=grid,
        in_specs=[pl.BlockSpec((TM, TNB, B), lambda i, k: (i, k, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((TM, TNB, B), lambda i, k: (i, k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, TNB), lambda i, k: (i, k),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Mp, NBp, B), cdt),
            jax.ShapeDtypeStruct((Mp, NBp), jnp.int8),
        ),
        interpret=interpret,
    )(x3)

    codes = codes.reshape(Mp, NBp * B)[:M, :Kp].reshape(lead + (Kp,))
    se = se[:M, :NB].reshape(lead + (NB,))
    return PackedMX(codes=codes, scale_exp=se, elem_format=elem_format,
                    block_size=block_size, scale_bits=scale_bits,
                    orig_dim=orig_dim)
