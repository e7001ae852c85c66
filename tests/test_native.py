"""Native C++ codec: bit-exact differential test vs the pure-JAX packer
(the reference's CPU-vs-CUDA testing pattern), plus a speed sanity check."""

import time

import numpy as np
import pytest

from microscopiq_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="g++ build unavailable")


@pytest.mark.parametrize("fmt", ["fp6_e3m2", "fp4_e2m1", "int8", "int4",
                                 "int2", "fp6_e2m3", "fp8_e4m3"])
def test_native_pack_bitexact_vs_jax(fmt):
    import jax.numpy as jnp
    from microscopiq_tpu.ops.packing import pack_mx

    rng = np.random.default_rng(0)
    W = (rng.standard_normal((64, 256)) *
         np.exp(rng.uniform(-3, 3, (64, 1)))).astype(np.float32)
    codes, scales = native.pack_mx_native(W, 8, fmt, 32)
    want = pack_mx(jnp.asarray(W), 8, fmt, 32, exact_scale=True)
    np.testing.assert_array_equal(scales, np.asarray(want.scale_exp))
    want_codes = np.asarray(want.codes)
    if want_codes.dtype != np.uint8:
        want_codes = want_codes.view(np.uint8) if want_codes.dtype.itemsize == 1 \
            else want_codes.astype(np.int8).view(np.uint8)
    np.testing.assert_array_equal(codes, want_codes.view(np.uint8))


def test_native_dequant_roundtrip():
    import jax.numpy as jnp
    from microscopiq_tpu.ops.packing import dequantize_mx, pack_mx

    rng = np.random.default_rng(1)
    W = rng.standard_normal((32, 128)).astype(np.float32)
    codes, scales = native.pack_mx_native(W, 8, "fp6_e3m2", 32)
    deq = native.dequant_mx_native(codes, scales, "fp6_e3m2", 32)
    want = np.asarray(dequantize_mx(
        pack_mx(jnp.asarray(W), 8, "fp6_e3m2", 32, exact_scale=True)))
    np.testing.assert_array_equal(deq, want)


def test_native_is_fast():
    rng = np.random.default_rng(2)
    W = rng.standard_normal((2048, 4096)).astype(np.float32)
    t0 = time.perf_counter()
    native.pack_mx_native(W, 8, "fp6_e3m2", 32)
    dt = time.perf_counter() - t0
    # 8M elements multithreaded: should be well under a second
    assert dt < 2.0, dt


@pytest.mark.parametrize("fmt", ["fp8_e5m2", "int4", "fp4_e2m1"])
@pytest.mark.parametrize("shape", [(1, 32), (3, 64), (127, 96),
                                   (256, 1024)])
def test_native_pack_shapes_and_formats(fmt, shape):
    """Wider shape/format sweep incl. fp8_e5m2 (untested before) and
    single-row / odd-row-count matrices exercising thread partitioning."""
    import jax.numpy as jnp
    from microscopiq_tpu.ops.packing import pack_mx

    rng = np.random.default_rng(hash((fmt, shape)) % 2**32)
    W = (rng.standard_normal(shape) *
         np.exp(rng.uniform(-4, 4, (shape[0], 1)))).astype(np.float32)
    codes, scales = native.pack_mx_native(W, 8, fmt, 32)
    want = pack_mx(jnp.asarray(W), 8, fmt, 32, exact_scale=True)
    np.testing.assert_array_equal(scales, np.asarray(want.scale_exp))
    want_codes = np.asarray(want.codes)
    if want_codes.dtype != np.uint8:
        want_codes = want_codes.view(np.uint8) \
            if want_codes.dtype.itemsize == 1 \
            else want_codes.astype(np.int8).view(np.uint8)
    np.testing.assert_array_equal(codes, want_codes)


@pytest.mark.parametrize("fmt", ["int8", "int4", "int2", "fp4_e2m1",
                                 "fp6_e2m3", "fp8_e4m3"])
def test_native_dequant_all_formats(fmt):
    """Dequant path across every container type (ints were untested),
    bit-exact vs the JAX dequantizer."""
    import jax.numpy as jnp
    from microscopiq_tpu.ops.packing import dequantize_mx, pack_mx

    rng = np.random.default_rng(7)
    W = (rng.standard_normal((48, 160)) *
         np.exp(rng.uniform(-3, 3, (48, 1)))).astype(np.float32)
    codes, scales = native.pack_mx_native(W, 8, fmt, 32)
    deq = native.dequant_mx_native(codes, scales, fmt, 32)
    want = np.asarray(dequantize_mx(
        pack_mx(jnp.asarray(W), 8, fmt, 32, exact_scale=True)))
    np.testing.assert_array_equal(deq, want)


def test_native_threading_deterministic():
    """1-thread and 16-thread results must be byte-identical (no
    partition-boundary effects), for pack AND dequant."""
    rng = np.random.default_rng(9)
    W = rng.standard_normal((257, 512)).astype(np.float32)  # odd rows
    c1, s1 = native.pack_mx_native(W, 8, "fp6_e3m2", 32, nthreads=1)
    c16, s16 = native.pack_mx_native(W, 8, "fp6_e3m2", 32, nthreads=16)
    np.testing.assert_array_equal(c1, c16)
    np.testing.assert_array_equal(s1, s16)
    d1 = native.dequant_mx_native(c1, s1, "fp6_e3m2", 32, nthreads=1)
    d16 = native.dequant_mx_native(c1, s1, "fp6_e3m2", 32, nthreads=16)
    np.testing.assert_array_equal(d1, d16)


def test_native_edge_values():
    """Zero rows, constant blocks, huge magnitudes, and sign handling
    survive the native path exactly like the JAX path."""
    import jax.numpy as jnp
    from microscopiq_tpu.ops.packing import dequantize_mx, pack_mx

    W = np.zeros((4, 64), np.float32)
    W[1] = 1e30
    W[2] = -1e-30
    W[3, ::2] = -3.5
    codes, scales = native.pack_mx_native(W, 8, "fp6_e3m2", 32)
    deq = native.dequant_mx_native(codes, scales, "fp6_e3m2", 32)
    want = np.asarray(dequantize_mx(
        pack_mx(jnp.asarray(W), 8, "fp6_e3m2", 32, exact_scale=True)))
    np.testing.assert_array_equal(deq, want)
    assert (deq[0] == 0).all()


def test_native_fp6_transport_matches_jax():
    """msq_pack_fp6_transport (4 raw 6-bit codes -> 3 bytes) must emit
    exactly packing.pack_fp6's byte layout."""
    import ctypes

    import jax.numpy as jnp
    from microscopiq_tpu.ops import packing as pk

    lib = native.get_lib()
    rng = np.random.default_rng(11)
    # values already on the fp6_e3m2 grid: quantize a random draw first
    vals = np.asarray(pk.dequantize_mx(pk.pack_mx(
        jnp.asarray(rng.standard_normal((8, 32)).astype(np.float32)),
        8, "fp6_e3m2", 32, exact_scale=True)))
    # undo the block scale so vals sit on the raw fp6 grid
    grid = np.asarray(pk.decode_fp_bits(
        jnp.asarray(pk.encode_fp_bits(jnp.asarray(vals), "fp6_e3m2")),
        "fp6_e3m2"))
    want = np.asarray(pk.pack_fp6(jnp.asarray(grid))).reshape(-1)
    codes = np.asarray(pk.encode_fp_bits(jnp.asarray(grid), "fp6_e3m2"),
                       dtype=np.uint8).reshape(-1)
    out = np.empty(codes.size // 4 * 3, np.uint8)
    lib.msq_pack_fp6_transport(
        codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(codes.size),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    np.testing.assert_array_equal(out, want)
