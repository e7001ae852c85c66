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
