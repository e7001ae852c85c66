"""Bit-exact parity of the element-wise quantizer against reference fixtures.

Golden data produced by scripts/gen_golden.py running the reference's
_quantize_elemwise_core (number_system/mx/elemwise_ops.py:84-174) on CPU.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from helpers import assert_bitexact
from microscopiq_tpu.formats import get_format_params
from microscopiq_tpu.ops.elemwise import (
    exp2_exact,
    floor_log2,
    quantize_elemwise_core,
)

FORMATS = ["int8", "int4", "int2", "fp8_e5m2", "fp8_e4m3", "fp6_e3m2",
           "fp6_e2m3", "fp4_e2m1", "fp16", "bf16"]
ROUNDS = ["nearest", "floor", "even"]




@pytest.mark.parametrize("fmt", FORMATS)
@pytest.mark.parametrize("rnd", ROUNDS)
@pytest.mark.parametrize("sat", [False, True])
@pytest.mark.parametrize("denorm", [True, False])
def test_elemwise_parity(golden_elemwise, fmt, rnd, sat, denorm):
    fmt_key = "fp4_e2m1" if fmt == "fp4_e2m1" else fmt
    key = f"{fmt_key}|{rnd}|sat{int(sat)}|dn{int(denorm)}"
    x = golden_elemwise["x"]
    want = golden_elemwise[key]
    ebits, mbits, _, max_norm, _ = get_format_params(fmt)
    got = quantize_elemwise_core(
        jnp.asarray(x), mbits, ebits, max_norm, round=rnd,
        saturate_normals=sat, allow_denorm=denorm)
    assert_bitexact(got, want, key)


def test_floor_log2_exhaustive():
    # every exponent x a few mantissas, plus subnormals
    exps = np.arange(0, 255, dtype=np.uint32)
    mants = np.array([0, 1, 0x400000, 0x7FFFFF], dtype=np.uint32)
    bits = (exps[:, None] << 23) | mants[None, :]
    x = bits.view(np.float32).ravel()
    x = x[x > 0]
    want = np.floor(np.log2(x.astype(np.float64))).astype(np.float32)
    got = np.asarray(floor_log2(jnp.asarray(x)))
    np.testing.assert_array_equal(got, want)


def test_floor_log2_specials():
    x = jnp.asarray(np.array([np.inf, np.nan], np.float32))
    got = np.asarray(floor_log2(x))
    assert np.isinf(got[0]) and got[0] > 0
    assert np.isnan(got[1])


def test_exp2_exact_range():
    e = np.arange(-126, 128, dtype=np.float32)
    got = np.asarray(exp2_exact(jnp.asarray(e)))
    want = np.exp2(e.astype(np.float64)).astype(np.float32)
    np.testing.assert_array_equal(got, want)
    # specials
    s = np.asarray(exp2_exact(jnp.asarray(
        np.array([np.inf, -np.inf, np.nan], np.float32))))
    assert np.isinf(s[0]) and s[1] == 0.0 and np.isnan(s[2])
