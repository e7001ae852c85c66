"""Bit-exact parity of the two-level outlier quantizers (utils/quant.py,
mx_ops.py variants) against reference fixtures."""

import jax.numpy as jnp
import numpy as np
import pytest

from microscopiq_tpu.ops.outlier import (
    extract_outlier_indices,
    quantize_mx_outlier_hessian,
    quantize_mx_outlier_op_v1,
    quantize_mx_outlier_v1,
)
from helpers import assert_bitexact

INPUTS = ["w2d", "w2d_outliers", "mat"]
CASES = [(ifmt, ofmt, bs)
         for (ifmt, ofmt) in [("int2", "fp4_e2m1"), ("fp6_e3m2", "fp8_e4m3")]
         for bs in [16, 32]]


@pytest.mark.parametrize("name", INPUTS)
@pytest.mark.parametrize("ifmt,ofmt,bs", CASES)
def test_hessian_parity(golden_outlier, name, ifmt, ofmt, bs):
    key = f"{name}|{ifmt}|{ofmt}|bs{bs}"
    a = golden_outlier[f"in_{name}"]
    q, n = quantize_mx_outlier_hessian(
        jnp.asarray(a), 8, 8, ifmt, ofmt, std_dev=2, axes=[0], block_size=bs)
    assert_bitexact(q, golden_outlier[f"h|{key}"], "h|" + key)
    np.testing.assert_array_equal(np.asarray(n), golden_outlier[f"hn|{key}"])


@pytest.mark.parametrize("name", INPUTS)
@pytest.mark.parametrize("ifmt,ofmt,bs", CASES)
def test_v1_parity(golden_outlier, name, ifmt, ofmt, bs):
    key = f"{name}|{ifmt}|{ofmt}|bs{bs}"
    a = golden_outlier[f"in_{name}"]
    q = quantize_mx_outlier_v1(
        jnp.asarray(a), 8, 8, ifmt, ofmt, std_dev=2, axes=[0], block_size=bs)
    assert_bitexact(q, golden_outlier[f"v1|{key}"], "v1|" + key)


@pytest.mark.parametrize("name", INPUTS)
@pytest.mark.parametrize("ifmt,ofmt,bs", CASES)
def test_op_v1_parity(golden_outlier, name, ifmt, ofmt, bs):
    key = f"{name}|{ifmt}|{ofmt}|bs{bs}"
    a = golden_outlier[f"in_{name}"]
    q = quantize_mx_outlier_op_v1(
        jnp.asarray(a), 8, 8, ifmt, ofmt, std_dev=2, axes=[0], block_size=bs)
    assert_bitexact(q, golden_outlier[f"op|{key}"], "op|" + key)


def test_outlier_mask_basic():
    # one clear outlier in a 16-elem block
    a = np.zeros((16, 1), np.float32)
    a[:, 0] = np.linspace(-1, 1, 16)
    a[7, 0] = 50.0
    mask = extract_outlier_indices(jnp.asarray(a), std_dev=2.0, axes=[0])
    assert np.asarray(mask)[7, 0] == 1.0
    assert np.asarray(mask).sum() == 1.0


def test_none_format_passthrough():
    a = jnp.asarray(np.random.randn(32, 1).astype(np.float32))
    out = quantize_mx_outlier_v1(a, 8, 8, None, "fp4_e2m1",
                                 axes=[0], block_size=16)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(a))
