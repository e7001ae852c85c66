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


def test_max_outliers_per_block_cap():
    """The hardware-faithful cap keeps exactly the k largest-|A| outliers
    per block; cap=0 reproduces the reference (unbounded) behavior."""
    from microscopiq_tpu.ops.outlier import (
        quantize_mx_outlier_hessian, quantize_mx_outlier_hessian_decisions)

    rng = np.random.default_rng(5)
    A = rng.standard_normal((64, 1)).astype(np.float32)
    A[rng.random(A.shape) < 0.3] *= 6.0   # many outliers per block

    q0, n0 = quantize_mx_outlier_hessian(
        jnp.asarray(A), 8, 8, "int2", "fp4", "max", 2.0, [0], 16)
    q0c, n0c = quantize_mx_outlier_hessian(
        jnp.asarray(A), 8, 8, "int2", "fp4", "max", 2.0, [0], 16,
        max_outliers_per_block=0)
    np.testing.assert_array_equal(np.asarray(q0), np.asarray(q0c))

    _, _, dec = quantize_mx_outlier_hessian_decisions(
        jnp.asarray(A), 8, 8, "int2", "fp4", "max", 2.0, [0], 16,
        max_outliers_per_block=2)
    mask = np.asarray(dec["mask"]).reshape(-1, 16)
    counts = (mask != 0).sum(axis=1)
    assert counts.max() <= 2
    # capped outliers are the largest-|A| of the uncapped mask
    _, _, dec0 = quantize_mx_outlier_hessian_decisions(
        jnp.asarray(A), 8, 8, "int2", "fp4", "max", 2.0, [0], 16)
    m0 = np.asarray(dec0["mask"]).reshape(-1, 16) != 0
    a = np.abs(A.reshape(-1, 16))
    for b in range(m0.shape[0]):
        kept = np.flatnonzero(mask[b])
        if m0[b].sum() <= 2:
            assert set(kept) == set(np.flatnonzero(m0[b]))
        else:
            top2 = np.flatnonzero(m0[b])[
                np.argsort(-a[b][m0[b].astype(bool)], kind="stable")][:2]
            assert set(kept) == set(top2)


def test_mx_assert_nan_guard(monkeypatch):
    """MX_ASSERT-gated NaN guards (utils/quant.py:103-128 analog): a
    level-2 scale overflow (deliberately NaN-poisoned by
    _clamp_shared_exp) raises at the reference's check point when the
    assert mode is on, and stays silent when off."""
    import microscopiq_tpu.specs as specs
    from microscopiq_tpu.ops.outlier import quantize_mx_outlier_hessian

    rng = np.random.default_rng(0)
    A = (rng.standard_normal((128, 4)) * 1000).astype(np.float32)
    A[0, 0] = 1e8            # genuine outlier with huge range vs L1
    Aj = jnp.asarray(A)

    monkeypatch.setattr(specs, "_ASSERT_MODE", "True")
    with pytest.raises(FloatingPointError, match="shared_exp_out"):
        quantize_mx_outlier_hessian(Aj, 8, 3, "int2", "fp4", "max",
                                    2.0, [0], 16)
    # clean inputs pass with asserts on
    q, _ = quantize_mx_outlier_hessian(
        jnp.asarray(rng.standard_normal((64, 4)).astype(np.float32)),
        8, 8, "int2", "fp4", "max", 2.0, [0], 16)
    assert np.isfinite(np.asarray(q)).all()

    monkeypatch.setattr(specs, "_ASSERT_MODE", "False")
    q2, _ = quantize_mx_outlier_hessian(Aj, 8, 3, "int2", "fp4", "max",
                                        2.0, [0], 16)   # no raise
