"""Posit codec tests: table properties, encode/decode round-trip,
quantization correctness, arithmetic closure, fast sigmoid."""

import jax.numpy as jnp
import numpy as np
import pytest

from microscopiq_tpu.posit import (
    Posit,
    decode_posit,
    encode_posit,
    posit_add,
    posit_mul,
    posit_sigmoid,
    posit_table,
    quantize_posit,
)


@pytest.mark.parametrize("nbits,es", [(8, 0), (8, 1), (8, 2), (16, 1),
                                      (6, 1), (4, 0)])
def test_table_monotonic_in_twos_complement(nbits, es):
    vals = posit_table(nbits, es)
    n = 1 << nbits
    # signed ordering: codes as two's-complement ints sort the values
    signed = np.arange(n)
    signed = np.where(signed >= n // 2, signed - n, signed)
    order = np.argsort(signed)
    v = vals[order]
    v = v[~np.isnan(v)]
    assert (np.diff(v) > 0).all()


def test_known_posit8_values():
    # posit(8,0): useed=2; max = 2^6 = 64, min pos = 2^-6
    vals = posit_table(8, 0)
    assert vals[0] == 0.0
    assert np.isnan(vals[128])
    assert np.nanmax(vals) == 64.0
    assert vals[vals > 0].min() == 2.0 ** -6
    assert vals[1] == 2.0 ** -6 and vals[127] == 64.0
    # posit(8,1): useed=4 -> max 4^6 = 4096
    assert np.nanmax(posit_table(8, 1)) == 4096.0


@pytest.mark.parametrize("nbits,es", [(8, 1), (16, 1), (8, 0)])
def test_roundtrip(nbits, es):
    vals = posit_table(nbits, es)
    vals = vals[~np.isnan(vals)].astype(np.float32)
    codes = encode_posit(jnp.asarray(vals), nbits, es)
    back = np.asarray(decode_posit(codes, nbits, es))
    np.testing.assert_array_equal(back, vals)


def test_quantize_picks_nearest():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(512).astype(np.float32) * 10
    q = np.asarray(quantize_posit(jnp.asarray(x), 8, 1))
    vals = posit_table(8, 1)
    vals = np.sort(vals[~np.isnan(vals)])
    # brute-force nearest
    d = np.abs(x[:, None] - vals[None, :].astype(np.float32))
    nearest = vals[np.argmin(d, 1)].astype(np.float32)
    # ties may legitimately pick the other neighbor; compare distances
    np.testing.assert_allclose(np.abs(q - x), np.abs(nearest - x),
                               rtol=1e-6, atol=0)


def test_arithmetic_closed_on_grid():
    rng = np.random.default_rng(1)
    a = quantize_posit(jnp.asarray(rng.standard_normal(64), jnp.float32), 8, 1)
    b = quantize_posit(jnp.asarray(rng.standard_normal(64), jnp.float32), 8, 1)
    s = np.asarray(posit_add(a, b, 8, 1))
    m = np.asarray(posit_mul(a, b, 8, 1))
    grid = posit_table(8, 1)
    grid = set(np.round(grid[~np.isnan(grid)], 10).tolist())
    assert all(np.round(float(v), 10) in grid for v in s)
    assert all(np.round(float(v), 10) in grid for v in m)


def test_fast_sigmoid_approximates():
    x = jnp.linspace(-6, 6, 25)
    y = np.asarray(posit_sigmoid(x, 8, 0))
    ref = 1 / (1 + np.exp(-np.asarray(x)))
    assert np.abs(y - ref).max() < 0.08
    assert (np.diff(y) >= 0).all()  # monotone


def test_posify_wrapper():
    p = Posit(8, 1)
    x = jnp.asarray(np.linspace(-5, 5, 11), jnp.float32)
    q = p(x)
    assert q.shape == x.shape
    codes = p.set_float(x)
    assert codes.dtype == jnp.uint8
    np.testing.assert_array_equal(np.asarray(p.to_float(codes)),
                                  np.asarray(q))
