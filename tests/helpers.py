"""Shared test helpers."""

import numpy as np

FP32_MIN_NORMAL = 2.0 ** -126


def assert_bitexact(got, want, msg="", ftz_ok=True):
    """Assert float32 bit-exact equality, treating NaNs as equal and
    +0/-0 as equal (matching the reference's check_diff tol=0 semantics).

    ftz_ok: XLA (and TPU hardware) flushes subnormal float32 outputs to
    zero, while the torch reference keeps them. Accept got==0 wherever the
    reference produced a subnormal.
    """
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    eq = (got.view(np.int32) == want.view(np.int32))
    eq |= (got == want)
    eq |= np.isnan(got) & np.isnan(want)
    if ftz_ok:
        eq |= (got == 0) & (np.abs(want) < FP32_MIN_NORMAL)
    bad = ~eq
    assert not bad.any(), (
        f"{msg}: {bad.sum()} mismatches; first: "
        f"got {got[bad][:5]} want {want[bad][:5]}")
