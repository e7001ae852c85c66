"""Format parameter table parity (reference: number_system/mx/formats.py)."""

import pytest

from microscopiq_tpu.formats import ElemFormat, get_format_params


# Expected values derived from the reference's format definitions
# (formats.py:87-127).
EXPECTED = {
    "int8": (0, 8, 0, 127.0 / 64, 0),
    "int4": (0, 4, 0, 7.0 / 4, 0),
    "int2": (0, 2, 0, 1.0, 0),
    "fp8_e5m2": (5, 4, 15, 2 ** 15 * 1.75, 2 ** -14),
    "fp8_e4m3": (4, 5, 8, 2 ** 8 * 1.75, 2 ** -6),
    "fp6_e3m2": (3, 4, 4, 2 ** 4 * 1.75, 2 ** -2),
    "fp6_e2m3": (2, 5, 2, 2 ** 2 * 1.875, 2 ** 0),
    "fp4": (2, 3, 2, 2 ** 2 * 1.5, 2 ** 0),
    "fp16": (5, 12, 15, 2 ** 15 * (2 ** 11 - 1) / 2 ** 10, 2 ** -14),
    "bf16": (8, 9, 127, 2 ** 127 * (2 ** 8 - 1) / 2 ** 7, 2 ** -126),
}


@pytest.mark.parametrize("fmt,expected", EXPECTED.items())
def test_format_params(fmt, expected):
    params = get_format_params(fmt)
    assert tuple(params) == pytest.approx(expected)


def test_aliases():
    assert ElemFormat.from_str("fp4_e2m1") is ElemFormat.fp4
    assert ElemFormat.from_str("bfloat16") is ElemFormat.bf16
    assert ElemFormat.from_str("float16") is ElemFormat.fp16
    assert get_format_params("fp4") == get_format_params(ElemFormat.fp4_e2m1)


def test_unknown_format_raises():
    with pytest.raises(ValueError):
        ElemFormat.from_str("fp3")
