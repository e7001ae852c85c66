"""Posit number system (vectorized TPU codec)."""

from .posit import (  # noqa: F401
    Posit,
    decode_posit,
    encode_posit,
    posit_add,
    posit_div,
    posit_mul,
    posit_sigmoid,
    posit_sub,
    posit_table,
    quantize_posit,
)
