"""Native (C++) host-side codecs, exposed via ctypes.

Build-on-first-use: the shared library is compiled with g++ into the
package directory. ``available()`` gates usage; every entry point has a
pure-JAX twin in :mod:`microscopiq_tpu.ops.packing`, and the native path
is differential-tested bit-exact against it.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(__file__)
_SRC = os.path.join(_DIR, "mx_codec.cpp")
_LIB = os.path.join(_DIR, "libmxcodec.so")

_FMT_IDS = {"int8": 0, "int4": 1, "int2": 2, "fp8_e4m3": 3, "fp8_e5m2": 4,
            "fp6_e3m2": 5, "fp6_e2m3": 6, "fp4_e2m1": 7, "fp4": 7}

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-o", _LIB, _SRC, "-lpthread"],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None:
            return _lib
        if _tried:
            return None
        _tried = True
        if not os.path.exists(_LIB) or \
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.msq_pack_mx.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int8),
            ctypes.c_int]
        lib.msq_dequant_mx.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int8),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int]
        lib.msq_pack_fp6_transport.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8)]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def pack_mx_native(W: np.ndarray, scale_bits: int, elem_format: str,
                   block_size: int, nthreads: int = 0):
    """Multithreaded pack of a (rows, cols) fp32 matrix along the last
    axis. Returns (codes uint8 (rows, cols), scales int8 (rows, nb)).

    Bit-identical to pack_mx(..., exact_scale=True) container bytes
    (fp containers returned as raw e4m3 bytes; view as float8_e4m3fn)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native codec unavailable (g++ build failed)")
    W = np.ascontiguousarray(W, np.float32)
    rows, cols = W.shape
    assert cols % block_size == 0
    codes = np.empty((rows, cols), np.uint8)
    scales = np.empty((rows, cols // block_size), np.int8)
    if nthreads <= 0:
        nthreads = min(os.cpu_count() or 1, 16)
    lib.msq_pack_mx(
        W.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), rows, cols,
        block_size, scale_bits, _FMT_IDS[elem_format],
        codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        scales.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)), nthreads)
    return codes, scales


def dequant_mx_native(codes: np.ndarray, scales: np.ndarray,
                      elem_format: str, block_size: int,
                      nthreads: int = 0) -> np.ndarray:
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native codec unavailable")
    codes = np.ascontiguousarray(codes, np.uint8)
    scales = np.ascontiguousarray(scales, np.int8)
    rows, cols = codes.shape
    out = np.empty((rows, cols), np.float32)
    if nthreads <= 0:
        nthreads = min(os.cpu_count() or 1, 16)
    lib.msq_dequant_mx(
        codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        scales.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        rows, cols, block_size, _FMT_IDS[elem_format],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), nthreads)
    return out
