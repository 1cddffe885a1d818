"""ctypes bindings for the native host-IO accelerators (native/*.cpp).

The library is built on demand from source (`make -C native`); absence of a
compiler degrades gracefully to the NumPy fallback, so the package never
hard-depends on the native build.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libfastparse.so"
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not _LIB_PATH.exists() and (_NATIVE_DIR / "fastparse.cpp").exists():
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)], check=True, capture_output=True
            )
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.parse_floats.restype = ctypes.c_long
        lib.parse_floats.argtypes = [
            ctypes.c_char_p, ctypes.c_long,
            ctypes.POINTER(ctypes.c_float), ctypes.c_long,
        ]
        lib.count_first_row.restype = ctypes.c_long
        lib.count_first_row.argtypes = [ctypes.c_char_p, ctypes.c_long]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available():
    return _load() is not None


def parse_float_matrix(text: str):
    """Parse a whitespace-delimited numeric block -> (rows, cols) float32.

    Native single-sweep strtof parser; returns None when the native library
    is unavailable (callers fall back to np.loadtxt).
    """
    lib = _load()
    if lib is None:
        return None
    data = text.encode()
    n_bytes = len(data)
    cols = lib.count_first_row(data, n_bytes)
    if cols <= 0:
        return None
    # upper bound on float count: assume every row has `cols` values
    max_count = n_bytes // 2 + cols  # conservative: >=2 bytes per number
    out = np.empty(max_count, np.float32)
    n = lib.parse_floats(
        data, n_bytes, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), max_count
    )
    if n % cols != 0:
        return None  # ragged/odd content: let numpy handle it
    return out[:n].reshape(n // cols, cols).astype(np.float64)


def format_float_matrix(values):
    """Format (rows, cols) floats as '%f'-rows text (bvh.save motion block).

    Returns None when the native library is unavailable.
    """
    lib = _load()
    if lib is None:
        return None
    try:
        lib.format_float_matrix.restype = ctypes.c_long
    except AttributeError:  # stale .so from before the formatter existed
        return None
    lib.format_float_matrix.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_long,
        ctypes.c_char_p, ctypes.c_long,
    ]
    vals = np.ascontiguousarray(values, np.float32)
    rows, cols = vals.shape
    cap = rows * cols * 32
    buf = ctypes.create_string_buffer(cap)
    n = lib.format_float_matrix(
        vals.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), rows, cols, buf, cap
    )
    if n < 0:
        return None
    return buf.raw[:n].decode()
