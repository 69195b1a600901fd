"""ctypes binding for the native MSM tape builder (csrc/msm_tape.cpp).

Auto-builds the shared library with g++ on first use (same pattern as
sequencer/native.py; no pybind11 in the image, so the binding is a plain
C ABI). msm_fast.build_tape falls back to its numpy implementation when
the library is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from functools import lru_cache

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc",
                    "msm_tape.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "..", "..", "csrc",
                    "libzelana_tape.so")


@lru_cache(maxsize=1)
def load():
    """Returns the ctypes library or None."""
    src = os.path.abspath(_SRC)
    lib_path = os.path.abspath(_LIB)
    if not os.path.exists(lib_path) and os.path.exists(src):
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", lib_path, src],
                check=True,
                capture_output=True,
            )
        except Exception:
            return None
    if not os.path.exists(lib_path):
        return None
    try:
        lib = ctypes.CDLL(lib_path)
    except OSError:
        return None
    lib.zelana_build_tape.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int64, ctypes.c_void_p,
        ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
    ]
    lib.zelana_build_tape.restype = ctypes.c_int
    return lib


def build_tape_arrays(digits: np.ndarray, n_buckets: int, window_bits: int,
                      S: int, a0: int):
    """Run the native builder; returns (idx, finals, steps, mixed, base)
    or None if the library is unavailable / the bound was exceeded."""
    lib = load()
    if lib is None:
        return None
    w, n = digits.shape
    max_steps = (w * n + w * window_bits * n_buckets // 2) // S + 96
    digits_c = np.ascontiguousarray(digits, dtype=np.int32)
    idx = np.empty((max_steps, 2, S), np.int32)
    finals = np.empty(window_bits * w, np.int32)
    meta = np.empty(3, np.int64)
    rc = lib.zelana_build_tape(
        digits_c.ctypes.data, w, n, n_buckets, window_bits, S, a0,
        idx.ctypes.data, max_steps, finals.ctypes.data, meta.ctypes.data,
    )
    if rc != 0:
        return None
    steps, mixed, base = (int(v) for v in meta)
    return idx[:steps], finals, steps, mixed, base
