"""ctypes binding for the native run-scan schedule builder
(csrc/scan_sched.cpp). Auto-builds with g++ on first use; msm_scan
falls back to its numpy builder when unavailable."""

from __future__ import annotations

import ctypes
import os
import subprocess
from functools import lru_cache

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc",
                    "scan_sched.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "..", "..", "csrc",
                    "libzelana_sched.so")


@lru_cache(maxsize=1)
def load():
    src = os.path.abspath(_SRC)
    lib_path = os.path.abspath(_LIB)
    if os.path.exists(src) and (
        not os.path.exists(lib_path)
        or os.path.getmtime(lib_path) < os.path.getmtime(src)
    ):
        try:
            # temp + atomic rename: never truncate a .so a live process maps
            tmp = lib_path + f".tmp{os.getpid()}"
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", tmp, src],
                check=True, capture_output=True,
            )
            os.replace(tmp, lib_path)
        except Exception:
            return None
    if not os.path.exists(lib_path):
        return None
    try:
        lib = ctypes.CDLL(lib_path)
    except OSError:
        return None
    lib.zelana_build_scan_schedule.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p,
    ]
    lib.zelana_build_scan_schedule.restype = ctypes.c_int
    if hasattr(lib, "zelana_build_scan_schedule2"):
        lib.zelana_build_scan_schedule2.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p,
        ]
        lib.zelana_build_scan_schedule2.restype = ctypes.c_int
    return lib


def build_schedule_arrays(digits: np.ndarray, nb: int, lanes: int, R: int,
                          fold_bit15: bool, kmax: int = 16):
    """Returns (perm u16 (R+1, L), flag_bits u32 (R+1, L/32),
    dense_idx (K, w*nb) i32, K) or None."""
    lib = load()
    if lib is None:
        return None
    w, n = digits.shape
    digits_c = np.ascontiguousarray(digits, dtype=np.int32)
    perm = np.empty((R + 1, lanes), np.uint16)
    flag_bits = np.zeros((R + 1, lanes // 32), np.uint32)
    dense = np.zeros((kmax, w * nb), np.int32)
    meta = np.zeros(1, np.int64)
    rc = lib.zelana_build_scan_schedule(
        digits_c.ctypes.data, w, n, nb, lanes, R, 1 if fold_bit15 else 0,
        perm.ctypes.data, flag_bits.ctypes.data, dense.ctypes.data,
        kmax, meta.ctypes.data,
    )
    if rc != 0:
        return None
    return perm, flag_bits, dense, int(meta[0])


def build_schedule_arrays2(digits: np.ndarray, nb: int, lanes: int, R: int,
                           fold_bit15: bool, lanes2: int, kmax: int = 64):
    """Two-level schedule (level-2 run-scan partial merge). Returns
    (perm, flag_bits, pos2 (R2+1, lanes2) i32, dense_idx2 (K2, w*nb) i32,
    K2, R2) or None (library missing / caps exceeded -> caller falls back
    to the single-level schedule)."""
    lib = load()
    if lib is None or not hasattr(lib, "zelana_build_scan_schedule2"):
        return None
    w, n = digits.shape
    digits_c = np.ascontiguousarray(digits, dtype=np.int32)
    perm = np.empty((R + 1, lanes), np.uint16)
    flag_bits = np.zeros((R + 1, lanes // 32), np.uint32)
    # upper bound on level-2 stream: one partial per bucket + one per
    # level-1 lane-boundary crossing (<= lanes per bucket-straddling lane)
    bound = w * nb + lanes + lanes2
    r2cap = -(-bound // lanes2) + 1
    pos2 = np.zeros((r2cap + 1, lanes2), np.int32)
    dense2 = np.zeros((kmax, w * nb), np.int32)
    meta = np.zeros(2, np.int64)
    rc = lib.zelana_build_scan_schedule2(
        digits_c.ctypes.data, w, n, nb, lanes, R, 1 if fold_bit15 else 0,
        lanes2, r2cap, perm.ctypes.data, flag_bits.ctypes.data,
        pos2.ctypes.data, dense2.ctypes.data, kmax, meta.ctypes.data,
    )
    if rc != 0:
        return None
    K2, R2 = int(meta[0]), int(meta[1])
    return (perm, flag_bits, np.ascontiguousarray(pos2[:R2 + 1]),
            dense2, K2, R2)
