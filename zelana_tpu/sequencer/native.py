"""ctypes bindings for the native MiMC engine (csrc/mimc.cpp).

Auto-builds the shared library with g++ on first import if it is missing
(cc toolchain is part of the deployment image; there is no pybind11, so the
binding is a plain C ABI). Falls back to the pure-Python golden MiMC when
no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from functools import lru_cache

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc", "mimc.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "..", "..", "csrc", "libzelana_mimc.so")


@lru_cache(maxsize=1)
def load():
    """Returns the ctypes library or None."""
    src = os.path.abspath(_SRC)
    lib_path = os.path.abspath(_LIB)
    if not os.path.exists(lib_path) and os.path.exists(src):
        try:
            # temp + atomic rename: never truncate a .so a live process maps
            tmp = lib_path + f".tmp{os.getpid()}"
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", tmp, src],
                check=True,
                capture_output=True,
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
    lib.zelana_mimc_hash_n.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p,
    ]
    lib.zelana_mimc_account_leaf.argtypes = [
        ctypes.c_char_p, ctypes.c_uint64, ctypes.c_uint64, ctypes.c_char_p,
    ]
    lib.zelana_mimc_hash2_batch.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p,
    ]
    lib.zelana_mimc_merkle_root.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int,
        ctypes.c_char_p,
    ]
    return lib


def hash_n_be(*values_be32: bytes) -> bytes:
    lib = load()
    if lib is None:
        from ..hashes import mimc

        vals = [int.from_bytes(v, "big") for v in values_be32]
        return mimc.hash_n(*vals).to_bytes(32, "big")
    out = ctypes.create_string_buffer(32)
    lib.zelana_mimc_hash_n(b"".join(values_be32), len(values_be32), out)
    return out.raw


def hash2_be(a: bytes, b: bytes) -> bytes:
    return hash_n_be(a, b)


def account_leaf_be(pubkey_be32: bytes, balance: int, nonce: int) -> bytes:
    lib = load()
    if lib is None:
        from ..hashes import mimc

        leaf = mimc.compute_account_leaf(
            int.from_bytes(pubkey_be32, "big"), balance, nonce
        )
        return leaf.to_bytes(32, "big")
    out = ctypes.create_string_buffer(32)
    lib.zelana_mimc_account_leaf(pubkey_be32, balance, nonce, out)
    return out.raw


def merkle_root_be(leaf: bytes, siblings: list, dirs: list) -> bytes:
    lib = load()
    if lib is None:
        cur = leaf
        for sib, is_right in zip(siblings, dirs):
            cur = hash2_be(sib, cur) if is_right else hash2_be(cur, sib)
        return cur
    out = ctypes.create_string_buffer(32)
    lib.zelana_mimc_merkle_root(
        leaf, b"".join(siblings), bytes(dirs), len(siblings), out
    )
    return out.raw
