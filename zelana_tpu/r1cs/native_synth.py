"""ctypes binding for the native chunk-circuit synthesizer
(csrc/chunk_synth.cpp).

Produces the same (A, B, C, z) system as running
circuits/batch_mimc.BatchCircuitMiMC.generate_constraints over the Python
ConstraintSystem -- proven element-for-element in
tests/test_chunk_native.py -- but in CSR/numpy form and ~100x faster,
which makes the production 8/4/4 depth-32 chunk shape (~1.2M constraints)
practical to prove per batch. Also binds the stateless CSR helpers used by
the prove/keygen host paths (matvec, satisfaction check, QAP Lagrange
accumulation).

Reference counterpart: ark-relations constraint synthesis inside
Groth16::prove / circuit_specific_setup (SURVEY.md 2.1).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from dataclasses import dataclass
from functools import lru_cache

import numpy as np

from ..fields.bn254 import R as FR

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc",
                    "chunk_synth.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "..", "..", "csrc",
                    "libzelana_chunk.so")

_p = ctypes.c_void_p


@lru_cache(maxsize=1)
def load():
    src = os.path.abspath(_SRC)
    lib_path = os.path.abspath(_LIB)
    if os.path.exists(src) and (
        not os.path.exists(lib_path)
        or os.path.getmtime(lib_path) < os.path.getmtime(src)
    ):
        try:
            # build to a temp name + atomic rename: a direct -o truncates
            # the existing .so in place, corrupting the mapping of any
            # LIVE process that loaded it (long-running prover services)
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
    lib.zelana_chunk_synth.argtypes = [_p] * 5 + [ctypes.c_int] * 4
    lib.zelana_chunk_synth.restype = _p
    lib.zelana_chunk_sizes.argtypes = [_p, _p]
    lib.zelana_chunk_export.argtypes = [_p] * 12
    lib.zelana_chunk_free.argtypes = [_p]
    lib.zelana_csr_matvec.argtypes = [
        _p, _p, _p, _p, ctypes.c_int64, _p, ctypes.c_int64,
        ctypes.c_int64, _p, ctypes.c_int32,
    ]
    lib.zelana_powers_scaled.argtypes = [_p, _p, ctypes.c_int64, _p]
    lib.zelana_from_mont_batch.argtypes = [_p, ctypes.c_int64, _p]
    lib.zelana_mont_encode_any.argtypes = [
        _p, ctypes.c_int64, _p, _p, ctypes.c_uint64, _p,
    ]
    lib.zelana_proj_affine_any.argtypes = [
        _p, _p, _p, ctypes.c_int64, _p, _p, ctypes.c_uint64, _p, _p,
    ]
    lib.zelana_proj_affine_fq2.argtypes = [
        _p, _p, _p, ctypes.c_int64, _p, _p, ctypes.c_uint64, _p, _p,
    ]
    lib.zelana_abc_combine.argtypes = [_p] * 6 + [ctypes.c_int64, _p]
    lib.zelana_csr_check.argtypes = [_p] * 10 + [
        ctypes.c_int64, _p, ctypes.c_int64, ctypes.c_int64,
    ]
    lib.zelana_csr_check.restype = ctypes.c_int64
    lib.zelana_qap_accumulate.argtypes = [
        _p, _p, _p, _p, ctypes.c_int64, _p, ctypes.c_int64,
        ctypes.c_int64, _p,
    ]
    lib.zelana_lagrange_at.argtypes = [_p, _p, _p, ctypes.c_int64, _p, _p]
    return lib


def fr_array(values) -> np.ndarray:
    """list of ints -> (n, 4) u64 canonical little-endian limbs."""
    n = len(values)
    buf = b"".join((int(v) % FR).to_bytes(32, "little") for v in values)
    return np.frombuffer(buf, dtype="<u8").reshape(n, 4).copy()


def fr_ints(arr: np.ndarray) -> list:
    """(n, 4) u64 limbs -> list of ints."""
    a = np.ascontiguousarray(arr, dtype=np.uint64)
    return [
        int(r[0]) | int(r[1]) << 64 | int(r[2]) << 128 | int(r[3]) << 192
        for r in a
    ]


def limbs16(arr: np.ndarray) -> np.ndarray:
    """(n, 4) u64 limbs -> (16, n) u32 16-bit limb planes (ops/limbs.py
    layout). Pure bit repacking: the input must already be in the wanted
    domain (canonical or Montgomery)."""
    a = np.ascontiguousarray(arr, dtype="<u8")
    return a.view("<u2").reshape(len(a), 16).T.astype(np.uint32)


@dataclass
class CsrMatrix:
    indptr: np.ndarray  # (rows+1,) i64
    indices: np.ndarray  # (nnz,) i32 global variable ids
    coeffs: np.ndarray  # (nnz,) i32 pool ids


class NativeSystem:
    """Synthesized R1CS in CSR/numpy form, with native helpers."""

    def __init__(self, lib, z, mats, pool, num_instance):
        self._lib = lib
        self.z = z  # (nvars, 4) u64 canonical
        self.A, self.B, self.C = mats
        self.pool = pool  # (npool, 4) u64 canonical
        self.num_instance = num_instance

    @property
    def num_constraints(self) -> int:
        return len(self.A.indptr) - 1

    @property
    def num_vars(self) -> int:
        return len(self.z)

    def instance_ints(self) -> list:
        return fr_ints(self.z[: self.num_instance])

    def assignment_ints(self) -> list:
        return fr_ints(self.z)

    def check(self) -> int:
        """-1 if satisfied, else the first violated constraint row."""
        return int(self._lib.zelana_csr_check(
            *(m_.ctypes.data for m_ in (
                self.A.indptr, self.A.indices, self.A.coeffs,
                self.B.indptr, self.B.indices, self.B.coeffs,
                self.C.indptr, self.C.indices, self.C.coeffs,
                self.pool)),
            len(self.pool), self.z.ctypes.data, len(self.z),
            self.num_constraints,
        ))

    def matvec(self, which: str, mont: bool = False) -> np.ndarray:
        """M.z as (rows, 4) u64, canonical (or Montgomery with mont=True)."""
        m = {"A": self.A, "B": self.B, "C": self.C}[which]
        rows = self.num_constraints
        out = np.empty((rows, 4), np.uint64)
        self._lib.zelana_csr_matvec(
            m.indptr.ctypes.data, m.indices.ctypes.data,
            m.coeffs.ctypes.data, self.pool.ctypes.data, len(self.pool),
            self.z.ctypes.data, len(self.z), rows, out.ctypes.data,
            1 if mont else 0,
        )
        return out

    def qap_accumulate(self, which: str, u: np.ndarray) -> np.ndarray:
        """sum_r coeff[r,i] * u[r] per variable i, (num_vars, 4) u64."""
        m = {"A": self.A, "B": self.B, "C": self.C}[which]
        u = np.ascontiguousarray(u, dtype=np.uint64)
        out = np.zeros((self.num_vars, 4), np.uint64)
        self._lib.zelana_qap_accumulate(
            m.indptr.ctypes.data, m.indices.ctypes.data,
            m.coeffs.ctypes.data, self.pool.ctypes.data, len(self.pool),
            u.ctypes.data, self.num_constraints, self.num_vars,
            out.ctypes.data,
        )
        return out

    def to_python(self):
        """(A, B, C) as lists of {global_var: coeff} dicts + z ints, for
        equivalence tests against the Python ConstraintSystem."""
        pool_ints = fr_ints(self.pool)

        def rows(m: CsrMatrix):
            out = []
            for r in range(self.num_constraints):
                lo, hi = m.indptr[r], m.indptr[r + 1]
                out.append({
                    int(m.indices[j]): pool_ints[m.coeffs[j]]
                    for j in range(lo, hi)
                })
            return out

        return rows(self.A), rows(self.B), rows(self.C), \
            self.assignment_ints()


def synthesize_chunk(circuit) -> NativeSystem | None:
    """Native synthesis of a circuits/batch_mimc.BatchCircuitMiMC instance.
    Returns None when the native library is unavailable."""
    lib = load()
    if lib is None:
        return None
    d = circuit.tree_depth
    transfers, withdrawals, shielded = circuit._pad()

    pub = fr_array([
        circuit.pre_state_root, circuit.post_state_root,
        circuit.pre_shielded_root, circuit.post_shielded_root,
        circuit.withdrawal_root, circuit.batch_hash, circuit.batch_id,
    ])

    tvals = []
    for t in transfers:
        tvals += [1 if t.is_valid else 0, t.sender_pubkey, t.sender_balance,
                  t.sender_nonce, t.receiver_pubkey, t.receiver_balance,
                  t.receiver_nonce, t.amount, t.signature]
        tvals += list(t.sender_path) + list(t.sender_path_indices)
        tvals += list(t.receiver_path) + list(t.receiver_path_indices)
    wvals = []
    for w in withdrawals:
        wvals += [1 if w.is_valid else 0, w.sender_pubkey, w.sender_balance,
                  w.sender_nonce, w.l1_recipient, w.amount, w.signature]
        wvals += list(w.sender_path) + list(w.sender_path_indices)
    svals = []
    for s in shielded:
        svals += [1 if s.is_valid else 0, 1 if s.skip_verification else 0,
                  s.input_owner, s.input_value, s.input_blinding,
                  s.input_position, s.spending_key, s.output_owner,
                  s.output_value, s.output_blinding, s.output_commitment,
                  s.nullifier]
        svals += list(s.input_path) + list(s.input_path_indices)
    finals = fr_array([circuit.num_transfers, circuit.num_withdrawals,
                       circuit.num_shielded])

    ta = fr_array(tvals) if tvals else np.zeros((0, 4), np.uint64)
    wa = fr_array(wvals) if wvals else np.zeros((0, 4), np.uint64)
    sa = fr_array(svals) if svals else np.zeros((0, 4), np.uint64)

    h = lib.zelana_chunk_synth(
        pub.ctypes.data, ta.ctypes.data, wa.ctypes.data, sa.ctypes.data,
        finals.ctypes.data, circuit.max_transfers, circuit.max_withdrawals,
        circuit.max_shielded, d,
    )
    if not h:
        return None
    try:
        sizes = np.zeros(7, np.int64)
        lib.zelana_chunk_sizes(h, sizes.ctypes.data)
        ni, nw, nc, nnza, nnzb, nnzc, npool = (int(x) for x in sizes)
        z = np.empty((ni + nw, 4), np.uint64)
        pool = np.empty((max(npool, 1), 4), np.uint64)

        def alloc(nnz):
            return (np.empty(nc + 1, np.int64), np.empty(nnz, np.int32),
                    np.empty(nnz, np.int32))

        aptr, aidx, acoe = alloc(nnza)
        bptr, bidx, bcoe = alloc(nnzb)
        cptr, cidx, ccoe = alloc(nnzc)
        lib.zelana_chunk_export(
            h, z.ctypes.data, aptr.ctypes.data, aidx.ctypes.data,
            acoe.ctypes.data, bptr.ctypes.data, bidx.ctypes.data,
            bcoe.ctypes.data, cptr.ctypes.data, cidx.ctypes.data,
            ccoe.ctypes.data, pool.ctypes.data,
        )
    finally:
        lib.zelana_chunk_free(h)
    pool = pool[:npool]
    return NativeSystem(
        lib, z,
        (CsrMatrix(aptr, aidx, acoe), CsrMatrix(bptr, bidx, bcoe),
         CsrMatrix(cptr, cidx, ccoe)),
        pool, ni,
    )


def from_mont_limbs16(arr: np.ndarray) -> np.ndarray | None:
    """(16, n) u32 Montgomery limb planes -> (n, 4) u64 canonical."""
    lib = load()
    if lib is None:
        return None
    n = arr.shape[1]
    u64s = np.ascontiguousarray(
        arr.T.astype(np.uint16)).view("<u8").reshape(n, 4).copy()
    lib.zelana_from_mont_batch(u64s.ctypes.data, n, u64s.ctypes.data)
    return u64s


def powers_scaled(t: int, scale: int, m: int) -> np.ndarray | None:
    """out[j] = scale * t^j for j < m, (m, 4) u64 canonical."""
    lib = load()
    if lib is None:
        return None
    tv = fr_array([t])
    sv = fr_array([scale])
    out = np.empty((m, 4), np.uint64)
    lib.zelana_powers_scaled(tv.ctypes.data, sv.ctypes.data, m,
                             out.ctypes.data)
    return out


def abc_combine(a: np.ndarray, b: np.ndarray, c: np.ndarray, beta: int,
                alpha: int, scale: int) -> np.ndarray | None:
    """out[i] = (beta*a[i] + alpha*b[i] + c[i]) * scale, canonical."""
    lib = load()
    if lib is None:
        return None
    n = len(a)
    bv = fr_array([beta])
    av = fr_array([alpha])
    sv = fr_array([scale])
    a = np.ascontiguousarray(a, dtype=np.uint64)
    b = np.ascontiguousarray(b, dtype=np.uint64)
    c = np.ascontiguousarray(c, dtype=np.uint64)
    out = np.empty((n, 4), np.uint64)
    lib.zelana_abc_combine(a.ctypes.data, b.ctypes.data, c.ctypes.data,
                           bv.ctypes.data, av.ctypes.data, sv.ctypes.data,
                           n, out.ctypes.data)
    return out


def lagrange_at(group_gen: int, size_inv: int, t: int, m: int):
    """Native Lagrange coefficients u_r(t) over the radix-2 domain.
    Returns ((m, 4) u64 canonical, Z(t) int) or None without the lib."""
    lib = load()
    if lib is None:
        return None
    g = fr_array([group_gen])
    mi = fr_array([size_inv])
    tv = fr_array([t])
    u = np.empty((m, 4), np.uint64)
    zt = np.empty((1, 4), np.uint64)
    lib.zelana_lagrange_at(g.ctypes.data, mi.ctypes.data, tv.ctypes.data,
                           m, u.ctypes.data, zt.ctypes.data)
    return u, fr_ints(zt)[0]
