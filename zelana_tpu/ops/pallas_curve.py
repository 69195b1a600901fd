"""Fused Pallas kernels for the MSM's batched point addition.

One pair-reduction round of the fast MSM (ops/msm_fast.py) is a batched
point addition of gathered slot pairs. The round math uses the COMPLETE
projective addition formulas for short-Weierstrass curves with a = 0
(Renes-Costello-Batina 2015, Algorithm 7): 12 field muls + 2 muls by the
constant 3b, with NO case analysis -- identity (0:1:0), doubling, and
P + (-P) all flow through the same straight-line code. That shape is ideal
for the TPU: the batched-affine alternative needs a shared batch inversion
whose Fermat base case is ~500 *sequential* tiny multiplies per round
(measured ~9 ms/round on the bench chip -- it dominated the whole MSM),
while the complete-add round is one branch-free kernel with all multiplies
at full batch width.

The same algorithm runs in two forms:
  - `proj_add_xla`: plain traceable JAX over ops/limbs.py (CPU/tests);
  - `step_call`: ONE fused kernel per MSM tape step on TPU -- complete add
    plus an in-place pool write via input_output_aliases, all limb math in
    VMEM/registers (ops from pallas_field._sos_mul_fn).

Reference counterpart: the bucket accumulation inside ark-groth16's
Pippenger MSM (SURVEY.md section 2.1, "Groth16 prove engine").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import limbs as L
from .pallas_field import _sos_mul_fn

MASK16 = 0xFFFF


# ---------------------------------------------------------------------------
# the complete-add straight line, generic over a field-op vtable
# ---------------------------------------------------------------------------


def complete_add(F, P, Q):
    """Renes-Costello Algorithm 7 (a = 0). P, Q: (X, Y, Z) projective.

    F provides mul/add/sub/mul_b3 over the coordinate field. Works verbatim
    for G1 (Fq) and G2 (Fq2 with the twist's b' = 3/(9+u))."""
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q
    t0 = F.mul(X1, X2)
    t1 = F.mul(Y1, Y2)
    t2 = F.mul(Z1, Z2)
    t3 = F.add(X1, Y1)
    t4 = F.add(X2, Y2)
    t3 = F.mul(t3, t4)
    t4 = F.add(t0, t1)
    t3 = F.sub(t3, t4)
    t4 = F.add(Y1, Z1)
    X3 = F.add(Y2, Z2)
    t4 = F.mul(t4, X3)
    X3 = F.add(t1, t2)
    t4 = F.sub(t4, X3)
    X3 = F.add(X1, Z1)
    Y3 = F.add(X2, Z2)
    X3 = F.mul(X3, Y3)
    Y3 = F.add(t0, t2)
    Y3 = F.sub(X3, Y3)
    X3 = F.add(t0, t0)
    t0 = F.add(X3, t0)
    t2 = F.mul_b3(t2)
    Z3 = F.add(t1, t2)
    t1 = F.sub(t1, t2)
    Y3 = F.mul_b3(Y3)
    X3 = F.mul(t4, Y3)
    t2 = F.mul(t3, t1)
    X3 = F.sub(t2, X3)
    Y3 = F.mul(Y3, t0)
    t1 = F.mul(t1, Z3)
    Y3 = F.add(t1, Y3)
    t0 = F.mul(t0, t3)
    Z3 = F.mul(Z3, t4)
    Z3 = F.add(Z3, t0)
    return X3, Y3, Z3


def complete_add_mixed(F, P, Q):
    """Algorithm 7 specialized to Z1 = Z2 = 1 (both operands original input
    points): t2 = 1 collapses three products to plain adds -- 9 muls + one
    mul by 3b. P, Q: (X, Y) affine; the result is fully projective.

    Off-curve padding inputs (the identity slot's (0, 1)) produce garbage
    that the tape never reads -- the straight line cannot fault."""
    X1, Y1 = P
    X2, Y2 = Q
    t0 = F.mul(X1, X2)
    t1 = F.mul(Y1, Y2)
    t3 = F.mul(F.add(X1, Y1), F.add(X2, Y2))
    t3 = F.sub(t3, F.add(t0, t1))
    t4 = F.add(Y1, Y2)
    Y3 = F.add(X1, X2)
    t0 = F.add(F.add(t0, t0), t0)
    b3 = F.b3_const(X1)
    Z3 = F.add(t1, b3)
    t1 = F.sub(t1, b3)
    Y3 = F.mul_b3(Y3)
    X3 = F.sub(F.mul(t3, t1), F.mul(t4, Y3))
    Y3 = F.add(F.mul(Y3, t0), F.mul(t1, Z3))
    Z3 = F.add(F.mul(Z3, t4), F.mul(t0, t3))
    return X3, Y3, Z3


def complete_add_z1(F, P, Q):
    """Algorithm 7 specialized to Z2 = 1 (Q affine, P fully projective):
    11 muls + 2 mul-by-3b. The run-scan MSM's steady-state add -- the carry
    (a partial bucket sum) is projective while every incoming stream element
    is an ORIGINAL affine input point.

    Complete: identity carry (0:1:0), doubling, and P + (-P) all flow
    through the same straight line."""
    X1, Y1, Z1 = P
    X2, Y2 = Q
    t0 = F.mul(X1, X2)
    t1 = F.mul(Y1, Y2)
    t3 = F.sub(F.mul(F.add(X1, Y1), F.add(X2, Y2)), F.add(t0, t1))
    t4 = F.add(F.mul(Y2, Z1), Y1)
    Y3 = F.add(F.mul(X2, Z1), X1)
    t0 = F.add(F.add(t0, t0), t0)
    t2 = F.mul_b3(Z1)
    Z3 = F.add(t1, t2)
    t1 = F.sub(t1, t2)
    Y3 = F.mul_b3(Y3)
    X3 = F.sub(F.mul(t3, t1), F.mul(t4, Y3))
    Y3 = F.add(F.mul(Y3, t0), F.mul(t1, Z3))
    Z3 = F.add(F.mul(Z3, t4), F.mul(t0, t3))
    return X3, Y3, Z3


def _b3_g2() -> tuple:
    """3 * b' for the G2 twist, b' = 3 / (9 + u), as integer Fq2 coeffs."""
    from ..fields import tower as tw

    inv = tw.fq2_inv((9, 1))
    return (9 * inv[0] % L.FQ.modulus, 9 * inv[1] % L.FQ.modulus)


# ---------------------------------------------------------------------------
# XLA vtables (CPU / fallback path; also the semantics reference in tests)
# ---------------------------------------------------------------------------


class XlaFq:
    mul = staticmethod(lambda a, b: L.mont_mul(a, b, L.FQ))
    add = staticmethod(lambda a, b: L.add(a, b, L.FQ))
    sub = staticmethod(lambda a, b: L.sub(a, b, L.FQ))

    @staticmethod
    def mul_b3(x):
        # b = 3 for G1: 3b = 9; 9x = 8x + x via three doublings + one add
        t = L.add(x, x, L.FQ)
        t = L.add(t, t, L.FQ)
        t = L.add(t, t, L.FQ)
        return L.add(t, x, L.FQ)

    @staticmethod
    def b3_const(like):
        return L.broadcast_scalar(L.encode_mont([9], L.FQ)[:, 0],
                                  like.shape[1:])


class XlaFq2:
    @staticmethod
    def mul(a, b):
        a0, a1 = a
        b0, b1 = b
        t0 = L.mont_mul(a0, b0, L.FQ)
        t1 = L.mont_mul(a1, b1, L.FQ)
        s = L.mont_mul(L.add(a0, a1, L.FQ), L.add(b0, b1, L.FQ), L.FQ)
        return (L.sub(t0, t1, L.FQ), L.sub(L.sub(s, t0, L.FQ), t1, L.FQ))

    add = staticmethod(lambda a, b: (L.add(a[0], b[0], L.FQ),
                                     L.add(a[1], b[1], L.FQ)))
    sub = staticmethod(lambda a, b: (L.sub(a[0], b[0], L.FQ),
                                     L.sub(a[1], b[1], L.FQ)))

    @staticmethod
    def mul_b3(x):
        return XlaFq2.mul(x, XlaFq2.b3_const(x))

    @staticmethod
    def b3_const(like):
        c = _b3_g2()
        return (L.broadcast_scalar(L.encode_mont([c[0]], L.FQ)[:, 0],
                                   like[0].shape[1:]),
                L.broadcast_scalar(L.encode_mont([c[1]], L.FQ)[:, 0],
                                   like[0].shape[1:]))


def proj_add_xla(P, Q, curve: str):
    return complete_add(XlaFq if curve == "g1" else XlaFq2, P, Q)


# ---------------------------------------------------------------------------
# in-kernel limb helpers: (16, S, 128) u32 arrays of canonical 16-bit limbs
# ---------------------------------------------------------------------------


def _add_raw(a, b):
    """a + b with an unrolled carry chain; result limbs < 2^16."""
    outs = []
    carry = jnp.zeros_like(a[0])
    for i in range(L.NLIMBS):
        v = a[i] + b[i] + carry
        outs.append(v & MASK16)
        carry = v >> 16
    return jnp.stack(outs), carry

def _sub_raw(a, b):
    """a - b with an unrolled borrow chain; returns (diff, borrow in {0,1})."""
    outs = []
    borrow = jnp.zeros_like(a[0], dtype=jnp.int32)
    for i in range(L.NLIMBS):
        v = a[i].astype(jnp.int32) - b[i].astype(jnp.int32) - borrow
        outs.append((v & MASK16).astype(jnp.uint32))
        borrow = (v < 0).astype(jnp.int32)
    return jnp.stack(outs), borrow


class _KernelFq:
    """Field vtable for the kernel body (register/VMEM-resident limb math)."""

    def __init__(self, spec_mod: int):
        self._mul = _sos_mul_fn(spec_mod)
        self.p16 = [(spec_mod >> (16 * i)) & MASK16 for i in range(L.NLIMBS)]

    def _p_like(self, a):
        return jnp.stack(
            [jnp.full(a.shape[1:], c, jnp.uint32) for c in self.p16]
        )

    def mul(self, a, b):
        return self._mul(a, b)

    def add(self, a, b):
        s, _ = _add_raw(a, b)  # a + b < 2p < 2^256: no carry out
        d, bor = _sub_raw(s, self._p_like(a))
        return jnp.where(bor == 0, d, s)

    def sub(self, a, b):
        d, bor = _sub_raw(a, b)
        corr, _ = _add_raw(d, self._p_like(a))
        return jnp.where(bor == 1, corr, d)

    def mul_b3(self, x):
        t = self.add(x, x)
        t = self.add(t, t)
        t = self.add(t, t)
        return self.add(t, x)

    def b3_const(self, like):
        vals = L.encode_mont([9], L.FQ)[:, 0]
        return jnp.stack(
            [jnp.full(like.shape[1:], int(v), jnp.uint32) for v in vals]
        )


class _KernelFq2:
    def __init__(self, spec_mod: int):
        self.f = _KernelFq(spec_mod)
        c = _b3_g2()
        self.b3_0 = tuple(int(v) for v in L.encode_mont([c[0]], L.FQ)[:, 0])
        self.b3_1 = tuple(int(v) for v in L.encode_mont([c[1]], L.FQ)[:, 0])

    def mul(self, a, b):
        f = self.f
        t0 = f.mul(a[0], b[0])
        t1 = f.mul(a[1], b[1])
        s = f.mul(f.add(a[0], a[1]), f.add(b[0], b[1]))
        return (f.sub(t0, t1), f.sub(f.sub(s, t0), t1))

    def add(self, a, b):
        return (self.f.add(a[0], b[0]), self.f.add(a[1], b[1]))

    def sub(self, a, b):
        return (self.f.sub(a[0], b[0]), self.f.sub(a[1], b[1]))

    def b3_const(self, like):
        shape = like[0].shape[1:]
        return (
            jnp.stack([jnp.full(shape, v, jnp.uint32) for v in self.b3_0]),
            jnp.stack([jnp.full(shape, v, jnp.uint32) for v in self.b3_1]),
        )

    def mul_b3(self, x):
        shape = x[0].shape[1:]
        const = (
            jnp.stack([jnp.full(shape, v, jnp.uint32) for v in self.b3_0]),
            jnp.stack([jnp.full(shape, v, jnp.uint32) for v in self.b3_1]),
        )
        return self.mul(x, const)


# ---------------------------------------------------------------------------
# the fused MSM step kernel: complete add + IN-PLACE pool write
# ---------------------------------------------------------------------------
#
# One MSM tape step (msm_fast._run_tape) is: gather operand pairs (XLA),
# complete-add them, write the S results into the slot pool at a
# data-dependent (but host-known) offset. The write goes through
# input_output_aliases so the pool is updated in place -- an XLA
# dynamic_update_slice instead materializes a full pool copy every step
# (measured ~2.3 ms/step of pure copy at a 2^20-slot pool). The dynamic
# output position rides a scalar-prefetch argument feeding the out
# BlockSpec's index_map.

ROWS = 8  # block sublane rows; S and the write offset align to ROWS * 128


# The pool stores field elements PACKED: 8 uint32 rows per element, row k
# holding 16-bit limbs 2k (low half) and 2k+1 (high half). That halves the
# pool footprint, the gather element count, and the kernel's HBM traffic;
# kernels unpack to the 16-row limb form in registers.


def kernel_unpack(p):
    """(8k, S, 128) packed u32 -> (16k, S, 128) 16-bit limb rows."""
    lo = p & 0xFFFF
    hi = p >> 16
    k = p.shape[0]
    return jnp.stack([lo, hi], axis=1).reshape(2 * k, *p.shape[1:])


def kernel_pack(a):
    """(16k, S, 128) limb rows -> (8k, S, 128) packed u32."""
    k = a.shape[0] // 2
    pairs = a.reshape(k, 2, *a.shape[1:])
    return pairs[:, 0] + (pairs[:, 1] << 16)


def pack_rows_py(limbs16) -> tuple:
    """(16,) python/numpy limb values -> 8 packed python ints."""
    v = [int(x) for x in limbs16]
    return tuple(v[2 * i] | (v[2 * i + 1] << 16) for i in range(8))


@functools.lru_cache(maxsize=None)
def step_call(modulus: int, curve: str, S: int, total_alloc: int,
              interpret: bool, mixed: bool = False):
    """The fused MSM step: unpack gathered operands, complete-add, pack,
    write in place at the scalar-prefetched pool offset.

    mixed=True is the bucket-phase round-0 specialization: both operands
    are ORIGINAL input points (Z = 1), so the gather skips the Z rows and
    the add drops to 9 muls (t2 = Z1*Z2 = 1 collapses three products to
    cheap adds); the result is still fully projective."""
    C = 24 if curve == "g1" else 48  # packed pool rows
    A_ROWS = (C * 2 // 3) if mixed else C
    F = _KernelFq(modulus) if curve == "g1" else _KernelFq2(modulus)

    def split(a):
        if curve == "g1":
            parts = [a[16 * i:16 * (i + 1)] for i in range(a.shape[0] // 16)]
        else:
            comps = [a[16 * i:16 * (i + 1)] for i in range(a.shape[0] // 16)]
            parts = [(comps[2 * i], comps[2 * i + 1])
                     for i in range(len(comps) // 2)]
        return tuple(parts)

    def join(coords):
        if curve == "g1":
            return jnp.concatenate(list(coords), axis=0)
        return jnp.concatenate([c for pair in coords for c in pair], axis=0)

    def kernel(st_ref, a_ref, b_ref, pool_ref, out_ref):
        del st_ref, pool_ref  # st feeds the index_map; pool is the alias
        P = split(kernel_unpack(a_ref[...]))
        Q = split(kernel_unpack(b_ref[...]))
        if mixed:
            R3 = complete_add_mixed(F, P, Q)
        else:
            R3 = complete_add(F, P, Q)
        out_ref[...] = kernel_pack(join(R3))

    a_spec = pl.BlockSpec((A_ROWS, ROWS, 128), lambda i, st: (0, i, 0),
                          memory_space=pltpu.VMEM)
    pool_spec = pl.BlockSpec(
        (C, ROWS, 128),
        lambda i, st: (0, st[0] // (ROWS * 128) + i, 0),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(S // (ROWS * 128),),
        in_specs=[a_spec, a_spec, pool_spec],
        out_specs=pool_spec,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((C, total_alloc // 128, 128),
                                       jnp.uint32),
        input_output_aliases={3: 0},  # pool arg (after the scalar) -> out
        interpret=interpret,
    )


# ---------------------------------------------------------------------------
# the run-scan MSM kernel: whole bucket accumulation in ONE pallas_call
# ---------------------------------------------------------------------------
#
# The round-2 MSM (ops/msm_scan.py) streams the key-sorted digit stream
# through this kernel: grid step r consumes stream row r (one affine point
# per lane), the running per-lane bucket partial (the "carry") lives in a
# VMEM scratch that persists across the sequentially-executed grid steps,
# and a host-provided flag marks where a new (window, digit) run begins --
# emit the finished carry, reset to the incoming point. One kernel replaces
# the per-step dispatch + gather of the tape design: all operands arrive by
# Pallas block streaming, never by XLA gather.


def _coords(a, curve: str, ny: int):
    """Split (16*ny, ...) limb rows into ny G1 coords or ny/2 Fq2 pairs."""
    parts = [a[16 * i:16 * (i + 1)] for i in range(ny)]
    if curve == "g1":
        return tuple(parts)
    return tuple((parts[2 * i], parts[2 * i + 1]) for i in range(ny // 2))


def _flat(coords, curve: str):
    if curve == "g1":
        return jnp.concatenate(list(coords), axis=0)
    return jnp.concatenate([c for pair in coords for c in pair], axis=0)


@functools.lru_cache(maxsize=None)
def runscan_call(modulus: int, curve: str, Ls: int, R: int, interpret: bool,
                 proj_in: bool = False):
    """Returns call(vals, flags) -> emit.

    vals:  (R+1, VC, Ls, 128) packed u32 -- stream row r = one point per
           lane. Affine stream (default): VC = 16 packed rows for G1 X|Y,
           32 for G2, and each add is the 11-mul Z2=1 complete add.
           proj_in=True (the level-2 partial-merge stream): VC = C (full
           projective operands), 12-mul complete add.
    flags: (R+1, Ls, 128) int32; 1 = this element begins a new run.
    emit:  (R+1, C, Ls, 128) packed u32 -- row r holds, per lane, the
           finished run total when flags[r] = 1 (else the identity).
           Row R is the flush row (host sets flags[R] = 1).
    """
    C = 24 if curve == "g1" else 48
    VC = C if proj_in else (16 if curve == "g1" else 32)
    F = _KernelFq(modulus) if curve == "g1" else _KernelFq2(modulus)
    one16 = tuple(int(v) for v in L.encode_mont([1], L.FQ)[:, 0])

    ypos = C // 3  # first packed row of the Y coordinate

    def kernel(vals_ref, flag_ref, emit_ref, carry_ref):
        r = pl.program_id(0)
        one_limbs = jnp.stack(
            [jnp.full((Ls, 128), v, jnp.uint32) for v in one16]
        )
        one_packed = kernel_pack(one_limbs)  # (8, Ls, 128)
        # identity (0 : 1 : 0): Y's first Fq component = one_mont
        ident = jnp.concatenate(
            [
                jnp.zeros((ypos, Ls, 128), jnp.uint32),
                one_packed,
                jnp.zeros((C - ypos - 8, Ls, 128), jnp.uint32),
            ],
            axis=0,
        )

        @pl.when(r == 0)
        def _():
            carry_ref[...] = ident

        f = flag_ref[0][None, :, :] != 0  # (1, Ls, 128) bool
        cpacked = carry_ref[...]
        emit_ref[...] = jnp.where(f, cpacked, ident)[None]

        c = kernel_unpack(cpacked)
        v = kernel_unpack(vals_ref[0])
        P3 = _coords(c, curve, 3 if curve == "g1" else 6)
        if proj_in:
            Q3 = _coords(v, curve, 3 if curve == "g1" else 6)
            S3 = complete_add(F, P3, Q3)
            prom3 = Q3
        else:
            Q2 = _coords(v, curve, 2 if curve == "g1" else 4)
            S3 = complete_add_z1(F, P3, Q2)
            if curve == "g1":
                prom3 = (v[0:16], v[16:32], one_limbs)
            else:
                zero = jnp.zeros_like(one_limbs)
                prom3 = ((v[0:16], v[16:32]), (v[32:48], v[48:64]),
                         (one_limbs, zero))

        # new carry: flag ? promote(Q) : P + Q
        if curve == "g1":
            newc = tuple(jnp.where(f, prom3[i], S3[i]) for i in range(3))
        else:
            newc = tuple(
                (jnp.where(f, prom3[i][0], S3[i][0]),
                 jnp.where(f, prom3[i][1], S3[i][1]))
                for i in range(3)
            )
        carry_ref[...] = kernel_pack(_flat(newc, curve))

    return pl.pallas_call(
        kernel,
        grid=(R + 1,),
        in_specs=[
            pl.BlockSpec((1, VC, Ls, 128), lambda r: (r, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Ls, 128), lambda r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, Ls, 128), lambda r: (r, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R + 1, C, Ls, 128), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((C, Ls, 128), jnp.uint32)],
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def pairs_add_call(modulus: int, curve: str, n: int, interpret: bool):
    """call(A, B) -> A + B: plain batched complete projective add over
    packed (C, n//128, 128) arrays. Used by the run-scan MSM's fixed
    bucket-merge / bit-subset reduction tree (no pool, no aliasing)."""
    C = 24 if curve == "g1" else 48
    F = _KernelFq(modulus) if curve == "g1" else _KernelFq2(modulus)
    rows = min(ROWS, n // 128)

    def kernel(a_ref, b_ref, o_ref):
        P = _coords(kernel_unpack(a_ref[...]), curve,
                    3 if curve == "g1" else 6)
        Q = _coords(kernel_unpack(b_ref[...]), curve,
                    3 if curve == "g1" else 6)
        o_ref[...] = kernel_pack(_flat(complete_add(F, P, Q), curve))

    spec = pl.BlockSpec((C, rows, 128), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n // (rows * 128),),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((C, n // 128, 128), jnp.uint32),
        interpret=interpret,
    )
