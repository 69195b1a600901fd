"""Batched elliptic-curve point arithmetic on TPU (JAX, Jacobian coords).

Generic over the coordinate field through a tiny adapter (FqOps for G1,
Fq2Ops for G2), so the same branch-free Jacobian formulas serve both curves.
Points are coordinate triples (X, Y, Z) with Z == 0 encoding infinity; each
coordinate is a limbs-first Montgomery array (G1) or a (c0, c1) pair of them
(G2). All control flow is mask-select -- no data-dependent branches, so the
whole thing stays inside one XLA program.

This subsystem replaces the arkworks `ark-ec` short-Weierstrass kernels that
ark-groth16's MSMs are built on (reference hot loop:
core/src/sequencer/settlement/prover.rs:408).
"""

from __future__ import annotations

import jax.numpy as jnp

from . import limbs as L


class FqOps:
    """Coordinate ops for G1 (single Fq limb arrays)."""

    spec = L.FQ

    @staticmethod
    def mul(a, b):
        return L.mont_mul(a, b, L.FQ)

    @staticmethod
    def sqr(a):
        return L.mont_mul(a, a, L.FQ)

    @staticmethod
    def add(a, b):
        return L.add(a, b, L.FQ)

    @staticmethod
    def sub(a, b):
        return L.sub(a, b, L.FQ)

    @staticmethod
    def neg(a):
        return L.neg(a, L.FQ)

    @staticmethod
    def is_zero(a):
        return L.is_zero(a)

    @staticmethod
    def select(mask, a, b):
        return L.select(mask, a, b)

    @staticmethod
    def zeros_like(a):
        return jnp.zeros_like(a)

    @staticmethod
    def one_mont(batch_shape):
        return L.broadcast_scalar(L.FQ.one_mont, batch_shape)

    @staticmethod
    def batch_shape(a):
        return a.shape[1:]

    @staticmethod
    def dbl(a):  # 2a
        return L.add(a, a, L.FQ)


class Fq2Ops:
    """Coordinate ops for G2 (pairs of Fq limb arrays, u^2 = -1)."""

    spec = L.FQ

    @staticmethod
    def mul(a, b):
        a0, a1 = a
        b0, b1 = b
        t0 = L.mont_mul(a0, b0, L.FQ)
        t1 = L.mont_mul(a1, b1, L.FQ)
        s = L.mont_mul(L.add(a0, a1, L.FQ), L.add(b0, b1, L.FQ), L.FQ)
        c0 = L.sub(t0, t1, L.FQ)
        c1 = L.sub(L.sub(s, t0, L.FQ), t1, L.FQ)
        return (c0, c1)

    @staticmethod
    def sqr(a):
        return Fq2Ops.mul(a, a)

    @staticmethod
    def add(a, b):
        return (L.add(a[0], b[0], L.FQ), L.add(a[1], b[1], L.FQ))

    @staticmethod
    def sub(a, b):
        return (L.sub(a[0], b[0], L.FQ), L.sub(a[1], b[1], L.FQ))

    @staticmethod
    def neg(a):
        return (L.neg(a[0], L.FQ), L.neg(a[1], L.FQ))

    @staticmethod
    def is_zero(a):
        return L.is_zero(a[0]) & L.is_zero(a[1])

    @staticmethod
    def select(mask, a, b):
        return (L.select(mask, a[0], b[0]), L.select(mask, a[1], b[1]))

    @staticmethod
    def zeros_like(a):
        return (jnp.zeros_like(a[0]), jnp.zeros_like(a[1]))

    @staticmethod
    def one_mont(batch_shape):
        return (
            L.broadcast_scalar(L.FQ.one_mont, batch_shape),
            jnp.zeros((L.NLIMBS, *batch_shape), jnp.uint32),
        )

    @staticmethod
    def batch_shape(a):
        return a[0].shape[1:]

    @staticmethod
    def dbl(a):
        return Fq2Ops.add(a, a)


# ---------------------------------------------------------------------------
# Jacobian point ops (curve y^2 = x^3 + b, a = 0; b never appears in add/dbl)
# ---------------------------------------------------------------------------


def point_inf(F, batch_shape):
    z = F.one_mont(batch_shape)
    zero = F.zeros_like(z)
    return (zero, F.one_mont(batch_shape), zero)


def point_is_inf(F, p):
    return F.is_zero(p[2])


def point_select(F, mask, a, b):
    return tuple(F.select(mask, x, y) for x, y in zip(a, b))


def point_double(F, p):
    """dbl-2009-l formulas (a = 0): ~6 field muls."""
    X, Y, Z = p
    A = F.sqr(X)
    B = F.sqr(Y)
    C = F.sqr(B)
    t = F.sqr(F.add(X, B))
    D = F.dbl(F.sub(F.sub(t, A), C))
    E = F.add(F.dbl(A), A)  # 3A
    Fv = F.sqr(E)
    X3 = F.sub(Fv, F.dbl(D))
    eightC = F.dbl(F.dbl(F.dbl(C)))
    Y3 = F.sub(F.mul(E, F.sub(D, X3)), eightC)
    Z3 = F.dbl(F.mul(Y, Z))
    return (X3, Y3, Z3)


def point_add(F, p1, p2):
    """Branch-free general Jacobian addition (add-2007-bl + mask dispatch).

    Handles p1 == p2 (falls through to doubling), either operand at infinity,
    and p1 == -p2 (returns infinity), all via select masks.
    """
    X1, Y1, Z1 = p1
    X2, Y2, Z2 = p2
    Z1Z1 = F.sqr(Z1)
    Z2Z2 = F.sqr(Z2)
    U1 = F.mul(X1, Z2Z2)
    U2 = F.mul(X2, Z1Z1)
    S1 = F.mul(F.mul(Y1, Z2), Z2Z2)
    S2 = F.mul(F.mul(Y2, Z1), Z1Z1)
    H = F.sub(U2, U1)
    Rr = F.dbl(F.sub(S2, S1))  # r = 2(S2 - S1)

    I = F.sqr(F.dbl(H))
    J = F.mul(H, I)
    V = F.mul(U1, I)
    X3 = F.sub(F.sub(F.sqr(Rr), J), F.dbl(V))
    Y3 = F.sub(F.mul(Rr, F.sub(V, X3)), F.dbl(F.mul(S1, J)))
    Z3 = F.mul(F.mul(F.dbl(H), Z1), Z2)
    added = (X3, Y3, Z3)

    h_zero = F.is_zero(H)
    r_zero = F.is_zero(F.sub(S2, S1))
    inf1 = point_is_inf(F, p1)
    inf2 = point_is_inf(F, p2)

    doubled = point_double(F, p1)
    infp = point_inf(F, F.batch_shape(X1))

    # same x: either double (same y) or infinity (opposite y)
    res = point_select(F, h_zero & r_zero, doubled, added)
    res = point_select(F, h_zero & ~r_zero & ~inf1 & ~inf2, infp, res)
    res = point_select(F, inf1, p2, res)
    res = point_select(F, inf2, p1, res)
    return res


def point_neg(F, p):
    return (p[0], F.neg(p[1]), p[2])


def to_affine_host(F, p, golden_field_inv):
    """Host-side Jacobian -> affine for single points (tests/serialization)."""
    raise NotImplementedError("use msm.jacobian_to_affine instead")
