"""BN254 G2 golden implementation (affine over Fq2, Python ints).

Point representation: ``((x0, x1), (y0, y1))`` or ``None`` for infinity.

Serialization matches arkworks compressed G2: 64 bytes = x.c0 LE || x.c1 LE
with flag bits in the MSBs of the last byte; sign convention compares
(c1, c0) lexicographically (arkworks QuadExtField Ord).
"""

from __future__ import annotations

from ..fields.bn254 import P, R, B_G2_C0, B_G2_C1, G2_GEN_X, G2_GEN_Y
from ..fields.tower import (
    FQ2_ZERO,
    fq2_add,
    fq2_sub,
    fq2_neg,
    fq2_mul,
    fq2_sqr,
    fq2_inv,
    fq2_is_zero,
    fq2_sqrt,
    fq2_cmp_gt,
    fq2_scale,
)

B2 = (B_G2_C0, B_G2_C1)

INF = None


def is_on_curve(pt) -> bool:
    if pt is None:
        return True
    x, y = pt
    lhs = fq2_sqr(y)
    rhs = fq2_add(fq2_mul(fq2_sqr(x), x), B2)
    return lhs == rhs


def neg(pt):
    if pt is None:
        return None
    return (pt[0], fq2_neg(pt[1]))


def add(p1, p2):
    if p1 is None:
        return p2
    if p2 is None:
        return p1
    x1, y1 = p1
    x2, y2 = p2
    if x1 == x2:
        if fq2_is_zero(fq2_add(y1, y2)):
            return None
        m = fq2_mul(fq2_scale(fq2_sqr(x1), 3), fq2_inv(fq2_scale(y1, 2)))
    else:
        m = fq2_mul(fq2_sub(y2, y1), fq2_inv(fq2_sub(x2, x1)))
    x3 = fq2_sub(fq2_sub(fq2_sqr(m), x1), x2)
    y3 = fq2_sub(fq2_mul(m, fq2_sub(x1, x3)), y1)
    return (x3, y3)


def mul(pt, k: int):
    """Scalar multiplication by the INTEGER k -- deliberately not reduced
    mod r: G2 has a large cofactor, so callers multiply by values (the
    cofactor, candidate orders) that are only meaningful unreduced.
    Reducing here silently made `in_subgroup` a tautology (r * pt -> 0 * pt)
    and broke cofactor clearing."""
    if pt is None or k == 0:
        return None
    if k < 0:
        pt = neg(pt)
        k = -k
    result = None
    base = pt
    while k > 0:
        if k & 1:
            result = add(result, base)
        base = add(base, base)
        k >>= 1
    return result


def msm(points, scalars):
    acc = None
    for pt, s in zip(points, scalars):
        acc = add(acc, mul(pt, s))
    return acc


def generator():
    return (G2_GEN_X, G2_GEN_Y)


def in_subgroup(pt) -> bool:
    """Membership in the order-r subgroup (G2 has a large cofactor)."""
    if pt is None:
        return True
    return is_on_curve(pt) and mul(pt, R) is None


# ---------------------------------------------------------------------------
# arkworks-compatible serialization
# ---------------------------------------------------------------------------

_FLAG_NEG = 1 << 7
_FLAG_INF = 1 << 6


def _y_is_negative(y) -> bool:
    return fq2_cmp_gt(y, fq2_neg(y))


def serialize_compressed(pt) -> bytes:
    if pt is None:
        out = bytearray(64)
        out[-1] |= _FLAG_INF
        return bytes(out)
    x, y = pt
    out = bytearray(int(x[0]).to_bytes(32, "little") + int(x[1]).to_bytes(32, "little"))
    if _y_is_negative(y):
        out[-1] |= _FLAG_NEG
    return bytes(out)


def deserialize_compressed(data: bytes):
    assert len(data) == 64
    raw = bytearray(data)
    flags = raw[-1] & 0xC0
    raw[-1] &= 0x3F
    if flags & _FLAG_INF:
        return None
    x0 = int.from_bytes(bytes(raw[:32]), "little")
    x1 = int.from_bytes(bytes(raw[32:]), "little")
    assert x0 < P and x1 < P
    x = (x0, x1)
    y2 = fq2_add(fq2_mul(fq2_sqr(x), x), B2)
    y = fq2_sqrt(y2)
    if y is None:
        raise ValueError("x not on curve")
    if _y_is_negative(y) != bool(flags & _FLAG_NEG):
        y = fq2_neg(y)
    pt = (x, y)
    assert is_on_curve(pt)
    return pt


def serialize_uncompressed(pt) -> bytes:
    if pt is None:
        out = bytearray(128)
        out[-1] |= _FLAG_INF
        return bytes(out)
    x, y = pt
    return (
        int(x[0]).to_bytes(32, "little")
        + int(x[1]).to_bytes(32, "little")
        + int(y[0]).to_bytes(32, "little")
        + int(y[1]).to_bytes(32, "little")
    )


def deserialize_uncompressed(data: bytes):
    assert len(data) == 128
    raw = bytearray(data)
    flags = raw[-1] & 0xC0
    raw[-1] &= 0x3F
    if flags & _FLAG_INF:
        return None
    vals = [int.from_bytes(bytes(raw[i : i + 32]), "little") for i in range(0, 128, 32)]
    pt = ((vals[0], vals[1]), (vals[2], vals[3]))
    assert is_on_curve(pt)
    return pt
