"""Curve kernel + MSM tests vs the golden implementation."""

import random

import jax.numpy as jnp
import numpy as np

from zelana_tpu.curves import g1 as G1, g2 as G2
from zelana_tpu.fields.bn254 import P, R
from zelana_tpu.ops import limbs as L
from zelana_tpu.ops import msm as M
from zelana_tpu.ops.curve_ops import (
    FqOps,
    Fq2Ops,
    point_add,
    point_double,
    point_inf,
)

rng = random.Random(99)


def _g1_batch(points):
    xs = [p[0] for p in points]
    ys = [p[1] for p in points]
    one = L.broadcast_scalar(L.FQ.one_mont, (len(points),))
    return (
        jnp.asarray(L.encode_mont(xs, L.FQ)),
        jnp.asarray(L.encode_mont(ys, L.FQ)),
        one,
    )


def _jac_to_affine_list(jac):
    X = L.decode_mont(np.asarray(jac[0]), L.FQ)
    Y = L.decode_mont(np.asarray(jac[1]), L.FQ)
    Z = L.decode_mont(np.asarray(jac[2]), L.FQ)
    out = []
    for x, y, z in zip(X, Y, Z):
        if z == 0:
            out.append(None)
            continue
        zi = pow(z, P - 2, P)
        out.append((x * zi * zi % P, y * zi % P * zi % P * zi % P))
    return out


def test_point_add_batch_matches_golden():
    g = G1.generator()
    pts_a = [G1.mul(g, rng.randrange(1, 1000)) for _ in range(8)]
    pts_b = [G1.mul(g, rng.randrange(1, 1000)) for _ in range(8)]
    # force edge cases: equal points (doubling), inverse points (infinity)
    pts_b[0] = pts_a[0]
    pts_b[1] = G1.neg(pts_a[1])
    a = _g1_batch(pts_a)
    b = _g1_batch(pts_b)
    res = point_add(FqOps, a, b)
    got = _jac_to_affine_list(res)
    expected = [G1.add(x, y) for x, y in zip(pts_a, pts_b)]
    assert got == expected


def test_point_double_batch_matches_golden():
    g = G1.generator()
    pts = [G1.mul(g, k) for k in range(1, 9)]
    res = point_double(FqOps, _g1_batch(pts))
    assert _jac_to_affine_list(res) == [G1.add(p, p) for p in pts]


def test_point_add_with_infinity():
    g = G1.generator()
    pts = [g] * 4
    a = _g1_batch(pts)
    inf = point_inf(FqOps, (4,))
    res = point_add(FqOps, a, inf)
    assert _jac_to_affine_list(res) == pts
    res2 = point_add(FqOps, inf, a)
    assert _jac_to_affine_list(res2) == pts


def test_msm_g1_small():
    g = G1.generator()
    n = 16
    points = [G1.mul(g, rng.randrange(1, R)) for _ in range(n)]
    scalars = [rng.randrange(R) for _ in range(n)]
    scalars[3] = 0  # zero scalar
    points[5] = None  # infinity point in the query (arkworks keys have these)
    got = M.msm_g1(points, scalars)
    expected = G1.msm([p for p in points if p is not None],
                      [s for p, s in zip(points, scalars) if p is not None])
    assert got == expected


def test_msm_g1_single():
    g = G1.generator()
    s = rng.randrange(R)
    assert M.msm_g1([g], [s]) == G1.mul(g, s)


def test_msm_fast_g1_matches_golden():
    from zelana_tpu.ops import msm_fast as MF

    g = G1.generator()
    n = 24
    points = [G1.mul(g, rng.randrange(1, R)) for _ in range(n)]
    scalars = [rng.randrange(R) for _ in range(n)]
    scalars[3] = 0
    points[5] = None  # infinity in the query
    points[10] = G1.neg(points[9])  # P + (-P) cancellation path
    scalars[10] = scalars[9]
    got = MF.msm_g1(points, scalars)
    expected = G1.msm([p for p in points if p is not None],
                      [s for p, s in zip(points, scalars) if p is not None])
    assert got == expected


def test_msm_fast_g2_matches_golden():
    from zelana_tpu.ops import msm_fast as MF

    g = G2.generator()
    points = [G2.mul(g, rng.randrange(1, 10**5)) for _ in range(4)]
    scalars = [rng.randrange(R) for _ in range(4)]
    assert MF.msm_g2(points, scalars) == G2.msm(points, scalars)


def test_msm_g2_small():
    g = G2.generator()
    n = 4
    points = [G2.mul(g, rng.randrange(1, 10**6)) for _ in range(n)]
    scalars = [rng.randrange(R) for _ in range(n)]
    got = M.msm_g2(points, scalars)
    expected = G2.msm(points, scalars)
    assert got == expected


def test_fixed_base_g1_matches_mul():
    from zelana_tpu.ops import fixed_base as FB

    g = G1.generator()
    table = FB.prepare_table_g1(g)
    scalars = [rng.randrange(R) for _ in range(5)]
    scalars += [0, 1, 2, R - 1]
    got = FB.fixed_base_msm(table, scalars)
    for s, p in zip(scalars, got):
        assert p == G1.mul(g, s), f"scalar {s}"


def test_fixed_base_g1_array_scalars_match_int_scalars():
    """The (n, 4) u64 limb-array scalar input (native keygen format) must
    produce the same points as the int-list path."""
    from zelana_tpu.ops import fixed_base as FB
    from zelana_tpu.r1cs.native_synth import fr_array

    g = G1.generator()
    table = FB.prepare_table_g1(g)
    scalars = [rng.randrange(R) for _ in range(4)] + [0, 1, R - 1]
    got = FB.fixed_base_msm(table, fr_array(scalars))
    assert got == FB.fixed_base_msm(table, scalars)


def test_fixed_base_g2_matches_mul():
    from zelana_tpu.ops import fixed_base as FB

    g = G2.generator()
    table = FB.prepare_table_g2(g)
    scalars = [rng.randrange(R) for _ in range(3)] + [0]
    got = FB.fixed_base_msm(table, scalars)
    for s, p in zip(scalars, got):
        assert p == G2.mul(g, s)
