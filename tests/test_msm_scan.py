"""Run-scan MSM (ops/msm_scan.py) against the golden host MSM.

Covers the host schedule (sort, lane layout, emit accounting, dense
placement), the run-scan itself (XLA fallback path on CPU; the Pallas
kernel shares the same complete_add_z1 straight line), the K-layer merge,
the fixed bit-subset tree, and the host Horner tail."""

import random

import pytest

from zelana_tpu.curves import g1 as G1
from zelana_tpu.curves import g2 as G2
from zelana_tpu.fields.bn254 import R as FR
from zelana_tpu.ops import msm_scan as MS


def _g1_points(n):
    g = G1.generator()
    pts, acc = [], g
    for _ in range(n):
        pts.append(acc)
        acc = G1.add(acc, g)
    return pts


def test_msm_scan_g1_matches_golden():
    r = random.Random(7)
    n = 50
    pts = _g1_points(n)
    scalars = [r.randrange(FR) for _ in range(n)]
    scalars[3] = 0  # zero scalar: all digits drop into the (w, 0) runs
    scalars[7] = 255  # single-window digit
    scalars[9] = scalars[11]  # repeated scalar -> same buckets
    assert MS.msm_g1(pts, scalars) == G1.msm(pts, scalars)


def test_msm_scan_g1_with_infinity_points():
    r = random.Random(11)
    pts = _g1_points(20)
    pts[4] = None
    pts[5] = None
    scalars = [r.randrange(FR) for _ in range(20)]
    expect = G1.msm([p for p in pts if p is not None],
                    [s for p, s in zip(pts, scalars) if p is not None])
    assert MS.msm_g1(pts, scalars) == expect


def test_msm_scan_equal_scalars_level2():
    """All-equal scalars concentrate every window's stream into ONE bucket
    whose run spans many lanes -- the degenerate case the level-2 run-scan
    merge exists for (the wide-window trap in miniature)."""
    n = 96
    pts = _g1_points(n)
    s = 0x1234567890ABCDEF1234567890ABCDEF
    scalars = [s] * n
    assert MS.msm_g1(pts, scalars) == G1.msm(pts, scalars)


def test_msm_scan_segmented_matches_golden(monkeypatch):
    """Point-segmented dispatch (MSMs beyond the uint16 id capacity split
    into CHUNK_N segments folded host-side): shrink the segment size so a
    small MSM crosses several segment boundaries, including a ragged tail
    and an infinity point."""
    r = random.Random(17)
    n = 300  # -> segments 128 / 128 / 44 with CHUNK_N = 128
    pts = _g1_points(n)
    pts[10] = None
    scalars = [r.randrange(FR) for _ in range(n)]
    scalars[33] = 0
    # CHUNK_N must stay 128-aligned (pool columns pack 128 points)
    monkeypatch.setattr(MS, "CHUNK_N", 128)
    monkeypatch.setattr(MS, "MAX_INFLIGHT", 2)
    expect = G1.msm([p for p in pts if p is not None],
                    [s for p, s in zip(pts, scalars) if p is not None])
    assert MS.msm_g1(pts, scalars) == expect


def test_msm_scan_g2_matches_golden():
    r = random.Random(13)
    n = 12
    g = G2.generator()
    pts, acc = [], g
    for _ in range(n):
        pts.append(acc)
        acc = G2.add(acc, g)
    scalars = [r.randrange(FR) for _ in range(n)]
    assert MS.msm_g2(pts, scalars) == G2.msm(pts, scalars)


def test_schedule_shapes_and_layers():
    import numpy as np

    r = random.Random(3)
    scalars = [r.randrange(FR) for _ in range(64)]
    digits = MS.scalar_digits(scalars)
    assert digits.shape[0] == MS.SCAN_WINDOWS
    # digit decomposition reconstructs the scalar
    rec = sum(int(digits[w, 0]) << (w * MS.SCAN_BITS)
              for w in range(MS.SCAN_WINDOWS))
    assert rec == scalars[0]
    s = MS.build_schedule(digits, level2=False)
    nw = digits.size
    lanes = s.perm.shape[1]
    assert s.perm.shape == (s.R + 1, lanes)
    assert s.R * lanes >= nw
    assert s.K >= 1 and (s.K & (s.K - 1)) == 0  # power of two
    assert s.dense_idx.shape == (s.K, MS.SCAN_WINDOWS * MS.SCAN_BUCKETS)
    # flag bit present on the flush row
    assert (s.perm[s.R] >> 15).all()
    # every dense entry points inside the emit buffer
    assert (s.dense_idx >= 0).all()
    assert (s.dense_idx < (s.R + 1) * lanes).all()
    # layer 0 of every nonzero-digit bucket that appears is a real position
    assert (np.asarray(s.dense_idx[0]) != 0).any()

    # two-level variant: dense entries index the LEVEL-2 emit buffer, the
    # level-1 perm/flags are unchanged, and the level-2 stream covers one
    # partial per appearing bucket
    s2 = MS.build_schedule(digits, level2=True)
    if s2.pos2 is not None:  # native builder available
        assert (s2.perm == s.perm).all()
        assert s2.pos2.shape == (s2.R2 + 1, s2.lanes2)
        assert (s2.dense_idx >= 0).all()
        assert (s2.dense_idx < (s2.R2 + 1) * s2.lanes2).all()
        # level-2 positions point inside the level-1 emit buffer
        pid2 = np.asarray(s2.pos2) & 0x7FFFFFFF
        assert (pid2 < (s.R + 1) * lanes).all()
        # flush row: all flags set, identity position
        assert (np.asarray(s2.pos2[s2.R2]) == -(1 << 31)).all()


def test_shared_segment_schedules_across_pools():
    """One schedule set (built from z digits) must serve pools with
    DIFFERENT infinity masks: identity slots are generator-backed and
    corrected at msm_end (the Groth16 a/b1/l sharing, prove.py)."""
    r = random.Random(21)
    n = 40
    base = _g1_points(n)
    pool_a = list(base)
    pool_b = list(base)
    for i in (0, 3, 17, 39):
        pool_a[i] = None
    for i in (1, 3, 20):
        pool_b[i] = None
    scalars = [r.randrange(FR) for _ in range(n)]
    digits = MS.scalar_digits(scalars)
    segs = MS.build_segment_schedules(digits)
    prep_a = MS.prepare_g1(pool_a)
    prep_b = MS.prepare_g1(pool_b)
    h_a = MS.msm_begin_scheds(prep_a, segs,
                              MS._inf_correction(digits, prep_a[1]))
    h_b = MS.msm_begin_scheds(prep_b, segs,
                              MS._inf_correction(digits, prep_b[1]))
    got_a, got_b = MS.msm_end_many([h_a, h_b])
    assert got_a == G1.msm(pool_a, scalars)
    assert got_b == G1.msm(pool_b, scalars)
    # the device schedule buffers were uploaded once and reused
    assert all(s["dev"] is not None for s in segs)


def test_prefix_padded_pool_matches_suffix_msm():
    """The l-query layout: identity prefix + real points, full-length
    scalars; result must equal the suffix MSM."""
    r = random.Random(22)
    ni = 5
    n = 32
    pts = _g1_points(n - ni)
    scalars = [r.randrange(FR) for _ in range(n)]
    digits = MS.scalar_digits(scalars)
    segs = MS.build_segment_schedules(digits)
    prep = MS.prepare_g1([None] * ni + pts)
    h = MS.msm_begin_scheds(prep, segs,
                            MS._inf_correction(digits, prep[1]))
    assert MS.msm_end(h) == G1.msm(pts, scalars[ni:])
