"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zelana_tpu.curves import g1 as G1
from zelana_tpu.fields.bn254 import R
from zelana_tpu.ops import limbs as L
from zelana_tpu.ops import msm as M
from zelana_tpu.parallel.sharded import make_mesh, sharded_msm, sharded_mimc_hash2

rng = random.Random(5)


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_mimc_matches_single():
    from zelana_tpu.hashes import mimc

    mesh = make_mesh(8)
    n = 16
    pairs = [(rng.randrange(R), rng.randrange(R)) for _ in range(n)]
    a = jnp.asarray(L.encode_mont([p[0] for p in pairs], L.FR))
    b = jnp.asarray(L.encode_mont([p[1] for p in pairs], L.FR))
    out = sharded_mimc_hash2(a, b, mesh)
    got = L.decode_mont(np.asarray(out), L.FR)
    assert got == [mimc.hash_2(x, y) for x, y in pairs]


def test_sharded_msm_matches_golden():
    mesh = make_mesh(4)
    n = 16  # 4 points per device
    g = G1.generator()
    pts = [G1.mul(g, rng.randrange(1, R)) for _ in range(n)]
    scalars = [rng.randrange(R) for _ in range(n)]
    coords, inf = M.g1_points_to_device(pts)
    digits = jnp.asarray(M.scalar_digits(scalars, inf))
    jac = sharded_msm(coords, digits, mesh, curve="g1")
    got = M._jac_to_affine_host(jac, fq2=False)
    assert got == G1.msm(pts, scalars)


# ------------------------------------------------------------------
# round-2 sharded paths: butterfly NTT + run-scan MSM at real sizes
# ------------------------------------------------------------------


def test_sharded_butterfly_ntt_matches_single_device():
    import jax.numpy as jnp
    import numpy as np

    from zelana_tpu.ops import limbs as L
    from zelana_tpu.ops import ntt as NTT
    from zelana_tpu.parallel.sharded import make_mesh, sharded_intt, sharded_ntt

    mesh = make_mesh(8)
    n = 1 << 12
    rng = np.random.default_rng(3)
    vals = [int(x) for x in rng.integers(0, 1 << 62, size=n)]
    x = jnp.asarray(L.encode_mont(vals, L.FR))
    plan = NTT.make_plan(n)

    want = np.asarray(NTT.ntt(x, plan))
    got = np.asarray(sharded_ntt(x, plan, mesh))
    assert (got == want).all()

    # inverse round-trips through the sharded path too
    back = np.asarray(sharded_intt(jnp.asarray(got), plan, mesh))
    assert (back == np.asarray(x)).all()


def test_sharded_msm_scan_2e16():
    """Point-sharded run-scan MSM at 2^16 points on the 8-device mesh,
    verified against a closed-form expectation (points are small multiples
    of the generator, so the MSM collapses to ONE scalar multiplication)."""
    import random

    from zelana_tpu.curves import g1 as G1
    from zelana_tpu.fields.bn254 import R as FR
    from zelana_tpu.parallel.sharded import make_mesh, sharded_msm_scan

    mesh = make_mesh(8)
    n = 1 << 16
    g = G1.generator()
    base = []
    acc = g
    for _ in range(64):
        base.append(acc)
        acc = G1.add(acc, g)
    pts = [base[i % 64] for i in range(n)]
    rng = random.Random(99)
    scalars = [rng.randrange(FR) for _ in range(n)]

    expected_scalar = sum(
        s * (1 + (i % 64)) for i, s in enumerate(scalars)
    ) % FR
    expected = G1.mul(g, expected_scalar)

    got = sharded_msm_scan(pts, scalars, mesh)
    assert got == expected


def test_sharded_msm_segments_beyond_chunk_cap(monkeypatch):
    """Shards over the uint16 point-id capacity dispatch as point
    segments with host-side folding (the production h/l query sizes on
    small meshes). Shrink CHUNK_N so a small mesh MSM crosses segment
    boundaries, including a ragged tail."""
    import random

    from zelana_tpu.curves import g1 as G1
    from zelana_tpu.fields.bn254 import R as FR
    from zelana_tpu.ops import msm_scan as MS
    from zelana_tpu.parallel.sharded import (
        _prepare_sharded,
        make_mesh,
        msm_begin_sharded,
    )

    monkeypatch.setattr(MS, "CHUNK_N", 256)
    monkeypatch.setattr(MS, "MAX_INFLIGHT", 2)
    mesh = make_mesh(4)
    n = 4 * 640  # shard 640 -> segments 256 / 256 / 128 per shard
    g = G1.generator()
    base, acc = [], g
    for _ in range(32):
        base.append(acc)
        acc = G1.add(acc, g)
    pts = [base[i % 32] for i in range(n)]
    rng = random.Random(4)
    scalars = [rng.randrange(FR) for _ in range(n)]
    expected = G1.mul(g, sum(
        s * (1 + (i % 32)) for i, s in enumerate(scalars)) % FR)

    prep = _prepare_sharded(pts, mesh, "g1")
    got = MS.msm_end(msm_begin_sharded(prep, scalars, mesh))
    assert got == expected
