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
