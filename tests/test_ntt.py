"""NTT tests: golden domain semantics + JAX kernel vs golden."""

import random

import jax.numpy as jnp
import numpy as np

from zelana_tpu.fields.bn254 import R as FR
from zelana_tpu.ops import limbs as L
from zelana_tpu.ops import ntt as N
from zelana_tpu.poly.domain import Domain

rng = random.Random(7)


def test_domain_params():
    d = Domain.new(100)
    assert d.size == 128
    assert pow(d.group_gen, d.size, FR) == 1
    assert pow(d.group_gen, d.size // 2, FR) != 1  # primitive
    assert d.evaluate_vanishing_polynomial(d.group_gen) == 0
    assert d.evaluate_vanishing_polynomial(5) == (pow(5, 128, FR) - 1) % FR


def test_golden_fft_matches_naive_eval():
    d = Domain.new(8)
    coeffs = [rng.randrange(FR) for _ in range(8)]
    evals = d.fft(coeffs)
    for i, x in enumerate(d.elements()):
        val = 0
        for j, c in enumerate(reversed(coeffs)):
            val = (val * x + c) % FR
        assert evals[i] == val


def test_golden_fft_roundtrip():
    d = Domain.new(64)
    coeffs = [rng.randrange(FR) for _ in range(64)]
    assert d.ifft(d.fft(coeffs)) == coeffs
    assert d.coset_ifft(d.coset_fft(coeffs)) == coeffs
    # coset evals differ from subgroup evals
    assert d.fft(coeffs) != d.coset_fft(coeffs)


def test_jax_ntt_matches_golden():
    n = 256
    plan = N.make_plan(n)
    coeffs = [rng.randrange(FR) for _ in range(n)]
    x = jnp.asarray(L.encode_mont(coeffs, L.FR))
    evals = L.decode_mont(np.asarray(N.ntt(x, plan)), L.FR)
    assert evals == plan.domain.fft(coeffs)


def test_jax_intt_roundtrip():
    n = 128
    plan = N.make_plan(n)
    coeffs = [rng.randrange(FR) for _ in range(n)]
    x = jnp.asarray(L.encode_mont(coeffs, L.FR))
    back = L.decode_mont(np.asarray(N.intt(N.ntt(x, plan), plan)), L.FR)
    assert back == coeffs


def test_jax_coset_matches_golden():
    n = 64
    plan = N.make_plan(n)
    coeffs = [rng.randrange(FR) for _ in range(n)]
    x = jnp.asarray(L.encode_mont(coeffs, L.FR))
    evals = L.decode_mont(np.asarray(N.coset_ntt(x, plan)), L.FR)
    assert evals == plan.domain.coset_fft(coeffs)
    back = L.decode_mont(np.asarray(N.coset_intt(jnp.asarray(L.encode_mont(evals, L.FR)), plan)), L.FR)
    assert back == coeffs
