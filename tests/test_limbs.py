"""Limb-kernel correctness vs Python bigint golden results."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zelana_tpu.ops import limbs as L
from zelana_tpu.fields.bn254 import P, R

rng = random.Random(1234)


def rand_elems(n, modulus):
    return [rng.randrange(modulus) for _ in range(n)]


@pytest.mark.parametrize("spec", [L.FQ, L.FR, L.BLS_FR], ids=["Fq", "Fr", "BlsFr"])
def test_roundtrip(spec):
    vals = rand_elems(17, spec.modulus) + [0, 1, spec.modulus - 1]
    arr = L.to_limbs(vals, spec)
    assert L.from_limbs(arr) == vals


@pytest.mark.parametrize("spec", [L.FQ, L.FR], ids=["Fq", "Fr"])
def test_add_sub(spec):
    n = 64
    a = rand_elems(n, spec.modulus)
    b = rand_elems(n, spec.modulus)
    a[0], b[0] = spec.modulus - 1, spec.modulus - 1  # wrap case
    a[1], b[1] = 0, 5  # borrow case
    la, lb = jnp.asarray(L.to_limbs(a, spec)), jnp.asarray(L.to_limbs(b, spec))
    s = L.from_limbs(np.asarray(L.add(la, lb, spec)))
    d = L.from_limbs(np.asarray(L.sub(la, lb, spec)))
    assert s == [(x + y) % spec.modulus for x, y in zip(a, b)]
    assert d == [(x - y) % spec.modulus for x, y in zip(a, b)]


@pytest.mark.parametrize("spec", [L.FQ, L.FR, L.BLS_FR], ids=["Fq", "Fr", "BlsFr"])
def test_mont_mul(spec):
    n = 64
    a = rand_elems(n, spec.modulus)
    b = rand_elems(n, spec.modulus)
    a[0], b[0] = spec.modulus - 1, spec.modulus - 1
    a[1], b[1] = 0, 12345
    la = jnp.asarray(L.encode_mont(a, spec))
    lb = jnp.asarray(L.encode_mont(b, spec))
    prod = L.decode_mont(np.asarray(L.mont_mul(la, lb, spec)), spec)
    assert prod == [(x * y) % spec.modulus for x, y in zip(a, b)]


def test_mont_roundtrip_and_pow():
    spec = L.FR
    vals = rand_elems(32, spec.modulus)
    arr = jnp.asarray(L.to_limbs(vals, spec))
    m = L.to_mont(arr, spec)
    back = L.from_mont(m, spec)
    assert L.from_limbs(np.asarray(back)) == vals
    # x^5 (the Poseidon s-box exponent)
    p5 = L.decode_mont(np.asarray(L.mont_pow(m, 5, spec)), spec)
    assert p5 == [pow(v, 5, spec.modulus) for v in vals]


def test_mont_inv():
    spec = L.FR
    vals = rand_elems(16, spec.modulus - 1)
    vals = [v + 1 for v in vals]  # nonzero
    m = jnp.asarray(L.encode_mont(vals, spec))
    inv = L.decode_mont(np.asarray(L.mont_inv(m, spec)), spec)
    assert inv == [pow(v, -1, spec.modulus) for v in vals]


def test_mont_batch_inv():
    spec = L.FQ
    vals = rand_elems(33, spec.modulus)
    vals[7] = 0  # zero passes through
    m = jnp.asarray(L.encode_mont(vals, spec))
    inv = L.decode_mont(np.asarray(L.mont_batch_inv(m, spec)), spec)
    expected = [pow(v, -1, spec.modulus) if v else 0 for v in vals]
    assert inv == expected


def test_neg_and_predicates():
    spec = L.FR
    vals = [0, 1, spec.modulus - 1] + rand_elems(13, spec.modulus)
    arr = jnp.asarray(L.to_limbs(vals, spec))
    negv = L.from_limbs(np.asarray(L.neg(arr, spec)))
    assert negv == [(-v) % spec.modulus for v in vals]
    assert list(np.asarray(L.is_zero(arr))) == [v == 0 for v in vals]


def test_jit_and_grad_free_path():
    """The mul kernel must be jittable with the spec static."""
    spec = L.FR

    @jax.jit
    def f(a, b):
        return L.mont_mul(a, b, spec)

    vals = rand_elems(8, spec.modulus)
    m = jnp.asarray(L.encode_mont(vals, spec))
    out = L.decode_mont(np.asarray(f(m, m)), spec)
    assert out == [(v * v) % spec.modulus for v in vals]
