"""Groth16 circuit-specific setup (keygen).

Produces proving/verifying keys with the same structure and serialization as
ark-groth16 =0.5.0 (see keys.py), for our circuits. Query layout matches the
reference engine exactly:

    a_query[i]    = a_i(t) * G1                 (all variables)
    b_g1_query[i] = b_i(t) * G1,  b_g2_query[i] = b_i(t) * G2
    h_query[j]    = (t^j * Z(t) / delta) * G1,  j < m - 1
    l_query[i]    = (beta*a_i + alpha*b_i + c_i) / delta * G1   (witnesses)
    gamma_abc[i]  = (beta*a_i + alpha*b_i + c_i) / gamma * G1   (instances)

Zero evaluations yield points at infinity, as in arkworks keys. Fixed-base
scalar multiplications use 4-bit windowed tables (host side; keygen is a
one-time operation, reference keygen.rs:84-94 takes minutes too).
"""

from __future__ import annotations

from typing import List

from ..curves import g1 as G1, g2 as G2
from ..fields.bn254 import R as FR
from .keys import ProvingKey, VerifyingKey
from .qap import evaluate_qap_at
from .stdrng import StdRng, rand_fp, rand_g1, rand_g2

WINDOW = 4


class FixedBase:
    """Windowed fixed-base scalar multiplication table."""

    def __init__(self, base, curve):
        self.curve = curve
        n_windows = (254 + WINDOW - 1) // WINDOW
        self.tables = []
        cur = base
        for _ in range(n_windows):
            row = [None]  # 0 * base
            acc = None
            for _ in range((1 << WINDOW) - 1):
                acc = curve.add(acc, cur)
                row.append(acc)
            self.tables.append(row)
            # advance base by 2^WINDOW
            for _ in range(WINDOW):
                cur = curve.add(cur, cur)

    def mul(self, scalar: int):
        scalar %= FR
        acc = None
        w = 0
        while scalar:
            digit = scalar & ((1 << WINDOW) - 1)
            if digit:
                acc = self.curve.add(acc, self.tables[w][digit])
            scalar >>= WINDOW
            w += 1
        return acc


def keygen(circuit, seed: int = 0) -> ProvingKey:
    """Deterministic circuit-specific setup (seed discipline matches
    keygen.rs: seed 0)."""
    from ..r1cs.system import ConstraintSystem

    cs = ConstraintSystem()
    circuit.generate_constraints(cs)
    A, B, C = cs.matrices()
    num_instance = cs.num_instance
    num_vars = num_instance + cs.num_witness
    return _keygen_impl(A, B, C, num_instance, num_vars, seed, None)


def keygen_synthesized(system, seed: int = 0) -> ProvingKey:
    """keygen over a r1cs.native_synth.NativeSystem: the QAP evaluation at
    t (Lagrange coefficients + per-variable accumulation over ~5M matrix
    entries) runs in C instead of per-entry Python -- the difference
    between ~minutes and ~seconds of host time at the production 8/4/4
    chunk shape."""
    return _keygen_impl(None, None, None, system.num_instance,
                        system.num_vars, seed, system)


def _qap_at_native(system, t: int, domain):
    """evaluate_qap_at over the native CSR system. Returns
    (a, b, c, zt) with a/b/c as (num_vars, 4) u64 canonical limb arrays
    (no per-element int conversion -- ~5M vars at the chunk shape)."""
    from ..r1cs.native_synth import fr_array, fr_ints, lagrange_at

    u, zt = lagrange_at(domain.group_gen, domain.size_inv, t, domain.size)
    a = system.qap_accumulate("A", u)
    b = system.qap_accumulate("B", u)
    c = system.qap_accumulate("C", u)
    u_tail = fr_ints(u[system.num_constraints:
                       system.num_constraints + system.num_instance])
    a_head = fr_ints(a[:system.num_instance])
    a[:system.num_instance] = fr_array([
        (a_head[i] + u_tail[i]) % FR for i in range(system.num_instance)])
    return a, b, c, zt


def _keygen_impl(A, B, C, num_instance, num_vars, seed, system) -> ProvingKey:

    # rand 0.8 StdRng stream, sampled in ark-groth16's exact order
    # (generator.rs: alpha, beta, gamma, delta, G1::rand, G2::rand, then
    # sample_element_outside_domain for t)
    rng = StdRng.seed_from_u64(seed)
    alpha = rand_fp(rng, FR)
    beta = rand_fp(rng, FR)
    gamma = rand_fp(rng, FR)
    delta = rand_fp(rng, FR)
    g1_gen = rand_g1(rng)
    g2_gen = rand_g2(rng)

    # t outside the domain
    from ..poly.domain import Domain

    num_constraints = system.num_constraints if system is not None else len(A)
    domain = Domain.new(num_constraints + num_instance)
    while True:
        t = rand_fp(rng, FR)
        if domain.evaluate_vanishing_polynomial(t) != 0:
            break

    gamma_inv = pow(gamma, FR - 2, FR)
    delta_inv = pow(delta, FR - 2, FR)

    if system is not None:
        # native path: a/b/c stay (n, 4) u64 limb arrays end to end; the
        # h/l/abc scalar combines run in C (csrc powers_scaled /
        # abc_combine) instead of ~2M-modmul Python loops
        from ..r1cs.native_synth import abc_combine, fr_ints, powers_scaled

        a, b, c, zt = _qap_at_native(system, t, domain)
        m = domain.size
        ni = num_instance
        h_s = powers_scaled(t, zt * delta_inv % FR, m - 1)
        l_s = abc_combine(a[ni:], b[ni:], c[ni:], beta, alpha, delta_inv)
        abc_scalars = fr_ints(
            abc_combine(a[:ni], b[:ni], c[:ni], beta, alpha, gamma_inv))
        a_s, b_s = a, b
    else:
        a, b, c, zt, domain = evaluate_qap_at(
            A, B, C, num_instance, num_vars, t)
        m = domain.size
        h_s = []
        tj = 1
        for _ in range(m - 1):
            h_s.append(tj * zt % FR * delta_inv % FR)
            tj = tj * t % FR
        l_s = [
            (beta * a[i] + alpha * b[i] + c[i]) % FR * delta_inv % FR
            for i in range(num_instance, num_vars)
        ]
        abc_scalars = [
            (beta * a[i] + alpha * b[i] + c[i]) % FR * gamma_inv % FR
            for i in range(num_instance)
        ]
        a_s, b_s = a, b

    fb1 = FixedBase(g1_gen, G1)
    fb2 = FixedBase(g2_gen, G2)

    # Query arrays: device fixed-base engine for real circuit sizes (the
    # host windowed tables take minutes at ~10k points and days at the
    # batch circuit's ~1.6M); tiny circuits stay host-side to skip the
    # 2x8160-point table build.
    if num_vars + m >= 4096:
        from ..ops.fixed_base import (
            fixed_base_msm,
            prepare_table_g1,
            prepare_table_g2,
        )
        import numpy as _np

        tg1 = prepare_table_g1(g1_gen)
        tg2 = prepare_table_g2(g2_gen)

        def msm1(scalars):
            if isinstance(scalars, _np.ndarray):
                return fixed_base_msm(tg1, scalars)
            return fixed_base_msm(tg1, [s % FR for s in scalars])

        def msm2(scalars):
            if isinstance(scalars, _np.ndarray):
                return fixed_base_msm(tg2, scalars)
            return fixed_base_msm(tg2, [s % FR for s in scalars])
    else:
        from ..r1cs.native_synth import fr_ints as _fr_ints
        import numpy as _np

        def _ints(s):
            return _fr_ints(s) if isinstance(s, _np.ndarray) else s

        def msm1(scalars):
            return [fb1.mul(s) if s else None for s in _ints(scalars)]

        def msm2(scalars):
            return [fb2.mul(s) if s else None for s in _ints(scalars)]

    a_query = msm1(a_s)
    b_g1_query = msm1(b_s)
    b_g2_query = msm2(b_s)
    h_query = msm1(h_s)
    l_query = msm1(l_s)

    gamma_abc = [fb1.mul(s) if s else None for s in abc_scalars]

    vk = VerifyingKey(
        alpha_g1=fb1.mul(alpha),
        beta_g2=fb2.mul(beta),
        gamma_g2=fb2.mul(gamma),
        delta_g2=fb2.mul(delta),
        gamma_abc_g1=gamma_abc,
    )
    return ProvingKey(
        vk=vk,
        beta_g1=fb1.mul(beta),
        delta_g1=fb1.mul(delta),
        a_query=a_query,
        b_g1_query=b_g1_query,
        b_g2_query=b_g2_query,
        h_query=h_query,
        l_query=l_query,
    )
