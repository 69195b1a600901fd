"""Native chunk-circuit synthesis (csrc/chunk_synth.cpp) equivalence.

The native engine must produce the SAME R1CS system (variables, matrices,
assignment) as the Python BatchCircuitMiMC over r1cs/system.py -- one key
serves both paths, so any divergence breaks proofs silently. Rows are
compared as {global_var: coeff} dicts (term order is irrelevant to the
QAP)."""

import pytest

from zelana_tpu.circuits.batch_mimc import (
    BatchCircuitMiMC,
    ShieldedSlot,
    TransferSlot,
    WithdrawalSlot,
)
from zelana_tpu.r1cs import native_synth
from zelana_tpu.r1cs.system import ConstraintSystem
from zelana_tpu.runtime.chunk_witness import ChunkWitnessBuilder
from zelana_tpu.runtime.coordinator import Dispatcher

pytestmark = pytest.mark.skipif(
    native_synth.load() is None, reason="native chunk synth unavailable")


def _python_system(circuit):
    cs = ConstraintSystem()
    circuit.generate_constraints(cs)
    A, B, C = cs.matrices()
    return A, B, C, cs.full_assignment(), cs.num_instance


def _assert_equal(circuit):
    nat = native_synth.synthesize_chunk(circuit)
    assert nat is not None
    A, B, C, z, ni = _python_system(circuit)
    assert nat.num_instance == ni
    assert nat.num_constraints == len(A)
    nz = nat.assignment_ints()
    assert len(nz) == len(z)
    assert nz == z
    nA, nB, nC, _ = nat.to_python()
    assert nA == A
    assert nB == B
    assert nC == C


def test_empty_chunk_matches_python():
    _assert_equal(BatchCircuitMiMC(
        max_transfers=1, max_withdrawals=1, max_shielded=1, tree_depth=4))


def test_occupied_chunk_matches_python():
    builder = ChunkWitnessBuilder(6)
    for pk in range(1, 6):
        builder.fund(pk, 5_000)
    chunks = Dispatcher.build_chunks_with_witness(
        builder,
        transfers=[(1, 2, 25), (3, 4, 10)],
        withdrawals=[(2, 0xBEEF, 7)],
        shielded=[555],
        capacity=(2, 1, 1),
    )
    assert len(chunks) == 1
    ch = chunks[0]
    from zelana_tpu.runtime.chunk_prover import Groth16ChunkProver

    prover = Groth16ChunkProver.__new__(Groth16ChunkProver)
    prover.capacity = (2, 1, 1)
    prover.tree_depth = 6
    circuit = prover.build_circuit(ch, batch_id=9)
    _assert_equal(circuit)
    nat = native_synth.synthesize_chunk(circuit)
    assert nat.check() == -1


def test_native_check_catches_bad_witness():
    from zelana_tpu.runtime.chunk_prover import Groth16ChunkProver

    c = Groth16ChunkProver.dummy_circuit(capacity=(1, 1, 1), tree_depth=4)
    nat = native_synth.synthesize_chunk(c)
    assert nat.check() == -1
    nat.z[nat.num_instance + 3, 0] += 1  # corrupt one witness value
    assert nat.check() != -1


def test_matvec_matches_python():
    circuit = BatchCircuitMiMC(
        max_transfers=1, max_withdrawals=0, max_shielded=0, tree_depth=3,
        transfers=[TransferSlot(sender_path=[0] * 3,
                                sender_path_indices=[0] * 3,
                                receiver_path=[0] * 3,
                                receiver_path_indices=[0] * 3)],
    )
    nat = native_synth.synthesize_chunk(circuit)
    A, B, C, z, ni = _python_system(circuit)
    from zelana_tpu.fields.bn254 import R as FR

    for which, M in (("A", A), ("B", B), ("C", C)):
        got = native_synth.fr_ints(nat.matvec(which))
        want = [sum(c * z[i] for i, c in row.items()) % FR for row in M]
        assert got == want


def test_qap_native_matches_python():
    """The native Lagrange + per-variable QAP accumulation must equal the
    Python evaluate_qap_at (the keygen core)."""
    from zelana_tpu.groth16.qap import evaluate_qap_at
    from zelana_tpu.groth16.setup import _qap_at_native
    from zelana_tpu.poly.domain import Domain
    from zelana_tpu.runtime.chunk_prover import Groth16ChunkProver

    circuit = Groth16ChunkProver.dummy_circuit(capacity=(1, 1, 1),
                                               tree_depth=4)
    system = native_synth.synthesize_chunk(circuit)
    A, B, C, z, ni = _python_system(circuit)
    t = 0xDEADBEEFCAFE
    want = evaluate_qap_at(A, B, C, ni, len(z), t)
    domain = Domain.new(len(A) + ni)
    got = _qap_at_native(system, t, domain)
    # a/b/c now stay (n, 4) u64 limb arrays end to end
    assert native_synth.fr_ints(got[0]) == want[0]
    assert native_synth.fr_ints(got[1]) == want[1]
    assert native_synth.fr_ints(got[2]) == want[2]
    assert got[3] == want[3]  # Z(t)


def test_witness_map_native_matches_python():
    """The native witness-map dispatch (C matvec + Montgomery-form device
    chain) must produce the same h(x) coefficients as the Python path."""
    from zelana_tpu.groth16.prove import (
        _unpack_h,
        witness_map_device,
        witness_map_dispatch_native,
    )
    from zelana_tpu.r1cs.native_synth import fr_ints, from_mont_limbs16
    import numpy as np

    circuit = BatchCircuitMiMC(
        max_transfers=0, max_withdrawals=0, max_shielded=1, tree_depth=2,
        num_shielded=0)
    # make it satisfiable: dummy accumulators
    from zelana_tpu.runtime.chunk_witness import chunk_accumulators

    wd_root, batch_hash = chunk_accumulators(0, [], [], [])
    circuit.withdrawal_root = wd_root
    circuit.batch_hash = batch_hash
    system = native_synth.synthesize_chunk(circuit)
    A, B, C, z, ni = _python_system(circuit)
    want = witness_map_device(A, B, C, z, ni)
    h_dev, m = witness_map_dispatch_native(system)
    got = fr_ints(from_mont_limbs16(_unpack_h(np.asarray(h_dev)))[: m - 1])
    assert got == want


@pytest.mark.skipif(
    __import__("os").environ.get("ZELANA_SLOW_TESTS") != "1",
    reason="two full keygens on the CPU backend take ~10 minutes")
def test_keygen_and_prove_native_match_python():
    """The native keygen must produce byte-identical keys (same RNG stream,
    same QAP), and prove_synthesized the same proof as the Python path."""
    from zelana_tpu.groth16.prove import (
        prove as g16_prove,
        prove_synthesized,
        public_inputs_of,
    )
    from zelana_tpu.groth16.setup import keygen, keygen_synthesized
    from zelana_tpu.groth16.verify import verify as g16_verify
    from zelana_tpu.runtime.chunk_prover import Groth16ChunkProver

    circuit = Groth16ChunkProver.dummy_circuit(capacity=(1, 0, 0),
                                               tree_depth=2)
    system = native_synth.synthesize_chunk(circuit)
    pk_native = keygen_synthesized(system, seed=0)
    pk_python = keygen(circuit, seed=0)
    assert pk_native.serialize_compressed() == pk_python.serialize_compressed()

    proof_n = prove_synthesized(pk_native, system, batch_id=5)
    proof_p = g16_prove(pk_python, circuit, batch_id=5)
    assert (proof_n.a, proof_n.b, proof_n.c) == (proof_p.a, proof_p.b,
                                                 proof_p.c)
    assert g16_verify(pk_native.vk, proof_n, public_inputs_of(circuit))


def test_native_encode_mont_matches_python():
    """limbs.encode_mont's native batch path (generic-modulus Montgomery
    encode) must agree with the pure-python encoding over both Fq and Fr,
    including unreduced inputs."""
    import random

    import numpy as np

    from zelana_tpu.ops import limbs as L

    r = random.Random(99)
    for spec in (L.FQ, L.FR):
        vals = [r.randrange(1 << 254) for _ in range(1500)]
        vals[0] = 0
        vals[1] = spec.modulus - 1
        vals[2] = spec.modulus  # unreduced
        vals[3] = (1 << 256) - 1  # max unreduced
        got = L._encode_mont_native(vals, spec)
        assert got is not None
        R_ = 1 << (L.LIMB_BITS * L.NLIMBS)
        want = L.to_limbs([(v * R_) % spec.modulus for v in vals], spec)
        assert (np.asarray(got) == np.asarray(want)).all()


def test_proving_key_npz_roundtrip(tmp_path):
    """The raw-coordinate key cache must round-trip exactly (including
    points at infinity) -- it exists because compressed deserialization
    pays one modular sqrt per point."""
    from zelana_tpu.curves import g1 as G1, g2 as G2
    from zelana_tpu.groth16.keys import ProvingKey, VerifyingKey

    g = G1.generator()
    pts = [g, G1.add(g, g), None, G1.add(G1.add(g, g), g)]
    h = G2.generator()
    pts2 = [h, G2.add(h, h), None]
    vk = VerifyingKey(alpha_g1=g, beta_g2=h, gamma_g2=G2.add(h, h),
                      delta_g2=pts2[1], gamma_abc_g1=pts[:2])
    pk = ProvingKey(vk=vk, beta_g1=pts[1], delta_g1=pts[3],
                    a_query=pts, b_g1_query=pts[:3], b_g2_query=pts2,
                    h_query=pts[1:], l_query=[None, g])
    path = str(tmp_path / "pk.npz")
    pk.save_npz(path)
    back = ProvingKey.load_npz(path)
    assert back.serialize_compressed() == pk.serialize_compressed()


def test_lagrange_matches_python():
    from zelana_tpu.groth16.qap import lagrange_coeffs_at
    from zelana_tpu.poly.domain import Domain

    domain = Domain.new(8)
    t = 0x1234567
    want = lagrange_coeffs_at(domain, t)
    u, zt = native_synth.lagrange_at(
        domain.group_gen, domain.size_inv, t, domain.size)
    assert native_synth.fr_ints(u) == want
    assert zt == domain.evaluate_vanishing_polynomial(t)
