"""Groth16 end-to-end tests.

The always-on test proves a small circuit through the full pipeline (R1CS ->
QAP -> device NTT witness map -> device MSMs -> pairing verify). The full
L2BlockCircuit e2e runs when ZELANA_SLOW_TESTS=1 (several minutes on the CPU
test backend; exercised routinely by bench.py on TPU).
"""

import os

import pytest

from zelana_tpu.groth16.prove import prove, public_inputs_of
from zelana_tpu.groth16.setup import keygen
from zelana_tpu.groth16.verify import verify
from zelana_tpu.r1cs.system import ConstraintSystem


class CubicCircuit:
    """x^3 + x + 5 == out (the classic toy relation)."""

    def __init__(self, x, out):
        self.x, self.out = x, out

    def generate_constraints(self, cs):
        out = cs.new_input(self.out)
        x = cs.new_witness(self.x)
        x3 = (x * x) * x
        (x3 + x + cs.constant(5)).enforce_equal(out)


def test_cubic_end_to_end():
    x = 3
    out = x**3 + x + 5
    pk = keygen(CubicCircuit(x, out), seed=0)
    proof = prove(pk, CubicCircuit(x, out), batch_id=7)
    assert verify(pk.vk, proof, [out])
    assert not verify(pk.vk, proof, [out + 1])


def test_cubic_proof_serialization_roundtrip():
    from zelana_tpu.groth16.keys import Proof, ProvingKey, VerifyingKey

    x, out = 4, 4**3 + 4 + 5
    pk = keygen(CubicCircuit(x, out), seed=0)
    proof = prove(pk, CubicCircuit(x, out), batch_id=1)
    blob = proof.serialize_compressed()
    assert len(blob) == 128  # matches reference l2_proof.json size
    restored = Proof.deserialize_compressed(blob)
    assert restored == proof
    vk_blob = pk.vk.serialize_compressed()
    assert VerifyingKey.deserialize_compressed(vk_blob) == pk.vk
    pk_blob = pk.serialize_compressed()
    assert ProvingKey.deserialize_compressed(pk_blob) == pk


def test_keygen_deterministic():
    pk1 = keygen(CubicCircuit(3, 35), seed=0)
    pk2 = keygen(CubicCircuit(9, 35), seed=0)  # witness value differs only
    # keys depend on circuit structure, not witness values
    assert pk1.vk.serialize_compressed() == pk2.vk.serialize_compressed()
    pk3 = keygen(CubicCircuit(3, 35), seed=1)
    assert pk1.vk.serialize_compressed() != pk3.vk.serialize_compressed()


def test_unsatisfied_witness_rejected():
    pk = keygen(CubicCircuit(3, 35), seed=0)
    with pytest.raises(ValueError):
        prove(pk, CubicCircuit(3, 36), batch_id=0)


def test_enforce_cmp_semantics():
    from zelana_tpu.r1cs.system import enforce_cmp_geq

    def check(balance, amount):
        cs = ConstraintSystem()
        b = cs.new_witness(balance)
        a = cs.new_witness(amount)
        enforce_cmp_geq(cs, b, a)
        return cs.is_satisfied() is None

    assert check(100, 50)
    assert check(100, 100)  # equality allowed (should_also_check_equality)
    assert not check(50, 100)
    assert check(2**64 - 1, 0)
    assert not check(0, 1)


@pytest.mark.skipif(
    not os.environ.get("ZELANA_SLOW_TESTS"),
    reason="full L2 circuit e2e takes minutes on the CPU backend",
)
def test_l2_block_circuit_end_to_end():
    from zelana_tpu.circuits.l2_block import (
        L2BlockCircuit,
        apply_transfers,
        compute_batch_hash,
        compute_state_root,
        compute_withdrawal_root,
    )

    c = L2BlockCircuit.dummy()
    final = apply_transfers(c.initial_accounts, c.transactions)
    c.pre_state_root = compute_state_root(c.batch_id, c.initial_accounts)
    c.post_state_root = compute_state_root(c.batch_id, final)
    c.withdrawal_root = compute_withdrawal_root(c.withdrawals)
    c.batch_hash = compute_batch_hash(c.batch_id, c.transactions)

    pk = keygen(c, seed=0)
    proof = prove(pk, c, batch_id=0)
    pub = public_inputs_of(c)
    assert len(pub) == 7
    assert verify(pk.vk, proof, pub)
    bad = list(pub)
    bad[1] = bad[1] + 1
    assert not verify(pk.vk, proof, bad)


def test_l2_circuit_satisfiability():
    """Fast structural check of the full L2 relation (no proving)."""
    from zelana_tpu.circuits.l2_block import (
        L2BlockCircuit,
        TransactionWitness,
        WithdrawalWitness,
        apply_transfers,
        compute_batch_hash,
        compute_shielded_root,
        compute_state_root,
        compute_withdrawal_root,
    )

    c = L2BlockCircuit(
        batch_id=3,
        transactions=[
            TransactionWitness(b"\x01" * 32, b"\x02" * 32, 250),
            TransactionWitness(b"\x02" * 32, b"\x03" * 32, 100),
        ],
        initial_accounts={b"\x01" * 32: 1000, b"\x02" * 32: 50},
        shielded_commitments=[b"\x0a" * 32],
        withdrawals=[WithdrawalWitness(b"\x07" * 32, 40)],
        pre_shielded_root=b"\x11" * 32,
    )
    final = apply_transfers(c.initial_accounts, c.transactions)
    c.pre_state_root = compute_state_root(c.batch_id, c.initial_accounts)
    c.post_state_root = compute_state_root(c.batch_id, final)
    c.post_shielded_root = compute_shielded_root(
        c.pre_shielded_root, c.shielded_commitments
    )
    c.withdrawal_root = compute_withdrawal_root(c.withdrawals)
    c.batch_hash = compute_batch_hash(c.batch_id, c.transactions)

    cs = ConstraintSystem()
    c.generate_constraints(cs)
    assert cs.num_instance == 8  # 7 public inputs + ONE
    assert cs.is_satisfied() is None

    # tamper: overdraw balance
    c2 = L2BlockCircuit(
        batch_id=3,
        transactions=[TransactionWitness(b"\x01" * 32, b"\x02" * 32, 2000)],
        initial_accounts={b"\x01" * 32: 1000, b"\x02" * 32: 0},
    )
    final2 = apply_transfers(c2.initial_accounts, c2.transactions)
    c2.pre_state_root = compute_state_root(c2.batch_id, c2.initial_accounts)
    c2.post_state_root = compute_state_root(c2.batch_id, final2)
    c2.withdrawal_root = compute_withdrawal_root([])
    c2.batch_hash = compute_batch_hash(c2.batch_id, c2.transactions)
    cs2 = ConstraintSystem()
    c2.generate_constraints(cs2)
    assert cs2.is_satisfied() is not None  # balance check must fail


def test_prove_many_pipelined():
    """prove_many overlaps next-proof synthesis under current device
    work; results must match independent prove() calls' verification."""
    from zelana_tpu.groth16.prove import prove_many

    x = 5
    out = x**3 + x + 5
    pk = keygen(CubicCircuit(x, out), seed=0)
    proofs = prove_many(
        pk, [(CubicCircuit(x, out), 11), (CubicCircuit(x, out), 12),
             (CubicCircuit(x, out), 13)])
    assert all(verify(pk.vk, p, [out]) for p in proofs)
    # distinct batch ids -> distinct r/s randomness -> distinct proofs
    assert proofs[0].a != proofs[1].a
