"""Circuit-family tests: shielded transfer + MiMC batch circuit.

Satisfiability-level checks (synthesis + constraint evaluation) run always;
full Groth16 proving of these circuits is exercised by the slow-gated L2
test and bench paths.
"""

import pytest

from zelana_tpu.circuits.shielded import (
    InputNoteWitness,
    NoteTree,
    OutputNoteWitness,
    ShieldedTransferCircuit,
    derive_owner_pk,
    note_commitment,
    note_nullifier,
)
from zelana_tpu.fields.bn254 import R as FR
from zelana_tpu.hashes import mimc
from zelana_tpu.r1cs.system import ConstraintSystem


def _b(v: int) -> bytes:
    return int(v).to_bytes(32, "little")


def build_shielded_instance(tamper=None):
    sk1, sk2 = _b(111), _b(222)
    pk1, pk2 = derive_owner_pk(sk1), derive_owner_pk(sk2)
    notes = [
        dict(value=500, randomness=_b(7), owner_pk=_b(pk1), sk=sk1),
        dict(value=300, randomness=_b(8), owner_pk=_b(pk1), sk=sk1),
    ]
    tree = NoteTree()
    for n in notes:
        n["cm"] = note_commitment(n["value"], n["randomness"], n["owner_pk"])
        n["pos"] = tree.insert(n["cm"])
    root = tree.root()

    inputs, nullifiers = [], []
    for n in notes:
        sibs, bits = tree.path(n["pos"])
        inputs.append(
            InputNoteWitness(
                value=n["value"], randomness=n["randomness"],
                owner_pk=n["owner_pk"], position=n["pos"],
                spending_key=n["sk"], merkle_path=sibs, path_bits=bits,
            )
        )
        nullifiers.append(_b(note_nullifier(n["sk"], n["cm"], n["pos"])))

    fee = 10
    outputs = [
        OutputNoteWitness(value=490, randomness=_b(21), recipient_pk=_b(pk2)),
        OutputNoteWitness(value=300, randomness=_b(22), recipient_pk=_b(pk1)),
    ]
    commitments = [
        _b(note_commitment(o.value, o.randomness, o.recipient_pk))
        for o in outputs
    ]
    circuit = ShieldedTransferCircuit(
        merkle_root=_b(root),
        nullifiers=nullifiers,
        commitments=commitments,
        fee=fee,
        inputs=inputs,
        outputs=outputs,
    )
    if tamper:
        tamper(circuit)
    return circuit


def test_shielded_circuit_satisfiable():
    circuit = build_shielded_instance()
    cs = ConstraintSystem()
    circuit.generate_constraints(cs)
    # 1 root + 2 nullifiers + 2 commitments + fee = 6 public inputs (+ONE)
    assert cs.num_instance == 7
    assert cs.is_satisfied() is None


def test_shielded_circuit_rejects_bad_balance():
    def tamper(c):
        c.fee = 11  # breaks sum(in) == sum(out) + fee

    circuit = build_shielded_instance(tamper)
    cs = ConstraintSystem()
    circuit.generate_constraints(cs)
    assert cs.is_satisfied() is not None


def test_shielded_circuit_rejects_wrong_nullifier():
    def tamper(c):
        c.nullifiers = [c.nullifiers[1], c.nullifiers[0]]  # swapped

    circuit = build_shielded_instance(tamper)
    cs = ConstraintSystem()
    circuit.generate_constraints(cs)
    assert cs.is_satisfied() is not None


# ---------------------------------------------------------------- batch MiMC


class MiMCTestTree:
    """Position-addressed MiMC SMT over raw field ints (circuit-side view)."""

    DEPTH = 32

    def __init__(self):
        self.nodes = {}
        self.empty = [0]
        for _ in range(self.DEPTH):
            e = self.empty[-1]
            self.empty.append(mimc.hash_2(e, e))

    def root(self):
        return self.nodes.get((self.DEPTH, 0), self.empty[self.DEPTH])

    def set_leaf(self, pos, leaf):
        self.nodes[(0, pos)] = leaf
        idx, cur = pos, leaf
        for level in range(self.DEPTH):
            right = idx & 1 == 1
            sib = self.nodes.get((level, idx - 1 if right else idx + 1),
                                 self.empty[level])
            cur = mimc.hash_2(sib, cur) if right else mimc.hash_2(cur, sib)
            idx //= 2
            self.nodes[(level + 1, idx)] = cur

    def path(self, pos):
        sibs, bits = [], []
        idx = pos
        for level in range(self.DEPTH):
            right = idx & 1 == 1
            bits.append(1 if right else 0)
            sibs.append(self.nodes.get((level, idx - 1 if right else idx + 1),
                                       self.empty[level]))
            idx //= 2
        return sibs, bits


def account_leaf(pk, bal, nonce):
    return mimc.mimc_sponge_absorb([4, 1, pk, bal, nonce], 0)


def build_batch_instance():
    from zelana_tpu.circuits.batch_mimc import (
        BatchCircuitMiMC, TransferSlot)

    tree = MiMCTestTree()
    sender_pk, recv_pk = 1111, 2222
    sender_pos, recv_pos = 5, 9
    tree.set_leaf(sender_pos, account_leaf(sender_pk, 1000, 0))
    tree.set_leaf(recv_pos, account_leaf(recv_pk, 50, 0))
    pre_root = tree.root()

    spath, sidx = tree.path(sender_pos)
    # debit sender
    tree.set_leaf(sender_pos, account_leaf(sender_pk, 750, 1))
    rpath, ridx = tree.path(recv_pos)
    tree.set_leaf(recv_pos, account_leaf(recv_pk, 300, 0))
    post_root = tree.root()

    slot = TransferSlot(
        sender_pubkey=sender_pk, sender_balance=1000, sender_nonce=0,
        sender_path=spath, sender_path_indices=sidx,
        receiver_pubkey=recv_pk, receiver_balance=50, receiver_nonce=0,
        receiver_path=rpath, receiver_path_indices=ridx,
        amount=250, signature=77, is_valid=True,
    )

    batch_id = 3
    tx_hash = mimc.hash_4(sender_pk, recv_pk, 250, 0)
    batch_acc = mimc.hash_2(4, batch_id)
    batch_acc = mimc.hash_3(batch_acc, tx_hash, 250)
    batch_hash = mimc.hash_4(batch_acc, 1, 0, 0)
    wd_root = mimc.hash_2(mimc.hash_2(5, batch_id), 0)
    shielded_root = 424242

    return BatchCircuitMiMC(
        pre_state_root=pre_root,
        post_state_root=post_root,
        pre_shielded_root=shielded_root,
        post_shielded_root=shielded_root,
        withdrawal_root=wd_root,
        batch_hash=batch_hash,
        batch_id=batch_id,
        transfers=[slot],
        num_transfers=1,
        max_transfers=1,
        max_withdrawals=1,
        max_shielded=1,
    )


def test_batch_mimc_circuit_satisfiable():
    circuit = build_batch_instance()
    cs = ConstraintSystem()
    circuit.generate_constraints(cs)
    assert cs.num_instance == 8  # 7 public inputs + ONE
    assert cs.is_satisfied() is None


def test_batch_mimc_circuit_rejects_overdraft():
    circuit = build_batch_instance()
    circuit.transfers[0].amount = 2000  # > balance; range check must fail
    cs = ConstraintSystem()
    circuit.generate_constraints(cs)
    assert cs.is_satisfied() is not None


# ------------------------------------------------------------- ownership


def test_ownership_circuit_end_to_end():
    """The client-side ownership relation proves and verifies (Groth16)."""
    from zelana_tpu.circuits.ownership import OwnershipCircuit
    from zelana_tpu.groth16.prove import prove, public_inputs_of
    from zelana_tpu.groth16.setup import keygen
    from zelana_tpu.groth16.verify import verify

    circuit = OwnershipCircuit.from_witness(
        spending_key=12345, value=777, blinding=999, position=5
    )
    cs = ConstraintSystem()
    circuit.generate_constraints(cs)
    assert cs.num_instance == 4  # 3 public inputs + ONE
    assert cs.is_satisfied() is None

    pk = keygen(circuit, seed=0)
    proof = prove(pk, circuit, batch_id=1)
    pub = public_inputs_of(circuit)
    assert verify(pk.vk, proof, pub)
    bad = list(pub)
    bad[2] = bad[2] + 1
    assert not verify(pk.vk, proof, bad)


def test_ownership_circuit_rejects_wrong_key():
    from zelana_tpu.circuits.ownership import OwnershipCircuit

    circuit = OwnershipCircuit.from_witness(12345, 777, 999, 5)
    circuit.spending_key = 54321  # not the key behind the commitment
    cs = ConstraintSystem()
    circuit.generate_constraints(cs)
    assert cs.is_satisfied() is not None
