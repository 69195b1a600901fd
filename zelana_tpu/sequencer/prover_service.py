"""Batch prover services (the BatchProver contract).

Mirrors core/src/sequencer/settlement/prover.rs:
- `BatchProver` protocol: prove(inputs, witness) -> BatchProof (:160-169)
- `MockProver`: hash-derived 256-byte fake proofs with simulated latency
  (:179-244)
- `Groth16Prover`: builds the L2BlockCircuit from the batch witness, proves
  on the TPU pipeline, serializes to the 256-byte Solana format (negated
  pi_a, little-endian coordinates, :304-334)

Public-input construction matches build_public_inputs (:506-522); witness
conversion matches the transfer/withdrawal filtering in prove() (:357-389).
"""

from __future__ import annotations

import hashlib
import time
from dataclasses import dataclass, field
from typing import List, Optional

from ..circuits.l2_block import (
    L2BlockCircuit,
    TransactionWitness,
    WithdrawalWitness,
)
from ..fields.bn254 import P as FQ_MOD
from ..groth16.keys import Proof, ProvingKey
from .transactions import Shielded, Transfer, Withdraw


@dataclass
class BatchPublicInputs:
    pre_state_root: bytes
    post_state_root: bytes
    pre_shielded_root: bytes
    post_shielded_root: bytes
    withdrawal_root: bytes
    batch_hash: bytes
    batch_id: int


@dataclass
class BatchProof:
    public_inputs: BatchPublicInputs
    proof_bytes: bytes
    proving_time_ms: int


@dataclass
class BatchWitness:
    transactions: List[object] = field(default_factory=list)
    initial_accounts: dict = field(default_factory=dict)  # pk bytes -> balance
    shielded_commitments: List[bytes] = field(default_factory=list)


def compute_batch_hash(transactions) -> bytes:
    """Domain-tagged running hash of batch txs (settlement/prover.rs:525-558;
    blake2b-256 stands in for blake3, which has no stdlib implementation)."""
    h = hashlib.blake2b(digest_size=32)
    for tx in transactions:
        if isinstance(tx, Shielded):
            h.update(b"shielded")
            h.update(tx.nullifier)
            h.update(tx.commitment)
        elif isinstance(tx, Transfer):
            h.update(b"transfer")
            h.update(tx.signer_pubkey)
            h.update(tx.to)
            h.update(tx.amount.to_bytes(8, "little"))
            h.update(tx.nonce.to_bytes(8, "little"))
        elif isinstance(tx, Withdraw):
            h.update(b"withdraw")
            h.update(tx.from_)
            h.update(tx.to_l1_address)
            h.update(tx.amount.to_bytes(8, "little"))
    return h.digest()


def proof_to_solana_bytes(proof: Proof) -> bytes:
    """(negated pi_a | pi_b | pi_c), 256 bytes, in the encoding the DEPLOYED
    verifier's alt_bn128 syscalls consume: big-endian coordinates, G2 with
    the imaginary coefficient first (EIP-197 order).

    NOTE(reference bug, fixed here): the reference prover writes
    little-endian, c0-first bytes (settlement/prover.rs:304-334) that the
    big-endian syscalls would misread; this framework emits what the
    on-chain program actually verifies (onchain_verifier.py)."""
    from ..curves import g1 as G1

    out = bytearray()
    a_neg = G1.neg(proof.a)
    out += int(a_neg[0]).to_bytes(32, "big")
    out += int(a_neg[1]).to_bytes(32, "big")
    (x0, x1), (y0, y1) = proof.b
    out += int(x1).to_bytes(32, "big")
    out += int(x0).to_bytes(32, "big")
    out += int(y1).to_bytes(32, "big")
    out += int(y0).to_bytes(32, "big")
    out += int(proof.c[0]).to_bytes(32, "big")
    out += int(proof.c[1]).to_bytes(32, "big")
    return bytes(out)


def solana_bytes_to_proof(data: bytes) -> Proof:
    """Inverse of proof_to_solana_bytes (un-negates pi_a)."""
    from ..curves import g1 as G1

    def fbe(off):
        return int.from_bytes(data[off : off + 32], "big")

    a = G1.neg((fbe(0), fbe(32)))
    b = ((fbe(96), fbe(64)), (fbe(160), fbe(128)))
    c = (fbe(192), fbe(224))
    return Proof(a=a, b=b, c=c)


def public_input_values(inputs: "BatchPublicInputs") -> List[int]:
    """The circuit's seven public-input field VALUES: roots parsed
    little-endian mod r exactly as the circuit allocates them
    (l2_circuit.rs from_le_bytes_mod_order), then batch_id."""
    from ..fields.bn254 import R as FR_MOD
    from ..fields.fp import from_le_bytes_mod_order

    return [
        from_le_bytes_mod_order(inputs.pre_state_root, FR_MOD),
        from_le_bytes_mod_order(inputs.post_state_root, FR_MOD),
        from_le_bytes_mod_order(inputs.pre_shielded_root, FR_MOD),
        from_le_bytes_mod_order(inputs.post_shielded_root, FR_MOD),
        from_le_bytes_mod_order(inputs.withdrawal_root, FR_MOD),
        from_le_bytes_mod_order(inputs.batch_hash, FR_MOD),
        inputs.batch_id,
    ]


def batch_inputs_to_solana_bytes(inputs: "BatchPublicInputs") -> List[bytes]:
    """The settler-side wire serialization: each circuit VALUE as a 32-byte
    BIG-ENDIAN array -- the exact bytes the deployed verifier feeds into
    alt_bn128_multiplication (lib.rs:479-494 passes them through raw, so
    they must already be syscall-convention). batch_id lands big-endian in
    the last 8 bytes, matching lib.rs:487-492."""
    return [v.to_bytes(32, "big") for v in public_input_values(inputs)]


class MockProver:
    """Blake2b fake proofs with simulated latency (prover.rs:179-244)."""

    def __init__(self, prove_time_ms: int = 100):
        self.prove_time_ms = prove_time_ms
        self.vk_hash = hashlib.blake2b(b"zelana-mock-vk-v1", digest_size=32).digest()

    def prove(self, inputs: BatchPublicInputs, witness: BatchWitness) -> BatchProof:
        time.sleep(self.prove_time_ms / 1000.0)
        h = hashlib.blake2b(digest_size=32)
        h.update(inputs.pre_state_root)
        h.update(inputs.post_state_root)
        h.update(inputs.pre_shielded_root)
        h.update(inputs.post_shielded_root)
        h.update(inputs.withdrawal_root)
        h.update(inputs.batch_hash)
        h.update(inputs.batch_id.to_bytes(8, "little"))
        proof_bytes = h.digest() + b"\x00" * 224
        return BatchProof(inputs, proof_bytes, self.prove_time_ms)

    def verify(self, proof: BatchProof) -> bool:
        return len(proof.proof_bytes) >= 32

    def verification_key_hash(self) -> bytes:
        return self.vk_hash


class Groth16Prover:
    """Real Groth16 proofs via the TPU pipeline (prover.rs:252-447)."""

    def __init__(self, proving_key: ProvingKey):
        self.pk = proving_key
        self.vk_hash = hashlib.blake2b(
            proving_key.vk.serialize_compressed(), digest_size=32
        ).digest()

    @classmethod
    def from_files(cls, pk_path: str) -> "Groth16Prover":
        with open(pk_path, "rb") as f:
            return cls(ProvingKey.deserialize_compressed(f.read()))

    def build_circuit(self, inputs: BatchPublicInputs,
                      witness: BatchWitness) -> L2BlockCircuit:
        txs = [
            TransactionWitness(t.signer_pubkey, t.to, t.amount)
            for t in witness.transactions
            if isinstance(t, Transfer)
        ]
        wds = [
            WithdrawalWitness(t.to_l1_address, t.amount)
            for t in witness.transactions
            if isinstance(t, Withdraw)
        ]
        return L2BlockCircuit(
            pre_state_root=inputs.pre_state_root,
            post_state_root=inputs.post_state_root,
            pre_shielded_root=inputs.pre_shielded_root,
            post_shielded_root=inputs.post_shielded_root,
            withdrawal_root=inputs.withdrawal_root,
            batch_hash=inputs.batch_hash,
            batch_id=inputs.batch_id,
            transactions=txs,
            initial_accounts=dict(witness.initial_accounts),
            shielded_commitments=list(witness.shielded_commitments),
            withdrawals=wds,
        )

    def prove(self, inputs: BatchPublicInputs, witness: BatchWitness) -> BatchProof:
        from ..groth16.prove import prove as groth16_prove

        start = time.time()
        circuit = self.build_circuit(inputs, witness)
        proof = groth16_prove(self.pk, circuit, batch_id=inputs.batch_id)
        proof_bytes = proof_to_solana_bytes(proof)
        return BatchProof(
            inputs, proof_bytes, int((time.time() - start) * 1000)
        )

    def verify(self, proof: BatchProof) -> bool:
        from ..groth16.verify import verify as groth16_verify

        p = solana_bytes_to_proof(proof.proof_bytes)
        return groth16_verify(
            self.pk.vk, p, public_input_values(proof.public_inputs)
        )

    def verification_key_hash(self) -> bytes:
        return self.vk_hash


def build_public_inputs(batch, withdrawal_root: bytes) -> BatchPublicInputs:
    assert batch.post_state_root is not None, "batch not executed"
    return BatchPublicInputs(
        pre_state_root=batch.pre_state_root,
        post_state_root=batch.post_state_root,
        pre_shielded_root=batch.pre_shielded_root,
        post_shielded_root=batch.post_shielded_root,
        withdrawal_root=withdrawal_root,
        batch_hash=compute_batch_hash(batch.transactions),
        batch_id=batch.id,
    )


def build_witness(batch, get_account) -> BatchWitness:
    """Initial balances for every account the batch touches (pre-state)."""
    initial = {}
    for tx in batch.transactions:
        if isinstance(tx, Transfer):
            for pk in (tx.signer_pubkey, tx.to):
                if pk not in initial:
                    initial[pk] = get_account(pk).balance
        elif isinstance(tx, Withdraw):
            if tx.from_ not in initial:
                initial[tx.from_] = get_account(tx.from_).balance
    cms = [tx.commitment for tx in batch.transactions
           if isinstance(tx, Shielded)]
    return BatchWitness(
        transactions=list(batch.transactions), initial_accounts=initial,
        shielded_commitments=cms,
    )


class NoirProverClient:
    """BatchProver over a remote prover-coordinator's /v2/batch/prove job
    API (core/src/sequencer/settlement/noir_client.rs): ships the batch as
    the coordinator-shaped request, follows the SSE status stream, and
    returns the chunked sunspot proofs as one BatchProof (proof bytes =
    last chunk's 388B proof + 236B witness, the 624-byte combined format
    the settler autodetects; every chunk is retrievable from the job)."""

    def __init__(self, coordinator_url: str, timeout: float = 300.0):
        from ..sdk.client import ApiClient

        self.api = ApiClient(coordinator_url, timeout=10.0)
        self.timeout = timeout
        self.vk_hash = hashlib.blake2b(b"zelana-noir-client-v1",
                                       digest_size=32).digest()
        self.last_result: Optional[dict] = None

    @staticmethod
    def _pk_int(pk: bytes) -> int:
        from ..fields.bn254 import R as FR_MOD
        from ..fields.fp import from_le_bytes_mod_order

        return from_le_bytes_mod_order(pk, FR_MOD)

    def build_request(self, inputs: BatchPublicInputs,
                      witness: BatchWitness) -> dict:
        accounts = [
            {"pk": self._pk_int(pk), "balance": bal}
            for pk, bal in witness.initial_accounts.items()
        ]
        transfers = [
            [self._pk_int(t.signer_pubkey), self._pk_int(t.to), t.amount]
            for t in witness.transactions if isinstance(t, Transfer)
        ]
        withdrawals = [
            [self._pk_int(t.from_), self._pk_int(t.to_l1_address), t.amount]
            for t in witness.transactions if isinstance(t, Withdraw)
        ]
        shielded = [
            self._pk_int(t.commitment)
            for t in witness.transactions if isinstance(t, Shielded)
        ]
        return {
            "batch_id": inputs.batch_id,
            "accounts": accounts,
            "transfers": transfers,
            "withdrawals": withdrawals,
            "shielded_commitments": shielded,
        }

    def prove(self, inputs: BatchPublicInputs,
              witness: BatchWitness) -> BatchProof:
        start = time.time()
        job = self.api.prove_batch(self.build_request(inputs, witness))
        result = self.api.wait_for_proof(job, timeout=self.timeout)
        self.last_result = result
        last = result["chunks"][-1]
        proof_bytes = (bytes.fromhex(last["proof"])
                       + bytes.fromhex(last.get("public_witness", "")))
        return BatchProof(inputs, proof_bytes,
                          int((time.time() - start) * 1000))

    def verify(self, proof: BatchProof) -> bool:
        from .settler import is_noir_proof

        return is_noir_proof(proof)

    def verification_key_hash(self) -> bytes:
        return self.vk_hash


def build_prover_from_config(cfg):
    """Prover selection with silent MockProver fallback, mirroring
    pipeline.rs:217-281: Groth16 when a proving key loads, Noir when a
    coordinator URL is configured, Mock otherwise (and on any load
    failure)."""
    mode = (cfg.prover_mode or "mock").lower()
    if not getattr(cfg, "mock_prover", False):
        if mode == "groth16" and getattr(cfg, "proving_key", None):
            try:
                return Groth16Prover.from_files(cfg.proving_key)
            except Exception:
                pass  # fall through to mock (reference logs + falls back)
        if mode == "noir" and getattr(cfg, "noir_coordinator_url", None):
            try:
                return NoirProverClient(cfg.noir_coordinator_url)
            except Exception:
                pass
    return MockProver()
