"""L1 settlement: Solana SubmitBatch instruction building + settlers.

Mirrors core/src/sequencer/settlement/settler.rs:

- SubmitBatchHeader layout: prev_batch_idx u64 | new_batch_idx u64 |
  state_root 32B | proof_len u32 | withdrawal_count u32  = 56 bytes
  (bridge submit_batch.rs:19-56)
- instruction = discriminator | header | proof(256B) | public inputs
- MockSettler keeps an in-memory L1 (settler.rs:1115-1152); the real
  settler builds the exact wire bytes (no RPC egress in this environment,
  so submission is pluggable).
"""

from __future__ import annotations

import hashlib
import struct
from dataclasses import dataclass, field
from typing import Dict, List, Optional

from .prover_service import BatchProof

SUBMIT_BATCH_DISCRIMINATOR = 2
HEADER_SIZE = 56


def build_submit_batch_header(prev_idx: int, new_idx: int, state_root: bytes,
                              proof_len: int, wd_count: int) -> bytes:
    return (
        struct.pack("<QQ", prev_idx, new_idx)
        + state_root
        + struct.pack("<II", proof_len, wd_count)
    )


def build_submit_batch_instruction(proof: BatchProof, prev_idx: int) -> bytes:
    """Full instruction data for the bridge SubmitBatch (settler.rs:159-310).

    Public inputs go on the wire as big-endian VALUE serializations
    (prover_service.batch_inputs_to_solana_bytes): the verifier program
    passes them raw into the big-endian alt_bn128 syscalls
    (lib.rs:479-494), so the settler is where the internal LE-parsed root
    bytes become syscall-convention -- the fix for the reference prover's
    LE/BE mismatch (settlement/prover.rs:304-334)."""
    from .prover_service import batch_inputs_to_solana_bytes

    inputs = proof.public_inputs
    header = build_submit_batch_header(
        prev_idx, inputs.batch_id, inputs.post_state_root,
        len(proof.proof_bytes), 0,
    )
    data = bytearray([SUBMIT_BATCH_DISCRIMINATOR])
    data += header
    data += proof.proof_bytes
    # public inputs, verifier ordering (onchain_verifier lib.rs:479-494)
    for arr in batch_inputs_to_solana_bytes(inputs):
        data += arr
    return bytes(data)


@dataclass
class SettlementResult:
    signature: str
    slot: int


class MockSettler:
    """In-memory L1 state (settler.rs MockSettler)."""

    def __init__(self):
        self.submitted: List[bytes] = []
        self.batch_index = 0
        self.slot = 1

    def submit(self, proof: BatchProof) -> SettlementResult:
        data = build_submit_batch_instruction(proof, self.batch_index)
        self.submitted.append(data)
        self.batch_index = proof.public_inputs.batch_id
        sig = hashlib.blake2b(data, digest_size=32).hexdigest()
        self.slot += 1
        return SettlementResult(signature=sig, slot=self.slot)


class OnchainVerifyingSettler:
    """Settler that runs the on-chain verifier algorithm locally before
    accepting -- the litesvm-style check (bridge tests use an in-process VM;
    here the alt_bn128 pairing math runs via our golden pairing)."""

    def __init__(self, vk):
        self.vk = vk
        self.inner = MockSettler()

    def submit(self, proof: BatchProof) -> SettlementResult:
        from .onchain_verifier import verify_batch_proof

        if not verify_batch_proof(self.vk, proof):
            raise ValueError("on-chain verification failed")
        return self.inner.submit(proof)
