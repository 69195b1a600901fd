"""In-process model of the on-chain Groth16 verifier program.

Re-implements onchain-programs/verifier verify_batch_proof
(onchain_verifier/src/lib.rs:438-547) against our golden pairing, playing
the role the reference's litesvm-hosted program plays in its tests: the
final acceptance gate a TPU proof must pass before the bridge finalizes a
batch.

Faithful details:
- batch public inputs serialized as seven 32-byte arrays with batch_id as
  big-endian in the last 8 bytes (:479-494)
- scalar-in-field validation per input (:650-655)
- vk_x = IC[0] + sum IC[i+1] * input_i, then the 4-pair product
  [-A, B, vk_x, gamma, C, delta, alpha, beta] == 1 (:497-545)
- proofs arrive in the settler's 256-byte format with pi_a pre-negated
  (prover side negates, verifier consumes directly)
"""

from __future__ import annotations

from typing import List

from ..curves import g1 as G1
from ..curves.pairing import pairing_product_is_one
from ..fields.bn254 import R as FR_MOD
from ..groth16.keys import VerifyingKey
from .prover_service import BatchProof

MAX_IC_POINTS = 8


def batch_inputs_to_field_elements(inputs) -> List[bytes]:
    # The reference encodes batch_id big-endian in the last 8 bytes
    # (lib.rs:487-492), which matches a big-endian syscall interpretation.
    # Our pinned end-to-end convention is little-endian (the circuit reads
    # all public inputs via from_le_bytes_mod_order), so batch_id is
    # serialized LE -- the 7th scalar then equals Fr::from(batch_id) exactly
    # as the circuit allocated it.
    return [
        inputs.pre_state_root,
        inputs.post_state_root,
        inputs.pre_shielded_root,
        inputs.post_shielded_root,
        inputs.withdrawal_root,
        inputs.batch_hash,
        inputs.batch_id.to_bytes(32, "little"),
    ]


def verify_scalar_in_field(x_bytes: bytes) -> bool:
    """The reference program compares big-endian against the base-field
    modulus (lib.rs:650-655); under our pinned little-endian convention the
    equivalent check is LE < r (scalar field)."""
    return int.from_bytes(x_bytes, "little") < FR_MOD


def verify_batch_proof(vk: VerifyingKey, proof: BatchProof) -> bool:
    if len(proof.proof_bytes) != 256:
        return False
    input_bytes = batch_inputs_to_field_elements(proof.public_inputs)
    if len(vk.gamma_abc_g1) != len(input_bytes) + 1:
        return False
    for b in input_bytes:
        if not verify_scalar_in_field(b):
            return False

    # NOTE(convention): the reference's prover writes little-endian
    # coordinates (settlement/prover.rs:304-334) while its on-chain negation
    # helper treats bytes as big-endian (lib.rs:671-693) -- one of the two
    # must reinterpret. We pin the convention: the 256-byte wire format is
    # little-endian, the verifier decodes LE, and the circuit's public
    # inputs are the LE interpretation of the 32-byte arrays -- matching the
    # circuit side (l2_circuit.rs from_le_bytes_mod_order) end to end.
    data = proof.proof_bytes

    def fle(off):
        return int.from_bytes(data[off : off + 32], "little")

    neg_a = (fle(0), fle(32))
    b_pt = ((fle(64), fle(96)), (fle(128), fle(160)))
    c_pt = (fle(192), fle(224))
    if not (G1.is_on_curve(neg_a) and G1.is_on_curve(c_pt)):
        return False
    from ..curves import g2 as G2

    if not G2.in_subgroup(b_pt):
        return False

    scalars = [int.from_bytes(b, "little") % FR_MOD for b in input_bytes]
    vk_x = vk.gamma_abc_g1[0]
    for s, pt in zip(scalars, vk.gamma_abc_g1[1:]):
        vk_x = G1.add(vk_x, G1.mul(pt, s))

    return pairing_product_is_one(
        [
            (neg_a, b_pt),  # pi_a arrives negated
            (vk_x, vk.gamma_g2),
            (c_pt, vk.delta_g2),
            (vk.alpha_g1, vk.beta_g2),
        ]
    )
