"""In-process model of the deployed on-chain Groth16 verifier program.

Re-implements onchain-programs/verifier `verify_batch_proof`
(onchain_verifier/src/lib.rs:438-545) byte-for-byte over the alt_bn128
syscall model (solana_syscalls.py), playing the role the reference's
litesvm-hosted program plays in its tests: the final acceptance gate a TPU
proof must pass before the bridge finalizes a batch.

Byte conventions -- matching what the DEPLOYED program actually consumes:
- Solana's alt_bn128_* syscalls are EVM-convention: 32-byte BIG-ENDIAN
  field elements, G2 with the imaginary coefficient first. The verifier
  feeds raw instruction/account bytes straight into them (lib.rs:497-545),
  so proof points, VK points, and public-input scalars are all BE on the
  wire.
- batch public inputs: seven raw 32-byte arrays with batch_id big-endian
  in the last 8 bytes (lib.rs:479-494).
- scalar-in-field validation compares big-endian bytes against the BASE
  field modulus q (lib.rs:648-654) -- the deployed program really checks
  q, not the scalar field r; reproduced as-is.
- pi_a arrives PRE-NEGATED (the pairing uses it directly; the reference's
  arkworks->Solana conversion helper negates, lib.rs:708-724).

NOTE(reference bug, fixed on our prover side): the reference PROVER
serializes proof points and roots little-endian
(core/src/sequencer/settlement/prover.rs:304-334) -- bytes the deployed
program would misread as big-endian, so its Groth16 proofs could never
verify on-chain (it only ever ran MockProver end-to-end). This framework
fixes the prover: prover_service.proof_to_solana_bytes and the settler
emit big-endian, and this model consumes exactly what the deployed
program consumes.
"""

from __future__ import annotations

from typing import List

from ..fields.bn254 import P as Q_MOD
from ..groth16.keys import VerifyingKey
from .prover_service import BatchProof
from .solana_syscalls import (
    SyscallError,
    alt_bn128_addition,
    alt_bn128_multiplication,
    alt_bn128_pairing,
    encode_g1,
    encode_g2,
)

MAX_IC_POINTS = 8


def batch_inputs_to_field_elements(inputs) -> List[bytes]:
    """lib.rs:479-494 passes the instruction's raw 32-byte arrays through
    (batch_id as 32-byte BE). The arrays the settler puts in the
    instruction are the big-endian VALUE serializations
    (prover_service.batch_inputs_to_solana_bytes) -- the settler-side fix
    for the reference's LE/BE mismatch."""
    from .prover_service import batch_inputs_to_solana_bytes

    return batch_inputs_to_solana_bytes(inputs)


def verify_scalar_in_field(x_bytes: bytes) -> bool:
    """lib.rs:648-654: big-endian byte comparison against the BASE field
    modulus q (the deployed program's actual check)."""
    return int.from_bytes(x_bytes, "big") < Q_MOD


def verify_groth16_with_alt_bn254(pi_a: bytes, pi_b: bytes, pi_c: bytes,
                                  input_bytes: List[bytes],
                                  vk_solana: dict) -> bool:
    """lib.rs:497-545 over the syscall model. vk_solana holds the stored
    account bytes: alpha_g1 (64), beta_g2/gamma_g2/delta_g2 (128), ic
    (list of 64). pi_a must be pre-negated."""
    if len(vk_solana["ic"]) != len(input_bytes) + 1:
        return False
    for b in input_bytes:
        if not verify_scalar_in_field(b):
            return False
    try:
        vk_x = vk_solana["ic"][0]
        for i, inp in enumerate(input_bytes):
            mul_res = alt_bn128_multiplication(vk_solana["ic"][i + 1] + inp)
            vk_x = alt_bn128_addition(mul_res + vk_x)
        pairing_input = (
            pi_a + pi_b
            + vk_x + vk_solana["gamma_g2"]
            + pi_c + vk_solana["delta_g2"]
            + vk_solana["alpha_g1"] + vk_solana["beta_g2"]
        )
        res = alt_bn128_pairing(pairing_input)
    except SyscallError:
        return False
    return res[31] == 1 and res[:31] == b"\x00" * 31


def vk_to_solana_account(vk: VerifyingKey) -> dict:
    """The verifier program's stored VK account bytes (big-endian, EVM G2
    ordering) -- what init_batch_vk/append_ic_points must upload for the
    syscalls to read the points correctly."""
    return {
        "alpha_g1": encode_g1(vk.alpha_g1),
        "beta_g2": encode_g2(vk.beta_g2),
        "gamma_g2": encode_g2(vk.gamma_g2),
        "delta_g2": encode_g2(vk.delta_g2),
        "ic": [encode_g1(pt) for pt in vk.gamma_abc_g1],
    }


def verify_batch_proof(vk: VerifyingKey, proof: BatchProof) -> bool:
    """lib.rs:438-475: the CPI entrypoint the bridge calls."""
    if len(proof.proof_bytes) != 256:
        return False
    input_bytes = batch_inputs_to_field_elements(proof.public_inputs)
    if len(vk.gamma_abc_g1) != len(input_bytes) + 1:
        return False
    data = proof.proof_bytes
    return verify_groth16_with_alt_bn254(
        data[0:64], data[64:192], data[192:256], input_bytes,
        vk_to_solana_account(vk),
    )
