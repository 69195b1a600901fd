"""Solana-format conversion + on-chain verifier gate tests."""

import base64
import json

from zelana_tpu.groth16.keys import VerifyingKey
from zelana_tpu.groth16.solana_vk import convert_vk, upload_plan

REF_VK = "/root/reference/prover/l2_vk.json"


def test_convert_reference_vk():
    raw = base64.b64decode(json.load(open(REF_VK))["verifying_key"])
    vk = VerifyingKey.deserialize_compressed(raw)
    svk = convert_vk(vk)
    assert len(svk.alpha_g1) == 64
    assert len(svk.beta_g2) == 128
    assert len(svk.ic) == 3
    # BE x-coordinate of alpha matches the point (syscall convention)
    assert int.from_bytes(svk.alpha_g1[:32], "big") == vk.alpha_g1[0]
    # the reference-LE mirror preserves convert_vk.rs's (buggy) layout
    from zelana_tpu.groth16.solana_vk import convert_vk_reference_le

    le = convert_vk_reference_le(vk)
    assert int.from_bytes(le.alpha_g1[:32], "little") == vk.alpha_g1[0]
    plan = upload_plan(svk, chunk=2)
    assert plan[0]["instruction"] == "init_batch_vk"
    assert [p["instruction"] for p in plan[1:-1]] == ["append_ic_points"] * 2
    assert plan[-1]["instruction"] == "finalize_batch_vk"


def test_onchain_verifier_gate_end_to_end():
    """Prove a tiny-but-7-input circuit and run it through the settler's
    on-chain verification gate (the litesvm-equivalent check)."""
    from zelana_tpu.groth16.prove import prove
    from zelana_tpu.groth16.setup import keygen
    from zelana_tpu.sequencer.onchain_verifier import verify_batch_proof
    from zelana_tpu.sequencer.prover_service import (
        BatchProof,
        BatchPublicInputs,
        proof_to_solana_bytes,
    )
    from zelana_tpu.sequencer.settler import OnchainVerifyingSettler

    class SevenInput:
        """Seven public inputs wired like the L2 circuit's interface, with a
        trivial relation (in0 * in1 == product witness binding all seven)."""

        def __init__(self, vals):
            self.vals = vals

        def generate_constraints(self, cs):
            ins = [cs.new_input(v) for v in self.vals]
            acc = cs.new_witness(1)
            acc.enforce_equal(cs.constant(1))
            prod = ins[0] * ins[1]
            expected = cs.new_witness(self.vals[0] * self.vals[1])
            prod.enforce_equal(expected)
            # touch the rest so every input appears in a constraint
            total = ins[2] + ins[3] + ins[4] + ins[5] + ins[6]
            tw = cs.new_witness(sum(self.vals[2:]))
            total.enforce_equal(tw)

    roots = [b"\x01" + b"\x00" * 31, b"\x02" + b"\x00" * 31,
             b"\x03" + b"\x00" * 31, b"\x04" + b"\x00" * 31,
             b"\x05" + b"\x00" * 31, b"\x06" + b"\x00" * 31]
    batch_id = 9
    vals = [int.from_bytes(r, "little") for r in roots] + [batch_id]
    circuit = SevenInput(vals)
    pk = keygen(circuit, seed=0)
    proof = prove(pk, circuit, batch_id=batch_id)

    inputs = BatchPublicInputs(*roots, batch_id=batch_id)
    bp = BatchProof(inputs, proof_to_solana_bytes(proof), 1)
    assert verify_batch_proof(pk.vk, bp)

    # settler gate accepts and produces the SubmitBatch instruction
    settler = OnchainVerifyingSettler(pk.vk)
    result = settler.submit(bp)
    assert result.signature

    # tampered public input is rejected by the gate
    bad_inputs = BatchPublicInputs(
        roots[0], b"\x07" + b"\x00" * 31, *roots[2:], batch_id=batch_id
    )
    bad = BatchProof(bad_inputs, bp.proof_bytes, 1)
    assert not verify_batch_proof(pk.vk, bad)


def test_snarkjs_vk_export():
    import base64

    raw = base64.b64decode(json.load(open(REF_VK))["verifying_key"])
    vk = VerifyingKey.deserialize_compressed(raw)
    from zelana_tpu.groth16.solana_vk import export_vk_snarkjs

    out = export_vk_snarkjs(vk)
    assert out["protocol"] == "groth16" and out["curve"] == "bn128"
    assert out["nPublic"] == 2
    assert len(out["IC"]) == 3
    assert out["vk_alpha_1"][0] == str(vk.alpha_g1[0])
    assert out["vk_alpha_1"][2] == "1"
    # G2 pairs are imaginary-first (snarkjs.rs fq2_to_pair_snarkjs)
    assert out["vk_beta_2"][0][0] == str(vk.beta_g2[0][1])
    assert out["vk_beta_2"][0][1] == str(vk.beta_g2[0][0])


def test_block_header_zlna_roundtrip():
    from zelana_tpu.sdk.block import (
        HEADER_MAGIC,
        HEADER_SIZE,
        BlockHeader,
    )

    h = BlockHeader(batch_id=7, prev_root=b"\x01" * 32,
                    new_root=b"\x02" * 32, tx_count=3, open_at=123456,
                    flags=1)
    data = h.to_bytes()
    assert len(data) == HEADER_SIZE
    assert data[:4] == HEADER_MAGIC == b"ZLNA"
    assert BlockHeader.from_bytes(data) == h
    g = BlockHeader.genesis()
    assert BlockHeader.from_bytes(g.to_bytes()) == g


def test_risc0_claim_digest_path():
    """RISC0 receipt path (verifier lib.rs:309-341, 550-650): tag-hash
    claim construction, digest splitting, scalar checks."""
    from zelana_tpu.sequencer.onchain_verifier import (
        hash_risc0_claim,
        risc0_public_inputs,
        verify_risc0_proof,
    )

    image_id = b"\x0a" * 32
    journal = b"\x0b" * 32
    claim = hash_risc0_claim(image_id, journal)
    assert len(claim) == 32 and claim != b"\x00" * 32
    # deterministic
    assert claim == hash_risc0_claim(image_id, journal)
    assert claim != hash_risc0_claim(image_id, b"\x0c" * 32)

    inputs = risc0_public_inputs(claim)
    assert len(inputs) == 5
    # split halves are 128-bit values zero-extended to 32 bytes
    assert inputs[0][:16] == b"\x00" * 16 and inputs[2][:16] == b"\x00" * 16
    assert verify_risc0_proof(b"\x00" * 256, image_id, journal)
    import pytest as _pytest

    from zelana_tpu.sequencer.onchain_verifier import _split_digest

    with _pytest.raises(ValueError):
        risc0_public_inputs(b"\x00" * 32)
    lo, hi = _split_digest(bytes(range(32)))
    assert lo != hi


def test_alt_bn128_syscall_model_edges():
    """EVM-convention syscall semantics: infinity encoding, off-curve and
    out-of-range rejection, G2 subgroup validation (real since the
    mul-reduces-mod-r fix), pairing of empty/identity pairs."""
    import pytest as _pytest

    from zelana_tpu.curves import g1 as G1
    from zelana_tpu.curves import g2 as G2
    from zelana_tpu.fields.bn254 import P as Q
    from zelana_tpu.sequencer.solana_syscalls import (
        SyscallError,
        alt_bn128_addition,
        alt_bn128_multiplication,
        alt_bn128_pairing,
        decode_g1,
        decode_g2,
        encode_g1,
        encode_g2,
    )

    g = G1.generator()
    # add P + (-P) = infinity (all-zero encoding)
    out = alt_bn128_addition(encode_g1(g) + encode_g1(G1.neg(g)))
    assert out == b"\x00" * 64
    # scalar mul by 0 and by r give infinity
    from zelana_tpu.fields.bn254 import R as FR

    assert alt_bn128_multiplication(
        encode_g1(g) + (0).to_bytes(32, "big")) == b"\x00" * 64
    assert alt_bn128_multiplication(
        encode_g1(g) + FR.to_bytes(32, "big")) == b"\x00" * 64
    # 2 * G matches the group law
    two_g = decode_g1(alt_bn128_multiplication(
        encode_g1(g) + (2).to_bytes(32, "big")))
    assert two_g == G1.add(g, g)

    # off-curve point rejected
    with _pytest.raises(SyscallError):
        decode_g1((5).to_bytes(32, "big") + (7).to_bytes(32, "big"))
    # coordinate >= q rejected
    with _pytest.raises(SyscallError):
        decode_g1(Q.to_bytes(32, "big") + (1).to_bytes(32, "big"))

    # G2: generator round-trips; a curve point OUTSIDE the r-torsion is
    # rejected (cofactor-order component)
    q2 = G2.generator()
    assert decode_g2(encode_g2(q2)) == q2
    from zelana_tpu.fields import tower as tw
    from zelana_tpu.groth16.stdrng import StdRng, rand_fp

    rng = StdRng.seed_from_u64(5)
    while True:
        x = (rand_fp(rng, Q), rand_fp(rng, Q))
        b = tw.fq2_scale(tw.fq2_inv((9, 1)), 3)
        rhs = tw.fq2_add(tw.fq2_mul(tw.fq2_sqr(x), x), b)
        y = tw.fq2_sqrt(rhs)
        if y is not None:
            break
    raw_pt = (x, y)  # on the twist, (almost surely) not in the subgroup
    if not G2.in_subgroup(raw_pt):
        with _pytest.raises(SyscallError):
            decode_g2(encode_g2(raw_pt))

    # pairing: e(G1, G2) alone != 1; with its inverse pair == 1
    one = alt_bn128_pairing(
        encode_g1(g) + encode_g2(q2)
        + encode_g1(G1.neg(g)) + encode_g2(q2))
    assert one[31] == 1
    not_one = alt_bn128_pairing(encode_g1(g) + encode_g2(q2))
    assert not_one[31] == 0
    # infinity pairs are skipped (e(O, Q) = 1)
    trivial = alt_bn128_pairing(b"\x00" * 64 + encode_g2(q2))
    assert trivial[31] == 1
