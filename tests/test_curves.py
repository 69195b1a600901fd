"""Golden-layer curve and pairing tests.

The decisive fixture is the reference's shipped arkworks artifacts
(prover/l2_vk.json, prover/l2_proof.json): deserializing them and
re-serializing byte-exactly validates compressed point encoding, Fq/Fq2
square roots, sign flags, and subgroup membership against real ark-serialize
output without needing a Rust toolchain.
"""

import base64
import json

import pytest

from zelana_tpu.curves import g1, g2
from zelana_tpu.curves.pairing import pairing, pairing_product_is_one
from zelana_tpu.fields import tower as tw
from zelana_tpu.fields.bn254 import P, R
from zelana_tpu.groth16.keys import Proof, VerifyingKey

REF_VK = "/root/reference/prover/l2_vk.json"
REF_PROOF = "/root/reference/prover/l2_proof.json"


def test_g1_group_law():
    g = g1.generator()
    assert g1.is_on_curve(g)
    p2 = g1.add(g, g)
    p3 = g1.add(p2, g)
    assert g1.add(g, p2) == p3
    assert g1.mul(g, 3) == p3
    assert g1.add(p3, g1.neg(p3)) is None
    assert g1.mul(g, R) is None  # group order


def test_g2_group_law():
    g = g2.generator()
    assert g2.is_on_curve(g)
    assert g2.in_subgroup(g)
    p2 = g2.add(g, g)
    assert g2.mul(g, 2) == p2
    assert g2.add(p2, g2.neg(p2)) is None
    assert g2.mul(g, R) is None


def test_g1_serialization_roundtrip():
    g = g1.generator()
    for k in [1, 2, 3, 12345, R - 1]:
        pt = g1.mul(g, k)
        assert g1.deserialize_compressed(g1.serialize_compressed(pt)) == pt
    assert g1.deserialize_compressed(g1.serialize_compressed(None)) is None


def test_g2_serialization_roundtrip():
    g = g2.generator()
    for k in [1, 2, 7, 99999]:
        pt = g2.mul(g, k)
        assert g2.deserialize_compressed(g2.serialize_compressed(pt)) == pt
    assert g2.deserialize_compressed(g2.serialize_compressed(None)) is None


def test_pairing_bilinearity():
    G1, G2 = g1.generator(), g2.generator()
    e = pairing(G1, G2)
    assert e != tw.FQ12_ONE
    assert tw.fq12_pow(e, R) == tw.FQ12_ONE  # order r
    sq = tw.fq12_mul(e, e)
    assert pairing(g1.mul(G1, 2), G2) == sq
    assert pairing(G1, g2.mul(G2, 2)) == sq
    assert pairing(g1.mul(G1, 5), g2.mul(G2, 7)) == pairing(
        g1.mul(G1, 7), g2.mul(G2, 5)
    )


def test_pairing_product():
    G1, G2 = g1.generator(), g2.generator()
    assert pairing_product_is_one([(G1, G2), (g1.neg(G1), G2)])
    assert not pairing_product_is_one([(G1, G2), (G1, G2)])


def test_reference_vk_roundtrip():
    raw = base64.b64decode(json.load(open(REF_VK))["verifying_key"])
    vk = VerifyingKey.deserialize_compressed(raw)
    assert len(vk.gamma_abc_g1) == 3  # legacy 2-public-input circuit
    for pt in [vk.alpha_g1] + vk.gamma_abc_g1:
        assert g1.in_subgroup(pt)
    for pt in [vk.beta_g2, vk.gamma_g2, vk.delta_g2]:
        assert g2.in_subgroup(pt)
    assert vk.serialize_compressed() == raw


def test_reference_proof_roundtrip():
    raw = base64.b64decode(json.load(open(REF_PROOF))["proof"])
    proof = Proof.deserialize_compressed(raw)
    assert g1.in_subgroup(proof.a)
    assert g2.in_subgroup(proof.b)
    assert g1.in_subgroup(proof.c)
    assert proof.serialize_compressed() == raw
