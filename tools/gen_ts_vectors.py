#!/usr/bin/env python3
"""Generate the TS SDK's constants + cross-implementation test vectors
from the TESTED Python modules.

Outputs:
- sdk/typescript/src/poseidonConstants.ts  (BLS12-381 8/57 ark + mds)
- sdk/typescript/test/vectors.json         (MiMC / Poseidon / AEAD vectors)

The TS mirror cannot run in this image (no node); the vectors pin it to
the Python implementations so any future node run validates byte-for-byte
(sdk/typescript/test/run_vectors.mjs).
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from zelana_tpu.hashes import mimc
from zelana_tpu.hashes.poseidon import bls12_381_config, poseidon_hash
from zelana_tpu.sdk import aead

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")


def gen_constants():
    cfg = bls12_381_config()
    lines = [
        "/**",
        " * Poseidon constants for the BLS12-381 Fr 8-full/57-partial rate-2",
        " * configuration (the privacy SDK note stack,",
        " * /root/reference/sdk/privacy/src/merkle.rs:121-124).",
        " *",
        " * Generated from the repo's tested Grain-LFSR derivation",
        " * (zelana_tpu/hashes/grain.py, cross-checked against ark-crypto-",
        " * primitives find_poseidon_ark_and_mds in tests/test_poseidon.py).",
        " * Regenerate: python tools/gen_ts_vectors.py",
        " */",
        "",
        "export const BLS12_381_FR =",
        f"  0x{cfg.modulus:x}n;",
        "",
        f"export const FULL_ROUNDS = {cfg.full_rounds};",
        f"export const PARTIAL_ROUNDS = {cfg.partial_rounds};",
        f"export const ALPHA = {cfg.alpha}n;",
        f"export const RATE = {cfg.rate};",
        f"export const CAPACITY = {cfg.capacity};",
        "",
        "export const ARK: bigint[][] = [",
    ]
    for row in cfg.ark:
        lines.append("  [" + ", ".join(f"0x{v:x}n" for v in row) + "],")
    lines.append("];")
    lines.append("")
    lines.append("export const MDS: bigint[][] = [")
    for row in cfg.mds:
        lines.append("  [" + ", ".join(f"0x{v:x}n" for v in row) + "],")
    lines.append("];")
    path = os.path.join(ROOT, "sdk/typescript/src/poseidonConstants.ts")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote", path)


def gen_vectors():
    cfg = bls12_381_config()
    sk, value, blinding, pos = 777, 9, 42, 5
    pk = mimc.derive_public_key(sk)
    cm = mimc.compute_commitment(pk, value, blinding)
    nf = mimc.compute_nullifier(sk, cm, pos)
    bp = mimc.compute_blinded_proxy(cm, pos)

    key = bytes(range(32))
    nonce = bytes(range(12))
    pt = b"zelana tpu vector plaintext."
    aad = b"hint"
    ct = aead.chacha20poly1305_encrypt(key, nonce, pt, aad=aad)

    a_sk = bytes([7] * 32)
    b_sk = bytes([11] * 32)
    shared = aead.x25519(a_sk, aead.x25519(b_sk))
    okm = aead.hkdf_sha256(shared, b"zelana-note-v1")

    vectors = {
        "mimc": {
            "hash2_1_2": str(mimc.hash_2(1, 2)),
            "hash3_3_4_5": str(mimc.hash_3(3, 4, 5)),
            "hash4_6_7_8_9": str(mimc.hash_4(6, 7, 8, 9)),
            "permute_1": str(mimc.mimc_permute(1)),
            "account_leaf_1_100_0": str(mimc.compute_account_leaf(1, 100, 0)),
        },
        "ownership": {
            "spending_key": str(sk), "value": value, "blinding": str(blinding),
            "position": pos,
            "public_key": str(pk), "commitment": str(cm),
            "nullifier": str(nf), "blinded_proxy": str(bp),
        },
        "poseidon_bls": {
            "hash_1_2_3": str(poseidon_hash(cfg, [1, 2, 3])),
            "hash_10_20_30_40": str(poseidon_hash(cfg, [10, 20, 30, 40])),
        },
        "chacha20poly1305": {
            "key": key.hex(), "nonce": nonce.hex(), "plaintext": pt.hex(),
            "aad": aad.hex(), "ciphertext": ct.hex(),
        },
        "x25519_hkdf": {
            "a_sk": a_sk.hex(), "b_sk": b_sk.hex(),
            "a_pk": aead.x25519(a_sk).hex(), "b_pk": aead.x25519(b_sk).hex(),
            "shared": shared.hex(),
            "hkdf_note_v1": okm.hex(),
        },
    }
    path = os.path.join(ROOT, "sdk/typescript/test/vectors.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(vectors, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    gen_constants()
    gen_vectors()
