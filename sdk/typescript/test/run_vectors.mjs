// Cross-implementation vector test for the TS SDK crypto modules.
//
// Vectors are generated from the repo's TESTED Python implementations
// (tools/gen_ts_vectors.py); this script pins the TS mirror byte-for-byte.
// Run (node >= 22.6 strips types natively):
//   node --experimental-strip-types sdk/typescript/test/run_vectors.mjs
// or transpile src/ first and point IMPL at the build output.

import { readFileSync } from "node:fs";
import { dirname, join } from "node:path";
import { fileURLToPath } from "node:url";

const here = dirname(fileURLToPath(import.meta.url));
const vectors = JSON.parse(readFileSync(join(here, "vectors.json"), "utf8"));

const shielded = await import("../src/shielded.ts");
const enc = await import("../src/encryption.ts");
const utils = await import("../src/utils.ts");

let failures = 0;
function check(name, got, want) {
  const g = String(got);
  const w = String(want);
  if (g !== w) {
    console.error(`FAIL ${name}: got ${g}, want ${w}`);
    failures += 1;
  } else {
    console.log(`ok   ${name}`);
  }
}

// -- MiMC ------------------------------------------------------------------
check("mimc.hash2(1,2)", shielded.mimcHash(1n, 2n), vectors.mimc.hash2_1_2);
check("mimc.hash3(3,4,5)", shielded.mimcHash(3n, 4n, 5n), vectors.mimc.hash3_3_4_5);
check("mimc.hash4(6,7,8,9)", shielded.mimcHash(6n, 7n, 8n, 9n), vectors.mimc.hash4_6_7_8_9);
check("mimc.permute(1)", shielded.mimcPermute(1n), vectors.mimc.permute_1);
check(
  "mimc.accountLeaf(1,100,0)",
  shielded.computeAccountLeaf(1n, 100n, 0n),
  vectors.mimc.account_leaf_1_100_0,
);

// -- ownership chain -------------------------------------------------------
const o = vectors.ownership;
const sk = BigInt(o.spending_key);
const pk = shielded.derivePublicKey(sk);
check("ownership.publicKey", pk, o.public_key);
const cm = shielded.computeCommitment(pk, BigInt(o.value), BigInt(o.blinding));
check("ownership.commitment", cm, o.commitment);
check(
  "ownership.nullifier",
  shielded.computeNullifier(sk, cm, BigInt(o.position)),
  o.nullifier,
);
check(
  "ownership.blindedProxy",
  shielded.computeBlindedProxy(cm, BigInt(o.position)),
  o.blinded_proxy,
);

// -- Poseidon BLS12-381 ----------------------------------------------------
check(
  "poseidon.hash(1,2,3)",
  shielded.poseidonHash([1n, 2n, 3n]),
  vectors.poseidon_bls.hash_1_2_3,
);
check(
  "poseidon.hash(10,20,30,40)",
  shielded.poseidonHash([10n, 20n, 30n, 40n]),
  vectors.poseidon_bls.hash_10_20_30_40,
);

// -- ChaCha20-Poly1305 -----------------------------------------------------
const c = vectors.chacha20poly1305;
const ct = enc.chacha20poly1305Encrypt(
  utils.hexToBytes(c.key),
  utils.hexToBytes(c.nonce),
  utils.hexToBytes(c.plaintext),
  utils.hexToBytes(c.aad),
);
check("aead.encrypt", utils.bytesToHex(ct), c.ciphertext);
const pt = enc.chacha20poly1305Decrypt(
  utils.hexToBytes(c.key),
  utils.hexToBytes(c.nonce),
  utils.hexToBytes(c.ciphertext),
  utils.hexToBytes(c.aad),
);
check("aead.decrypt", utils.bytesToHex(pt ?? new Uint8Array(0)), c.plaintext);

// -- X25519 + HKDF ---------------------------------------------------------
const x = vectors.x25519_hkdf;
check("x25519.aPk", utils.bytesToHex(enc.x25519(utils.hexToBytes(x.a_sk))), x.a_pk);
check("x25519.bPk", utils.bytesToHex(enc.x25519(utils.hexToBytes(x.b_sk))), x.b_pk);
const shared = enc.x25519(utils.hexToBytes(x.a_sk), utils.hexToBytes(x.b_pk));
check("x25519.shared", utils.bytesToHex(shared), x.shared);
check(
  "hkdf.note-v1",
  utils.bytesToHex(
    enc.hkdfSha256(shared, new TextEncoder().encode("zelana-note-v1")),
  ),
  x.hkdf_note_v1,
);

// -- note encryption round-trip (random keys) ------------------------------
const kp = enc.generateX25519Keypair();
const note = shielded.createNote(12345n, utils.randomBytes(32));
const blob = enc.encryptNote(note, kp.publicKey);
const back = enc.decryptNote(blob, kp.secretKey);
check("note.roundtrip.value", back?.value, note.value);
check(
  "note.roundtrip.commitment",
  utils.bytesToHex(shielded.noteCommitment(back)),
  utils.bytesToHex(shielded.noteCommitment(note)),
);

// u64 lamport-scale value (> 2^53): must survive the JSON codec exactly
// (values ship as decimal strings; float64 would round here), including a
// Python-style bare-integer payload
const bigNote = shielded.createNote(18446744073709551557n, utils.randomBytes(32));
const bigBack = shielded.noteFromJson(shielded.noteToJson(bigNote));
check("note.json.u64value", bigBack.value, bigNote.value);
const pyStyle = `{"value": 18446744073709551557, "randomness": "${utils.bytesToHex(
  bigNote.randomness,
)}", "owner_pk": "${utils.bytesToHex(bigNote.ownerPk)}"}`;
check("note.json.u64value.bare", shielded.noteFromJson(pyStyle).value, bigNote.value);

if (failures > 0) {
  console.error(`${failures} vector check(s) FAILED`);
  process.exit(1);
}
console.log("all TS SDK vectors match the Python implementations");
