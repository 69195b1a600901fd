/**
 * Client-edge crypto: X25519 + HKDF-SHA256 + ChaCha20-Poly1305, and the
 * note / tx-blob encryption built on them.
 *
 * Mirror of the TESTED Python stack `zelana_tpu/sdk/aead.py` (RFC 7748 /
 * 5869 / 8439 primitives, vector-tested in tests/test_sdk_crypto.py) and
 * the note/tx layers `zelana_tpu/sdk/privacy.py` (encryption section,
 * HKDF info "zelana-note-v1"; reference sdk/privacy/src/encryption.rs) and
 * `zelana_tpu/sdk/txblob.py` ("zelana-tx-v1"; reference
 * sdk/txblob/src/crypto.rs:23-31).
 *
 * Dependency-free and synchronous (pure-TS SHA-256 / ChaCha20 / Poly1305 /
 * X25519) so it runs identically in browsers, workers, and Node.
 */

import { Note, noteFromJson, noteToJson } from "./shielded";
import { concatBytes, randomBytes } from "./utils";

// ---------------------------------------------------------------------------
// SHA-256 + HMAC + HKDF (RFC 6234 / 2104 / 5869)
// ---------------------------------------------------------------------------

const SHA_K = new Uint32Array([
  0x428a2f98, 0x71374491, 0xb5c0fbcf, 0xe9b5dba5, 0x3956c25b, 0x59f111f1,
  0x923f82a4, 0xab1c5ed5, 0xd807aa98, 0x12835b01, 0x243185be, 0x550c7dc3,
  0x72be5d74, 0x80deb1fe, 0x9bdc06a7, 0xc19bf174, 0xe49b69c1, 0xefbe4786,
  0x0fc19dc6, 0x240ca1cc, 0x2de92c6f, 0x4a7484aa, 0x5cb0a9dc, 0x76f988da,
  0x983e5152, 0xa831c66d, 0xb00327c8, 0xbf597fc7, 0xc6e00bf3, 0xd5a79147,
  0x06ca6351, 0x14292967, 0x27b70a85, 0x2e1b2138, 0x4d2c6dfc, 0x53380d13,
  0x650a7354, 0x766a0abb, 0x81c2c92e, 0x92722c85, 0xa2bfe8a1, 0xa81a664b,
  0xc24b8b70, 0xc76c51a3, 0xd192e819, 0xd6990624, 0xf40e3585, 0x106aa070,
  0x19a4c116, 0x1e376c08, 0x2748774c, 0x34b0bcb5, 0x391c0cb3, 0x4ed8aa4a,
  0x5b9cca4f, 0x682e6ff3, 0x748f82ee, 0x78a5636f, 0x84c87814, 0x8cc70208,
  0x90befffa, 0xa4506ceb, 0xbef9a3f7, 0xc67178f2,
]);

export function sha256(message: Uint8Array): Uint8Array {
  const h = new Uint32Array([
    0x6a09e667, 0xbb67ae85, 0x3c6ef372, 0xa54ff53a, 0x510e527f, 0x9b05688c,
    0x1f83d9ab, 0x5be0cd19,
  ]);
  const bitLen = message.length * 8;
  const padded = new Uint8Array(((message.length + 8) >> 6 << 6) + 64);
  padded.set(message);
  padded[message.length] = 0x80;
  new DataView(padded.buffer).setUint32(padded.length - 4, bitLen >>> 0);
  new DataView(padded.buffer).setUint32(
    padded.length - 8,
    Math.floor(bitLen / 0x100000000),
  );
  const w = new Uint32Array(64);
  const view = new DataView(padded.buffer);
  for (let off = 0; off < padded.length; off += 64) {
    for (let i = 0; i < 16; i++) w[i] = view.getUint32(off + 4 * i);
    for (let i = 16; i < 64; i++) {
      const s0 =
        ((w[i - 15] >>> 7) | (w[i - 15] << 25)) ^
        ((w[i - 15] >>> 18) | (w[i - 15] << 14)) ^
        (w[i - 15] >>> 3);
      const s1 =
        ((w[i - 2] >>> 17) | (w[i - 2] << 15)) ^
        ((w[i - 2] >>> 19) | (w[i - 2] << 13)) ^
        (w[i - 2] >>> 10);
      w[i] = (w[i - 16] + s0 + w[i - 7] + s1) >>> 0;
    }
    let [a, b, c, d, e, f, g, hh] = h;
    for (let i = 0; i < 64; i++) {
      const S1 =
        ((e >>> 6) | (e << 26)) ^ ((e >>> 11) | (e << 21)) ^
        ((e >>> 25) | (e << 7));
      const ch = (e & f) ^ (~e & g);
      const t1 = (hh + S1 + ch + SHA_K[i] + w[i]) >>> 0;
      const S0 =
        ((a >>> 2) | (a << 30)) ^ ((a >>> 13) | (a << 19)) ^
        ((a >>> 22) | (a << 10));
      const maj = (a & b) ^ (a & c) ^ (b & c);
      const t2 = (S0 + maj) >>> 0;
      hh = g; g = f; f = e; e = (d + t1) >>> 0;
      d = c; c = b; b = a; a = (t1 + t2) >>> 0;
    }
    h[0] = (h[0] + a) >>> 0; h[1] = (h[1] + b) >>> 0;
    h[2] = (h[2] + c) >>> 0; h[3] = (h[3] + d) >>> 0;
    h[4] = (h[4] + e) >>> 0; h[5] = (h[5] + f) >>> 0;
    h[6] = (h[6] + g) >>> 0; h[7] = (h[7] + hh) >>> 0;
  }
  const out = new Uint8Array(32);
  const outView = new DataView(out.buffer);
  for (let i = 0; i < 8; i++) outView.setUint32(4 * i, h[i]);
  return out;
}

export function hmacSha256(key: Uint8Array, message: Uint8Array): Uint8Array {
  let k = key.length > 64 ? sha256(key) : key;
  const ipad = new Uint8Array(64).fill(0x36);
  const opad = new Uint8Array(64).fill(0x5c);
  for (let i = 0; i < k.length; i++) {
    ipad[i] ^= k[i];
    opad[i] ^= k[i];
  }
  return sha256(concatBytes(opad, sha256(concatBytes(ipad, message))));
}

export function hkdfSha256(
  ikm: Uint8Array,
  info: Uint8Array,
  salt: Uint8Array = new Uint8Array(32),
  length = 32,
): Uint8Array {
  const prk = hmacSha256(salt, ikm);
  let out = new Uint8Array(0);
  let t = new Uint8Array(0);
  let counter = 1;
  while (out.length < length) {
    t = hmacSha256(prk, concatBytes(t, info, Uint8Array.of(counter)));
    out = concatBytes(out, t);
    counter += 1;
  }
  return out.slice(0, length);
}

// ---------------------------------------------------------------------------
// X25519 (RFC 7748) — bigint Montgomery ladder
// ---------------------------------------------------------------------------

const P25519 = (1n << 255n) - 19n;
const A24 = 121665n;

function mod(a: bigint): bigint {
  const r = a % P25519;
  return r < 0n ? r + P25519 : r;
}

function decodeScalar(k: Uint8Array): bigint {
  const a = Uint8Array.from(k);
  a[0] &= 248;
  a[31] &= 127;
  a[31] |= 64;
  let v = 0n;
  for (let i = 31; i >= 0; i--) v = (v << 8n) | BigInt(a[i]);
  return v;
}

function decodeU(u: Uint8Array): bigint {
  const a = Uint8Array.from(u);
  a[31] &= 127;
  let v = 0n;
  for (let i = 31; i >= 0; i--) v = (v << 8n) | BigInt(a[i]);
  return v;
}

/** Scalar multiplication; u defaults to the base point 9. */
export function x25519(k: Uint8Array, u?: Uint8Array): Uint8Array {
  const scalar = decodeScalar(k);
  const x1 = u !== undefined ? decodeU(u) : 9n;
  let x2 = 1n, z2 = 0n, x3 = x1, z3 = 1n;
  let swap = 0n;
  for (let t = 254; t >= 0; t--) {
    const kt = (scalar >> BigInt(t)) & 1n;
    swap ^= kt;
    if (swap) {
      [x2, x3] = [x3, x2];
      [z2, z3] = [z3, z2];
    }
    swap = kt;
    const a = mod(x2 + z2);
    const aa = mod(a * a);
    const b = mod(x2 - z2);
    const bb = mod(b * b);
    const e = mod(aa - bb);
    const c = mod(x3 + z3);
    const d = mod(x3 - z3);
    const da = mod(d * a);
    const cb = mod(c * b);
    x3 = mod((da + cb) * (da + cb));
    z3 = mod(x1 * mod((da - cb) * (da - cb)));
    x2 = mod(aa * bb);
    z2 = mod(e * (aa + A24 * e));
  }
  if (swap) {
    [x2, x3] = [x3, x2];
    [z2, z3] = [z3, z2];
  }
  // z2^(p-2) via square-and-multiply
  let inv = 1n, base = z2, exp = P25519 - 2n;
  while (exp > 0n) {
    if (exp & 1n) inv = mod(inv * base);
    base = mod(base * base);
    exp >>= 1n;
  }
  const result = mod(x2 * inv);
  const out = new Uint8Array(32);
  let v = result;
  for (let i = 0; i < 32; i++) {
    out[i] = Number(v & 0xffn);
    v >>= 8n;
  }
  return out;
}

export function generateX25519Keypair(): {
  secretKey: Uint8Array;
  publicKey: Uint8Array;
} {
  const secretKey = randomBytes(32);
  return { secretKey, publicKey: x25519(secretKey) };
}

export function x25519PublicKey(secretKey: Uint8Array): Uint8Array {
  return x25519(secretKey);
}

// ---------------------------------------------------------------------------
// ChaCha20-Poly1305 AEAD (RFC 8439)
// ---------------------------------------------------------------------------

function chachaBlock(
  key: Uint8Array,
  counter: number,
  nonce: Uint8Array,
): Uint8Array {
  const kv = new DataView(key.buffer, key.byteOffset);
  const nv = new DataView(nonce.buffer, nonce.byteOffset);
  const state = new Uint32Array(16);
  state[0] = 0x61707865; state[1] = 0x3320646e;
  state[2] = 0x79622d32; state[3] = 0x6b206574;
  for (let i = 0; i < 8; i++) state[4 + i] = kv.getUint32(4 * i, true);
  state[12] = counter >>> 0;
  for (let i = 0; i < 3; i++) state[13 + i] = nv.getUint32(4 * i, true);
  const w = Uint32Array.from(state);
  const qr = (a: number, b: number, c: number, d: number) => {
    w[a] = (w[a] + w[b]) >>> 0; w[d] ^= w[a]; w[d] = (w[d] << 16) | (w[d] >>> 16);
    w[c] = (w[c] + w[d]) >>> 0; w[b] ^= w[c]; w[b] = (w[b] << 12) | (w[b] >>> 20);
    w[a] = (w[a] + w[b]) >>> 0; w[d] ^= w[a]; w[d] = (w[d] << 8) | (w[d] >>> 24);
    w[c] = (w[c] + w[d]) >>> 0; w[b] ^= w[c]; w[b] = (w[b] << 7) | (w[b] >>> 25);
  };
  for (let i = 0; i < 10; i++) {
    qr(0, 4, 8, 12); qr(1, 5, 9, 13); qr(2, 6, 10, 14); qr(3, 7, 11, 15);
    qr(0, 5, 10, 15); qr(1, 6, 11, 12); qr(2, 7, 8, 13); qr(3, 4, 9, 14);
  }
  const out = new Uint8Array(64);
  const ov = new DataView(out.buffer);
  for (let i = 0; i < 16; i++) ov.setUint32(4 * i, (w[i] + state[i]) >>> 0, true);
  return out;
}

function chacha20Xor(
  key: Uint8Array,
  nonce: Uint8Array,
  data: Uint8Array,
  counter = 1,
): Uint8Array {
  const out = new Uint8Array(data.length);
  for (let i = 0; i < data.length; i += 64) {
    const block = chachaBlock(key, counter + i / 64, nonce);
    const n = Math.min(64, data.length - i);
    for (let j = 0; j < n; j++) out[i + j] = data[i + j] ^ block[j];
  }
  return out;
}

const POLY_P = (1n << 130n) - 5n;
const POLY_RMASK = 0x0ffffffc0ffffffc0ffffffc0fffffffn;

function poly1305(key32: Uint8Array, msg: Uint8Array): Uint8Array {
  let r = 0n, s = 0n;
  for (let i = 15; i >= 0; i--) r = (r << 8n) | BigInt(key32[i]);
  for (let i = 31; i >= 16; i--) s = (s << 8n) | BigInt(key32[i]);
  r &= POLY_RMASK;
  let acc = 0n;
  for (let i = 0; i < msg.length; i += 16) {
    const blockLen = Math.min(16, msg.length - i);
    let n = 1n << BigInt(8 * blockLen);
    for (let j = blockLen - 1; j >= 0; j--) n |= BigInt(msg[i + j]) << BigInt(8 * j);
    acc = ((acc + n) * r) % POLY_P;
  }
  const tagInt = (acc + s) & ((1n << 128n) - 1n);
  const out = new Uint8Array(16);
  let v = tagInt;
  for (let i = 0; i < 16; i++) {
    out[i] = Number(v & 0xffn);
    v >>= 8n;
  }
  return out;
}

function pad16(len: number): Uint8Array {
  return new Uint8Array((16 - (len % 16)) % 16);
}

function lenBytes(aadLen: number, ctLen: number): Uint8Array {
  const out = new Uint8Array(16);
  const view = new DataView(out.buffer);
  view.setBigUint64(0, BigInt(aadLen), true);
  view.setBigUint64(8, BigInt(ctLen), true);
  return out;
}

/** Returns ciphertext || 16-byte tag. */
export function chacha20poly1305Encrypt(
  key: Uint8Array,
  nonce: Uint8Array,
  plaintext: Uint8Array,
  aad: Uint8Array = new Uint8Array(0),
): Uint8Array {
  const otk = chachaBlock(key, 0, nonce).slice(0, 32);
  const ct = chacha20Xor(key, nonce, plaintext, 1);
  const macData = concatBytes(
    aad, pad16(aad.length), ct, pad16(ct.length), lenBytes(aad.length, ct.length),
  );
  return concatBytes(ct, poly1305(otk, macData));
}

/** Returns the plaintext or null on authentication failure. */
export function chacha20poly1305Decrypt(
  key: Uint8Array,
  nonce: Uint8Array,
  data: Uint8Array,
  aad: Uint8Array = new Uint8Array(0),
): Uint8Array | null {
  if (data.length < 16) return null;
  const ct = data.slice(0, -16);
  const tag = data.slice(-16);
  const otk = chachaBlock(key, 0, nonce).slice(0, 32);
  const macData = concatBytes(
    aad, pad16(aad.length), ct, pad16(ct.length), lenBytes(aad.length, ct.length),
  );
  const expect = poly1305(otk, macData);
  let diff = 0;
  for (let i = 0; i < 16; i++) diff |= expect[i] ^ tag[i];
  if (diff !== 0) return null;
  return chacha20Xor(key, nonce, ct, 1);
}

// ---------------------------------------------------------------------------
// Note encryption (zelana_tpu/sdk/privacy.py; sdk/privacy/src/encryption.rs)
// ---------------------------------------------------------------------------

const NOTE_HKDF_INFO = new TextEncoder().encode("zelana-note-v1");

/** ECIES blob: [eph_pk(32) | nonce(12) | ciphertext+tag]. */
export function encryptNote(
  note: Note,
  recipientX25519Pk: Uint8Array,
): Uint8Array {
  const { secretKey: ephSk, publicKey: ephPk } = generateX25519Keypair();
  const shared = x25519(ephSk, recipientX25519Pk);
  const key = hkdfSha256(shared, NOTE_HKDF_INFO);
  const nonce = randomBytes(12);
  const ct = chacha20poly1305Encrypt(
    key, nonce, new TextEncoder().encode(noteToJson(note)),
  );
  return concatBytes(ephPk, nonce, ct);
}

export function decryptNote(
  blob: Uint8Array,
  recipientX25519Sk: Uint8Array,
): Note | null {
  if (blob.length < 32 + 12 + 16) return null;
  const ephPk = blob.slice(0, 32);
  const nonce = blob.slice(32, 44);
  const ct = blob.slice(44);
  const shared = x25519(recipientX25519Sk, ephPk);
  const key = hkdfSha256(shared, NOTE_HKDF_INFO);
  const pt = chacha20poly1305Decrypt(key, nonce, ct);
  if (pt === null) return null;
  return noteFromJson(new TextDecoder().decode(pt));
}

// ---------------------------------------------------------------------------
// Encrypted tx blobs (zelana_tpu/sdk/txblob.py; sdk/txblob/src/crypto.rs)
// ---------------------------------------------------------------------------

const TX_HKDF_INFO = new TextEncoder().encode("zelana-tx-v1");

export interface TxBlob {
  ephemeralPk: Uint8Array; // 32
  nonce: Uint8Array; // 12
  ciphertext: Uint8Array; // includes tag
  senderHint: Uint8Array; // first 4 bytes of sender pubkey, optional
}

export function serializeTxBlob(blob: TxBlob): Uint8Array {
  return concatBytes(
    blob.ephemeralPk,
    blob.nonce,
    Uint8Array.of(blob.senderHint.length),
    blob.senderHint,
    blob.ciphertext,
  );
}

export function deserializeTxBlob(data: Uint8Array): TxBlob {
  if (data.length < 45) {
    throw new Error(
      `tx blob too short: ${data.length} bytes (need >= 45: 32B ephemeral ` +
        "pk + 12B nonce + 1B hint length)",
    );
  }
  const hintLen = data[44];
  // ciphertext carries a 16-byte Poly1305 tag at minimum
  if (data.length < 45 + hintLen + 16) {
    throw new Error(
      `tx blob truncated: ${data.length} bytes for hint length ${hintLen}`,
    );
  }
  return {
    ephemeralPk: data.slice(0, 32),
    nonce: data.slice(32, 44),
    senderHint: data.slice(45, 45 + hintLen),
    ciphertext: data.slice(45 + hintLen),
  };
}

export function encryptTx(
  txBytes: Uint8Array,
  sequencerPk: Uint8Array,
  senderHint: Uint8Array = new Uint8Array(0),
): TxBlob {
  const { secretKey: ephSk, publicKey: ephPk } = generateX25519Keypair();
  const key = hkdfSha256(x25519(ephSk, sequencerPk), TX_HKDF_INFO);
  const nonce = randomBytes(12);
  const ciphertext = chacha20poly1305Encrypt(key, nonce, txBytes, senderHint);
  return { ephemeralPk: ephPk, nonce, ciphertext, senderHint };
}

export function decryptTx(
  blob: TxBlob,
  sequencerSk: Uint8Array,
): Uint8Array | null {
  const key = hkdfSha256(x25519(sequencerSk, blob.ephemeralPk), TX_HKDF_INFO);
  return chacha20poly1305Decrypt(key, blob.nonce, blob.ciphertext, blob.senderHint);
}
