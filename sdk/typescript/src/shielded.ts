/**
 * Client-side shielded-note primitives.
 *
 * Mirror of the TESTED Python modules `zelana_tpu/sdk/ownership.py` (MiMC
 * ownership chain; reference sdk/ownership-prover/src/lib.rs:48-108) and
 * `zelana_tpu/sdk/privacy.py` (BLS12-381 Poseidon note commitments;
 * reference sdk/privacy/src/{commitment,nullifier}.rs). The reference's own
 * TS shielded.ts uses an unrelated sha512 scheme that no circuit or
 * sequencer path verifies — this mirror intentionally computes the hashes
 * the sequencer actually checks (delegated flow, zelana_tpu/sequencer/
 * api.py /shielded/delegated).
 *
 * All field elements travel as 32-byte little-endian (lib.rs:36-43);
 * bigint in memory.
 */

import {
  ALPHA,
  ARK,
  BLS12_381_FR,
  CAPACITY,
  FULL_ROUNDS,
  MDS,
  PARTIAL_ROUNDS,
  RATE,
} from "./poseidonConstants";
import {
  bigintToLeBytes32,
  bytesToHex,
  hexToBytes,
  leBytesToBigint,
  randomBytes,
} from "./utils";

// ---------------------------------------------------------------------------
// MiMC-91 sponge over BN254 Fr (zelana_tpu/hashes/mimc.py; reference
// account_tree.rs:46-125, zelana_lib/poseidon.nr)
// ---------------------------------------------------------------------------

export const BN254_FR =
  0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000001n;

const MIMC_ROUNDS = 91;

export const DELEGATE_DOMAIN = 0x44454c45n; // "DELE"
export const PK_DOMAIN = 0x504bn; // "PK"
export const NULLIFIER_DOMAIN = 3n;

const ROUND_CONSTANTS: bigint[] = (() => {
  const out: bigint[] = [];
  for (let i = 1n; i <= BigInt(MIMC_ROUNDS); i++) {
    out.push((i * i * i + i) % BN254_FR);
  }
  return out;
})();

function pow7(x: bigint, p: bigint): bigint {
  const x2 = (x * x) % p;
  const x4 = (x2 * x2) % p;
  return (((x4 * x2) % p) * x) % p;
}

export function mimcPermute(x: bigint, k: bigint = 0n): bigint {
  let state = ((x % BN254_FR) + BN254_FR) % BN254_FR;
  for (const c of ROUND_CONSTANTS) {
    state = pow7((state + k + c) % BN254_FR, BN254_FR);
  }
  return (state + k) % BN254_FR;
}

export function mimcSponge(inputs: bigint[]): bigint {
  let state = 0n;
  for (const inp of inputs) {
    state = mimcPermute((state + (inp % BN254_FR)) % BN254_FR);
  }
  return state;
}

/** hash with numeric-arity domain separator: sponge([n, v_1..v_n]). */
export function mimcHash(...values: bigint[]): bigint {
  return mimcSponge([BigInt(values.length), ...values]);
}

// -- ownership chain (sdk/ownership-prover/src/lib.rs:48-108) --------------

export function derivePublicKey(spendingKey: bigint): bigint {
  return mimcHash(PK_DOMAIN, spendingKey, 0n);
}

export function computeCommitment(
  ownerPk: bigint,
  value: bigint,
  blinding: bigint,
): bigint {
  return mimcHash(ownerPk, value, blinding);
}

export function computeNullifier(
  spendingKey: bigint,
  commitment: bigint,
  position: bigint,
): bigint {
  return mimcHash(NULLIFIER_DOMAIN, spendingKey, commitment, position);
}

export function computeBlindedProxy(
  commitment: bigint,
  position: bigint,
): bigint {
  return mimcHash(DELEGATE_DOMAIN, commitment, position);
}

export function computeAccountLeaf(
  pubkey: bigint,
  balance: bigint,
  nonce: bigint,
): bigint {
  // mimc_sponge([4, 1, pubkey, balance, nonce]); 1 = account domain
  return mimcSponge([4n, 1n, pubkey, balance, nonce]);
}

// ---------------------------------------------------------------------------
// Poseidon sponge over BLS12-381 Fr (zelana_tpu/hashes/poseidon.py;
// arkworks PoseidonSponge duplex semantics, capacity-first layout)
// ---------------------------------------------------------------------------

function powMod(base: bigint, exp: bigint, p: bigint): bigint {
  let result = 1n;
  base %= p;
  while (exp > 0n) {
    if (exp & 1n) result = (result * base) % p;
    base = (base * base) % p;
    exp >>= 1n;
  }
  return result;
}

const WIDTH = RATE + CAPACITY;

export function poseidonPermute(state: bigint[]): bigint[] {
  const p = BLS12_381_FR;
  const halfFull = FULL_ROUNDS / 2;
  const total = FULL_ROUNDS + PARTIAL_ROUNDS;
  let s = state.map((v) => v % p);
  for (let rnd = 0; rnd < total; rnd++) {
    const isFull = rnd < halfFull || rnd >= halfFull + PARTIAL_ROUNDS;
    const arkRow = ARK[rnd];
    s = s.map((v, i) => (v + arkRow[i]) % p);
    if (isFull) {
      s = s.map((v) => powMod(v, ALPHA, p));
    } else {
      s[0] = powMod(s[0], ALPHA, p);
    }
    const next: bigint[] = new Array(WIDTH).fill(0n);
    for (let i = 0; i < WIDTH; i++) {
      let acc = 0n;
      for (let j = 0; j < WIDTH; j++) acc += MDS[i][j] * s[j];
      next[i] = acc % p;
    }
    s = next;
  }
  return s;
}

export function poseidonHash(inputs: bigint[]): bigint {
  // absorb(inputs); squeeze(1) with arkworks duplex semantics. Inputs
  // always fit the absorb loop below (rate 2, capacity-first layout).
  const p = BLS12_381_FR;
  let state: bigint[] = new Array(WIDTH).fill(0n);
  let idx = 0;
  for (const e of inputs.map((v) => ((v % p) + p) % p)) {
    if (idx === RATE) {
      state = poseidonPermute(state);
      idx = 0;
    }
    state[CAPACITY + idx] = (state[CAPACITY + idx] + e) % p;
    idx += 1;
  }
  state = poseidonPermute(state); // absorb -> squeeze transition
  return state[CAPACITY];
}

// ---------------------------------------------------------------------------
// Note stack (zelana_tpu/sdk/privacy.py; sdk/privacy/src/*.rs)
// ---------------------------------------------------------------------------

export const NULL_DOMAIN = 0x4e554c4cn; // "NULL"

export interface Note {
  value: bigint;
  /** 32-byte blinding factor */
  randomness: Uint8Array;
  /** 32-byte owner public key */
  ownerPk: Uint8Array;
}

export interface ShieldedKeys {
  /** MiMC spending key (BN254 Fr) */
  spendingKey: bigint;
  /** MiMC public key = hash_3(PK_DOMAIN, sk, 0) */
  publicKey: bigint;
}

export function generateShieldedKeys(): ShieldedKeys {
  const sk = leBytesToBigint(randomBytes(32)) % BN254_FR;
  return { spendingKey: sk, publicKey: derivePublicKey(sk) };
}

export function shieldedKeysFromSpendingKey(sk: bigint): ShieldedKeys {
  return { spendingKey: sk, publicKey: derivePublicKey(sk) };
}

function fle(b: Uint8Array): bigint {
  return leBytesToBigint(b) % BLS12_381_FR;
}

export function createNote(value: bigint, ownerPk: Uint8Array): Note {
  return { value, randomness: randomBytes(32), ownerPk };
}

/** Poseidon(value, randomness, owner_pk) over BLS12-381 Fr, 32B LE. */
export function noteCommitment(note: Note): Uint8Array {
  const h = poseidonHash([note.value, fle(note.randomness), fle(note.ownerPk)]);
  return bigintToLeBytes32(h);
}

/** Poseidon("NULL", key, commitment, position), 32B LE. */
export function noteNullifier(
  spendingKey: Uint8Array,
  commitment: Uint8Array,
  position: bigint,
): Uint8Array {
  const h = poseidonHash([
    NULL_DOMAIN,
    fle(spendingKey),
    fle(commitment),
    position,
  ]);
  return bigintToLeBytes32(h);
}

export function noteToJson(note: Note): string {
  // value ships as a decimal string: JSON numbers are float64 in JS, so
  // u64 lamport-scale values (>= 2^53) would silently round through
  // Number() and break commitment recomputation against the Python SDK
  return JSON.stringify({
    value: note.value.toString(),
    randomness: bytesToHex(note.randomness),
    owner_pk: bytesToHex(note.ownerPk),
  });
}

export function noteFromJson(s: string): Note {
  const d = JSON.parse(s) as {
    value: number | string;
    randomness: string;
    owner_pk: string;
  };
  let value: bigint;
  if (typeof d.value === "string") {
    value = BigInt(d.value);
  } else {
    // bare JSON number (the Python SDK emits full-precision integers):
    // JSON.parse already rounded it to float64, so recover the raw
    // digit token from the source text before converting
    const m = /"value"\s*:\s*(\d+)/.exec(s);
    value = m ? BigInt(m[1]) : BigInt(d.value);
  }
  return {
    value,
    randomness: hexToBytes(d.randomness),
    ownerPk: hexToBytes(d.owner_pk),
  };
}
