/**
 * Dual-key wallet: Ed25519 signing + X25519 privacy key.
 *
 * Mirror of the TESTED Python `zelana_tpu/sdk/keypair.py` (reference
 * sdk/keypair/src/lib.rs:17-40): one wallet holds an Ed25519 signing key
 * (transparent transfers, the L2 account id) and an X25519 privacy key
 * (note encryption, Zephyr sessions), plus the human-readable signed
 * message framing ("Zelana <kind>\nkey: value" lines, keys sorted).
 *
 * Ed25519 uses WebCrypto (Node >= 19 / modern browsers); seeds import via
 * a PKCS8 wrapper so raw 32-byte seeds interoperate with the Python SDK.
 */

import { sha256, x25519 } from "./encryption";
import { bytesToBase58, concatBytes, randomBytes } from "./utils";

const textEncoder = new TextEncoder();

// PKCS8 prefix for a raw Ed25519 seed (RFC 8410 structure):
// SEQUENCE { INTEGER 0, SEQUENCE { OID 1.3.101.112 }, OCTET STRING {
//   OCTET STRING seed } }
const ED25519_PKCS8_PREFIX = Uint8Array.from([
  0x30, 0x2e, 0x02, 0x01, 0x00, 0x30, 0x05, 0x06, 0x03, 0x2b, 0x65, 0x70,
  0x04, 0x22, 0x04, 0x20,
]);

export function ed25519SeedToPkcs8(seed: Uint8Array): Uint8Array {
  if (seed.length !== 32) throw new Error("ed25519 seed must be 32 bytes");
  return concatBytes(ED25519_PKCS8_PREFIX, seed);
}

async function importSigningKey(seed: Uint8Array): Promise<CryptoKey> {
  return crypto.subtle.importKey(
    "pkcs8", ed25519SeedToPkcs8(seed), "Ed25519", true, ["sign"],
  );
}

async function publicKeyOf(key: CryptoKey): Promise<Uint8Array> {
  const jwk = await crypto.subtle.exportKey("jwk", key);
  const b64 = jwk.x!.replace(/-/g, "+").replace(/_/g, "/");
  return Uint8Array.from(atob(b64), (c) => c.charCodeAt(0));
}

export interface SignerLike {
  pubkey: Uint8Array;
  sign(message: Uint8Array): Promise<Uint8Array>;
}

export class ZelanaKeypair implements SignerLike {
  private constructor(
    readonly signingSeed: Uint8Array,
    readonly privacySk: Uint8Array,
    private signingKey: CryptoKey,
    readonly pubkey: Uint8Array,
  ) {}

  /** 32-byte X25519 public key for note encryption. */
  get privacyPk(): Uint8Array {
    return x25519(this.privacySk);
  }

  static async generate(): Promise<ZelanaKeypair> {
    return ZelanaKeypair.fromParts(randomBytes(32), randomBytes(32));
  }

  /** Deterministic dual keys from one seed (sha512 split, keypair.py). */
  static async fromSeed(seed: Uint8Array): Promise<ZelanaKeypair> {
    const h = new Uint8Array(
      await crypto.subtle.digest("SHA-512", seed as BufferSource),
    );
    return ZelanaKeypair.fromParts(h.slice(0, 32), h.slice(32, 64));
  }

  static async fromParts(
    signingSeed: Uint8Array,
    privacySk: Uint8Array,
  ): Promise<ZelanaKeypair> {
    const key = await importSigningKey(signingSeed);
    const pub = await publicKeyOf(key);
    return new ZelanaKeypair(signingSeed, privacySk, key, pub);
  }

  async sign(message: Uint8Array): Promise<Uint8Array> {
    return new Uint8Array(
      await crypto.subtle.sign("Ed25519", this.signingKey, message as BufferSource),
    );
  }

  // -- human-readable signed message framing (keypair.py frame_message) ---

  static frameMessage(kind: string, fields: Record<string, unknown>): Uint8Array {
    const lines = [`Zelana ${kind}`];
    for (const key of Object.keys(fields).sort()) {
      lines.push(`${key}: ${fields[key]}`);
    }
    return textEncoder.encode(lines.join("\n"));
  }

  async signMessage(
    kind: string,
    fields: Record<string, unknown>,
  ): Promise<Uint8Array> {
    return this.sign(ZelanaKeypair.frameMessage(kind, fields));
  }
}

export async function verifyEd25519(
  pubkey: Uint8Array,
  message: Uint8Array,
  signature: Uint8Array,
): Promise<boolean> {
  const key = await crypto.subtle.importKey(
    "raw", pubkey as BufferSource, "Ed25519", true, ["verify"],
  );
  return crypto.subtle.verify(
    "Ed25519", key, signature as BufferSource, message as BufferSource,
  );
}

export class PublicKey {
  constructor(readonly bytes: Uint8Array) {
    if (bytes.length !== 32) throw new Error("public key must be 32 bytes");
  }

  toBase58(): string {
    return bytesToBase58(this.bytes);
  }

  /** Short display form ("abcd..wxyz"). */
  toShortString(): string {
    const b58 = this.toBase58();
    return `${b58.slice(0, 4)}..${b58.slice(-4)}`;
  }

  equals(other: PublicKey): boolean {
    return this.bytes.every((b, i) => b === other.bytes[i]);
  }

  /** Content-address checksum (sha256 first 4 bytes) for UI display. */
  checksum(): Uint8Array {
    return sha256(this.bytes).slice(0, 4);
  }
}
