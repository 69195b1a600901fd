/**
 * Ownership-proof client glue.
 *
 * Mirror of the reference's prover.ts capability surface
 * (/root/reference/sdk/typescript/src/prover.ts: witness computation +
 * proof generation + DelegatedShieldedRequest), mapped onto this repo's
 * architecture: witness computation is local TS MiMC (shielded.ts — the
 * exact hashes the sequencer checks), and proof generation goes to the
 * sequencer's synchronous delegated-proving endpoint
 * `POST /v2/ownership/prove` (zelana_tpu/sequencer/api.py:222-239,
 * zelana_tpu/runtime/ownership_api.py; reference
 * forge/crates/prover-coordinator/src/ownership_api.rs:1-45). The
 * reference's in-browser WASM UltraHonk prover is replaced by this
 * server-side Groth16 path — same relation, TPU-side compute.
 */

import {
  computeBlindedProxy,
  computeCommitment,
  computeNullifier,
  derivePublicKey,
} from "./shielded";

export interface OwnershipWitness {
  spendingKey: bigint;
  value: bigint;
  blinding: bigint;
  position: bigint;
  /** derived public values */
  publicKey: bigint;
  commitment: bigint;
  nullifier: bigint;
  blindedProxy: bigint;
}

/** Local witness computation (sdk/ownership-prover wasm_generate_witness
 * mirror: derive pk -> commitment -> nullifier -> blinded proxy). */
export function computeOwnershipWitness(
  spendingKey: bigint,
  value: bigint,
  blinding: bigint,
  position: bigint,
): OwnershipWitness {
  const publicKey = derivePublicKey(spendingKey);
  const commitment = computeCommitment(publicKey, value, blinding);
  const nullifier = computeNullifier(spendingKey, commitment, position);
  const blindedProxy = computeBlindedProxy(commitment, position);
  return {
    spendingKey, value, blinding, position,
    publicKey, commitment, nullifier, blindedProxy,
  };
}

export interface OwnershipProof {
  /** sunspot-shaped proof bytes, hex (388 bytes) */
  proof: string;
  /** public inputs as decimal strings [commitment, nullifier, proxy] */
  publicInputs: string[];
}

export interface DelegatedShieldedRequest {
  nullifier: string;
  commitment: string;
  proof: string;
  ciphertext: string;
  merkle_root: string;
  ownership_public_inputs: string[];
}

export class OwnershipProver {
  constructor(
    public baseUrl: string,
    public timeoutMs = 120_000,
  ) {
    this.baseUrl = baseUrl.replace(/\/$/, "");
  }

  /** Server-side delegated prove: ships the private witness plus the
   * locally computed public values; the server recomputes and REJECTS
   * mismatches before proving (ownership_api.py:43-60). */
  async prove(witness: OwnershipWitness): Promise<OwnershipProof> {
    const res = await fetch(this.baseUrl + "/v2/ownership/prove", {
      method: "POST",
      headers: { "Content-Type": "application/json" },
      body: JSON.stringify({
        spending_key: witness.spendingKey.toString(),
        value: witness.value.toString(),
        blinding: witness.blinding.toString(),
        position: witness.position.toString(),
        commitment: witness.commitment.toString(),
        nullifier: witness.nullifier.toString(),
        blinded_proxy: witness.blindedProxy.toString(),
      }),
      signal: AbortSignal.timeout(this.timeoutMs),
    });
    const body = (await res.json()) as {
      proof?: string;
      public_inputs?: (string | number)[];
      error?: string;
    };
    if (!res.ok) throw new Error(body.error ?? `HTTP ${res.status}`);
    return {
      proof: body.proof ?? "",
      publicInputs: (body.public_inputs ?? []).map(String),
    };
  }

  /** Full delegated-shielded payload for POST /shielded/delegated. */
  async buildDelegatedRequest(
    witness: OwnershipWitness,
    ciphertextHex = "",
    merkleRootHex = "",
  ): Promise<DelegatedShieldedRequest> {
    const proof = await this.prove(witness);
    const hex32 = (v: bigint) => {
      // 32-byte little-endian hex (client-edge convention, lib.rs:36-43)
      let s = "";
      let x = v;
      for (let i = 0; i < 32; i++) {
        s += (x & 0xffn).toString(16).padStart(2, "0");
        x >>= 8n;
      }
      return s;
    };
    return {
      nullifier: hex32(witness.nullifier),
      commitment: hex32(witness.commitment),
      proof: proof.proof,
      ciphertext: ciphertextHex,
      merkle_root: merkleRootHex,
      ownership_public_inputs: proof.publicInputs,
    };
  }
}

/** Offline witness-only "prover" for tests and dev flows without a
 * sequencer (reference MockOwnershipProver analogue). */
export class MockOwnershipProver {
  async prove(witness: OwnershipWitness): Promise<OwnershipProof> {
    return {
      proof: "00".repeat(388),
      publicInputs: [
        witness.commitment.toString(),
        witness.nullifier.toString(),
        witness.blindedProxy.toString(),
      ],
    };
  }
}
