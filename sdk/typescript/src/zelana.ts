/**
 * Keypair-aware convenience client.
 *
 * Mirror of the reference TS SDK's ZelanaClient (sdk/typescript/zelana.ts)
 * and the tested Python twin (zelana_tpu/sdk/client.py:251+): signs
 * transfers/withdrawals over the canonical signing messages
 * (zelana_tpu/sequencer/transactions.py -- "zelana:transfer:v1\n" /
 * "zelana:withdraw:v1\n" prefixed, little-endian u64 amount+nonce),
 * auto-fills nonces from account state with the pending nonce winning,
 * and offers wait-for pollers.
 *
 * Ed25519 signing uses WebCrypto (Node >= 19 / modern browsers).
 */

import { ApiClient, toHex } from "./client";
import type { AccountState, SubmitResult } from "./types";

const textEncoder = new TextEncoder();

function u64le(v: number): Uint8Array {
  const out = new Uint8Array(8);
  new DataView(out.buffer).setBigUint64(0, BigInt(v), true);
  return out;
}

function concat(...parts: Uint8Array[]): Uint8Array {
  const out = new Uint8Array(parts.reduce((a, p) => a + p.length, 0));
  let off = 0;
  for (const p of parts) {
    out.set(p, off);
    off += p.length;
  }
  return out;
}

export function transferSigningMessage(
  from: Uint8Array,
  to: Uint8Array,
  amount: number,
  nonce: number,
): Uint8Array {
  return concat(
    textEncoder.encode("zelana:transfer:v1\n"),
    from,
    to,
    u64le(amount),
    u64le(nonce),
  );
}

export function withdrawSigningMessage(
  from: Uint8Array,
  toL1Address: Uint8Array,
  amount: number,
  nonce: number,
): Uint8Array {
  return concat(
    textEncoder.encode("zelana:withdraw:v1\n"),
    from,
    toL1Address,
    u64le(amount),
    u64le(nonce),
  );
}

export interface Signer {
  /** 32-byte Ed25519 public key (the L2 account id) */
  pubkey: Uint8Array;
  sign(message: Uint8Array): Promise<Uint8Array>;
}

/** WebCrypto-backed Ed25519 signer from a PKCS8 private key. */
export async function signerFromPkcs8(pkcs8: Uint8Array): Promise<Signer> {
  const key = await crypto.subtle.importKey("pkcs8", pkcs8, "Ed25519", true, [
    "sign",
  ]);
  const jwk = await crypto.subtle.exportKey("jwk", key);
  const pub = Uint8Array.from(atob(jwk.x!.replace(/-/g, "+").replace(/_/g, "/")),
    (c) => c.charCodeAt(0));
  return {
    pubkey: pub,
    sign: async (message) =>
      new Uint8Array(await crypto.subtle.sign("Ed25519", key, message)),
  };
}

export class ZelanaClient {
  readonly api: ApiClient;

  constructor(
    baseUrl: string,
    public signer?: Signer,
    timeoutMs = 10_000,
  ) {
    this.api = new ApiClient(baseUrl, timeoutMs);
  }

  // -- status ------------------------------------------------------------

  async isHealthy(): Promise<boolean> {
    try {
      return (await this.api.health()).status === "ok";
    } catch {
      return false;
    }
  }

  // -- account -----------------------------------------------------------

  get pubkey(): Uint8Array {
    if (!this.signer) throw new Error("client has no signer");
    return this.signer.pubkey;
  }

  getAccount(): Promise<AccountState> {
    return this.api.getAccount(this.pubkey);
  }

  async getBalance(): Promise<number> {
    return (await this.getAccount()).balance;
  }

  /** Next usable nonce: the pending nonce if a tx is in flight. */
  async getNonce(): Promise<number> {
    const acct = await this.getAccount();
    return acct.pending_nonce ?? acct.nonce;
  }

  // -- transfers ---------------------------------------------------------

  async transfer(
    to: Uint8Array,
    amount: number,
    nonce?: number,
  ): Promise<SubmitResult> {
    const n = nonce ?? (await this.getNonce());
    const sig = await this.signer!.sign(
      transferSigningMessage(this.pubkey, to, amount, n),
    );
    return this.api.submitTransfer(this.pubkey, to, amount, n, sig);
  }

  async transferAll(to: Uint8Array): Promise<SubmitResult> {
    return this.transfer(to, await this.getBalance());
  }

  async withdraw(
    toL1Address: Uint8Array,
    amount: number,
    nonce?: number,
  ): Promise<SubmitResult> {
    const n = nonce ?? (await this.getNonce());
    const sig = await this.signer!.sign(
      withdrawSigningMessage(this.pubkey, toL1Address, amount, n),
    );
    return this.api.submitWithdrawal(this.pubkey, toL1Address, amount, n, sig);
  }

  async fastWithdraw(
    toL1Address: Uint8Array,
    amount: number,
    nonce?: number,
  ): Promise<SubmitResult & { received?: number }> {
    const n = nonce ?? (await this.getNonce());
    const sig = await this.signer!.sign(
      withdrawSigningMessage(this.pubkey, toL1Address, amount, n),
    );
    return this.api.fastWithdraw(this.pubkey, toL1Address, amount, n, sig);
  }

  // -- pollers -----------------------------------------------------------

  async waitForFinalized(txHash: string, timeoutMs = 30_000): Promise<void> {
    const deadline = Date.now() + timeoutMs;
    while (Date.now() < deadline) {
      const tx = await this.api.getTransaction(txHash);
      if (tx?.status === "finalized") return;
      await new Promise((r) => setTimeout(r, 200));
    }
    throw new Error(`tx ${txHash} not finalized within ${timeoutMs} ms`);
  }

  async waitForBalance(min: number, timeoutMs = 30_000): Promise<number> {
    const deadline = Date.now() + timeoutMs;
    for (;;) {
      const balance = await this.getBalance();
      if (balance >= min) return balance;
      if (Date.now() >= deadline)
        throw new Error(`balance ${balance} < ${min} after ${timeoutMs} ms`);
      await new Promise((r) => setTimeout(r, 200));
    }
  }
}

export { toHex };
