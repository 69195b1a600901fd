/**
 * Low-level HTTP API client (fetch-based).
 *
 * Route-for-route mirror of the TESTED Python ApiClient
 * (zelana_tpu/sdk/client.py:40-249) against the sequencer's HTTP surface
 * (zelana_tpu/sequencer/api.py; reference core/src/api/routes.rs and the
 * reference TS SDK's client.ts). Request/response field names are copied
 * from the live server's JSON; hex strings carry all byte fields.
 */

import type {
  AccountState,
  BatchProofResult,
  BatchRecord,
  CommitteeInfo,
  FastWithdrawQuote,
  MerklePath,
  NoteScan,
  PipelineStats,
  StateRoots,
  SubmitResult,
  TxRecord,
} from "./types";

export class ApiError extends Error {
  constructor(
    public status: number,
    message: string,
  ) {
    super(`HTTP ${status}: ${message}`);
  }
}

export const toHex = (b: Uint8Array): string =>
  Array.from(b, (x) => x.toString(16).padStart(2, "0")).join("");

export const fromHex = (s: string): Uint8Array => {
  const out = new Uint8Array(s.length / 2);
  for (let i = 0; i < out.length; i++)
    out[i] = parseInt(s.slice(2 * i, 2 * i + 2), 16);
  return out;
};

export class ApiClient {
  constructor(
    public baseUrl: string,
    public timeoutMs: number = 10_000,
  ) {
    this.baseUrl = baseUrl.replace(/\/$/, "");
  }

  private async request<T>(
    method: string,
    path: string,
    body?: unknown,
  ): Promise<T> {
    const res = await fetch(this.baseUrl + path, {
      method,
      headers:
        body !== undefined ? { "Content-Type": "application/json" } : {},
      body: body !== undefined ? JSON.stringify(body) : undefined,
      signal: AbortSignal.timeout(this.timeoutMs),
    });
    const text = await res.text();
    if (!res.ok) {
      let message = text;
      try {
        message = (JSON.parse(text) as { error?: string }).error ?? text;
      } catch {
        /* plain-text error */
      }
      throw new ApiError(res.status, message);
    }
    return JSON.parse(text) as T;
  }

  get<T>(path: string): Promise<T> {
    return this.request<T>("GET", path);
  }

  post<T>(path: string, body: unknown): Promise<T> {
    return this.request<T>("POST", path, body);
  }

  // -- status ------------------------------------------------------------

  health(): Promise<{ status: string }> {
    return this.get("/health");
  }

  getStateRoots(): Promise<StateRoots> {
    return this.get("/status/roots");
  }

  getBatchStatus(): Promise<Record<string, unknown>> {
    return this.get("/status/batch");
  }

  getStats(): Promise<PipelineStats> {
    return this.get("/status/stats");
  }

  // -- accounts ----------------------------------------------------------

  getAccount(pubkey: Uint8Array): Promise<AccountState> {
    return this.post("/account", { account_id: toHex(pubkey) });
  }

  // -- transparent txs ---------------------------------------------------

  submitTransfer(
    from: Uint8Array,
    to: Uint8Array,
    amount: number,
    nonce: number,
    signature: Uint8Array,
  ): Promise<SubmitResult> {
    return this.post("/transfer", {
      from: toHex(from),
      to: toHex(to),
      amount,
      nonce,
      signature: toHex(signature),
    });
  }

  submitWithdrawal(
    from: Uint8Array,
    toL1Address: Uint8Array,
    amount: number,
    nonce: number,
    signature: Uint8Array,
  ): Promise<SubmitResult> {
    return this.post("/withdraw", {
      from: toHex(from),
      to_l1_address: toHex(toL1Address),
      amount,
      nonce,
      signature: toHex(signature),
    });
  }

  getWithdrawalStatus(txHash: string): Promise<Record<string, unknown>> {
    return this.post("/withdraw/status", { tx_hash: txHash });
  }

  getFastWithdrawQuote(amount: number): Promise<FastWithdrawQuote> {
    return this.post("/withdraw/fast/quote", { amount });
  }

  fastWithdraw(
    from: Uint8Array,
    toL1Address: Uint8Array,
    amount: number,
    nonce: number,
    signature: Uint8Array,
  ): Promise<SubmitResult & { received?: number }> {
    return this.post("/withdraw/fast/execute", {
      from: toHex(from),
      to_l1_address: toHex(toL1Address),
      amount,
      nonce,
      signature: toHex(signature),
    });
  }

  // -- shielded ----------------------------------------------------------

  submitShielded(
    nullifier: Uint8Array,
    commitment: Uint8Array,
    proof: Uint8Array = new Uint8Array(),
    ciphertext: Uint8Array = new Uint8Array(),
    merkleRoot: Uint8Array = new Uint8Array(),
    delegated = false,
  ): Promise<SubmitResult> {
    return this.post(delegated ? "/shielded/delegated" : "/shielded/submit", {
      nullifier: toHex(nullifier),
      commitment: toHex(commitment),
      proof: toHex(proof),
      ciphertext: toHex(ciphertext),
      merkle_root: toHex(merkleRoot),
    });
  }

  getMerklePath(position: number): Promise<MerklePath> {
    return this.post("/shielded/merkle_path", { position });
  }

  scanNotes(fromPosition = 0, limit = 1000): Promise<NoteScan> {
    return this.post("/shielded/scan", {
      from_position: fromPosition,
      limit,
    });
  }

  async getShieldedRoot(): Promise<Uint8Array> {
    const res = await this.get<{ root: string }>("/shielded/root");
    return fromHex(res.root);
  }

  // -- encrypted mempool -------------------------------------------------

  getCommittee(): Promise<CommitteeInfo> {
    return this.get("/encrypted/committee");
  }

  /** encryptedShares: committee member index -> hex-encoded share blob */
  submitEncrypted(
    txId: Uint8Array,
    ciphertext: Uint8Array,
    encryptedShares: Record<string, string>,
  ): Promise<SubmitResult> {
    return this.post("/encrypted/submit", {
      tx_id: toHex(txId),
      ciphertext: toHex(ciphertext),
      encrypted_shares: encryptedShares,
    });
  }

  // -- batch / tx queries ------------------------------------------------

  async getBatch(batchId: number): Promise<BatchRecord | null> {
    try {
      return await this.post("/batch", { batch_id: batchId });
    } catch (e) {
      if (e instanceof ApiError && e.status === 404) return null;
      throw e;
    }
  }

  async listBatches(limit = 100): Promise<BatchRecord[]> {
    const res = await this.post<{ batches: BatchRecord[] }>("/batches", {
      limit,
    });
    return res.batches;
  }

  async getTransaction(txHash: string): Promise<TxRecord | null> {
    try {
      return await this.post("/tx", { tx_hash: txHash });
    } catch (e) {
      if (e instanceof ApiError && e.status === 404) return null;
      throw e;
    }
  }

  async listTransactions(limit = 100): Promise<TxRecord[]> {
    const res = await this.post<{ txs: TxRecord[] }>("/txs", { limit });
    return res.txs;
  }

  // -- dev mode ----------------------------------------------------------

  devDeposit(to: Uint8Array, amount: number, l1Seq = 0): Promise<SubmitResult> {
    return this.post("/dev/deposit", {
      to: toHex(to),
      amount,
      l1_seq: l1Seq,
    });
  }

  devSeal(): Promise<{ sealed: number | null }> {
    return this.post("/dev/seal", {});
  }

  // -- distributed prover job API (core_api.rs / noir_client.rs shapes) --

  async proveBatch(request: Record<string, unknown> = {}): Promise<string> {
    const res = await this.post<{ job_id: string }>(
      "/v2/batch/prove",
      request,
    );
    return res.job_id;
  }

  async proveStatus(jobId: string): Promise<string> {
    const res = await this.get<{ status: string }>(
      `/v2/batch/${jobId}/status`,
    );
    return res.status;
  }

  /** SSE status stream: resolves on the first terminal status event. */
  async streamStatus(jobId: string, timeoutMs = 300_000): Promise<string> {
    const res = await fetch(
      `${this.baseUrl}/v2/batch/${jobId}/status?stream=1`,
      {
        headers: { Accept: "text/event-stream" },
        signal: AbortSignal.timeout(timeoutMs),
      },
    );
    const reader = res.body!.getReader();
    const decoder = new TextDecoder();
    let buf = "";
    for (;;) {
      const { value, done } = await reader.read();
      if (done) break;
      buf += decoder.decode(value, { stream: true });
      const blocks = buf.split("\n\n");
      buf = blocks.pop() ?? "";
      for (const block of blocks) {
        const data = block
          .split("\n")
          .find((l) => l.startsWith("data:"))
          ?.slice(5)
          .trim();
        if (!data) continue;
        const status = (JSON.parse(data) as { status: string }).status;
        if (
          status === "done" ||
          status === "unknown" ||
          status.startsWith("failed")
        )
          return status;
      }
    }
    throw new Error("status stream ended without a terminal event");
  }

  fetchProof(jobId: string): Promise<BatchProofResult> {
    return this.get(`/v2/batch/${jobId}/proof`);
  }

  async waitForProof(
    jobId: string,
    timeoutMs = 300_000,
  ): Promise<BatchProofResult> {
    const status = await this.streamStatus(jobId, timeoutMs);
    if (status !== "done") throw new Error(`prove job ${jobId}: ${status}`);
    return this.fetchProof(jobId);
  }

  /** settler.rs:543 is_noir_proof autodetect: 388-byte sunspot vs 256-byte groth16 */
  static detectProofFormat(proofBytes: Uint8Array): "sunspot" | "groth16" {
    return proofBytes.length === 388 ? "sunspot" : "groth16";
  }
}
