/**
 * Wire types of the zelana-tpu sequencer HTTP API.
 *
 * Mirrors the reference TS SDK's types.ts and the Python client's
 * dataclasses (zelana_tpu/sdk/client.py); field names match the JSON the
 * server emits (zelana_tpu/sequencer/api.py routes). The Python client is
 * the TESTED surface (tests/test_client_sdk.py drives a live server);
 * this package is its typed browser/Node mirror.
 */

export interface AccountState {
  balance: number;
  nonce: number;
  /** in-flight view from the accumulating batch, when it differs */
  pending_balance?: number;
  pending_nonce?: number;
}

export interface StateRoots {
  state_root: string;
  shielded_root: string;
  withdrawal_root?: string;
}

export interface PipelineStats {
  submitted: number;
  batches_proved: number;
  batches_settled: number;
  proving_time_ms_total: number;
  paused: boolean;
}

export interface SubmitResult {
  accepted: boolean;
  tx_hash?: string;
  error?: string;
}

export interface BatchRecord {
  id: number;
  state: string;
  txs: number;
  transfers: number;
  withdrawals: number;
  shielded: number;
  signature?: string;
}

export interface TxRecord {
  kind: string;
  status: "pending" | "in_batch" | "finalized";
  batch_id: number | null;
  amount?: number;
  tx_hash?: string;
}

export interface MerklePath {
  position: number;
  siblings: string[];
  path_bits: number[];
  root: string;
}

export interface EncryptedNote {
  position: number;
  commitment: string;
  ciphertext: string;
}

export interface NoteScan {
  tree_size: number;
  notes: EncryptedNote[];
}

export interface FastWithdrawQuote {
  available: boolean;
  amount: number;
  fee: number;
  amount_received: number;
  fee_bps: number;
}

export interface CommitteeInfo {
  threshold: number;
  members: { index: number; x25519_pk: string }[];
}

export interface ProofJobStatus {
  job_id: string;
  status: "queued" | "running" | "done" | "failed" | "cancelled";
  error?: string;
}

export interface ChunkProofResult {
  chunk_index: number;
  proof: string; // hex, 388-byte sunspot-shaped proof
  public_witness: string; // hex, 236-byte witness blob
}

export interface BatchProofResult {
  pre_state_root: string;
  post_state_root: string;
  chunks: ChunkProofResult[];
}
