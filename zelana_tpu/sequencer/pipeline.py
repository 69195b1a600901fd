"""Three-stage batch pipeline: Accumulate -> Prove -> Settle.

Mirrors core/src/sequencer/pipeline.rs: parallel stages (a new batch
accumulates while the previous proves and an older one settles, :6-28),
ProverMode Mock/Groth16 (:59-67), settlement retries with exponential
backoff and pipeline pause after max retries (:430-701), operator
pause/resume commands and stats (:133-178, :770-951).

Proof-state note: the reference carries a latent inconsistency -- its
sequencer tracks MiMC SMT roots while its arkworks circuit enforces
Poseidon-fold roots (only the Mock prover path was exercised end to end).
This pipeline resolves it explicitly: the durable state roots remain the
MiMC tree roots (API/storage continuity), and when ProverMode is GROTH16
the public inputs handed to the prover are the circuit-native Poseidon fold
roots computed from the same balances, so real proofs verify end to end.
"""

from __future__ import annotations

import enum
import threading
import time
from dataclasses import dataclass, field
from typing import Optional

from .account_tree import AccountState, AccountTree
from .batch import Batch, BatchConfig, BatchManager, BatchState
from .prover_service import (
    BatchPublicInputs,
    BatchWitness,
    MockProver,
    build_witness,
)
from .settler import MockSettler
from .shielded_state import ShieldedState
from .store import Store
from .transactions import Transfer, Withdraw
from .tx_router import TxRouter


class ProverMode(enum.Enum):
    MOCK = "mock"
    GROTH16 = "groth16"


@dataclass
class PipelineConfig:
    batch: BatchConfig = field(default_factory=BatchConfig)
    prover_mode: ProverMode = ProverMode.MOCK
    poll_interval_secs: float = 0.1
    max_settlement_retries: int = 5
    settlement_backoff_base: float = 0.2


@dataclass
class PipelineStats:
    submitted: int = 0
    batches_proved: int = 0
    batches_settled: int = 0
    proving_time_ms_total: int = 0
    paused: bool = False


class PipelineOrchestrator:
    def __init__(self, store: Optional[Store] = None,
                 config: Optional[PipelineConfig] = None,
                 prover=None, settler=None, dev_mode: bool = True):
        self.store = store or Store()
        self.config = config or PipelineConfig()
        self.tree = AccountTree()
        self.shielded = ShieldedState()
        self.router = TxRouter(self.get_account, self.shielded,
                               dev_mode=dev_mode)
        self.batches = BatchManager(self.router, self.tree, self.shielded,
                                    self.config.batch)
        self.prover = prover or MockProver()
        self.settler = settler or MockSettler()
        self.stats = PipelineStats()
        self._settle_retries = 0
        self._lock = threading.RLock()

    # -- state access -------------------------------------------------------

    def get_account(self, account_id: bytes) -> AccountState:
        raw = self.store.get("accounts", account_id)
        if raw is None:
            return AccountState()
        balance = int.from_bytes(raw[:8], "little")
        nonce = int.from_bytes(raw[8:16], "little")
        return AccountState(balance, nonce)

    def _persist_account(self, account_id: bytes, state: AccountState):
        self.store.put(
            "accounts",
            account_id,
            state.balance.to_bytes(8, "little") + state.nonce.to_bytes(8, "little"),
        )

    # -- submission ---------------------------------------------------------

    def submit(self, tx):
        with self._lock:
            self.stats.submitted += 1
            return self.batches.submit_transaction(tx)

    def seal(self) -> Optional[Batch]:
        with self._lock:
            return self.batches.seal()

    # -- pipeline tick ------------------------------------------------------

    def tick(self):
        if self.stats.paused:
            return
        with self._lock:
            self.batches.check_timeout()
            self._try_prove()
            self._try_settle()

    def _fold_public_inputs(self, batch: Batch,
                            witness: BatchWitness) -> BatchPublicInputs:
        """Circuit-native public inputs (Poseidon folds over balances)."""
        from ..circuits.l2_block import (
            TransactionWitness,
            WithdrawalWitness,
            compute_batch_hash,
            compute_state_root,
            compute_withdrawal_root,
        )

        txs = [
            TransactionWitness(t.signer_pubkey, t.to, t.amount)
            for t in batch.transactions
            if isinstance(t, Transfer)
        ]
        wds = [
            WithdrawalWitness(t.to_l1_address, t.amount)
            for t in batch.transactions
            if isinstance(t, Withdraw)
        ]
        final = dict(witness.initial_accounts)
        for t in txs:
            final[t.sender_pk] = final.get(t.sender_pk, 0) - t.amount
            final[t.recipient_pk] = final.get(t.recipient_pk, 0) + t.amount
        for w, t in zip(wds, [t for t in batch.transactions if isinstance(t, Withdraw)]):
            final[t.from_] = final.get(t.from_, 0) - t.amount
        return BatchPublicInputs(
            pre_state_root=compute_state_root(batch.id, witness.initial_accounts),
            post_state_root=compute_state_root(batch.id, final),
            pre_shielded_root=batch.pre_shielded_root,
            post_shielded_root=batch.pre_shielded_root,  # circuit path: no
            # shielded commitments are proven yet (prover.rs:402 TODO)
            withdrawal_root=compute_withdrawal_root(wds),
            batch_hash=compute_batch_hash(batch.id, txs),
            batch_id=batch.id,
        )

    def _try_prove(self):
        batch = self.batches.next_for_proving()
        if batch is None:
            return
        batch.state = BatchState.PROVING
        witness = build_witness(batch, self.get_account)
        if self.config.prover_mode is ProverMode.GROTH16:
            inputs = self._fold_public_inputs(batch, witness)
        else:
            from .prover_service import build_public_inputs

            wd_root = self.batches.withdrawal_root(batch)
            inputs = build_public_inputs(batch, wd_root)
        try:
            proof = self.prover.prove(inputs, witness)
        except Exception as exc:  # prover failure: mark batch failed
            batch.state = BatchState.FAILED
            batch.error = f"prove failed: {exc}"
            return
        self.batches.batch_proved(batch, proof)
        self.stats.batches_proved += 1
        self.stats.proving_time_ms_total += proof.proving_time_ms

    def _try_settle(self):
        batch = self.batches.next_for_settlement()
        if batch is None:
            return
        try:
            result = self.settler.submit(batch.proof)
        except Exception as exc:
            self._settle_retries += 1
            if self._settle_retries >= self.config.max_settlement_retries:
                self.stats.paused = True
                batch.state = BatchState.FAILED
                batch.error = f"settlement failed: {exc}"
            else:
                time.sleep(
                    self.config.settlement_backoff_base * (2 ** self._settle_retries)
                )
            return
        self._settle_retries = 0
        self.batches.batch_settled(batch, result.signature)
        # persist committed account state
        for account_id, state in batch.diff.account_updates.items():
            self._persist_account(account_id, state)
        for nf in batch.diff.new_nullifiers:
            self.store.put("nullifiers", nf, b"\x01")
        for cm in batch.diff.new_commitments:
            self.store.put("commitments", cm, b"\x01")
        self.stats.batches_settled += 1

    # -- operator commands --------------------------------------------------

    def pause(self):
        self.stats.paused = True

    def resume(self):
        self.stats.paused = False
        self._settle_retries = 0


class PipelineService:
    """Background thread driving the orchestrator (pipeline.rs:770-951)."""

    def __init__(self, orchestrator: PipelineOrchestrator):
        self.orchestrator = orchestrator
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    def start(self):
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def _run(self):
        while not self._stop.is_set():
            self.orchestrator.tick()
            self._stop.wait(self.orchestrator.config.poll_interval_secs)

    def submit(self, tx):
        return self.orchestrator.submit(tx)

    def stop(self):
        # graceful shutdown: seal the pending batch first (pipeline.rs:836-852)
        self.orchestrator.seal()
        for _ in range(20):
            self.orchestrator.tick()
            pending = self.orchestrator.batches.next_for_proving() or \
                self.orchestrator.batches.next_for_settlement()
            if pending is None:
                break
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=5)
