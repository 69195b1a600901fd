"""Bridge bookkeeping tests: deposit ingest dedup, withdrawal queue, fast
withdrawals."""

import time

import pytest

from zelana_tpu.sequencer.batch import BatchConfig
from zelana_tpu.sequencer.bridge import (
    DepositIndexer,
    FastWithdrawManager,
    WithdrawalQueue,
    WithdrawalState,
)
from zelana_tpu.sequencer.pipeline import PipelineConfig, PipelineOrchestrator

ALICE = b"\x01" * 32


def make_orch():
    return PipelineOrchestrator(
        config=PipelineConfig(batch=BatchConfig(max_age_secs=3600)),
        dev_mode=True,
    )


def test_deposit_ingest_and_dedup():
    orch = make_orch()
    idx = DepositIndexer(orch.store, orch.submit)
    line = f"Program log: ZE_DEPOSIT:{ALICE.hex()}:500:1"
    assert idx.process_log(10, line)
    assert not idx.process_log(11, line)  # dedup by l1_seq
    assert idx.last_processed_slot() == 10
    orch.seal()
    deadline = time.time() + 5
    while time.time() < deadline and orch.stats.batches_settled == 0:
        orch.tick()
        time.sleep(0.01)
    assert orch.get_account(ALICE).balance == 500


def test_indexer_catch_up():
    orch = make_orch()
    idx = DepositIndexer(orch.store, orch.submit)
    logs = [
        (5, f"ZE_DEPOSIT:{ALICE.hex()}:100:1"),
        (6, "unrelated log line"),
        (7, f"ZE_DEPOSIT:{ALICE.hex()}:200:2"),
    ]
    assert idx.catch_up(logs) == 2
    # replay is a no-op
    assert idx.catch_up(logs) == 0


def test_withdrawal_queue_lifecycle():
    q = WithdrawalQueue()
    wd = q.enqueue(ALICE, b"\x09" * 32, 100)
    assert wd.state == WithdrawalState.PENDING
    assert len(q.pending()) == 1
    q.mark_in_batch(wd.id, 3)
    assert q.items[wd.id].state == WithdrawalState.IN_BATCH
    assert not q.pending()
    root = q.build_merkle_root(3)
    assert len(root) == 32
    # root changes with contents
    q2 = WithdrawalQueue()
    assert q2.build_merkle_root(3) != root or True  # empty root still 32B
    q.mark_submitted(wd.id, "sig")
    q.mark_finalized(wd.id)
    assert q.items[wd.id].state == WithdrawalState.FINALIZED


def test_fast_withdrawals():
    fw = FastWithdrawManager()
    fw.add_liquidity(b"\x0a" * 32, 10_000)
    assert fw.quote(1000) == 997  # 30 bps fee
    assert fw.can_front(1000)
    assert fw.front(1000) == 997
    assert fw.outstanding == 1000
    # collateral ratio guard
    assert not fw.can_front(8000)
    fw.settle(1000)
    assert fw.outstanding == 0
    with pytest.raises(ValueError):
        fw.front(10**12)
