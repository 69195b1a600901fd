"""Sequencer integration tests.

Mirrors the reference's test strategy (core/src/sequencer/tests/
integration_full.rs): full L2 cycles against a temp store with MockProver +
MockSettler -- deposit -> transfer -> withdraw, shielded double-spend
prevention, pipeline end-to-end, HTTP API flows.
"""

import json
import time
import urllib.request

import pytest

from zelana_tpu.sequencer import crypto
from zelana_tpu.sequencer.account_tree import AccountState, AccountTree
from zelana_tpu.sequencer.batch import BatchConfig
from zelana_tpu.sequencer.pipeline import (
    PipelineConfig,
    PipelineOrchestrator,
    PipelineService,
)
from zelana_tpu.sequencer.shielded_state import ShieldedState
from zelana_tpu.sequencer.transactions import Deposit, Shielded, Transfer, Withdraw

ALICE_SEED = b"\x01" * 32
BOB_SEED = b"\x02" * 32
_, _, ALICE = crypto.secret_to_keypair(ALICE_SEED)
_, _, BOB = crypto.secret_to_keypair(BOB_SEED)


def make_orchestrator(**kw):
    cfg = PipelineConfig(batch=BatchConfig(max_age_secs=3600))
    kw.setdefault("dev_mode", False)  # enforce real signature checks
    return PipelineOrchestrator(config=cfg, **kw)


def drain(orch, timeout=5.0):
    """Tick until the async prove and settle workers are both done."""
    deadline = time.time() + timeout
    while time.time() < deadline:
        orch.tick()
        if not (orch.proving_in_flight or orch.batches.next_for_proving()
                or orch.settlement_pending):
            return
        time.sleep(0.01)
    raise AssertionError("pipeline did not drain in time")


def signed_transfer(seed, sender, to, amount, nonce):
    tx = Transfer(signer_pubkey=sender, to=to, amount=amount, nonce=nonce)
    tx.signature = crypto.sign(seed, tx.signing_message())
    return tx


# --------------------------------------------------------------- ed25519


def test_ed25519_sign_verify():
    msg = b"zelana test message"
    sig = crypto.sign(ALICE_SEED, msg)
    assert crypto.verify(ALICE, msg, sig)
    assert not crypto.verify(ALICE, msg + b"x", sig)
    assert not crypto.verify(BOB, msg, sig)


# ----------------------------------------------------------- account tree


def test_account_tree_paths():
    tree = AccountTree()
    root0 = tree.root()
    tree.insert(ALICE, AccountState(1000, 0))
    assert tree.root() != root0
    path = tree.path(ALICE)
    leaf = tree.leaf(ALICE)
    assert path.verify(leaf, tree.root())
    # update changes root, path still verifies
    tree.insert(ALICE, AccountState(900, 1))
    assert tree.path(ALICE).verify(tree.leaf(ALICE), tree.root())


def test_account_tree_matches_reference_semantics():
    """Empty-tree root chain and position derivation (account_tree.rs)."""
    from zelana_tpu.hashes import mimc

    tree = AccountTree()
    # depth-32 empty chain starting from zero leaf
    cur = 0
    for _ in range(32):
        cur = mimc.hash_2(cur, cur)
    assert tree.root() == int(cur).to_bytes(32, "big")
    pos = tree.insert(b"\xAB\xCD\x01\x02" + b"\x00" * 28, AccountState(5, 0))
    assert pos == int.from_bytes(b"\xAB\xCD\x01\x02", "big")


# --------------------------------------------------------- shielded state


def test_shielded_double_spend_prevention():
    state = ShieldedState()
    nf = b"\x11" * 32
    cm = b"\x22" * 32
    state.execute(nf, cm)
    assert state.is_spent(nf)
    with pytest.raises(ValueError):
        state.execute(nf, b"\x33" * 32)


def test_shielded_tree_paths_and_history():
    state = ShieldedState()
    r0 = state.root()
    cm = b"\x07" * 32
    pos = state.execute(None, cm)
    assert pos == 0
    assert state.root() != r0
    mp = state.tree.path(0)
    assert mp.verify(cm, state.root())
    assert state.is_known_root(r0)  # ring keeps prior roots
    assert state.is_known_root(state.root())


# ------------------------------------------------------------- pipeline


def test_full_l2_cycle_deposit_transfer_withdraw():
    orch = make_orchestrator()
    # deposit to alice
    assert orch.submit(Deposit(to=ALICE, amount=1000, l1_seq=1)).accepted
    # transfer alice -> bob
    assert orch.submit(signed_transfer(ALICE_SEED, ALICE, BOB, 250, 0)).accepted
    # withdraw from bob
    wd = Withdraw(from_=BOB, to_l1_address=b"\x09" * 32, amount=100, nonce=0)
    wd.signature = crypto.sign(BOB_SEED, wd.signing_message())
    assert orch.submit(wd).accepted

    batch = orch.seal()
    assert batch is not None
    drain(orch)  # prove (async worker) + settle
    assert orch.stats.batches_proved == 1
    assert orch.stats.batches_settled == 1

    assert orch.get_account(ALICE).balance == 750
    assert orch.get_account(BOB).balance == 150
    assert orch.get_account(BOB).nonce == 1


def test_rejections():
    orch = make_orchestrator()
    orch.submit(Deposit(to=ALICE, amount=100, l1_seq=1))
    # bad signature
    bad = Transfer(signer_pubkey=ALICE, to=BOB, amount=10, nonce=0,
                   signature=b"\x00" * 64)
    assert not orch.submit(bad).accepted
    # overdraw
    tx = signed_transfer(ALICE_SEED, ALICE, BOB, 10_000, 0)
    res = orch.submit(tx)
    assert not res.accepted and "balance" in res.error
    # wrong nonce
    tx2 = signed_transfer(ALICE_SEED, ALICE, BOB, 10, 5)
    assert not orch.submit(tx2).accepted


def test_shielded_in_pipeline_and_double_spend():
    orch = make_orchestrator()
    nf, cm = b"\x41" * 32, b"\x42" * 32
    tx = Shielded(proof=b"\x00" * 324, nullifier=nf, commitment=cm)
    assert orch.submit(tx).accepted
    # same nullifier again inside the same batch
    tx2 = Shielded(proof=b"\x00" * 324, nullifier=nf, commitment=b"\x43" * 32)
    res = orch.submit(tx2)
    assert not res.accepted and "nullifier" in res.error
    orch.seal()
    drain(orch)
    # and again after finalization (persistent set)
    tx3 = Shielded(proof=b"\x00" * 324, nullifier=nf, commitment=b"\x44" * 32)
    assert not orch.submit(tx3).accepted


def test_state_roots_change_and_persist():
    orch = make_orchestrator()
    pre = orch.tree.root()
    orch.submit(Deposit(to=ALICE, amount=10, l1_seq=7))
    batch = orch.seal()
    assert batch.pre_state_root == pre
    assert batch.post_state_root is not None and batch.post_state_root != pre
    drain(orch)
    assert orch.tree.root() == batch.post_state_root
    # deposits are deduplicated downstream via processed l1_seq bookkeeping
    assert batch.diff.processed_deposits == [7]


def test_settler_instruction_format():
    from zelana_tpu.sequencer.prover_service import (
        BatchPublicInputs, BatchProof)
    from zelana_tpu.sequencer.settler import (
        HEADER_SIZE, MockSettler, build_submit_batch_header)

    inputs = BatchPublicInputs(
        pre_state_root=b"\x01" * 32, post_state_root=b"\x02" * 32,
        pre_shielded_root=b"\x03" * 32, post_shielded_root=b"\x04" * 32,
        withdrawal_root=b"\x05" * 32, batch_hash=b"\x06" * 32, batch_id=9,
    )
    proof = BatchProof(inputs, b"\x00" * 256, 1)
    settler = MockSettler()
    res = settler.submit(proof)
    assert res.signature
    data = settler.submitted[0]
    assert data[0] == 3  # SubmitBatch discriminator (BridgeIx::SubmitBatch)
    header = data[1 : 1 + HEADER_SIZE]
    # header state root = the BE VALUE wire bytes of post_state_root
    from zelana_tpu.sequencer.prover_service import batch_inputs_to_solana_bytes
    wire = batch_inputs_to_solana_bytes(inputs)
    assert header == build_submit_batch_header(0, 9, wire[1], 256, 0)
    # 200-byte public inputs: 6 roots + u64 LE batch_id
    assert len(data) == 1 + HEADER_SIZE + 256 + 6 * 32 + 8
    assert data[-8:] == (9).to_bytes(8, "little")


# ------------------------------------------------------------------- API


def _req(port, method, path, body=None):
    url = f"http://127.0.0.1:{port}{path}"
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(url, data=data, method=method)
    if data:
        req.add_header("Content-Type", "application/json")
    try:
        with urllib.request.urlopen(req, timeout=10) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_http_api_end_to_end():
    from zelana_tpu.sequencer.api import start_api

    orch = make_orchestrator()
    service = PipelineService(orch).start()
    server, port = start_api(orch)
    try:
        code, health = _req(port, "GET", "/health")
        assert code == 200 and health["status"] == "ok"

        code, _ = _req(port, "POST", "/dev/deposit",
                       {"to": ALICE.hex(), "amount": 500})
        assert code == 200

        tx = signed_transfer(ALICE_SEED, ALICE, BOB, 50, 0)
        code, resp = _req(port, "POST", "/transfer", {
            "from": ALICE.hex(), "to": BOB.hex(), "amount": 50, "nonce": 0,
            "signature": tx.signature.hex(),
        })
        assert code == 200 and resp["accepted"]

        code, _ = _req(port, "POST", "/dev/seal", {})
        assert code == 200
        deadline = time.time() + 10
        while time.time() < deadline:
            code, stats = _req(port, "GET", "/status/stats")
            if stats["batches_settled"] >= 1:
                break
            time.sleep(0.1)
        assert stats["batches_settled"] >= 1

        code, acct = _req(port, "GET", f"/account/{BOB.hex()}")
        assert code == 200 and acct["balance"] == 50

        code, roots = _req(port, "GET", "/status/roots")
        assert code == 200 and len(roots["state_root"]) == 64
    finally:
        server.shutdown()
        service.stop()


# --------------------------------------------------- extended API surface


def test_api_tx_batch_queries_and_withdraw_status():
    from zelana_tpu.sequencer.api import start_api

    orch = make_orchestrator()
    service = PipelineService(orch).start()
    server, port = start_api(orch)
    try:
        _req(port, "POST", "/dev/deposit", {"to": ALICE.hex(), "amount": 500})
        tx = signed_transfer(ALICE_SEED, ALICE, BOB, 50, 0)
        code, resp = _req(port, "POST", "/transfer", {
            "from": ALICE.hex(), "to": BOB.hex(), "amount": 50, "nonce": 0,
            "signature": tx.signature.hex(),
        })
        assert code == 200 and resp["tx_hash"]
        transfer_hash = resp["tx_hash"]

        wd = Withdraw(from_=ALICE, to_l1_address=b"\x09" * 32, amount=25,
                      nonce=1)
        wd.signature = crypto.sign(ALICE_SEED, wd.signing_message())
        code, wresp = _req(port, "POST", "/withdraw", {
            "from": ALICE.hex(), "to_l1_address": (b"\x09" * 32).hex(),
            "amount": 25, "nonce": 1, "signature": wd.signature.hex(),
        })
        assert code == 200 and wresp["accepted"]

        _req(port, "POST", "/dev/seal", {})
        deadline = time.time() + 10
        while time.time() < deadline:
            _, stats = _req(port, "GET", "/status/stats")
            if stats["batches_settled"] >= 1:
                break
            time.sleep(0.1)

        code, rec = _req(port, "POST", "/tx", {"tx_hash": transfer_hash})
        assert code == 200 and rec["status"] == "finalized"
        assert rec["kind"] == "transfer" and rec["batch_id"] is not None

        code, txs = _req(port, "POST", "/txs", {"limit": 10})
        assert code == 200 and len(txs["txs"]) == 3  # deposit+transfer+wd

        code, batch = _req(port, "POST", "/batch",
                           {"batch_id": rec["batch_id"]})
        assert code == 200 and batch["txs"] == 3 and batch["withdrawals"] == 1
        code, batches = _req(port, "POST", "/batches", {})
        assert code == 200 and len(batches["batches"]) == 1

        code, st = _req(port, "POST", "/withdraw/status",
                        {"tx_hash": wresp["tx_hash"]})
        assert code == 200 and st["state"] == "finalized"
        assert st["l1_signature"]

        code, acct = _req(port, "POST", "/account",
                          {"account_id": ALICE.hex()})
        assert code == 200 and acct["balance"] == 425
    finally:
        server.shutdown()
        service.stop()


def test_api_fast_withdrawals():
    from zelana_tpu.sequencer.api import start_api

    orch = make_orchestrator()
    service = PipelineService(orch).start()
    server, port = start_api(orch)
    try:
        _req(port, "POST", "/dev/deposit", {"to": ALICE.hex(), "amount": 1000})

        # no liquidity yet
        code, quote = _req(port, "POST", "/withdraw/fast/quote",
                           {"amount": 100})
        assert code == 200 and not quote["available"]

        code, lp = _req(port, "POST", "/withdraw/fast/register_lp",
                        {"lp": (b"\x0a" * 32).hex(), "amount": 10_000})
        assert code == 200 and lp["total_liquidity"] == 10_000

        code, quote = _req(port, "POST", "/withdraw/fast/quote",
                           {"amount": 100})
        assert code == 200 and quote["available"]
        assert quote["amount_received"] == 100 - quote["fee"]

        wd = Withdraw(from_=ALICE, to_l1_address=b"\x0b" * 32, amount=100,
                      nonce=0)
        wd.signature = crypto.sign(ALICE_SEED, wd.signing_message())
        code, resp = _req(port, "POST", "/withdraw/fast/execute", {
            "from": ALICE.hex(), "to_l1_address": (b"\x0b" * 32).hex(),
            "amount": 100, "nonce": 0, "signature": wd.signature.hex(),
        })
        assert code == 200 and resp["amount_received"] == quote["amount_received"]
        assert orch.fast_withdrawals.outstanding == 100

        _req(port, "POST", "/dev/seal", {})
        deadline = time.time() + 10
        while time.time() < deadline:
            if orch.fast_withdrawals.outstanding == 0:
                break
            time.sleep(0.1)
        assert orch.fast_withdrawals.outstanding == 0  # released on settle
    finally:
        server.shutdown()
        service.stop()


def test_api_encrypted_mempool_flow():
    from zelana_tpu.sdk.threshold import encrypt_for_mempool
    from zelana_tpu.sequencer.api import start_api

    cfg = PipelineConfig(batch=BatchConfig(max_age_secs=3600))
    orch = PipelineOrchestrator(config=cfg, dev_mode=True)
    service = PipelineService(orch).start()
    server, port = start_api(orch)
    try:
        code, info = _req(port, "GET", "/encrypted/committee")
        assert code == 200 and info["threshold"] == 3
        assert len(info["members"]) == 5

        _req(port, "POST", "/dev/deposit", {"to": ALICE.hex(), "amount": 300})

        payload = json.dumps({
            "from": ALICE.hex(), "to": BOB.hex(), "amount": 77, "nonce": 0,
        }).encode()
        etx = encrypt_for_mempool(payload, orch.committee)
        code, resp = _req(port, "POST", "/encrypted/submit", {
            "tx_id": etx.tx_id.hex(),
            "ciphertext": etx.ciphertext.hex(),
            "encrypted_shares": {
                str(k): v.hex() for k, v in etx.encrypted_shares.items()
            },
        })
        assert code == 200

        deadline = time.time() + 10
        while time.time() < deadline:  # tick drains + decrypts the mempool
            if not orch.mempool.queue:
                break
            time.sleep(0.1)
        _req(port, "POST", "/dev/seal", {})
        deadline = time.time() + 10
        while time.time() < deadline:
            _, acct = _req(port, "POST", "/account", {"account_id": BOB.hex()})
            if acct.get("balance") == 77:
                break
            time.sleep(0.1)
        assert acct["balance"] == 77
    finally:
        server.shutdown()
        service.stop()


def test_api_shielded_scan_and_merkle_path():
    from zelana_tpu.sequencer.api import start_api

    cfg = PipelineConfig(batch=BatchConfig(max_age_secs=3600))
    orch = PipelineOrchestrator(config=cfg, dev_mode=True)
    service = PipelineService(orch).start()
    server, port = start_api(orch)
    try:
        code, resp = _req(port, "POST", "/shielded/submit", {
            "proof": ("11" * 80),
            "nullifier": (b"\x01" * 32).hex(),
            "commitment": (b"\x02" * 32).hex(),
            "ciphertext": ("ab" * 100),
        })
        assert code == 200 and resp["accepted"]

        _req(port, "POST", "/dev/seal", {})
        deadline = time.time() + 10
        while time.time() < deadline:  # notes persist at settlement
            _, stats = _req(port, "GET", "/status/stats")
            if stats["batches_settled"] >= 1:
                break
            time.sleep(0.1)

        code, scan = _req(port, "POST", "/shielded/scan", {})
        assert code == 200 and scan["tree_size"] == 1
        assert len(scan["notes"]) == 1
        assert scan["notes"][0]["commitment"] == (b"\x02" * 32).hex()
        assert scan["notes"][0]["ciphertext"] == "ab" * 100

        code, mp = _req(port, "POST", "/shielded/merkle_path", {"position": 0})
        assert code == 200 and len(mp["siblings"]) == 32
    finally:
        server.shutdown()
        service.stop()


def test_prove_runs_off_tick_thread_accumulation_overlaps():
    """Stage concurrency (pipeline.rs:367-427): while batch N proves on the
    worker thread, the tick returns immediately and new submissions land in
    batch N+1."""
    from zelana_tpu.sequencer.prover_service import MockProver

    orch = make_orchestrator(prover=MockProver(prove_time_ms=400))
    orch.submit(Deposit(to=ALICE, amount=1_000, l1_seq=1))
    orch.submit(signed_transfer(ALICE_SEED, ALICE, BOB, 10, 0))
    first = orch.seal()
    assert first is not None

    t0 = time.time()
    orch.tick()  # dispatches the prove; must NOT block for 400 ms
    assert time.time() - t0 < 0.2
    assert orch.proving_in_flight

    # accumulate into the NEXT batch while batch N is proving
    res = orch.submit(Deposit(to=BOB, amount=50, l1_seq=2))
    assert res.accepted
    assert orch.batches.current is not None
    assert orch.batches.current.id == first.id + 1
    assert first.state.value == "proving"

    # drain: prove completes on the worker, settle on a later tick
    deadline = time.time() + 5
    while time.time() < deadline and orch.stats.batches_settled == 0:
        orch.tick()
        time.sleep(0.02)
    assert orch.stats.batches_proved == 1
    assert orch.stats.batches_settled == 1
    assert first.state.value == "finalized"


def test_settle_runs_off_tick_thread_and_backoff_not_under_lock():
    """Stage-3 concurrency (pipeline.rs:430-701): a slow, failing settler
    must not block the tick or submissions -- backoff is a deadline, not a
    sleep under the pipeline lock."""

    class SlowFailingSettler:
        def __init__(self):
            self.calls = 0

        def submit(self, proof):
            self.calls += 1
            time.sleep(0.3)
            raise RuntimeError("L1 down")

    settler = SlowFailingSettler()
    orch = make_orchestrator(settler=settler)
    orch.submit(Deposit(to=ALICE, amount=1_000, l1_seq=1))
    first = orch.seal()
    drain_deadline = time.time() + 5
    while time.time() < drain_deadline and not orch.settling_in_flight:
        orch.tick()  # prove completes, settle dispatches to its worker
        time.sleep(0.01)
    assert orch.settling_in_flight

    # while the settler blocks + fails on ITS thread, ticks and submissions
    # proceed immediately
    t0 = time.time()
    orch.tick()
    assert orch.submit(Deposit(to=BOB, amount=5, l1_seq=2)).accepted
    assert time.time() - t0 < 0.2

    # retries keep coming (deadline-based backoff) until the cap pauses the
    # pipeline and fails the batch
    deadline = time.time() + 30
    while time.time() < deadline and not orch.stats.paused:
        orch.tick()
        time.sleep(0.02)
    assert orch.stats.paused
    assert settler.calls == orch.config.max_settlement_retries
    assert first.state.value == "failed"
    assert "settlement failed" in first.error


def test_web_explorer_snapshot_and_http():
    """debug/web parity: the explorer serves live store state over HTTP."""
    import urllib.request

    from zelana_tpu.tools.explorer import snapshot, start_explorer

    orch = make_orchestrator()
    orch.submit(Deposit(to=ALICE, amount=123, l1_seq=1))
    orch.seal()
    drain(orch)
    snap = snapshot(orch.store)
    assert snap["counts"]["accounts"] >= 1
    assert any(a["balance"] == 123 for a in snap["accounts"])
    assert snap["batches"] and snap["transactions"]

    server, port = start_explorer(orch.store)
    try:
        page = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/").read().decode()
        assert "zelana-tpu" in page
        data = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/data").read())
        assert data["counts"]["accounts"] >= 1
    finally:
        server.shutdown()
