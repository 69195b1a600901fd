"""Client SDK tests: ZelanaClient / ApiClient against a live sequencer API.

Mirrors what the reference exercises through its TypeScript SDK
(sdk/typescript/src/zelana.ts ZelanaClient, client.ts ApiClient): signed
transfer/withdraw submission with auto-nonce, account/balance queries,
batch and transaction polling, fast-withdraw quotes, shielded note scan,
dev-mode deposit/seal, and the /v2 prove-job API.
"""

import time

import pytest

from zelana_tpu.sdk.client import ApiError, ZelanaClient
from zelana_tpu.sdk.keypair import ZelanaKeypair
from zelana_tpu.sequencer.api import start_api
from zelana_tpu.sequencer.batch import BatchConfig
from zelana_tpu.sequencer.pipeline import (
    PipelineConfig,
    PipelineOrchestrator,
    PipelineService,
)

ALICE_KP = ZelanaKeypair.from_seed(b"\x01" * 32)
BOB_KP = ZelanaKeypair.from_seed(b"\x02" * 32)


@pytest.fixture()
def stack():
    cfg = PipelineConfig(batch=BatchConfig(max_age_secs=3600))
    orch = PipelineOrchestrator(config=cfg, dev_mode=False)
    service = PipelineService(orch).start()
    server, port = start_api(orch)
    try:
        yield orch, port
    finally:
        server.shutdown()
        service.stop()


def _settle(client, min_batches=1, timeout=10.0):
    client.dev_seal()
    deadline = time.time() + timeout
    while time.time() < deadline:
        if client.get_stats()["batches_settled"] >= min_batches:
            return
        time.sleep(0.05)
    raise TimeoutError("batch did not settle")


def test_client_transfer_flow(stack):
    _, port = stack
    alice = ZelanaClient(f"http://127.0.0.1:{port}", keypair=ALICE_KP)
    bob = ZelanaClient(f"http://127.0.0.1:{port}", keypair=BOB_KP)

    assert alice.is_healthy()
    assert alice.get_balance() == 0

    alice.dev_deposit(500)
    assert alice.get_balance() == 500 or (
        alice.get_account().pending_balance == 500
    )

    # auto-nonce signed transfers, back to back (pending nonce tracking)
    r1 = alice.transfer(bob.pubkey, 50)
    assert r1["accepted"], r1
    r2 = alice.transfer(bob.pubkey, 25)
    assert r2["accepted"], r2

    _settle(alice)
    assert bob.get_balance() == 75
    assert alice.get_balance() == 425
    assert alice.get_account().nonce == 2

    # tx / batch queries and pollers
    record = alice.wait_for_transaction(r1["tx_hash"], timeout=5)
    assert record["kind"] == "transfer"
    batches = alice.list_batches()
    assert batches
    settled = alice.wait_for_batch(batches[0]["id"], timeout=5)
    assert settled["state"] in ("settled", "finalized")

    roots = alice.get_state_roots()
    assert len(roots["state_root"]) == 64


def test_client_bad_signature_rejected(stack):
    _, port = stack
    mallory = ZelanaClient(f"http://127.0.0.1:{port}", keypair=ALICE_KP)
    mallory.dev_deposit(100)
    # submit with a signature from the wrong key
    from zelana_tpu.sequencer.transactions import Transfer

    tx = Transfer(signer_pubkey=ALICE_KP.pubkey, to=BOB_KP.pubkey,
                  amount=10, nonce=0)
    bad_sig = BOB_KP.sign_raw(tx.signing_message())
    with pytest.raises(ApiError) as exc:
        mallory.api.submit_transfer(
            ALICE_KP.pubkey, BOB_KP.pubkey, 10, 0, bad_sig
        )
    assert exc.value.status == 400


def test_client_withdraw_and_fast_quote(stack):
    _, port = stack
    alice = ZelanaClient(f"http://127.0.0.1:{port}", keypair=ALICE_KP)
    alice.dev_deposit(1000)

    l1_addr = b"\x0b" * 32
    r = alice.withdraw(l1_addr, 200)
    assert r["accepted"], r
    _settle(alice)
    status = alice.get_withdrawal_status(r["tx_hash"])
    assert status["amount"] == 200

    quote = alice.get_fast_withdraw_quote(100)
    assert quote["fee"] + quote["amount_received"] == 100


def test_client_shielded_and_scan(stack):
    _, port = stack
    client = ZelanaClient(f"http://127.0.0.1:{port}", keypair=ALICE_KP)
    r = client.api.submit_shielded(
        nullifier=b"\x03" * 32, commitment=b"\x04" * 32,
        proof=b"\x00" * 324, ciphertext=b"\xaa" * 16,
    )
    assert r["accepted"], r
    _settle(client)
    scan = client.api.scan_notes()
    assert scan["tree_size"] == 1
    assert scan["notes"][0]["commitment"] == ("04" * 32)
    path = client.api.get_merkle_path(0)
    assert len(path["siblings"]) == 32
    assert client.api.get_shielded_root().hex() == path["root"]


def test_client_prove_job_api(stack):
    _, port = stack
    client = ZelanaClient(f"http://127.0.0.1:{port}", keypair=ALICE_KP)
    client.dev_deposit(50)
    job = client.api.prove_batch()
    deadline = time.time() + 10
    while time.time() < deadline:
        if client.api.prove_status(job) == "done":
            break
        time.sleep(0.05)
    assert client.api.prove_status(job) == "done"
    proof = client.api.fetch_proof(job)
    assert proof["proof"] is not None and len(proof["proof"]) == 512


def test_client_sse_stream_and_format_autodetect(stack):
    """SSE status streaming + proof-format autodetect on the client
    (noir_client.rs SSE leg + settler.rs:543 is_noir_proof)."""
    from zelana_tpu.sdk.client import ApiClient, ZelanaClient

    _, port = stack
    client = ZelanaClient(f"http://127.0.0.1:{port}", keypair=ALICE_KP)
    client.dev_deposit(50)
    client_api = ApiClient(f"http://127.0.0.1:{port}")
    job = client_api.prove_batch()
    statuses = list(client_api.stream_status(job, timeout=20))
    assert statuses[-1] == "done"
    assert client_api.detect_proof_format(b"\x00" * 388) == "noir"
    assert client_api.detect_proof_format(b"\x00" * 624) == "noir"
    assert client_api.detect_proof_format(b"\x00" * 256) == "groth16"
    assert client_api.detect_proof_format(b"\x00" * 10) == "unknown"
