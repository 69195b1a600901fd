"""Distributed proving layer tests: Fr Shamir, distributed Schnorr, dispatcher."""

import time

from zelana_tpu.fields.bn254 import R as FR
from zelana_tpu.sdk import mpc
from zelana_tpu.runtime.coordinator import Dispatcher, TransferSlot


def test_fr_shamir_roundtrip():
    secret = 123456789123456789
    shares = mpc.share_secret(secret, 3, 5)
    assert mpc.reconstruct(shares[:3]) == secret
    assert mpc.reconstruct(shares[1:4]) == secret
    assert mpc.reconstruct([shares[0], shares[2], shares[4]]) == secret
    assert mpc.reconstruct(shares[:2]) != secret


def test_distributed_schnorr():
    secret = 987654321
    msg = b"zelana batch 42"
    proof, pk = mpc.distributed_schnorr_prove(secret, msg, k=3, n=5)
    assert proof.verify(pk, msg)
    assert not proof.verify(pk, msg + b"!")
    assert not proof.verify(mpc.public_key(secret + 1), msg)


def test_hash_preimage_proof():
    proof = mpc.prove_hash_preimage(b"the witness", k=2, n=3)
    assert mpc.verify_hash_preimage(proof, b"the witness")
    assert not mpc.verify_hash_preimage(proof, b"wrong witness")


def test_dispatcher_slices_and_chains():
    transfers = [TransferSlot(sender_pubkey=i, is_valid=True) for i in range(20)]
    chunks = Dispatcher.slice_batch(transfers, [], [])
    assert len(chunks) == 3  # 8 + 8 + 4
    assert [len(c.transfers) for c in chunks] == [8, 8, 4]

    def apply_chunk(chunk, state, shielded):
        return state + len(chunk.transfers), shielded

    final, _ = Dispatcher.chain_roots(chunks, 100, 0, apply_chunk)
    assert final == 120
    assert chunks[0].pre_state_root == 100
    assert chunks[0].post_state_root == 108
    assert chunks[1].pre_state_root == 108  # chained
    assert chunks[2].post_state_root == 120


def test_dispatcher_job_lifecycle():
    d = Dispatcher(max_workers=2)
    chunks = Dispatcher.slice_batch(
        [TransferSlot(is_valid=True)] * 10, [], [])
    job_id = d.submit_job(chunks, batch_id=1)
    deadline = time.time() + 10
    while time.time() < deadline and d.status(job_id) != "done":
        time.sleep(0.02)
    assert d.status(job_id) == "done"
    proofs = d.proofs(job_id)
    assert len(proofs) == len(chunks)
    assert all(len(p.proof_bytes) == 388 for p in proofs)  # sunspot size
    assert d.expire(max_age_secs=0) == 1
    assert d.status(job_id) is None


def test_prover_node_swarm_over_http():
    """Blind MPC node service (prover-node/src/main.rs): a 3-of-5 swarm
    proves a Schnorr statement over real HTTP without any node seeing the
    secret; replay of a session share is rejected; fragment before
    commitment is rejected."""
    import json
    import urllib.error
    import urllib.request

    from zelana_tpu.runtime.prover_node import (
        NodeNetworkCoordinator,
        start_prover_node,
    )

    servers = []
    urls = []
    try:
        for i in range(5):
            server, port, _ = start_prover_node(i + 1)
            servers.append(server)
            urls.append(f"http://127.0.0.1:{port}")

        coord = NodeNetworkCoordinator(urls)
        secret = 0xDEADBEEFCAFE
        message = b"zelana swarm proof"
        proof, pk = coord.prove(secret, message, k=3, session_id="s1")
        assert proof.verify(pk, message)
        assert not proof.verify(pk, b"other message")

        # replayed share assignment for the same session is rejected
        body = json.dumps({
            "session_id": "s1", "circuit": "schnorr", "index": 1,
            "share_value": "01",
        }).encode()
        req = urllib.request.Request(
            urls[0] + "/share", data=body,
            headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(req)
            raised = False
        except urllib.error.HTTPError as e:
            raised = e.code == 400
        assert raised

        # fragment without a prior commitment is rejected
        freq = urllib.request.Request(
            urls[4] + "/fragment",
            data=json.dumps({"session_id": "s1", "challenge": "02",
                             "lagrange": "01"}).encode(),
            headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(freq)
            raised = False
        except urllib.error.HTTPError as e:
            raised = e.code == 400
        assert raised

        # health reports the assigned session
        h = json.loads(urllib.request.urlopen(urls[0] + "/health").read())
        assert h["sessions"] == 1
    finally:
        for s in servers:
            s.shutdown()


def test_swarm_controller_node_fleet():
    """prover-control parity: the controller boots a node fleet as
    subprocesses, reports status/logs, and the swarm proves over HTTP."""
    from zelana_tpu.runtime.control import SwarmController
    from zelana_tpu.runtime.prover_node import NodeNetworkCoordinator

    ctl = SwarmController()
    try:
        urls = [ctl.start_node(i + 1).url for i in range(3)]
        status = ctl.status()
        assert len(status) == 3
        assert all(s["running"] for s in status.values())
        assert "prover node" in ctl.logs("node1")

        coord = NodeNetworkCoordinator(urls)
        proof, pk = coord.prove(secret=424242, message=b"ctl swarm", k=2)
        assert proof.verify(pk, b"ctl swarm")

        ctl.stop("node3")
        assert "node3" not in ctl.status()
    finally:
        ctl.stop()
    assert ctl.status() == {}
