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
