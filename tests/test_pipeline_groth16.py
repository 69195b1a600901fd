"""Groth16-mode pipeline end to end (slow; gated by ZELANA_SLOW_TESTS).

The full production path: transactions -> batch -> circuit-native public
inputs -> real Groth16 proof on the TPU pipeline -> 256-byte Solana wire
format -> on-chain verifier gate -> SubmitBatch instruction.
"""

import os

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("ZELANA_SLOW_TESTS"),
    reason="keygen + prove on the CPU backend takes ~10 minutes",
)


def test_pipeline_with_real_groth16_prover():
    from zelana_tpu.circuits.l2_block import L2BlockCircuit
    from zelana_tpu.groth16.setup import keygen
    from zelana_tpu.sequencer import crypto
    from zelana_tpu.sequencer.batch import BatchConfig
    from zelana_tpu.sequencer.pipeline import (
        PipelineConfig,
        PipelineOrchestrator,
        ProverMode,
    )
    from zelana_tpu.sequencer.prover_service import Groth16Prover
    from zelana_tpu.sequencer.settler import OnchainVerifyingSettler
    from zelana_tpu.sequencer.transactions import Deposit, Shielded, Transfer

    alice_seed, bob_seed = b"\x01" * 32, b"\x02" * 32
    _, _, alice = crypto.secret_to_keypair(alice_seed)
    _, _, bob = crypto.secret_to_keypair(bob_seed)

    # keys for the 2-account/1-transfer circuit shape the batch produces:
    # keygen fixes the circuit STRUCTURE (accounts+txs counts), so generate
    # for the same shape as the batch below
    commitment = b"\x5a" * 32
    shape_circuit = L2BlockCircuit(
        batch_id=0,
        transactions=[
            __import__("zelana_tpu.circuits.l2_block", fromlist=["TransactionWitness"])
            .TransactionWitness(alice, bob, 250)
        ],
        initial_accounts={alice: 1000, bob: 0},
        shielded_commitments=[commitment],
    )
    pk = keygen(shape_circuit, seed=0)

    prover = Groth16Prover(pk)
    settler = OnchainVerifyingSettler(pk.vk)
    orch = PipelineOrchestrator(
        config=PipelineConfig(
            batch=BatchConfig(max_age_secs=3600),
            prover_mode=ProverMode.GROTH16,
        ),
        prover=prover,
        settler=settler,
        dev_mode=False,
    )

    assert orch.submit(Deposit(to=alice, amount=1000, l1_seq=1)).accepted
    # seal + settle the deposit batch with... deposits aren't proven by the
    # L2 circuit; keep this batch transfer-only by sealing after the deposit
    # is committed through a mock-mode orchestration? Simpler: fund via
    # direct store write to isolate the proven batch to the transfer.
    orch.seal()
    # deposit batch would need the prover too; drop it and fund directly
    orch.batches.sealed.clear()
    from zelana_tpu.sequencer.account_tree import AccountState

    orch._persist_account(alice, AccountState(1000, 0))
    orch.tree.insert(alice, AccountState(1000, 0))
    orch.batches.next_batch_id = 0

    tx = Transfer(signer_pubkey=alice, to=bob, amount=250, nonce=0)
    tx.signature = crypto.sign(alice_seed, tx.signing_message())
    assert orch.submit(tx).accepted
    # a shielded commitment rides the same proven batch: the circuit folds
    # it into post_shielded_root (the pre==post shortcut is gone)
    sh = Shielded(proof=b"\x00" * 324, nullifier=b"\x7b" * 32,
                  commitment=commitment)
    assert orch.submit(sh).accepted
    batch = orch.seal()
    assert batch is not None and batch.id == 0

    import time as _time
    deadline = _time.time() + 1800
    while _time.time() < deadline:
        orch.tick()
        if batch.proof is not None or batch.error:
            break
        _time.sleep(0.2)
    assert batch.proof is not None, batch.error
    assert len(batch.proof.proof_bytes) == 256
    # the proven shielded root CHANGED (commitment folded on-proof)
    pi = batch.proof.public_inputs
    assert pi.post_shielded_root != pi.pre_shielded_root
    # settle through the on-chain verifier gate (async settle worker)
    deadline = _time.time() + 10
    while _time.time() < deadline and batch.settlement_sig is None:
        orch.tick()
        _time.sleep(0.02)
    assert batch.settlement_sig is not None
    assert orch.get_account(bob).balance == 250
