"""Bridge program model (litesvm-equivalent) tests.

Mirrors onchain-programs/bridge/tests/{init,deposit,withdraw,submit_batch,
zk_verification}.rs: instruction processing against modeled vault/config/
nullifier/receipt PDAs, lamport accounting, replay rejection, and the
SubmitBatch CPI into the verifier program with a REAL Groth16 proof."""

import pytest

from zelana_tpu.sequencer.bridge_program import (
    BRIDGE_PROGRAM_ID,
    VERIFIER_PROGRAM_ID,
    AccountMeta,
    BridgeSVM,
    Instruction,
    ProgramError,
    decode_config,
    derive_config_pda,
    derive_deposit_receipt_pda,
    derive_nullifier_pda,
    derive_vault_pda,
)

DOMAIN = b"\x11" * 32
SEQUENCER = b"\x22" * 32
ALICE = b"\x33" * 32


def _init_bridge(svm: BridgeSVM):
    config_pda, _ = derive_config_pda(DOMAIN)
    vault_pda, _ = derive_vault_pda(DOMAIN)
    svm.process(Instruction(
        program_id=BRIDGE_PROGRAM_ID,
        accounts=[
            AccountMeta(ALICE, is_signer=True, is_writable=True),
            AccountMeta(config_pda, is_writable=True),
            AccountMeta(vault_pda, is_writable=True),
            AccountMeta(b"\x00" * 32),
        ],
        data=bytes([0]) + SEQUENCER + DOMAIN,
    ))
    return config_pda, vault_pda


def _deposit(svm, config_pda, vault_pda, depositor, amount, nonce):
    receipt_pda, _ = derive_deposit_receipt_pda(DOMAIN, depositor, nonce)
    svm.process(Instruction(
        program_id=BRIDGE_PROGRAM_ID,
        accounts=[
            AccountMeta(depositor, is_signer=True, is_writable=True),
            AccountMeta(config_pda),
            AccountMeta(vault_pda, is_writable=True),
            AccountMeta(receipt_pda, is_writable=True),
            AccountMeta(b"\x00" * 32),
        ],
        data=bytes([1]) + amount.to_bytes(8, "little")
        + nonce.to_bytes(8, "little"),
    ))
    return receipt_pda


def test_init_creates_config_and_vault():
    svm = BridgeSVM()
    config_pda, vault_pda = _init_bridge(svm)
    cfg = decode_config(svm.account(config_pda).data)
    assert cfg["is_initialized"]
    assert cfg["sequencer_authority"] == SEQUENCER
    assert cfg["domain"] == DOMAIN
    assert cfg["batch_index"] == 0
    # re-init rejected
    with pytest.raises(ProgramError):
        _init_bridge(svm)


def test_deposit_moves_lamports_and_logs():
    svm = BridgeSVM()
    config_pda, vault_pda = _init_bridge(svm)
    svm.airdrop(ALICE, 10_000)
    _deposit(svm, config_pda, vault_pda, ALICE, 4_000, nonce=1)
    assert svm.balance(ALICE) == 6_000
    assert svm.balance(vault_pda) == 4_000
    assert any(line.startswith(f"ZE_DEPOSIT:{ALICE.hex()}:4000:1")
               for line in svm.logs)
    # duplicate nonce -> receipt PDA exists -> rejected (dedup)
    with pytest.raises(ProgramError):
        _deposit(svm, config_pda, vault_pda, ALICE, 4_000, nonce=1)
    # new nonce fine
    _deposit(svm, config_pda, vault_pda, ALICE, 1_000, nonce=2)
    assert svm.balance(vault_pda) == 5_000


def test_withdraw_attested_and_replay_rejection():
    svm = BridgeSVM()
    config_pda, vault_pda = _init_bridge(svm)
    svm.airdrop(ALICE, 10_000)
    _deposit(svm, config_pda, vault_pda, ALICE, 8_000, nonce=1)

    recipient = b"\x44" * 32
    nullifier = b"\x55" * 32
    nf_pda, _ = derive_nullifier_pda(DOMAIN, nullifier)

    def withdraw():
        svm.process(Instruction(
            program_id=BRIDGE_PROGRAM_ID,
            accounts=[
                AccountMeta(SEQUENCER, is_signer=True),
                AccountMeta(config_pda),
                AccountMeta(vault_pda, is_writable=True),
                AccountMeta(recipient, is_writable=True),
                AccountMeta(nf_pda, is_writable=True),
                AccountMeta(b"\x00" * 32),
            ],
            data=bytes([2]) + recipient + (3_000).to_bytes(8, "little")
            + nullifier,
        ))

    withdraw()
    assert svm.balance(recipient) == 3_000
    assert svm.balance(vault_pda) == 5_000
    # replay with the same nullifier rejected
    with pytest.raises(ProgramError):
        withdraw()
    # unauthorized sequencer rejected
    with pytest.raises(ProgramError):
        svm.process(Instruction(
            program_id=BRIDGE_PROGRAM_ID,
            accounts=[
                AccountMeta(ALICE, is_signer=True),
                AccountMeta(config_pda),
                AccountMeta(vault_pda, is_writable=True),
                AccountMeta(recipient, is_writable=True),
                AccountMeta(nf_pda, is_writable=True),
                AccountMeta(b"\x00" * 32),
            ],
            data=bytes([2]) + recipient + (1).to_bytes(8, "little")
            + b"\x66" * 32,
        ))


class SevenInput:
    """Trivial 7-public-input relation for fast keygen (same shape as the
    batch circuit's public interface)."""

    def __init__(self, vals):
        self.vals = vals

    def generate_constraints(self, cs):
        ins = [cs.new_input(v) for v in self.vals]
        prod = ins[0] * ins[1]
        expected = cs.new_witness(self.vals[0] * self.vals[1])
        prod.enforce_equal(expected)
        total = ins[2] + ins[3] + ins[4] + ins[5] + ins[6]
        tw = cs.new_witness(sum(self.vals[2:]))
        total.enforce_equal(tw)


def test_submit_batch_zk_verification_cpi():
    """zk_verification.rs equivalent: SubmitBatch verifies a REAL Groth16
    proof via CPI, updates config state, rejects stale/tampered
    submissions."""
    from zelana_tpu.groth16.prove import prove
    from zelana_tpu.groth16.setup import keygen
    from zelana_tpu.sequencer.bridge_program import derive_vk_pda
    from zelana_tpu.sequencer.onchain_verifier import vk_to_solana_account
    from zelana_tpu.sequencer.prover_service import (
        BatchProof,
        BatchPublicInputs,
        proof_to_solana_bytes,
    )
    from zelana_tpu.sequencer.settler import build_submit_batch_instruction

    svm = BridgeSVM()
    config_pda, vault_pda = _init_bridge(svm)

    roots = [bytes([i + 1]) + b"\x00" * 31 for i in range(6)]
    batch_id = 1  # config.batch_index starts at 0; first batch must be 1
    vals = [int.from_bytes(r, "little") for r in roots] + [batch_id]
    circuit = SevenInput(vals)
    pk = keygen(circuit, seed=0)
    proof = prove(pk, circuit, batch_id=batch_id)
    inputs = BatchPublicInputs(*roots, batch_id=batch_id)
    bp = BatchProof(inputs, proof_to_solana_bytes(proof), 1)

    vk_pda = svm.store_vk(DOMAIN, vk_to_solana_account(pk.vk))
    assert vk_pda == derive_vk_pda(DOMAIN)[0]

    ix_data = build_submit_batch_instruction(bp, prev_idx=0)

    def submit(data):
        svm.process(Instruction(
            program_id=BRIDGE_PROGRAM_ID,
            accounts=[
                AccountMeta(SEQUENCER, is_signer=True),
                AccountMeta(config_pda, is_writable=True),
                AccountMeta(VERIFIER_PROGRAM_ID),
                AccountMeta(vk_pda),
            ],
            data=data,
        ))

    submit(ix_data)
    cfg = decode_config(svm.account(config_pda).data)
    assert cfg["batch_index"] == 1
    from zelana_tpu.sequencer.prover_service import batch_inputs_to_solana_bytes

    assert cfg["state_root"] == batch_inputs_to_solana_bytes(inputs)[1]
    assert any("ZK proof verified successfully" in line for line in svm.logs)
    assert any(line.startswith("ZE_BATCH_FINALIZED:") for line in svm.logs)

    # double submit (stale prev index) rejected
    with pytest.raises(ProgramError):
        submit(ix_data)

    # tampered proof rejected by the CPI
    bad = bytearray(ix_data)
    bad[1 + 56 + 8] ^= 1  # flip a proof byte
    with pytest.raises(ProgramError):
        submit(bytes(bad))


def test_full_l1_l2_loop_through_bridge_model():
    """The complete bridge loop against the program model: L1 deposit
    (logs ZE_DEPOSIT) -> deposit indexer -> L2 balance -> L2 withdrawal ->
    settlement -> batched WithdrawAttested execution moving REAL vault
    lamports to the recipient, replay-guarded. (MockProver settlement leg;
    the ZK CPI leg is covered by test_submit_batch_zk_verification_cpi.)"""
    from zelana_tpu.sequencer import crypto
    from zelana_tpu.sequencer.batch import BatchConfig
    from zelana_tpu.sequencer.bridge import DepositIndexer
    from zelana_tpu.sequencer.bridge_program import derive_vault_pda
    from zelana_tpu.sequencer.pipeline import (
        PipelineConfig,
        PipelineOrchestrator,
    )
    from zelana_tpu.sequencer.settler import BridgeProgramSettler
    from zelana_tpu.sequencer.transactions import Withdraw

    svm = BridgeSVM()
    config_pda, vault_pda = _init_bridge(svm)

    alice_seed = b"\x01" * 32
    _, _, alice_l2 = crypto.secret_to_keypair(alice_seed)
    alice_l1 = b"\x77" * 32
    # the depositor signs on L1 with a wallet whose pubkey doubles as the
    # L2 identity (ZE_DEPOSIT:<pk> is what the indexer parses)
    svm.airdrop(alice_l2, 10_000)

    class NoVerifyBridgeSettler(BridgeProgramSettler):
        # MockProver proofs can't pass the ZK CPI; route submit through
        # the mock path but keep the REAL withdrawal execution leg
        def submit(self, proof):
            from zelana_tpu.sequencer.settler import MockSettler

            return MockSettler().submit(proof)

    settler = NoVerifyBridgeSettler(svm, DOMAIN, SEQUENCER)
    orch = PipelineOrchestrator(
        config=PipelineConfig(batch=BatchConfig(max_age_secs=3600)),
        settler=settler, dev_mode=False,
    )

    # L1 deposit: lamports move into the vault, ZE_DEPOSIT logged with the
    # L2 pubkey as the depositor identity the indexer parses
    receipt = _deposit(svm, config_pda, vault_pda, alice_l2, 4_000, nonce=1)
    assert svm.balance(vault_pda) == 4_000

    indexer = DepositIndexer(orch.store, orch.submit)
    ingested = sum(
        indexer.process_log(slot=10 + i, log_line=line)
        for i, line in enumerate(svm.logs)
    )
    assert ingested == 1
    # replaying the same logs is a no-op (processed_deposits dedup)
    assert not any(indexer.process_log(99, line) for line in svm.logs)

    # withdraw back to L1
    wd = Withdraw(from_=alice_l2, to_l1_address=alice_l1, amount=1_500,
                  nonce=0)
    wd.signature = crypto.sign(alice_seed, wd.signing_message())
    assert orch.submit(wd).accepted
    orch.seal()
    deadline = __import__("time").time() + 5
    while __import__("time").time() < deadline:
        orch.tick()
        if orch.stats.batches_settled:
            break
        __import__("time").sleep(0.02)
    assert orch.stats.batches_settled == 1

    # the WithdrawAttested leg moved real lamports out of the vault
    assert svm.balance(alice_l1) == 1_500
    assert svm.balance(vault_pda) == 2_500
    assert orch.get_account(alice_l2).balance == 2_500
    # replay of the same withdrawal nullifier is rejected on L1
    with pytest.raises(ProgramError):
        settler.execute_withdrawals(
            [(alice_l1, 1_500,
              __import__("zelana_tpu.sequencer.pipeline",
                         fromlist=["tx_hash"]).tx_hash(wd))])
