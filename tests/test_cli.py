"""CLI subcommand coverage (cli/src/main.rs:13-45 surface parity).

`zelana test` (dev.rs run_tests analogue), `zelana deploy` (dev.rs deploy +
scripts store_vk analogue), and `airdrop` against a live dev stack.
"""

import json
import os

from zelana_tpu.cli import main


def test_cli_e2e_test_command(capsys):
    assert main(["test", "--timeout", "30"]) == 0
    out = capsys.readouterr().out
    assert "e2e: OK" in out
    assert "[FAIL]" not in out
    assert "withdrawal executed on L1" in out


def test_cli_deploy_command(tmp_path, capsys):
    out_path = str(tmp_path / "deployment.json")
    assert main(["deploy", "--out", out_path]) == 0
    desc = json.load(open(out_path))
    assert desc["network"] == "mock"
    assert len(bytes.fromhex(desc["config_pda"])) == 32
    assert len(bytes.fromhex(desc["vault_pda"])) == 32
    assert desc["vk_upload_chunks"] >= 3  # init + >=1 ic chunk + finalize
    assert "vk stored" in capsys.readouterr().out


def test_cli_airdrop_against_dev_stack():
    """airdrop (cli/src/airdrop.rs airdrop_if_needed analogue) drives the
    /dev/deposit faucet of a live ephemeral sequencer."""
    from zelana_tpu.sequencer.api import start_api
    from zelana_tpu.sequencer.pipeline import (
        PipelineConfig, PipelineOrchestrator, PipelineService)

    orch = PipelineOrchestrator(config=PipelineConfig(), dev_mode=True)
    service = PipelineService(orch).start()
    server, port = start_api(orch, port=0)
    try:
        pk = (b"\x5a" * 32).hex()
        rc = main(["airdrop", pk, "--amount", "1234",
                   "--url", f"http://127.0.0.1:{port}"])
        assert rc == 0
        pend = orch.get_pending_account(b"\x5a" * 32)
        bal = (pend.balance if pend
               else orch.get_account(b"\x5a" * 32).balance)
        assert bal >= 1234
    finally:
        server.shutdown()
        service.stop()


def test_cli_genkey_command(tmp_path, capsys):
    import json as _json
    import os as _os

    path = str(tmp_path / "id.json")
    assert main(["genkey", path]) == 0
    doc = _json.load(open(path))
    assert len(bytes.fromhex(doc["pubkey"])) == 32
    assert len(bytes.fromhex(doc["privacy_pk"])) == 32
    assert oct(_os.stat(path).st_mode)[-3:] == "600"
    # the written parts reconstruct a working signer
    from zelana_tpu.sdk.keypair import ZelanaKeypair

    kp = ZelanaKeypair(bytes.fromhex(doc["signing_seed"]),
                       bytes.fromhex(doc["privacy_sk"]))
    assert kp.pubkey.hex() == doc["pubkey"]
