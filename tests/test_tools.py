"""Debug tooling: the db TUI's pure decoding layer (debug/db parity)."""

import json

from zelana_tpu.sequencer.store import COLUMN_FAMILIES, Store
from zelana_tpu.tools.db_tui import decode_row, row_lines, tab_counts


def _store():
    s = Store()
    s.put("accounts", b"\xab" * 32,
          (500).to_bytes(8, "little") + (3).to_bytes(8, "little"))
    s.put("tx_index", b"\x01" * 32, json.dumps(
        {"kind": "transfer", "status": "finalized", "batch_id": 7,
         "amount": 250}).encode())
    s.put("batches", (7).to_bytes(8, "little"), json.dumps(
        {"id": 7, "state": "finalized", "txs": 2}).encode())
    s.put("nullifiers", b"\x7b" * 32, b"\x01")
    s.put("encrypted_notes", (4).to_bytes(8, "little"),
          b"\x02" * 32 + b"\xcc" * 100)
    return s


def test_decode_account_row():
    summary, detail = decode_row(
        "accounts", b"\xab" * 32,
        (500).to_bytes(8, "little") + (3).to_bytes(8, "little"))
    assert "balance=500" in summary and "nonce=3" in summary
    assert "balance 500" in detail


def test_decode_json_cfs():
    summary, detail = decode_row("tx_index", b"\x01" * 32, json.dumps(
        {"kind": "transfer", "status": "pending"}).encode())
    assert "transfer" in summary
    assert "pending" in detail


def test_decode_encrypted_note():
    summary, detail = decode_row(
        "encrypted_notes", (4).to_bytes(8, "little"),
        b"\x02" * 32 + b"\xcc" * 100)
    assert "pos=4" in summary and "100B ciphertext" in summary
    assert ("cc" * 100) in detail


def test_row_lines_filtering_and_counts():
    s = _store()
    assert dict(tab_counts(s))["accounts"] == 1
    rows = row_lines(s, "tx_index")
    assert len(rows) == 1
    assert row_lines(s, "tx_index", filter_text="finalized")
    assert not row_lines(s, "tx_index", filter_text="nonexistent-xyz")
    # every column family decodes without raising
    for cf in COLUMN_FAMILIES:
        row_lines(s, cf)
