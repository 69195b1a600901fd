"""WebSocket deposit ingest: RFC 6455 transport + Solana pubsub shapes.

The reference indexer subscribes over Solana WS `logsSubscribe`
(bridge/ingest.rs); these tests drive the full wire path -- handshake,
masked client frames, JSON-RPC subscribe, logsNotification push --
into the DepositIndexer and the live pipeline.
"""

import time

from zelana_tpu.sequencer.bridge import DepositIndexer
from zelana_tpu.sequencer.ws import (
    LogsSubscribeServer,
    WsClient,
    WsServer,
    accept_key,
    encode_frame,
    start_ws_indexer,
)

ALICE = b"\x11" * 32


def test_accept_key_rfc_example():
    # the RFC 6455 1.3 worked example
    assert accept_key("dGhlIHNhbXBsZSBub25jZQ==") == \
        "s3pPLMBiTxaQ9kYGzzhZRbK+xOo="


def test_frame_roundtrip_masked_and_lengths():
    import io

    from zelana_tpu.sequencer import ws as W

    class FakeSock:
        def __init__(self, data):
            self.buf = io.BytesIO(data)

        def recv(self, n):
            return self.buf.read(n)

    for payload in (b"", b"hi", b"x" * 200, b"y" * 70000):
        for mask in (True, False):
            frame = encode_frame(W.OP_TEXT, payload, mask=mask)
            opcode, got = W.read_frame(FakeSock(frame))
            assert opcode == W.OP_TEXT
            assert got == payload


def test_ws_client_server_echo():
    def handler(conn):
        while True:
            text = conn.recv_text()
            if text is None:
                return
            conn.send_text(text.upper())

    server = WsServer(handler)
    try:
        client = WsClient("127.0.0.1", server.port)
        client.send_text("zelana")
        assert client.recv_text() == "ZELANA"
        client.close()
    finally:
        server.close()


def test_ws_indexer_end_to_end_with_dedup():
    from zelana_tpu.sequencer.batch import BatchConfig
    from zelana_tpu.sequencer.pipeline import (
        PipelineConfig,
        PipelineOrchestrator,
    )

    orch = PipelineOrchestrator(
        config=PipelineConfig(batch=BatchConfig(max_age_secs=3600)))
    idx = DepositIndexer(orch.store, orch.submit)
    pubsub = LogsSubscribeServer()
    try:
        thread = start_ws_indexer(idx, "127.0.0.1", pubsub.port,
                                  bridge_program="ZeBridge111")
        deadline = time.time() + 5
        while time.time() < deadline and not pubsub._subs:
            time.sleep(0.02)
        assert pubsub._subs, "indexer never subscribed"

        line = f"Program log: ZE_DEPOSIT:{ALICE.hex()}:750:1"
        pubsub.publish(10, ["Program ZeBridge111 invoke [1]", line])
        pubsub.publish(11, [line])  # same l1_seq: must dedup
        deadline = time.time() + 5
        while time.time() < deadline and orch.stats.submitted < 1:
            time.sleep(0.02)
        assert orch.stats.submitted == 1
        assert idx.last_processed_slot() == 10

        # settle and check the balance landed
        orch.seal()
        deadline = time.time() + 5
        while time.time() < deadline and orch.stats.batches_settled == 0:
            orch.tick()
            time.sleep(0.02)
        assert orch.get_account(ALICE).balance == 750
        thread.stop.set()
    finally:
        pubsub.close()
