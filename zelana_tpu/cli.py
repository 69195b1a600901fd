"""zelana-tpu command line (mirror of cli/ + the forge service binaries).

    python -m zelana_tpu.cli dev         # local stack: pipeline + HTTP (+UDP)
    python -m zelana_tpu.cli keygen      # Groth16 circuit-specific setup
    python -m zelana_tpu.cli prove       # prove a demo batch end to end
    python -m zelana_tpu.cli verify      # verify a proof file
    python -m zelana_tpu.cli worker      # chunk-proving worker service
    python -m zelana_tpu.cli node        # blind MPC prover node
    python -m zelana_tpu.cli explorer    # live store web explorer
"""

from __future__ import annotations

import argparse
import base64
import json
import sys
import time


def cmd_dev(args):
    from .sequencer.api import start_api
    from .sequencer.config import ZelanaConfig
    from .sequencer.pipeline import (
        PipelineConfig, PipelineOrchestrator, PipelineService)
    from .sequencer.batch import BatchConfig

    from .sequencer.prover_service import build_prover_from_config

    cfg = ZelanaConfig.load(args.config)
    prover = build_prover_from_config(cfg)
    print(f"prover: {type(prover).__name__} (mode={cfg.prover_mode})")
    orch = PipelineOrchestrator(
        config=PipelineConfig(
            batch=BatchConfig(
                max_txs=cfg.batch_max_txs,
                max_age_secs=cfg.batch_max_age_secs,
                max_shielded=cfg.batch_max_shielded,
            )
        ),
        prover=prover,
        dev_mode=cfg.dev_mode,
    )
    service = PipelineService(orch).start()
    server, port = start_api(orch, port=cfg.http_port if not args.ephemeral else 0)
    print(f"zelana-tpu sequencer: http://127.0.0.1:{port}")
    udp = None
    if cfg.udp_enabled:
        from .sdk.zephyr import ZephyrServer

        def udp_handler(req):
            from .sequencer.transactions import Transfer

            tx = Transfer(
                signer_pubkey=bytes.fromhex(req["from"]),
                to=bytes.fromhex(req["to"]),
                amount=int(req["amount"]),
                nonce=int(req["nonce"]),
                signature=bytes.fromhex(req.get("signature", "")),
            )
            res = orch.submit(tx)
            return {"accepted": res.accepted, "error": res.error}

        udp = ZephyrServer(udp_handler, port=cfg.udp_port).start()
        print(f"zephyr udp: 127.0.0.1:{udp.port}")
    try:
        while True:
            time.sleep(1)
    except KeyboardInterrupt:
        print("shutting down (sealing pending batch)...")
        service.stop()
        server.shutdown()
        if udp:
            udp.stop()


def cmd_keygen(args):
    from .circuits.l2_block import L2BlockCircuit
    from .groth16.setup import keygen

    print("Groth16 circuit-specific setup on L2BlockCircuit.dummy() ...")
    start = time.time()
    pk = keygen(L2BlockCircuit.dummy(), seed=args.seed)
    print(f"setup done in {time.time() - start:.1f}s")
    with open(args.pk_out, "wb") as f:
        f.write(pk.serialize_compressed())
    with open(args.vk_out, "wb") as f:
        f.write(pk.vk.serialize_compressed())
    import hashlib

    vk_hash = hashlib.blake2b(pk.vk.serialize_compressed(),
                              digest_size=32).hexdigest()
    print(f"pk -> {args.pk_out}\nvk -> {args.vk_out}\nvk hash: {vk_hash}")


def cmd_prove(args):
    from .circuits.l2_block import (
        L2BlockCircuit, apply_transfers, compute_batch_hash,
        compute_state_root, compute_withdrawal_root)
    from .groth16.keys import ProvingKey
    from .groth16.prove import prove, public_inputs_of
    from .groth16.verify import verify

    with open(args.pk, "rb") as f:
        pk = ProvingKey.deserialize_compressed(f.read())
    circuit = L2BlockCircuit.dummy()
    final = apply_transfers(circuit.initial_accounts, circuit.transactions)
    circuit.pre_state_root = compute_state_root(circuit.batch_id,
                                                circuit.initial_accounts)
    circuit.post_state_root = compute_state_root(circuit.batch_id, final)
    circuit.withdrawal_root = compute_withdrawal_root(circuit.withdrawals)
    circuit.batch_hash = compute_batch_hash(circuit.batch_id,
                                            circuit.transactions)
    start = time.time()
    proof = prove(pk, circuit, batch_id=args.batch_id)
    elapsed = time.time() - start
    ok = verify(pk.vk, proof, public_inputs_of(circuit))
    blob = base64.b64encode(proof.serialize_compressed()).decode()
    with open(args.out, "w") as f:
        json.dump({"proof": blob}, f, indent=2)
    print(f"proved in {elapsed:.1f}s, verified: {ok}, -> {args.out}")


def cmd_verify(args):
    from .groth16.keys import Proof, VerifyingKey
    from .curves import g1, g2

    with open(args.proof) as f:
        blob = base64.b64decode(json.load(f)["proof"])
    proof = Proof.deserialize_compressed(blob)
    checks = {
        "a on curve+subgroup": g1.in_subgroup(proof.a),
        "b on curve+subgroup": g2.in_subgroup(proof.b),
        "c on curve+subgroup": g1.in_subgroup(proof.c),
    }
    for name, ok in checks.items():
        print(f"  {name}: {ok}")
    if args.vk and args.inputs:
        with open(args.vk) as f:
            vk = VerifyingKey.deserialize_compressed(
                base64.b64decode(json.load(f)["verifying_key"]))
        inputs = [int(x, 0) for x in args.inputs.split(",")]
        from .groth16.verify import verify

        print(f"  pairing check: {verify(vk, proof, inputs)}")


def cmd_worker(args):
    """Chunk-proving worker (forge prover-worker main.rs): keygen the
    fixed-capacity chunk circuit once, then serve /prove."""
    from .runtime.chunk_prover import Groth16ChunkProver
    from .runtime.worker import start_worker

    cap = tuple(int(x) for x in args.capacity.split("/"))
    print(f"keygen for capacity {cap}, depth {args.depth}...")
    prover = Groth16ChunkProver.setup(cap, args.depth)
    server, port = start_worker(prover, port=args.port)
    print(f"chunk worker: http://127.0.0.1:{port}")
    try:
        while True:
            time.sleep(1)
    except KeyboardInterrupt:
        server.shutdown()


def cmd_node(args):
    """Blind MPC prover node (forge prover-node main.rs)."""
    from .runtime.prover_node import start_prover_node

    server, port, _ = start_prover_node(args.node_id, port=args.port)
    print(f"prover node {args.node_id}: http://127.0.0.1:{port}")
    try:
        while True:
            time.sleep(1)
    except KeyboardInterrupt:
        server.shutdown()


def cmd_explorer(args):
    """Live store explorer (debug/web parity)."""
    from .sequencer.store import Store
    from .tools.explorer import start_explorer

    _, port = start_explorer(Store(args.db_path), args.port)
    print(f"explorer: http://127.0.0.1:{port}")
    try:
        while True:
            time.sleep(1)
    except KeyboardInterrupt:
        pass


def main(argv=None):
    parser = argparse.ArgumentParser(prog="zelana-tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("dev", help="run the local sequencer stack")
    p.add_argument("--config", default=None)
    p.add_argument("--ephemeral", action="store_true",
                   help="bind an ephemeral HTTP port")
    p.set_defaults(fn=cmd_dev)

    p = sub.add_parser("keygen", help="Groth16 setup for the L2 circuit")
    p.add_argument("--pk-out", default="./proving.key")
    p.add_argument("--vk-out", default="./verifying.key")
    p.add_argument("--seed", type=int, default=0)
    p.set_defaults(fn=cmd_keygen)

    p = sub.add_parser("prove", help="prove the demo batch")
    p.add_argument("--pk", default="./proving.key")
    p.add_argument("--batch-id", type=int, default=0)
    p.add_argument("--out", default="./l2_proof.json")
    p.set_defaults(fn=cmd_prove)

    p = sub.add_parser("verify", help="check a proof file")
    p.add_argument("--proof", default="./l2_proof.json")
    p.add_argument("--vk", default=None)
    p.add_argument("--inputs", default=None,
                   help="comma-separated public inputs")
    p.set_defaults(fn=cmd_verify)

    p = sub.add_parser("worker", help="chunk-proving worker service")
    p.add_argument("--capacity", default="8/4/4",
                   help="transfers/withdrawals/shielded per chunk")
    p.add_argument("--depth", type=int, default=32)
    p.add_argument("--port", type=int, default=0)
    p.set_defaults(fn=cmd_worker)

    p = sub.add_parser("node", help="blind MPC prover node")
    p.add_argument("--node-id", type=int, required=True)
    p.add_argument("--port", type=int, default=0)
    p.set_defaults(fn=cmd_node)

    p = sub.add_parser("explorer", help="live store web explorer")
    p.add_argument("db_path")
    p.add_argument("--port", type=int, default=8899)
    p.set_defaults(fn=cmd_explorer)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
