#!/usr/bin/env python3
"""Keygen + prove ONE full-capacity 8/4/4 depth-32 chunk on the TPU.

The production chunk shape (forge zelana_batch/main.nr:27-30): ~1.13M
constraints. One proving key serves every chunk of the network; this
script builds it, proves a maximally-occupied chunk (8 transfers + 4
withdrawals + 4 shielded -- including one FULL-verification shielded
spend -- with real intermediate SMT paths), verifies, and reports phase
timings. Artifacts cache to --keydir so reruns skip keygen; --json writes
the committed evidence file (CHUNK_BENCH.json).

    python tools/prove_chunk_full.py [--capacity 8/4/4] [--depth 32]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--capacity", default="8/4/4")
    parser.add_argument("--depth", type=int, default=32)
    parser.add_argument("--keydir", default="/root/.cache/zelana_tpu_keys")
    parser.add_argument("--json", default=None,
                        help="write phase timings as JSON (the committed "
                             "CHUNK_BENCH.json evidence)")
    parser.add_argument("--reps", type=int, default=1,
                        help="warm prove repetitions after the cold one")
    args = parser.parse_args()
    cap = tuple(int(x) for x in args.capacity.split("/"))
    report = {"capacity": args.capacity, "depth": args.depth}

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/zelana_tpu_xla_tpu")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from zelana_tpu.groth16.keys import ProvingKey
    from zelana_tpu.r1cs.native_synth import synthesize_chunk
    from zelana_tpu.runtime.chunk_prover import Groth16ChunkProver
    from zelana_tpu.runtime.chunk_witness import ChunkWitnessBuilder
    from zelana_tpu.runtime.coordinator import Dispatcher

    print("devices:", jax.devices(), file=sys.stderr)
    report["device"] = str(jax.devices()[0])

    t0 = time.time()
    circuit = Groth16ChunkProver.dummy_circuit(cap, args.depth)
    system = synthesize_chunk(circuit)  # native C++ synthesis (~1.4 s)
    if system is None:
        print("native synth unavailable; aborting (the Python DSL "
              "costs ~100 s/prove at this shape)", file=sys.stderr)
        sys.exit(1)
    n_constraints = system.num_constraints
    report["synthesis_s"] = round(time.time() - t0, 2)
    report["constraints"] = n_constraints
    report["variables"] = system.num_vars
    print(f"synthesis (native): {report['synthesis_s']}s, "
          f"{n_constraints} constraints, {system.num_vars} vars",
          file=sys.stderr)

    os.makedirs(args.keydir, exist_ok=True)
    # npz = raw-coordinate cache (seconds to load); the compressed arkworks
    # format needs one modular sqrt per point (~90 min at this key's 5.7M
    # points) and is kept only as the wire format
    key_path = os.path.join(
        args.keydir, f"chunk_{cap[0]}_{cap[1]}_{cap[2]}_d{args.depth}.npz")
    if os.path.exists(key_path):
        t0 = time.time()
        pk = ProvingKey.load_npz(key_path)
        prover = Groth16ChunkProver(pk, cap, args.depth)
        report["key_load_s"] = round(time.time() - t0, 2)
        print(f"key loaded: {report['key_load_s']}s", file=sys.stderr)
    else:
        t0 = time.time()
        prover = Groth16ChunkProver.setup(cap, args.depth)
        report["keygen_s"] = round(time.time() - t0, 2)
        print(f"keygen: {report['keygen_s']}s", file=sys.stderr)
        prover.pk.save_npz(key_path)

    # a maximally-occupied chunk with real intermediate Merkle paths; one
    # shielded slot is a FULL-verification spend (input note + nullifier)
    builder = ChunkWitnessBuilder(args.depth)
    for pk_i in range(1, 16):
        builder.fund(pk_i, 10_000)
    note_pos = builder.add_note(spending_key=777, value=50, blinding=42)
    transfers = [(1 + (i % 8), 1 + ((i + 3) % 8), 10 + i)
                 for i in range(cap[0])]
    withdrawals = [(1 + i, 0xAA00 + i, 5 + i) for i in range(cap[1])]
    shielded = [("full", note_pos, 777, 0xFACE, 50, 4242)] + [
        1000 + i for i in range(cap[2] - 1)]
    chunks = Dispatcher.build_chunks_with_witness(
        builder, transfers, withdrawals, shielded, capacity=cap,
        pre_shielded_root=builder.shielded_root())
    assert len(chunks) == 1

    t0 = time.time()
    cp = prover.prove_chunk(chunks[0], batch_id=7)
    dt = time.time() - t0
    report["prove_cold_s"] = report["prove_s"] = round(dt, 2)
    report["prove_reported_ms"] = cp.proving_time_ms
    print(f"prove COLD (full {cap[0]}/{cap[1]}/{cap[2]} chunk): {dt:.1f}s "
          f"({cp.proving_time_ms} ms reported)", file=sys.stderr)

    # WARM rep(s): same process, same quantized program shapes, pools
    # device-resident -- the prover's steady state (the reference budgets
    # 300 s/chunk, noir_client.rs:60; this is the number to beat). The
    # per-phase table of the BEST warm rep is embedded so the committed
    # breakdown comes from the same run as the headline number.
    from zelana_tpu.groth16 import prove as P

    warm, phase_tables = [], []
    for rep in range(args.reps):
        P.phase_log_start()
        t0 = time.time()
        cp = prover.prove_chunk(chunks[0], batch_id=8 + rep)
        warm.append(round(time.time() - t0, 2))
        phase_tables.append([[dt, label]
                             for _t, dt, label in P.phase_log_take()])
        print(f"prove WARM rep {rep}: {warm[-1]:.1f}s", file=sys.stderr)
    if warm:
        report["prove_warm_s"] = min(warm)
        report["prove_warm_all_s"] = warm
        report["beats_reference_300s_budget"] = bool(min(warm) < 300)
        report["prove_warm_phases"] = phase_tables[
            warm.index(min(warm))]

    t0 = time.time()
    ok = prover.verify_chunk(cp)
    report["verify_s"] = round(time.time() - t0, 2)
    report["verified"] = bool(ok)
    print(f"verify: {ok} in {report['verify_s']}s", file=sys.stderr)
    assert ok, "full-capacity chunk proof failed verification"
    if args.json:
        with open(args.json, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {args.json}", file=sys.stderr)
    print(f"OK: {n_constraints}-constraint chunk proved in {dt:.1f}s")


if __name__ == "__main__":
    main()
