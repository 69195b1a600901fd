#!/usr/bin/env python3
"""A BIG MSM through the sharded path: segments x mesh, verified.

BASELINE config 5 is the 2^24-point MSM across chips/hosts. The sharded
engine (parallel/sharded.py msm_begin_sharded) was previously exercised
only at 2^16/2^18, where each shard fits one scan; at >= 2^20 points an
8-device mesh gives 2^17-point shards, which EXCEED msm_scan.CHUNK_N and
drive the seg_handle segment loop (sharded.py) -- the segment x mesh
interaction this tool pins down, with the multi-host slicing glue
(parallel/distributed.host_point_slice) selecting this host's range.

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/msm_sharded_big.py [--n 20] [--devices 8] \
        [--json artifacts/msm_sharded_r5.json]

Correctness: points are a 128-long generator cycle, so the expected sum
has the closed form g * sum(s_i * (1 + i % 128)). CPU-mesh wall numbers
are directional (8 virtual devices share 2 host cores); the committed
single-chip TPU numbers live in artifacts/msm_long_r4.json.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=20)
    parser.add_argument("--devices", type=int, default=8)
    parser.add_argument("--json", default=None)
    args = parser.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/zelana_tpu_xla")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import random

    from zelana_tpu.curves import g1 as G1
    from zelana_tpu.fields.bn254 import R
    from zelana_tpu.ops import msm_scan as MS
    from zelana_tpu.parallel import distributed as D
    from zelana_tpu.parallel.sharded import (
        _prepare_sharded,
        make_mesh,
        msm_begin_sharded,
    )

    n = 1 << args.n
    report = {"log_n": args.n, "points": n, "devices": args.devices,
              "backend": "cpu-virtual-mesh"}
    g = G1.generator()
    base, acc = [], g
    for _ in range(128):
        base.append(acc)
        acc = G1.add(acc, g)

    # multi-host glue: this host prepares only its own slice (on a
    # single-host run that is the full range; the API surface is the same
    # one the multi-host launcher uses)
    lo, hi = D.host_point_slice(n)
    report["host_slice"] = [lo, hi]
    pts = [base[i % 128] for i in range(lo, hi)]
    rng = random.Random(9)
    scalars = [rng.randrange(R) for _ in range(n)][lo:hi]
    expect = G1.mul(g, sum(s * (1 + ((lo + i) % 128))
                           for i, s in enumerate(scalars)) % R)

    mesh = make_mesh(args.devices)
    shard = -(-len(pts) // args.devices)
    report["points_per_shard"] = shard
    report["segments_per_shard"] = -(-shard // MS.CHUNK_N)
    assert shard > MS.CHUNK_N, (
        "this size does not exercise the segment loop; use --n >= 20")
    print(f"2^{args.n} points over {args.devices} devices: "
          f"{shard} pts/shard = {report['segments_per_shard']} segments "
          "per shard", flush=True)

    t0 = time.time()
    prep = _prepare_sharded(pts, mesh, "g1")
    report["prepare_s"] = round(time.time() - t0, 2)
    print(f"prepare: {report['prepare_s']}s", flush=True)

    t0 = time.time()
    got = MS.msm_end(msm_begin_sharded(prep, scalars, mesh))
    report["first_s"] = round(time.time() - t0, 2)
    assert got == expect, "sharded 2^%d MSM result WRONG" % args.n
    print(f"first (compiles): {report['first_s']}s, verified", flush=True)

    t0 = time.time()
    got = MS.msm_end(msm_begin_sharded(prep, scalars, mesh))
    report["steady_s"] = round(time.time() - t0, 2)
    assert got == expect
    report["mpoints_per_s"] = round(n / report["steady_s"] / 1e6, 4)
    report["verified"] = True
    print(f"steady: {report['steady_s']}s = "
          f"{report['mpoints_per_s']} Mpoints/s, verified", flush=True)

    if args.json:
        with open(args.json, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {args.json}")
    print(f"OK: sharded 2^{args.n} MSM verified on the {args.devices}-dev "
          "mesh")


if __name__ == "__main__":
    main()
