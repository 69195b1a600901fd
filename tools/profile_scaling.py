#!/usr/bin/env python3
"""Sharded-MSM scaling on the virtual CPU mesh: wall time vs mesh size.

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/profile_scaling.py [--n 18] [--devices 1,2,4,8]

Measures the production point-sharded run-scan MSM (parallel/sharded.py
msm_begin_sharded: per-shard bucket scan + reduce-scatter/all-gather
ppermute allreduce) at 2^n points across mesh sizes. CPU-mesh numbers are
DIRECTIONAL (all "devices" share one host's cores, so ideal scaling is
flat wall time, not linear speedup; on real chips each device is its own
compute) — the point is that the sharded program runs, shards evenly,
and the collective overhead stays bounded. Results feed the scaling
table in docs/PERFORMANCE.md.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=18)
    parser.add_argument("--devices", default="1,2,4,8")
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
    from zelana_tpu.parallel.sharded import (
        _prepare_sharded,
        make_mesh,
        msm_begin_sharded,
    )

    n = 1 << args.n
    g = G1.generator()
    base, acc = [], g
    for _ in range(128):
        base.append(acc)
        acc = G1.add(acc, g)
    pts = [base[i % 128] for i in range(n)]
    rng = random.Random(5)
    scalars = [rng.randrange(R) for _ in range(n)]
    # closed-form expectation: points are small generator multiples
    expect = G1.mul(g, sum(s * (1 + (i % 128))
                           for i, s in enumerate(scalars)) % R)

    rows = []
    for d in (int(x) for x in args.devices.split(",")):
        mesh = make_mesh(d)
        t0 = time.time()
        prep = _prepare_sharded(pts, mesh, "g1")
        t_prep = time.time() - t0
        h = msm_begin_sharded(prep, scalars, mesh)
        got = MS.msm_end(h)
        assert got == expect, f"mesh={d}: wrong MSM result"
        t0 = time.time()
        h = msm_begin_sharded(prep, scalars, mesh)
        got = MS.msm_end(h)
        dt = time.time() - t0
        assert got == expect
        rows.append((d, dt, t_prep))
        print(f"devices={d}: {dt:.2f} s warm ({n / dt / 1e6:.4f} Mpoints/s"
              f"; prepare+compile {t_prep:.1f} s)", flush=True)

    base_t = rows[0][1]
    print(f"\n2^{args.n} points, warm wall time (one shared host!):")
    for d, dt, _ in rows:
        print(f"  {d} device(s): {dt:6.2f} s  ({base_t / dt:.2f}x vs 1-dev)")


if __name__ == "__main__":
    main()
