#!/usr/bin/env python3
"""Does the tape upload overlap device compute across pipelined MSMs?

Times k back-to-back MSMs issued as begin,begin,...,end,end against k * the
single-MSM latency. If the relay executes the upload of MSM k+1 while the
device still runs MSM k, steady-state throughput beats 1/latency and the
Groth16 prove pipeline (5+ MSMs) should lean on msm_begin batching harder.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/zelana_tpu_xla_tpu")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from zelana_tpu.curves import g1 as G1
    from zelana_tpu.fields.bn254 import R
    from zelana_tpu.ops import msm_fast as MF

    msm_n = 1 << 14
    g = G1.generator()
    pts = []
    acc = g
    for _ in range(msm_n):
        pts.append(acc)
        acc = G1.add(acc, g)
    import random as _random

    _r = _random.Random(12345)
    scalar_sets = [
        [_r.randrange(R) for _ in range(msm_n)] for _ in range(4)
    ]
    prepared = MF.prepare_g1(pts)

    _ = MF.msm_g1_prepared(prepared, scalar_sets[0])  # warm

    # single-MSM latency
    for name, k in (("single", 1), ("pipe2", 2), ("pipe4", 4)):
        t0 = time.time()
        handles = [
            MF.msm_begin(prepared, scalar_sets[i], "g1") for i in range(k)
        ]
        t_begin = time.time() - t0
        res = [MF.msm_end(h) for h in handles]
        dt = time.time() - t0
        print(
            f"{name}: total={dt * 1e3:.0f}ms begin={t_begin * 1e3:.0f}ms "
            f"-> {dt / k * 1e3:.0f}ms/msm",
            flush=True,
        )
        assert all(r is not None for r in res)


if __name__ == "__main__":
    main()
