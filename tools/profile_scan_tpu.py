#!/usr/bin/env python3
"""Benchmark the run-scan MSM on the TPU bench device, with a phase
breakdown (schedule build, upload, device scan, host tail)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/zelana_tpu_xla_tpu")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    import random

    from zelana_tpu.curves import g1 as G1
    from zelana_tpu.fields.bn254 import R as FR
    from zelana_tpu.ops import msm_scan as MS
    from zelana_tpu.ops.msm_scan import scalar_digits

    print("devices:", jax.devices(), file=sys.stderr)
    LOGN = int(os.environ.get("LOGN", "14"))
    N = 1 << LOGN
    g = G1.generator()
    pts, acc = [], g
    for _ in range(min(N, 64)):
        pts.append(acc)
        acc = G1.add(acc, g)
    while len(pts) < N:
        pts.append(pts[len(pts) % 64])
    rng = random.Random(12345)
    scalars = [rng.randrange(FR) for _ in range(N)]

    prep = MS.prepare_g1(pts)
    _ = np.asarray(prep[0][:1, :1])

    # warm / compile
    t0 = time.time()
    r1 = MS.msm_g1_prepared(prep, scalars)
    print(f"warm (compile): {time.time()-t0:.1f}s", file=sys.stderr)

    # golden check on a small prefix via tail-summing is too slow at 2^14;
    # trust the CPU-tested path, but sanity-check determinism
    r2 = MS.msm_g1_prepared(prep, scalars)
    assert r1 == r2

    # phase breakdown
    t0 = time.time()
    digits = scalar_digits(scalars, prep[1])
    t1 = time.time()
    sched = MS.build_schedule(digits)
    t2 = time.time()
    h = MS.msm_begin(prep, scalars, "g1", schedule=sched)
    g_arr = h[0]
    gg = np.asarray(g_arr)
    t3 = time.time()
    res = MS.msm_end((g_arr, "g1"))
    t4 = time.time()
    print(f"digits: {(t1-t0)*1e3:.1f} ms", file=sys.stderr)
    print(f"schedule: {(t2-t1)*1e3:.1f} ms", file=sys.stderr)
    print(f"upload+device+fetch: {(t3-t2)*1e3:.1f} ms", file=sys.stderr)
    print(f"host tail: {(t4-t3)*1e3:.1f} ms", file=sys.stderr)
    print(f"perm bytes: {sched.perm.nbytes}, dense: {sched.dense_idx.nbytes},"
          f" R={sched.R} K={sched.K} lanes={sched.perm.shape[1]}",
          file=sys.stderr)

    # pipelined: overlap schedule build with device execution
    reps = 4
    t0 = time.time()
    handles = []
    for i in range(reps):
        handles.append(MS.msm_begin(prep, scalars, "g1", digits=digits))
    outs = [MS.msm_end(hh) for hh in handles]
    dt = (time.time() - t0) / reps
    print(f"pipelined x{reps}: {dt*1e3:.1f} ms/msm -> "
          f"{N/dt/1e6:.4f} Mpoints/s", file=sys.stderr)


if __name__ == "__main__":
    main()
