#!/usr/bin/env python3
"""Long-dimension MSM on the real TPU: 2^18 .. 2^24 through the segmented
run-scan engine (BASELINE config 5's top size is 2^24).

    python tools/profile_msm_long.py [--sizes 18,20,22,24] [--reps 2]

Design notes for the big sizes:
- the point set is a 256-point generator cycle TILED at the packed-pool
  level (bucket shapes depend on scalars, not point values, so timing is
  representative; the closed-form expected result makes every run
  verifiable);
- scalars are uniform 253-bit (numpy-generated 4x64-bit limbs, top limb
  masked), so the digit stream is full-width in every window except the
  top one;
- every size reuses the ONE compiled 2^16-segment program
  (shape-quantized schedules); the measured number is steady-state wall
  time of a full MSM: per-segment schedule build (native, overlapped) +
  packed upload + scan + host fold.

Writes the rows to stdout and optionally --json for docs/PERFORMANCE.md.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def tiled_prepared(n):
    """prepare_g1 for a 256-point generator cycle tiled to n points."""
    from zelana_tpu.curves import g1 as G1
    from zelana_tpu.ops import msm_scan as MS
    from zelana_tpu.ops.msm import g1_points_to_device

    g = G1.generator()
    pts, acc = [], g
    for _ in range(256):
        pts.append(acc)
        acc = G1.add(acc, g)
    coords, inf = g1_points_to_device(pts)
    import jax.numpy as jnp

    pool256 = np.asarray(MS._pack_pool(coords, "g1"))  # (VC, 2, 128)
    pool = np.tile(pool256, (1, n // 256, 1))  # (VC, n/128, 128)
    return (jnp.asarray(pool), None, "g1"), pts


def random_scalars(n, seed):
    """(n, 4) u64 LE limbs, uniform over [0, 2^253) (< R)."""
    rng = np.random.default_rng(seed)
    limbs = rng.integers(0, 1 << 64, size=(n, 4), dtype=np.uint64)
    limbs[:, 3] &= np.uint64((1 << 61) - 1)
    return limbs


def expected_point(limbs):
    """Closed form: sum_i s_i * (1 + i % 256) * g, via per-stratum sums."""
    from zelana_tpu.curves import g1 as G1
    from zelana_tpu.fields.bn254 import R

    n = len(limbs)
    total = 0
    lo = (limbs & np.uint64(0xFFFFFFFF)).astype(np.int64)
    hi = (limbs >> np.uint64(32)).astype(np.int64)
    for k in range(256):
        sl = lo[k::256].sum(axis=0)
        sh = hi[k::256].sum(axis=0)
        s = 0
        for j in range(3, -1, -1):
            s = (s << 64) + (int(sh[j]) << 32) + int(sl[j])
        total = (total + s * (1 + k)) % R
    return G1.mul(G1.generator(), total)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--sizes", default="18,20,22,24")
    parser.add_argument("--reps", type=int, default=2)
    parser.add_argument("--json", default=None)
    args = parser.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/zelana_tpu_xla_tpu")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from zelana_tpu.ops import msm_scan as MS

    print("devices:", jax.devices(), file=sys.stderr)
    rows = []
    for log_n in (int(x) for x in args.sizes.split(",")):
        n = 1 << log_n
        t0 = time.time()
        prepared, _pts = tiled_prepared(n)
        limbs = random_scalars(n, seed=log_n)
        exp = expected_point(limbs)
        prep_s = time.time() - t0
        digits = MS.scalar_digits(limbs)
        sched_mb = 0.0
        # one-segment schedule cost estimate for the accounting line
        seg = MS.build_schedule(digits[:, :MS.CHUNK_N])
        sched_mb = MS._pack_sched(seg).nbytes / 1e6 * (n / MS.CHUNK_N)

        # warm/compile + correctness
        t0 = time.time()
        got = MS.msm_end(MS.msm_begin(prepared, None, "g1", digits=digits))
        warm_s = time.time() - t0
        assert got == exp, f"2^{log_n}: wrong MSM result"
        best = None
        for rep in range(args.reps):
            t0 = time.time()
            got = MS.msm_end(
                MS.msm_begin(prepared, None, "g1", digits=digits))
            dt = time.time() - t0
            assert got == exp
            best = dt if best is None or dt < best else best
            print(f"2^{log_n} rep {rep}: {dt:.2f}s", file=sys.stderr)
        mpps = n / best / 1e6
        rows.append({
            "log_n": log_n, "points": n, "steady_s": round(best, 2),
            "first_s": round(warm_s, 2), "mpoints_per_s": round(mpps, 4),
            "upload_mb_per_msm": round(sched_mb, 1),
            "prep_s": round(prep_s, 1),
        })
        print(f"2^{log_n}: {best:.2f}s steady -> {mpps:.4f} Mpoints/s "
              f"({sched_mb:.0f} MB schedule/MSM; first {warm_s:.2f}s)",
              flush=True)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(rows, f, indent=1)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
