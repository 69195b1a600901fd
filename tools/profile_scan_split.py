#!/usr/bin/env python3
"""Split the run-scan MSM device time: gather vs scan vs merge/subset."""
import functools
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
    from zelana_tpu.ops import limbs as L
    from zelana_tpu.ops import msm_scan as MS
    from zelana_tpu.ops.msm_scan import scalar_digits
    from zelana_tpu.ops.pallas_curve import runscan_call

    print("devices:", jax.devices(), file=sys.stderr)
    N = 1 << 14
    g = G1.generator()
    pts, acc = [], g
    for _ in range(64):
        pts.append(acc)
        acc = G1.add(acc, g)
    while len(pts) < N:
        pts.append(pts[len(pts) % 64])
    rng = random.Random(5)
    scalars = [rng.randrange(FR) for _ in range(N)]
    prep = MS.prepare_g1(pts)
    pool = prep[0]
    np.asarray(pool[:1, :1])

    digits = scalar_digits(scalars, prep[1])
    for lanes in (8192,):
        s = MS.build_schedule(digits, lanes=lanes)
        R, Lx = s.R, s.perm.shape[1]
        Ls = Lx // 128
        perm_d = jnp.asarray(s.perm)
        np.asarray(perm_d[:1, :1])

        @functools.partial(jax.jit, static_argnames=("R", "Ls"))
        def gather_only(pool, perm, R, Ls):
            pid = (perm & 0x7FFF).astype(jnp.int32)
            vals = pool[:, pid // 128, pid % 128]
            return vals.reshape(16, R + 1, Ls, 128).transpose(1, 0, 2, 3)

        vals = gather_only(pool, perm_d, R=R, Ls=Ls)
        np.asarray(vals[:1, :1, :1])
        t0 = time.time()
        for _ in range(3):
            vals = gather_only(pool, perm_d, R=R, Ls=Ls)
            np.asarray(vals[:1, :1, :1, :1])
        t_gather = (time.time() - t0) / 3
        print(f"lanes={lanes}: gather {t_gather*1e3:.1f} ms", file=sys.stderr)

        flag3 = jnp.asarray(
            ((s.perm >> 15) & 1).astype(np.int32).reshape(R + 1, Ls, 128)
        )

        @functools.partial(jax.jit, static_argnames=("R", "Ls"))
        def scan_only(vals, flag3, R, Ls):
            call = runscan_call(L.FQ.modulus, "g1", Ls, R, False)
            return call(vals, flag3)

        emit = scan_only(vals, flag3, R=R, Ls=Ls)
        np.asarray(emit[:1, :1, :1, :1])
        t0 = time.time()
        for _ in range(3):
            emit = scan_only(vals, flag3, R=R, Ls=Ls)
            np.asarray(emit[:1, :1, :1, :1])
        t_scan = (time.time() - t0) / 3
        print(f"lanes={lanes}: scan {t_scan*1e3:.1f} ms "
              f"({R+1} rows, K={s.K})", file=sys.stderr)

        # full device program for comparison
        h = MS.msm_begin(prep, scalars, "g1", schedule=s)
        np.asarray(h[0][:1, :1])
        t0 = time.time()
        for _ in range(3):
            h = MS.msm_begin(prep, scalars, "g1", schedule=s)
            np.asarray(h[0][:1, :1])
        t_full = (time.time() - t0) / 3
        print(f"lanes={lanes}: full device (cached sched) "
              f"{t_full*1e3:.1f} ms", file=sys.stderr)


if __name__ == "__main__":
    main()
