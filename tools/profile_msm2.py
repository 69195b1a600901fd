#!/usr/bin/env python3
"""End-to-end MSM phase breakdown: digits, tape build, device, host tail."""
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
    import jax.numpy as jnp

    from zelana_tpu.curves import g1 as G1
    from zelana_tpu.fields.bn254 import R
    from zelana_tpu.ops import msm_fast as MF
    from zelana_tpu.ops.msm import scalar_digits

    msm_n = 1 << 14
    g = G1.generator()
    pts = []
    acc = g
    for _ in range(msm_n):
        pts.append(acc)
        acc = G1.add(acc, g)
    import random as _random

    _r = _random.Random(12345)
    scalars = [_r.randrange(R) for _ in range(msm_n)]
    prepared = MF.prepare_g1(pts)

    _ = MF.msm_g1_prepared(prepared, scalars)  # warm

    for it in range(2):
        coords, inf = prepared
        t0 = time.time()
        digits = scalar_digits(scalars, inf)
        t1 = time.time()
        tape = MF.build_tape(digits)
        t2 = time.time()
        buf, mixed16, hi16, gen_steps = MF._pack_tape(tape)
        buf_dev = jnp.asarray(buf)
        _ = np.asarray(jax.jit(lambda v: v[-1])(buf_dev))
        t3 = time.time()
        X, Y = coords
        gout = MF._run_tape(X, Y, buf_dev, "g1", tape.S,
                            tape.a0, tape.total_slots, tape.mixed_steps,
                            gen_steps, mixed16, hi16)
        gh = np.asarray(gout)
        t4 = time.time()
        res = MF._finish_host(gh, "g1")
        t5 = time.time()
        print(f"iter{it}: digits={1e3*(t1-t0):.1f}ms tape={1e3*(t2-t1):.1f}ms "
              f"xfer={1e3*(t3-t2):.1f}ms device={1e3*(t4-t3):.1f}ms "
              f"tail={1e3*(t5-t4):.1f}ms total={1e3*(t5-t0):.1f}ms "
              f"steps={tape.idx.shape[0]} S={tape.S}", flush=True)


if __name__ == "__main__":
    main()
