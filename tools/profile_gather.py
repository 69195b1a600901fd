#!/usr/bin/env python3
"""Is the MSM step's fixed cost the TWO pool gathers? Compare:

- two separate (C, S) gathers per step (current msm_fast layout)
- one fused (C, 2S) gather split into A|B (halves gather dispatches)
- wider steps (S=16384/32768) with the fused gather

profile_smallstep measured ~0.55 ms/step fixed cost at any S; DEVNOTES
pins a single 8192-wide 24-row gather at ~0.25 ms, so the two operand
gathers are the prime suspect.
"""
import os, sys, time
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/zelana_tpu_xla_tpu")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    from zelana_tpu.ops import limbs as L
    from zelana_tpu.ops.pallas_curve import step_call

    rng = np.random.default_rng(0)
    total = 1 << 20
    C = 24
    lanes_total = 64 * 8192  # constant work across configs
    pool0 = jnp.asarray(rng.integers(0, 1 << 32, size=(C, total // 128, 128),
                                     dtype=np.uint64).astype(np.uint32))

    for S, fused_gather in ((8192, False), (8192, True), (16384, True),
                            (32768, True), (16384, False)):
        steps = lanes_total // S
        idx = jnp.asarray(
            rng.integers(0, total // 2, size=(steps, 2, S), dtype=np.int64
                         ).astype(np.int32))
        call = step_call(L.FQ.modulus, "g1", S, total, False, False)

        @jax.jit
        def full(pool, idx):
            def step(pool, xs):
                ix, t = xs
                if fused_gather:
                    flat = ix.reshape(2 * S)
                    AB = pool[:, flat // 128, flat % 128]
                    A, B = AB[:, :S], AB[:, S:]
                else:
                    A = pool[:, ix[0] // 128, ix[0] % 128]
                    B = pool[:, ix[1] // 128, ix[1] % 128]
                st = (t * S).reshape(1).astype(jnp.int32) % (total // 2)
                out = call(st, A.reshape(C, S // 128, 128),
                           B.reshape(C, S // 128, 128), pool)
                return out, None
            ts = jnp.arange(steps, dtype=jnp.int32)
            pool, _ = jax.lax.scan(step, pool, (idx, ts))
            return pool.sum()

        _ = np.asarray(full(pool0, idx))
        t0 = time.time()
        _ = np.asarray(full(pool0, idx))
        dt = time.time() - t0
        print(f"S={S} fused_gather={fused_gather}: {dt / steps * 1e3:.2f} "
              f"ms/step, total {dt * 1e3:.0f} ms for {lanes_total} lanes",
              flush=True)

if __name__ == "__main__":
    main()
