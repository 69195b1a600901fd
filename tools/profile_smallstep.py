#!/usr/bin/env python3
"""Per-step cost vs step width S: is a small-S tail section worth it?

The MSM tape's last ~10-14 steps are depth-bound (each level of the
remaining reduction tree has far fewer pairs than S=8192 lanes but must
wait for the previous step). If a S=1024 step costs much less than a
S=8192 step, a third tape section with small steps trims ~10 ms of air.
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
    steps = 64
    pool0 = jnp.asarray(rng.integers(0, 1 << 32, size=(C, total // 128, 128),
                                     dtype=np.uint64).astype(np.uint32))

    for S in (8192, 4096, 2048, 1024):
        idx = jnp.asarray(
            rng.integers(0, total // 2, size=(steps, 2, S), dtype=np.int64
                         ).astype(np.int32))
        call = step_call(L.FQ.modulus, "g1", S, total, False, False)

        @jax.jit
        def full(pool, idx):
            def step(pool, xs):
                ix, t = xs
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
        print(f"S={S}: {dt / steps * 1e3:.2f} ms/step", flush=True)

if __name__ == "__main__":
    main()
