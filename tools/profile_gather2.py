#!/usr/bin/env python3
"""Gather variants for the run-scan MSM: with/without transpose."""
import functools, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/zelana_tpu_xla_tpu")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    print("devices:", jax.devices(), file=sys.stderr)
    N = 1 << 14
    R1, Ls = 65, 64
    rng = np.random.default_rng(0)
    pool = jnp.asarray(rng.integers(0, 1 << 32, size=(16, N // 128, 128), dtype=np.uint64).astype(np.uint32))
    idx = jnp.asarray(rng.integers(0, N, size=(R1, Ls, 128), dtype=np.int64).astype(np.int32))
    np.asarray(pool[:1, :1]); np.asarray(idx[:1, :1])

    @jax.jit
    def g_plain(pool, idx):  # (16, R1, Ls, 128), no transpose
        return pool[:, idx // 128, idx % 128]

    @jax.jit
    def g_transposed(pool, idx):
        v = pool[:, idx // 128, idx % 128]
        return v.transpose(1, 0, 2, 3)

    @jax.jit
    def g_flat(pool, idx):  # flat-pool take
        p = pool.reshape(16, -1)
        return jnp.take(p, idx.reshape(-1), axis=1)

    for name, fn in [("plain", g_plain), ("transposed", g_transposed), ("flat_take", g_flat)]:
        out = fn(pool, idx); np.asarray(out.reshape(-1)[:2])
        t0 = time.time()
        reps = 5
        for _ in range(reps):
            out = fn(pool, idx)
            np.asarray(out.reshape(-1)[:2])
        dt = (time.time() - t0) / reps
        print(f"{name}: {dt*1e3:.1f} ms", file=sys.stderr)

    # upper bound: pure sync cost
    @jax.jit
    def nop(pool):
        return pool[:1, :1, :1]
    np.asarray(nop(pool))
    t0 = time.time()
    for _ in range(5):
        np.asarray(nop(pool))
    print(f"sync floor: {(time.time()-t0)/5*1e3:.1f} ms", file=sys.stderr)

if __name__ == "__main__":
    main()
