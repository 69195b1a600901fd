#!/usr/bin/env python3
"""Decompose MSM step cost on the bench TPU: gather vs kernel vs scan."""
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

    from zelana_tpu.ops import limbs as L
    from zelana_tpu.ops.pallas_curve import step_call

    rng = np.random.default_rng(0)
    S = 8192
    total = 1 << 20
    C = 24
    steps = 64
    pool = jnp.asarray(
        rng.integers(0, 1 << 32, size=(C, total // 128, 128), dtype=np.uint64
                     ).astype(np.uint32))
    idx = jnp.asarray(
        rng.integers(0, total // 2, size=(steps, 2, S), dtype=np.int64
                     ).astype(np.int32))

    def timeit(f, *a):
        r = f(*a)
        _ = np.asarray(jax.tree_util.tree_leaves(r)[0])
        t0 = time.time()
        r = f(*a)
        _ = np.asarray(jax.tree_util.tree_leaves(r)[0])
        return time.time() - t0

    # 1. gather only
    @jax.jit
    def gather_only(pool, idx):
        def step(carry, ix):
            A = pool[:, ix[0] // 128, ix[0] % 128]
            B = pool[:, ix[1] // 128, ix[1] % 128]
            return carry + A.sum() + B.sum(), None

        out, _ = jax.lax.scan(step, jnp.zeros((), jnp.uint32), idx)
        return out

    dt = timeit(gather_only, pool, idx)
    print(f"gather-only: {dt / steps * 1e3:.2f} ms/step", flush=True)

    # 2. full step (gather + kernel + in-place write), as in _run_tape
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

    dt = timeit(full, pool, idx)
    print(f"full step:   {dt / steps * 1e3:.2f} ms/step", flush=True)

    # 3. kernel only (operands precomputed, no gather)
    A0 = jnp.asarray(rng.integers(0, 1 << 32, size=(C, S // 128, 128),
                                  dtype=np.uint64).astype(np.uint32))
    B0 = jnp.asarray(rng.integers(0, 1 << 32, size=(C, S // 128, 128),
                                  dtype=np.uint64).astype(np.uint32))

    @jax.jit
    def kernel_only(pool, A0, B0):
        def step(pool, t):
            st = (t * S).reshape(1).astype(jnp.int32) % (total // 2)
            out = call(st, A0, B0, pool)
            return out, None

        ts = jnp.arange(steps, dtype=jnp.int32)
        pool, _ = jax.lax.scan(step, pool, ts)
        return pool.sum()

    dt = timeit(kernel_only, pool, A0, B0)
    print(f"kernel-only: {dt / steps * 1e3:.2f} ms/step", flush=True)

    # 4. mixed kernel only
    callm = step_call(L.FQ.modulus, "g1", S, total, False, True)
    Am = A0[:16]
    Bm = B0[:16]

    @jax.jit
    def mixed_only(pool, Am, Bm):
        def step(pool, t):
            st = (t * S).reshape(1).astype(jnp.int32) % (total // 2)
            out = callm(st, Am, Bm, pool)
            return out, None

        ts = jnp.arange(steps, dtype=jnp.int32)
        pool, _ = jax.lax.scan(step, pool, ts)
        return pool.sum()

    dt = timeit(mixed_only, pool, Am, Bm)
    print(f"mixed-only:  {dt / steps * 1e3:.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()
