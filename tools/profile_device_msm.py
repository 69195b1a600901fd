#!/usr/bin/env python3
"""Break the DEVICE-ONLY 2^16 MSM into its terms: gather vs scan vs merge.

VERDICT r04 ask #3 names the "uint16 point pool" as the next lever for
msm_device_mpps. The pool has in fact stored 16-bit limb PAIRS packed in
u32 words since round 2 (_pack_pool: 16 u32 rows/point = 512 bits, the
information-theoretic floor for an affine G1 point) -- so the lever as
named cannot halve anything. What CAN still move the number is whatever
share of the 2^16 device MSM the pool gather actually is. This tool
measures it directly:

  full      -- _device_msm exactly as bench.py's device-only leg runs it
  gather    -- the schedule unpack + pool gather alone (sum-reduced)
  scan      -- runscan kernel(s) from PRE-GATHERED operands (clock starts
               after vals are staged on device)
  merge     -- dense gather + K-layer merge + subset tree from a staged
               emit buffer

full ~= gather + scan + merge (+ dispatch fixed costs); the printed table
names the next term honestly.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, reps=8):
    _ = fn()  # warm/compile
    t0 = time.time()
    for _i in range(reps):
        r = fn()
    _ = np.asarray(r)
    return (time.time() - t0) / reps


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/zelana_tpu_xla_tpu")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import functools
    import random

    import jax.numpy as jnp

    from zelana_tpu.curves import g1 as G1
    from zelana_tpu.fields.bn254 import R as FR
    from zelana_tpu.ops import limbs as L
    from zelana_tpu.ops import msm_scan as MS

    print("devices:", jax.devices(), file=sys.stderr)
    n = 1 << 16
    g = G1.generator()
    pts, acc = [], g
    for _ in range(256):
        pts.append(acc)
        acc = G1.add(acc, g)
    while len(pts) < n:
        pts.append(pts[len(pts) % 256])
    rng = random.Random(7)
    scalars = [rng.randrange(FR) for _ in range(n)]

    prepared = MS.prepare_g1(pts)
    pool = prepared[0]
    s = MS.build_schedule(MS.scalar_digits(scalars), lanes=MS.LANES)
    sched_dev = jnp.asarray(MS._pack_sched(s))
    lanes = s.perm.shape[1]
    args = dict(curve="g1", R=s.R, lanes=lanes, K=s.K,
                has_bits=s.flag_bits is not None, R2=s.R2, lanes2=s.lanes2,
                has_l2=s.pos2 is not None, dense16=MS._dense16(s))
    print(f"schedule: R={s.R} lanes={lanes} K={s.K} l2={s.pos2 is not None} "
          f"R2={s.R2} lanes2={s.lanes2}", file=sys.stderr)

    # --- full: identical to bench.py's device-only leg -------------------
    dt_full = timed(
        lambda: MS._device_msm(pool, sched_dev, MS._subset_idx(), **args))
    print(f"full device MSM:  {dt_full * 1e3:7.1f} ms  "
          f"({n / dt_full / 1e6:.3f} Mp/s)")

    # --- gather: schedule unpack + pool gather, sum-reduced --------------
    R, K = s.R, s.K
    has_bits = s.flag_bits is not None

    @functools.partial(jax.jit, static_argnames=())
    def gather_only(pool, sched):
        off = 0
        npw = (R + 1) * lanes // 2
        pw = jax.lax.slice(sched, (off,), (off + npw,))
        perm = jnp.stack([pw & 0xFFFF, pw >> 16], axis=1).reshape(
            R + 1, lanes)
        if has_bits:
            pid = perm.astype(jnp.int32)
        else:
            pid = (perm & 0x7FFF).astype(jnp.int32)
        vals = pool[:, pid // 128, pid % 128]
        return vals.sum(dtype=jnp.uint32)

    dt_gather = timed(lambda: gather_only(pool, sched_dev))
    print(f"gather alone:     {dt_gather * 1e3:7.1f} ms  "
          f"({dt_gather / dt_full * 100:.0f}% of full)")

    # --- scan: runscan kernel from staged operands -----------------------
    from zelana_tpu.ops.pallas_curve import runscan_call

    interpret = jax.default_backend() == "cpu"
    Ls = lanes // 128
    pid_h = ((np.asarray(s.perm) & (0x7FFF if not has_bits else 0xFFFF))
             .astype(np.int32))
    vals_h = np.asarray(pool)[:, pid_h // 128, pid_h % 128]
    VC = vals_h.shape[0]
    vals4 = jnp.asarray(
        vals_h.reshape(VC, R + 1, Ls, 128).transpose(1, 0, 2, 3))
    if has_bits:
        fb = np.asarray(s.flag_bits)
        bits = (fb[:, :, None] >> np.arange(32, dtype=np.uint32)) & 1
        flag_h = bits.reshape(R + 1, lanes).astype(np.int32)
    else:
        flag_h = (np.asarray(s.perm) >> 15).astype(np.int32)
    flag3 = jnp.asarray(flag_h.reshape(R + 1, Ls, 128))

    call = runscan_call(L.FQ.modulus, "g1", Ls, R, interpret)

    @jax.jit
    def scan_only(v, f):
        return call(v, f).sum(dtype=jnp.uint32)

    dt_scan = timed(lambda: scan_only(vals4, flag3))
    print(f"L1 scan alone:    {dt_scan * 1e3:7.1f} ms  "
          f"({dt_scan / dt_full * 100:.0f}% of full)")

    # --- merge: everything downstream of the L1 emit buffer --------------
    emit = call(vals4, flag3)
    flat0 = jnp.asarray(np.asarray(
        emit.transpose(1, 0, 2, 3).reshape(24, (R + 1) * lanes)))
    sub_idx = MS._subset_idx()
    dense_np = s.dense_idx.astype(np.int32)
    pos2 = s.pos2

    @jax.jit
    def merge_only(flat):
        from zelana_tpu.ops.pallas_curve import pairs_add_call

        C = 24
        if pos2 is not None:
            R2, lanes2 = s.R2, s.lanes2
            Ls2 = lanes2 // 128
            p2 = jnp.asarray(pos2)
            flag2 = ((p2 >> 31) & 1).astype(jnp.int32)
            pid2 = (p2 & 0x7FFFFFFF).astype(jnp.int32)
            flat3 = flat.reshape(C, (R + 1) * lanes // 128, 128)
            vals_l2 = flat3[:, pid2 // 128, pid2 % 128]
            v4 = vals_l2.transpose(1, 0, 2).reshape(R2 + 1, C, Ls2, 128)
            f3 = flag2.reshape(R2 + 1, Ls2, 128)
            emit2 = runscan_call(L.FQ.modulus, "g1", Ls2, R2, interpret,
                                 proj_in=True)(v4, f3)
            flat = emit2.transpose(1, 0, 2, 3).reshape(C, (R2 + 1) * lanes2)

        def padd(a, b):
            m = a.shape[1]
            mp = -(-m // 128) * 128
            if mp != m:
                a = jnp.pad(a, ((0, 0), (0, mp - m)))
                b = jnp.pad(b, ((0, 0), (0, mp - m)))
            out = pairs_add_call(L.FQ.modulus, "g1", mp, interpret)(
                a.reshape(C, mp // 128, 128), b.reshape(C, mp // 128, 128))
            return out.reshape(C, mp)[:, :m]

        dense = flat[:, jnp.asarray(dense_np)]
        merged = dense[:, 0]
        for k in range(1, s.K):
            merged = padd(merged, dense[:, k])
        sub = merged[:, sub_idx]
        h = MS.SCAN_BUCKETS // 2
        x = sub.reshape(C, MS.SCAN_BITS * MS.SCAN_WINDOWS, h)
        while h > 1:
            h //= 2
            a = x[:, :, :h].reshape(C, -1)
            b = x[:, :, h:2 * h].reshape(C, -1)
            x = padd(a, b).reshape(C, MS.SCAN_BITS * MS.SCAN_WINDOWS, h)
        return x[:, :, 0].sum(dtype=jnp.uint32)

    dt_merge = timed(lambda: merge_only(flat0))
    print(f"L2+merge+subsets: {dt_merge * 1e3:7.1f} ms  "
          f"({dt_merge / dt_full * 100:.0f}% of full)")

    acct = dt_gather + dt_scan + dt_merge
    print(f"sum of parts:     {acct * 1e3:7.1f} ms  vs full "
          f"{dt_full * 1e3:.1f} ms ({acct / dt_full * 100:.0f}%)")

    # mul-bound context: the L1 scan does (R+1)*lanes complete z2=1 adds
    # of 11 muls (the padded rows are real adds too)
    adds = (R + 1) * lanes
    print(f"L1 stream: {adds} rows x 11 mul = {adds * 11 / 1e6:.1f} Mmul",
          file=sys.stderr)


if __name__ == "__main__":
    main()
