"""Multi-chip sharding for the prover (jax.sharding.Mesh + shard_map).

This is the TPU-native replacement for the reference's distributed proving
plane (forge coordinator slicing batches across HTTP workers,
forge/crates/prover-coordinator/src/dispatcher.rs): instead of chunked
HTTP/JSON fan-out, the MSM point set and the witness hash batch are sharded
over a device mesh and partial results combine over ICI collectives.

Layout:
- axis "dp": points / hash batches partitioned across devices
- MSM: each device runs the full local Pippenger pipeline on its point shard
  (device-side sort + segmented scan + bucket reduce + Horner), producing one
  Jacobian point; shards combine with an all_gather + log-depth point-add
  tree. Communication is 3 coordinates x 16 limbs per device -- bytes, not
  megabytes; ICI-friendly.
- Hashing: embarrassingly parallel; sharded batch, no collectives.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import limbs as L
from ..ops.curve_ops import FqOps, Fq2Ops, point_add, point_double, point_inf, point_select
from ..ops.msm import N_BUCKETS, N_WINDOWS, WINDOW_BITS


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def _pcast_varying(a, axes):
    """Promote a replicated value to 'varying' over `axes` inside shard_map.
    jax.lax.pvary is deprecated in favor of pcast (JAX 0.9); support both."""
    if hasattr(jax.lax, "pcast"):
        return jax.lax.pcast(a, axes, to="varying")
    return jax.lax.pvary(a, axes)


def _ops(curve):
    return FqOps if curve == "g1" else Fq2Ops


# ---------------------------------------------------------------------------
# fully device-side local MSM (no host preprocessing; used inside shard_map)
# ---------------------------------------------------------------------------


def _local_msm(F, X, Y, digits, axes=None):
    """X, Y: coord pytrees leaves (16, n); digits (N_WINDOWS, n) int32.

    Returns a single Jacobian point, leaves (16, 1). ``axes``: shard_map
    axis name(s) -- constants created inside the mapped function are
    replicated ("unvarying") and must be promoted to 'varying' before mixing with
    device-varying data in loop carries.
    """
    def _pv(t):
        if axes is None:
            return t
        return jax.tree_util.tree_map(lambda a: _pcast_varying(a, axes), t)

    n = digits.shape[1]
    log_n = max(1, math.ceil(math.log2(n)))

    order = jnp.argsort(digits, axis=1)
    keys = jnp.take_along_axis(digits, order, axis=1)
    gather = lambda a: a[:, order]  # noqa: E731  (16, W, n)
    Xg = jax.tree_util.tree_map(gather, X)
    Yg = jax.tree_util.tree_map(gather, Y)
    Z = _pv(F.one_mont((N_WINDOWS, n)))
    vals = (Xg, Yg, Z)

    starts = jnp.concatenate(
        [jnp.ones((N_WINDOWS, 1), bool), keys[:, 1:] != keys[:, :-1]], axis=1
    )
    ends = jnp.concatenate(
        [keys[:, 1:] != keys[:, :-1], jnp.ones((N_WINDOWS, 1), bool)], axis=1
    )

    flags = starts
    pos = jnp.arange(n)[None, :]
    for k in range(log_n):
        off = 1 << k
        shifted_vals = jax.tree_util.tree_map(
            lambda a: jnp.roll(a, off, axis=-1), vals
        )
        shifted_flags = jnp.roll(flags, off, axis=-1)
        valid = pos >= off
        combined = point_add(F, vals, shifted_vals)
        keep = flags | ~valid
        vals = point_select(F, keep, vals, combined)
        flags = flags | (shifted_flags & valid)

    scatter_idx = jnp.where(ends, keys, 0)
    win_idx = jnp.broadcast_to(jnp.arange(N_WINDOWS)[:, None], keys.shape)

    def scatter(leaf):
        out = jnp.zeros((L.NLIMBS, N_WINDOWS, N_BUCKETS), jnp.uint32)
        out = out.at[:, win_idx, scatter_idx].set(jnp.where(ends[None], leaf, 0))
        return out.at[:, :, 0].set(0)

    buckets = jax.tree_util.tree_map(scatter, vals)

    def bstep(i, carry):
        running, total = carry
        d = N_BUCKETS - 1 - i
        bucket = jax.tree_util.tree_map(
            lambda a: jax.lax.dynamic_slice_in_dim(a, d, 1, axis=2)[:, :, 0],
            buckets,
        )
        running = point_add(F, running, tuple(bucket))
        total = point_add(F, total, running)
        return (running, total)

    inf_w = _pv(point_inf(F, (N_WINDOWS,)))
    _, totals = jax.lax.fori_loop(0, N_BUCKETS - 1, bstep, (inf_w, inf_w))

    def horner(acc, w):
        for _ in range(WINDOW_BITS):
            acc = point_double(F, acc)
        wnd = jax.tree_util.tree_map(
            lambda a: jax.lax.dynamic_slice_in_dim(a, w, 1, axis=1), totals
        )
        return point_add(F, acc, tuple(wnd)), None

    top = jax.tree_util.tree_map(
        lambda a: jax.lax.dynamic_slice_in_dim(a, N_WINDOWS - 1, 1, axis=1),
        totals,
    )
    acc, _ = jax.lax.scan(horner, tuple(top), jnp.arange(N_WINDOWS - 2, -1, -1))
    return acc


def _combine_across_devices(F, local_pt, axis: str):
    """all_gather single points and fold with a point-add tree."""
    gathered = jax.tree_util.tree_map(
        lambda a: jax.lax.all_gather(a, axis, axis=1), local_pt
    )  # leaves (16, D, 1)
    d = jax.tree_util.tree_leaves(gathered)[0].shape[1]
    acc = jax.tree_util.tree_map(lambda a: a[:, 0], gathered)
    acc = tuple(acc)
    for i in range(1, d):
        nxt = tuple(jax.tree_util.tree_map(lambda a: a[:, i], gathered))
        acc = point_add(F, acc, nxt)
    return acc


def sharded_msm(coords, digits, mesh: Mesh, curve: str = "g1", axis: str = "dp"):
    """coords: (X, Y) leaves (16, N); digits (N_WINDOWS, N); N % D == 0.

    Returns a replicated Jacobian point (leaves (16, 1)).
    """
    F = _ops(curve)
    X, Y = coords

    def shard_fn(Xs, Ys, ds):
        local = _local_msm(F, Xs, Ys, ds, axes=axis)
        return _combine_across_devices(F, local, axis)

    coord_spec = jax.tree_util.tree_map(lambda _: P(None, axis), X)
    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(coord_spec, coord_spec, P(None, axis)),
        out_specs=jax.tree_util.tree_map(lambda _: P(None, None), X),
        # the gathered fold is replicated by construction (same all_gather
        # result folded identically on every device); the static checker
        # cannot prove that, so varying-axis checking is off here
        check_vma=False,
    )
    return fn(X, Y, digits)


# ---------------------------------------------------------------------------
# data-parallel hashing (witness generation / commitment batches)
# ---------------------------------------------------------------------------


def sharded_mimc_hash2(a, b, mesh: Mesh, axis: str = "dp"):
    """Batched MiMC hash_2 with the batch axis sharded across the mesh."""
    from ..hashes.mimc_jax import hash2_batch

    fn = jax.shard_map(
        hash2_batch,
        mesh=mesh,
        in_specs=(P(None, axis), P(None, axis)),
        out_specs=P(None, axis),
    )
    return fn(a, b)


# ---------------------------------------------------------------------------
# single-transform sharded NTT: butterfly stages exchanged over ICI
# ---------------------------------------------------------------------------
#
# ONE transform of size n block-sharded across D devices. The first
# log2(n/D) DIT stages are local (butterfly distance < shard size); the top
# log2(D) stages pair element i with i ^ 2^s across devices -- each is ONE
# ppermute of the full local block over ICI plus a full-width butterfly.
# This is the all-to-all butterfly schedule from BASELINE config 2 /
# SURVEY 2.7 (the radix-2 analogue of the reference's chunked long
# dimension), replacing ops/ntt.py's single-chip-only transform when the
# domain no longer fits one chip's HBM.


def sharded_ntt(x, plan, mesh: Mesh, axis: str = "dp",
                inverse: bool = False):
    """x: (16, n) global array (any sharding; resharded internally).
    Returns the transform in natural order, block-sharded along `axis`."""
    from jax.sharding import NamedSharding

    D = int(np.prod(mesh.devices.shape))
    n = plan.n
    m = n // D
    log_m = m.bit_length() - 1
    log_n = n.bit_length() - 1
    tables = (plan.twiddles_inv_dev() if inverse else plan.twiddles_dev())

    def local_fn(xs):
        xs = xs.reshape(L.NLIMBS, m)
        dev = jax.lax.axis_index(axis)
        # local stages: butterfly distance < m, twiddles repeat per group
        for s in range(log_m):
            half = 1 << s
            groups = m // (2 * half)
            xr = xs.reshape(L.NLIMBS, groups, 2, half)
            a, b = xr[:, :, 0, :], xr[:, :, 1, :]
            tw = jnp.broadcast_to(tables[s][:, None, :],
                                  (L.NLIMBS, groups, half))
            bt = L.mont_mul(b, tw, L.FR)
            xs = jnp.stack(
                [L.add(a, bt, L.FR), L.sub(a, bt, L.FR)], axis=2
            ).reshape(L.NLIMBS, m)
        # cross-device stages: partner block = device ^ 2^k, one ppermute
        # of the whole local block per stage
        for s in range(log_m, log_n):
            k = s - log_m
            perm = [(i, i ^ (1 << k)) for i in range(D)]
            recv = jax.lax.ppermute(xs, axis, perm)
            bit = (dev >> k) & 1
            a = jnp.where(bit, recv, xs)
            b = jnp.where(bit, xs, recv)
            # within-group twiddle position of local j:
            # (dev & (2^k - 1)) * m + j
            lo_dev = dev & ((1 << k) - 1)
            tw = jax.lax.dynamic_slice_in_dim(
                _pcast_varying(tables[s], (axis,)), 0, (1 << s), axis=1
            )
            tw = jax.lax.dynamic_slice_in_dim(tw, lo_dev * m, m, axis=1)
            bt = L.mont_mul(b, tw, L.FR)
            xs = jnp.where(bit, L.sub(a, bt, L.FR), L.add(a, bt, L.FR))
        return xs

    x = jnp.take(x, plan.bitrev_dev(), axis=1)  # global gather (resharded)
    fn = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=P(None, axis), out_specs=P(None, axis),
        check_vma=False,
    )
    out = fn(x)
    if inverse:
        n_inv = L.broadcast_scalar(plan.n_inv_mont, (n,))
        out = L.mont_mul(out, n_inv, L.FR)
    return out


def sharded_intt(x, plan, mesh: Mesh, axis: str = "dp"):
    return sharded_ntt(x, plan, mesh, axis=axis, inverse=True)


# ---------------------------------------------------------------------------
# sharded run-scan MSM: point shards + ppermute bucket-array reduction
# ---------------------------------------------------------------------------
#
# The production multi-chip MSM: each device owns N/D points and their
# scalars, runs the run-scan bucket accumulation (ops/msm_scan.py) on its
# shard to a dense (C, W*256) bucket-point array, then the D dense arrays
# allreduce with a recursive-halving REDUCE-SCATTER (log2(D) ppermute
# rounds of halving width) + one tiled all_gather -- per-device wire
# volume 2(D-1)/D of the array, the bandwidth-optimal allreduce -- after
# which every device holds the global bucket sums. The bit-subset tree and
# host Horner finish as in the single-chip path. This replaces the
# reference's coordinator/worker HTTP fan-out for the compute plane
# (SURVEY 2.7); the host-side Dispatcher remains the cross-HOST axis.


@functools.lru_cache(maxsize=32)
def _shard_program(mesh: Mesh, axis: str, curve: str, R: int, lanes: int,
                   K: int, has_bits: bool):
    """One compiled shard_map MSM program per (mesh, shape) bucket.

    jax.jit caches per Python function object, so building the mapped
    closure inline (as round 3 did) recompiles the SAME XLA program for
    every msm_begin_sharded call -- the a/b1/l/h queries of one Groth16
    prove share (R=16, lanes=8192, K=8) yet paid four 2.5-minute CPU
    compiles each in the driver's dryrun (MULTICHIP_r03 rc=124). The
    factory is the fix: identical shapes reuse one traced+compiled
    program across calls and across MSMs."""
    from ..ops import msm_scan as MS
    from ..ops.pallas_curve import (
        _coords,
        _flat,
        kernel_pack,
        kernel_unpack,
        proj_add_xla,
        runscan_call,
    )

    C = 24 if curve == "g1" else 48
    fused = MS._use_fused()
    subset = MS._subset_idx()
    D = int(np.prod(mesh.devices.shape))

    def shard_fn(pool, perm, fbits, dense_idx):
        pool = pool[0]
        perm = perm[0]
        dense_idx = dense_idx[0]
        if has_bits:
            pid = perm.astype(jnp.int32)
            bits = jnp.right_shift(
                fbits[0][:, :, None], jnp.arange(32, dtype=jnp.uint32)
            ) & 1
            flag = bits.reshape(R + 1, lanes).astype(jnp.int32)
        else:
            pid = (perm & 0x7FFF).astype(jnp.int32)
            flag = (perm >> 15).astype(jnp.int32)
        vals = pool[:, pid // 128, pid % 128]
        VC = vals.shape[0]
        if fused:
            vals4 = vals.reshape(VC, R + 1, lanes // 128, 128).transpose(
                1, 0, 2, 3)
            flag3 = flag.reshape(R + 1, lanes // 128, 128)
            emit = runscan_call(L.FQ.modulus, curve, lanes // 128, R,
                                False)(vals4, flag3)
            flat = emit.transpose(1, 0, 2, 3).reshape(C, (R + 1) * lanes)
        else:
            vals2 = vals.transpose(1, 0, 2)
            emit = MS._runscan_xla(vals2, flag, curve)
            flat = emit.transpose(1, 0, 2).reshape(C, (R + 1) * lanes)

        def padd(a, b):
            P3 = _coords(kernel_unpack(a), curve, 3 if curve == "g1" else 6)
            Q3 = _coords(kernel_unpack(b), curve, 3 if curve == "g1" else 6)
            return kernel_pack(_flat(proj_add_xla(P3, Q3, curve), curve))

        layers = flat[:, dense_idx]  # (C, K, W*256)
        merged = layers[:, 0]
        if K > 1:
            # lax.scan (not an unrolled loop): the merge body compiles once
            # regardless of K, keeping the XLA program small -- compile
            # time, not runtime, is the binding constraint on the virtual
            # CPU mesh the driver dry-runs on
            rest = jnp.moveaxis(layers[:, 1:], 1, 0)  # (K-1, C, W*256)
            merged = jax.lax.scan(
                lambda m, l: (padd(m, l), None), merged, rest)[0]

        # Allreduce of the dense bucket-point array: recursive-halving
        # REDUCE-SCATTER + tiled all_gather (replaces round 3's XOR
        # butterfly). Per-device wire volume drops from log2(D) full
        # arrays to 2(D-1)/D (1.75x less at D=8) and the add work from
        # log2(D) full-width complete adds to a halving series (3.4x
        # less) -- the lever VERDICT r03 named for a positive scaling
        # point. MSB-first half selection keeps the scattered segments in
        # natural device order, so the all_gather needs no reshuffle.
        logD = int(np.log2(D))
        assert (1 << logD) == D, "mesh size must be a power of two"
        if D > 1:
            dev = jax.lax.axis_index(axis)
            for k in range(logD):
                b = logD - 1 - k
                half = merged.shape[1] // 2
                lower, upper = merged[:, :half], merged[:, half:]
                bit = (dev >> b) & 1
                send = jnp.where(bit, lower, upper)
                keep = jnp.where(bit, upper, lower)
                pairs = [(i, i ^ (1 << b)) for i in range(D)]
                recv = jax.lax.ppermute(send, axis, pairs)
                merged = padd(keep, recv)
            merged = jax.lax.all_gather(merged, axis, axis=1, tiled=True)

        sub = merged[:, subset]
        h = MS.SCAN_BUCKETS // 2
        x = sub.reshape(C, MS.SCAN_BITS * MS.SCAN_WINDOWS, h)
        while h > 1:
            h //= 2
            a = x[:, :, :h].reshape(C, -1)
            b = x[:, :, h:2 * h].reshape(C, -1)
            x = padd(a, b).reshape(C, MS.SCAN_BITS * MS.SCAN_WINDOWS, h)
        finals = x[:, :, 0]
        lo = finals & 0xFFFF
        hi = finals >> 16
        return jnp.stack([lo, hi], axis=1).reshape(2 * C, -1)

    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(None, None),
        check_vma=False,
    )
    return jax.jit(fn)


def sharded_msm_scan_begin(pool_shards, schedules, mesh: Mesh,
                           curve: str = "g1", axis: str = "dp",
                           k_min: int = 0):
    """pool_shards: per-device packed pools stacked on axis 0
    (D, VC, np/128, 128); schedules: per-shard msm_scan.Schedule list with
    UNIFORM (R, lanes) (equal shard sizes guarantee this); K pads to the
    max over shards (floored at k_min -- callers use it to keep the
    compiled-program set small; padded dense layers gather emit position 0,
    the identity, and fold as no-op complete adds).
    Returns the (2C, 256) finals handle (sync with msm_scan.msm_end)."""
    from ..ops import msm_scan as MS

    D = int(np.prod(mesh.devices.shape))
    assert len(schedules) == D
    s0 = schedules[0]
    R, lanes = s0.R, s0.perm.shape[1]
    K = MS._round_pow2(max(max(s.K for s in schedules), k_min, 1))
    has_bits = s0.flag_bits is not None

    perm = jnp.asarray(np.stack([s.perm for s in schedules]))
    fbits = (jnp.asarray(np.stack([s.flag_bits for s in schedules]))
             if has_bits else jnp.zeros((D, 1, 1), jnp.uint32))
    dense = np.zeros((D, K, s0.dense_idx.shape[1]), np.int32)
    for i, s in enumerate(schedules):
        dense[i, :s.K] = s.dense_idx
    dense = jnp.asarray(dense)

    fn = _shard_program(mesh, axis, curve, R, lanes, K, has_bits)
    g = fn(pool_shards, perm, fbits, dense)
    return (g, curve)


# G1 shard programs pad K to >=8: the production prove's a/b1/l/h queries
# then share ONE compiled program shape (K floats between 4 and 8 with the
# witness data; uniformity costs a few no-op scan layers, a recompile costs
# minutes). Override for experiments.
SHARD_K_MIN_G1 = int(__import__("os").environ.get("ZELANA_SHARD_KMIN", "8"))


def sharded_msm_scan(points, scalars, mesh: Mesh, curve: str = "g1",
                     axis: str = "dp"):
    """Full sharded MSM from python points/scalars (N % D == 0)."""
    from ..ops import msm_scan as MS
    from ..ops.msm_fast import _finish_host

    scalar_digits = MS.scalar_digits
    D = int(np.prod(mesh.devices.shape))
    n = len(points)
    assert n % D == 0
    shard = n // D
    pools, schedules = [], []
    prep = (MS.prepare_g1 if curve == "g1" else MS.prepare_g2)
    for d in range(D):
        pool, inf, _ = prep(points[d * shard:(d + 1) * shard])
        digits = scalar_digits(scalars[d * shard:(d + 1) * shard], inf)
        pools.append(pool)
        schedules.append(MS.build_schedule(
            digits, lanes=MS.LANES if curve == "g1" else MS.LANES_G2,
            level2=False))
    pool_shards = jnp.stack(pools)
    handle = sharded_msm_scan_begin(
        pool_shards, schedules, mesh, curve, axis,
        k_min=SHARD_K_MIN_G1 if curve == "g1" else 0)
    return _finish_host(handle[0], curve, window_bits=MS.SCAN_BITS,
                        n_windows=MS.SCAN_WINDOWS)


# ---------------------------------------------------------------------------
# prove()-facing sharded MSM API (mirrors ops/msm_scan.msm_begin/msm_end)
# ---------------------------------------------------------------------------


def prepare_g1_sharded(points, mesh: Mesh):
    return _prepare_sharded(points, mesh, "g1")


def prepare_g2_sharded(points, mesh: Mesh):
    return _prepare_sharded(points, mesh, "g2")


def _prepare_sharded(points, mesh: Mesh, curve: str):
    """Split the fixed query basis across the mesh once per proving key.
    Points pad to equal shards with a repeated point; the padding scalars
    are zeroed at schedule time (zero digits land in dropped buckets)."""
    from ..ops import msm_scan as MS

    D = int(np.prod(mesh.devices.shape))
    n = len(points)
    shard = -(-n // D)
    padded = list(points) + [points[0]] * (D * shard - n)
    prep = MS.prepare_g1 if curve == "g1" else MS.prepare_g2
    pools, infs = [], []
    for d in range(D):
        pool, inf, _ = prep(padded[d * shard:(d + 1) * shard])
        pools.append(pool)
        infs.append(inf)
    return (jnp.stack(pools), infs, curve, n, shard)


def msm_begin_sharded(prepared, scalars, mesh: Mesh, digits=None,
                      axis: str = "dp"):
    """Sharded twin of msm_scan.msm_begin: slice scalars per shard, build
    per-shard schedules (host, overlappable), dispatch the shard_map
    program. Sync with ops.msm_fast._finish_host via msm_scan.msm_end.

    Shards beyond msm_scan.CHUNK_N points (the uint16 point-id limit --
    reached by the h/l queries of the production 8/4/4 chunk key on small
    meshes) dispatch as point SEGMENTS, exactly like the single-device
    msm_begin: each segment is one shard_map program over the mesh, and the
    per-segment partials fold host-side at msm_end (one point add each)."""
    from ..ops import msm_scan as MS

    scalar_digits = MS.scalar_digits
    pool_shards, infs, curve, n, shard = prepared
    D = pool_shards.shape[0]
    scalars = list(scalars) + [0] * (D * shard - n) if scalars is not None \
        else None
    lanes = MS.LANES if curve == "g1" else MS.LANES_G2
    per_shard = []
    for d in range(D):
        if digits is not None and d * shard + shard <= digits.shape[1]:
            dd = digits[:, d * shard:(d + 1) * shard]
            if infs[d] is not None and infs[d].any():
                dd = dd.copy()
                dd[:, infs[d]] = 0
        else:
            dd = scalar_digits(scalars[d * shard:(d + 1) * shard], infs[d])
        per_shard.append(dd)

    def seg_handle(lo, hi):
        # level2=False: the shard program consumes level-1 dense indexing
        # and needs uniform (R, K) across shards
        scheds = [MS.build_schedule(dd[:, lo:hi], lanes=lanes, level2=False)
                  for dd in per_shard]
        seg_pool = pool_shards[:, :, lo // 128:-(-hi // 128), :]
        return sharded_msm_scan_begin(
            seg_pool, scheds, mesh, curve, axis,
            k_min=SHARD_K_MIN_G1 if curve == "g1" else 0)[0]

    if shard <= MS.CHUNK_N:
        return (seg_handle(0, shard), curve)
    multi = MS._MultiMsm()
    for lo in range(0, shard, MS.CHUNK_N):
        hi = min(lo + MS.CHUNK_N, shard)
        multi.pending.append(seg_handle(lo, hi))
        if len(multi.pending) >= MS.MAX_INFLIGHT:
            multi.done.append(np.asarray(multi.pending.pop(0)))
    return (multi, curve)
