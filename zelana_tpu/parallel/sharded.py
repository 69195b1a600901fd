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


def _ops(curve):
    return FqOps if curve == "g1" else Fq2Ops


# ---------------------------------------------------------------------------
# fully device-side local MSM (no host preprocessing; used inside shard_map)
# ---------------------------------------------------------------------------


def _local_msm(F, X, Y, digits, axes=None):
    """X, Y: coord pytrees leaves (16, n); digits (N_WINDOWS, n) int32.

    Returns a single Jacobian point, leaves (16, 1). ``axes``: shard_map
    axis name(s) -- constants created inside the mapped function are
    replicated ("unvarying") and must be pvary-promoted before mixing with
    device-varying data in loop carries.
    """
    def _pv(t):
        if axes is None:
            return t
        return jax.tree_util.tree_map(lambda a: jax.lax.pvary(a, axes), t)

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
