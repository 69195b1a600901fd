"""Pippenger multi-scalar multiplication on TPU (JAX).

Replaces the rayon-parallel MSMs inside ark-groth16 (the A/B1/B2/H/L query
MSMs of `Groth16::prove`, reference call site
core/src/sequencer/settlement/prover.rs:408) with an XLA-friendly pipeline:

1. window decomposition: 8-bit digits, 32 windows over the 254-bit scalar
2. per-window bucket accumulation WITHOUT data-dependent scatter-adds:
   points are sorted by digit, then a segmented Hillis-Steele scan over the
   sorted sequence produces per-bucket sums; sorting + scan is the standard
   way to make Pippenger SIMD/XLA-shaped, since elliptic "scatter-add" is not
   a native reduction. All 32 windows run as one (32, N) batch.
3. bucket reduction: the classic descending running sum, batched across all
   32 windows at once
4. window combine: Horner with 8 doublings per window

Orchestration is host-side Python over a small set of per-shape-cached jitted
point kernels: sequential structure lives in cheap host loops, data-parallel
work lives on device. This keeps XLA programs small (fast compiles) while the
batch dimension saturates the VPU. The fused-Pallas fast path will slot in
behind the same API.

Multi-chip sharding (points partitioned across devices, per-window partial
bucket sums combined via collectives) lives in zelana_tpu.parallel.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from . import limbs as L
from .curve_ops import (
    FqOps,
    Fq2Ops,
    point_add,
    point_double,
    point_inf,
    point_select,
)

WINDOW_BITS = 8
N_WINDOWS = (254 + WINDOW_BITS - 1) // WINDOW_BITS  # 32
N_BUCKETS = 1 << WINDOW_BITS  # bucket 0 is the trash bucket


def _ops(curve: str):
    return FqOps if curve == "g1" else Fq2Ops


# ---------------------------------------------------------------------------
# host-side preparation
# ---------------------------------------------------------------------------


def g1_points_to_device(points):
    """Affine G1 python points [(x, y) | None] -> Montgomery coord arrays."""
    xs = [0 if p is None else p[0] for p in points]
    ys = [0 if p is None else p[1] for p in points]
    inf = np.array([p is None for p in points], dtype=bool)
    X = jnp.asarray(L.encode_mont(xs, L.FQ))
    Y = jnp.asarray(L.encode_mont(ys, L.FQ))
    return (X, Y), inf


def g2_points_to_device(points):
    xs0 = [0 if p is None else p[0][0] for p in points]
    xs1 = [0 if p is None else p[0][1] for p in points]
    ys0 = [0 if p is None else p[1][0] for p in points]
    ys1 = [0 if p is None else p[1][1] for p in points]
    inf = np.array([p is None for p in points], dtype=bool)
    X = (jnp.asarray(L.encode_mont(xs0, L.FQ)), jnp.asarray(L.encode_mont(xs1, L.FQ)))
    Y = (jnp.asarray(L.encode_mont(ys0, L.FQ)), jnp.asarray(L.encode_mont(ys1, L.FQ)))
    return (X, Y), inf


def scalar_digits(scalars, inf_mask=None) -> np.ndarray:
    """(n_windows, N) int32 digit matrix; infinity points get all-zero digits.

    With 8-bit windows each digit is one byte of the little-endian scalar,
    so the decomposition is one serialization pass + a numpy transpose.
    """
    assert WINDOW_BITS == 8 and N_WINDOWS == 32
    buf = b"".join(int(s).to_bytes(32, "little") for s in scalars)
    arr = np.frombuffer(buf, dtype=np.uint8).reshape(len(scalars), N_WINDOWS)
    digits = np.ascontiguousarray(arr.T).astype(np.int32)
    if inf_mask is not None:
        digits[:, inf_mask] = 0
    return digits


# ---------------------------------------------------------------------------
# jitted device kernels (cached per curve + shape)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("curve",))
def _k_gather_points(coords, order, curve):
    """coords leaves (16, N), order (W, N) -> leaves (16, W, N)."""
    return jax.tree_util.tree_map(lambda a: a[:, order], coords)


@functools.partial(
    jax.jit, static_argnames=("curve", "offset"), donate_argnums=(0, 1)
)
def _k_seg_scan_step(vals, flags, curve, offset):
    """One Hillis-Steele segmented-scan step along the last axis."""
    F = _ops(curve)
    shifted_vals = jax.tree_util.tree_map(
        lambda a: jnp.roll(a, offset, axis=-1), vals
    )
    shifted_flags = jnp.roll(flags, offset, axis=-1)
    n = flags.shape[-1]
    valid = (jnp.arange(n) >= offset)[None, :]  # (1, N) over windows

    combined = point_add(F, vals, shifted_vals)
    keep = flags | ~valid  # segment start within reach, or out of range
    new_vals = point_select(F, keep, vals, combined)
    new_flags = flags | (shifted_flags & valid)
    return new_vals, new_flags


@functools.partial(jax.jit, static_argnames=("curve",))
def _k_scatter_buckets(vals, ends, keys, curve):
    """Segment-end values -> bucket arrays (leaves (16, W, N_BUCKETS))."""
    w = keys.shape[0]
    scatter_idx = jnp.where(ends, keys, 0)  # (W, N); trash bucket 0
    win_idx = jnp.broadcast_to(jnp.arange(w)[:, None], keys.shape)

    def scatter(leaf):
        out = jnp.zeros((L.NLIMBS, w, N_BUCKETS), jnp.uint32)
        masked = jnp.where(ends[None], leaf, 0)
        out = out.at[:, win_idx, scatter_idx].set(masked)
        return out.at[:, :, 0].set(0)

    return jax.tree_util.tree_map(scatter, vals)


@functools.partial(jax.jit, static_argnames=("curve", "d"))
def _k_bucket_select(buckets, curve, d):
    return jax.tree_util.tree_map(lambda a: a[:, :, d], buckets)


@functools.partial(jax.jit, static_argnames=("curve",))
def _k_point_add(a, b, curve):
    return point_add(_ops(curve), a, b)


@functools.partial(jax.jit, static_argnames=("curve",))
def _k_double8_add(acc, wnd, curve):
    """acc := 2^WINDOW_BITS * acc + wnd (the Horner step)."""
    F = _ops(curve)
    for _ in range(WINDOW_BITS):
        acc = point_double(F, acc)
    return point_add(F, acc, wnd)


@functools.partial(jax.jit, static_argnames=("curve",))
def _k_bucket_reduce(buckets, curve):
    """Descending running sum over buckets 255..1, all windows batched."""
    F = _ops(curve)
    w = jax.tree_util.tree_leaves(buckets)[0].shape[1]

    def step(i, carry):
        running, total = carry
        d = N_BUCKETS - 1 - i
        bucket = jax.tree_util.tree_map(
            lambda a: jax.lax.dynamic_slice_in_dim(a, d, 1, axis=2)[:, :, 0],
            buckets,
        )
        running = point_add(F, running, tuple(bucket))
        total = point_add(F, total, running)
        return (running, total)

    inf_w = point_inf(F, (w,))
    _, total = jax.lax.fori_loop(0, N_BUCKETS - 1, step, (inf_w, inf_w))
    return total


# ---------------------------------------------------------------------------
# MSM driver (host orchestration)
# ---------------------------------------------------------------------------


def _window_chunk(n: int) -> int:
    """Windows processed per device pass; bounds peak memory (the scan holds
    a handful of (16, chunk, n) coordinate tensors)."""
    import os

    # lanes in flight; the scan holds ~30 live (16, chunk*n) uint32 tensors,
    # so 2^20 lanes => roughly 2-3 GB peak -- comfortably inside 16G HBM
    budget = int(os.environ.get("ZELANA_MSM_LANE_BUDGET", 1 << 20))
    return max(1, min(N_WINDOWS, budget // max(n, 1)))


def _msm(coords, digits_np: np.ndarray, curve: str):
    F = _ops(curve)
    n = digits_np.shape[1]
    log_n = max(1, math.ceil(math.log2(n))) if n > 1 else 0

    # host-side sort per window (digits are host data today; device sort is a
    # drop-in once scalars are produced on device)
    order_all = np.argsort(digits_np, axis=1, kind="stable").astype(np.int32)
    keys_all = np.take_along_axis(digits_np, order_all, axis=1)

    X, Y = coords
    chunk = _window_chunk(n)
    totals_parts = []
    for w0 in range(0, N_WINDOWS, chunk):
        order = order_all[w0 : w0 + chunk]
        keys = keys_all[w0 : w0 + chunk]
        cw = order.shape[0]
        starts = np.concatenate(
            [np.ones((cw, 1), bool), keys[:, 1:] != keys[:, :-1]], axis=1
        )
        ends = np.concatenate(
            [keys[:, 1:] != keys[:, :-1], np.ones((cw, 1), bool)], axis=1
        )
        Xg = _k_gather_points(X, jnp.asarray(order), curve)
        Yg = _k_gather_points(Y, jnp.asarray(order), curve)
        Z = F.one_mont((cw, n))
        vals = (Xg, Yg, Z)
        flags = jnp.asarray(starts)
        for k in range(log_n):
            vals, flags = _k_seg_scan_step(vals, flags, curve, 1 << k)
        buckets = _k_scatter_buckets(
            vals, jnp.asarray(ends), jnp.asarray(keys), curve
        )
        totals_parts.append(_k_bucket_reduce(tuple(buckets), curve))

    if len(totals_parts) == 1:
        totals = totals_parts[0]
    else:
        totals = jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, axis=1), *totals_parts
        )

    # Horner across windows, high to low (host loop, single-point batch)
    def window(i):
        return jax.tree_util.tree_map(
            lambda a: jax.lax.dynamic_slice_in_dim(a, i, 1, axis=1), totals
        )

    acc = tuple(window(N_WINDOWS - 1))
    for wdx in range(N_WINDOWS - 2, -1, -1):
        acc = _k_double8_add(acc, tuple(window(wdx)), curve)
    return acc


# ---------------------------------------------------------------------------
# host API
# ---------------------------------------------------------------------------


def _jac_to_affine_host(jac, fq2=False):
    from ..fields.bn254 import P
    from ..fields import tower as tw

    def leaf_int(a):
        return L.decode_mont(np.asarray(a), L.FQ)[0]

    if not fq2:
        X, Y, Z = (leaf_int(c) for c in jac)
        if Z == 0:
            return None
        zinv = pow(Z, P - 2, P)
        return (X * zinv * zinv % P, Y * zinv % P * zinv % P * zinv % P)
    (x0, x1), (y0, y1), (z0, z1) = jac
    X = (leaf_int(x0), leaf_int(x1))
    Y = (leaf_int(y0), leaf_int(y1))
    Z = (leaf_int(z0), leaf_int(z1))
    if Z == (0, 0):
        return None
    zinv = tw.fq2_inv(Z)
    zinv2 = tw.fq2_sqr(zinv)
    return (tw.fq2_mul(X, zinv2), tw.fq2_mul(tw.fq2_mul(Y, zinv2), zinv))


def _pad_pow2(points, scalars, min_size=16):
    """Pad to a power-of-two length with infinity points / zero scalars, so
    device kernels only ever see a small set of shapes (compile cache)."""
    n = max(min_size, len(points))
    n = 1 << (n - 1).bit_length()
    pad = n - len(points)
    return list(points) + [None] * pad, list(scalars) + [0] * pad


def msm_g1(points, scalars):
    """Host API: affine python G1 points + int scalars -> affine result."""
    if not points:
        return None
    points, scalars = _pad_pow2(points, scalars)
    coords, inf = g1_points_to_device(points)
    digits = scalar_digits(scalars, inf)
    jac = _msm(coords, digits, "g1")
    return _jac_to_affine_host(jac, fq2=False)


def msm_g2(points, scalars):
    if not points:
        return None
    points, scalars = _pad_pow2(points, scalars)
    coords, inf = g2_points_to_device(points)
    digits = scalar_digits(scalars, inf)
    jac = _msm(coords, digits, "g2")
    return _jac_to_affine_host(jac, fq2=True)
