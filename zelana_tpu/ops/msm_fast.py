"""Fast Pippenger MSM: host-scheduled batched-affine bucket reduction.

The performance-critical MSM design (the segmented-scan variant in msm.py is
the didactic/fallback path). Work per MSM is the Pippenger optimum --
~W*N affine additions total -- instead of W*N*log N full Jacobian adds:

1. Scalars decompose into W=32 8-bit window digits (host, numpy).
2. Because witness scalars are host-resident, the entire bucket-accumulation
   ADDITION SCHEDULE is precomputed: every (window, bucket) multiset of
   points is pair-reduced round by round; each round is one device kernel
   over all windows/buckets at once, with gather indices and output slots
   known statically. Batch sizes shrink geometrically, so total work is ~one
   affine add per (point, window).
3. Additions use affine coordinates: one shared log-depth Montgomery batch
   inversion per round (4 muls/element amortized) + ~5 muls per add -- vs
   ~45 for branch-free Jacobian. Doubling and infinity edge cases resolve
   via masks; P + (-P) produces a tracked infinity flag.
4. Bucket-weighted reduction sum_d d*S_d splits by digit bits:
   sum_t 2^t * (sum_{d: bit t} S_d); the inner sums reuse the same
   pair-reduction machinery (host-known static subsets), and the outer
   combine is 8 Horner steps on a (W,) batch, then 31 window-Horner steps.

This matches how state-of-the-art GPU/FPGA MSM engines schedule Pippenger
(sorted buckets + batched affine adds), re-expressed as a handful of
shape-stable XLA kernels driven by a host schedule.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from . import limbs as L
from .msm import (
    N_BUCKETS,
    N_WINDOWS,
    WINDOW_BITS,
    g1_points_to_device,
    g2_points_to_device,
    scalar_digits,
    _jac_to_affine_host,
)

# ---------------------------------------------------------------------------
# schedule construction (host, numpy)
# ---------------------------------------------------------------------------


@dataclass
class Round:
    idx_a: np.ndarray  # (M,) int32 slot ids
    idx_b: np.ndarray
    out_start: int  # outputs land at slots [out_start, out_start + M)


@dataclass
class Schedule:
    rounds: List[Round]
    total_slots: int
    bucket_slot: np.ndarray  # (W, N_BUCKETS) int32; 0 = infinity slot
    n_points: int


def build_schedule(digits: np.ndarray) -> Schedule:
    """digits: (W, N) int32. Slot 0 is reserved as the canonical infinity;
    input point i lives at slot i + 1."""
    w, n = digits.shape
    win = np.repeat(np.arange(w, dtype=np.int64), n)
    slot = np.tile(np.arange(1, n + 1, dtype=np.int64), w)
    dig = digits.reshape(-1).astype(np.int64)
    keep = dig != 0
    keys = win[keep] * N_BUCKETS + dig[keep]
    items = slot[keep]

    order = np.argsort(keys, kind="stable")
    keys = keys[order]
    items = items[order]

    rounds: List[Round] = []
    base = n + 1
    while len(items) > 0:
        same_next = np.zeros(len(items), dtype=bool)
        if len(items) > 1:
            same_next[:-1] = keys[1:] == keys[:-1]
        # run structure
        run_start = np.ones(len(items), dtype=bool)
        run_start[1:] = keys[1:] != keys[:-1]
        if not same_next.any():
            break  # every run is a singleton
        run_id = np.cumsum(run_start) - 1
        start_pos = np.flatnonzero(run_start)
        pos_in_run = np.arange(len(items)) - start_pos[run_id]
        run_len = np.bincount(run_id)
        is_a = (pos_in_run % 2 == 0) & (pos_in_run + 1 < run_len[run_id])
        is_b = np.zeros(len(items), dtype=bool)
        is_b[1:] = is_a[:-1]
        m = int(is_a.sum())
        rounds.append(
            Round(
                idx_a=items[is_a].astype(np.int32),
                idx_b=items[is_b].astype(np.int32),
                out_start=base,
            )
        )
        # survivors: pair outputs (keep key of the a element) + odd leftovers
        leftover = ~(is_a | is_b)
        new_items = np.concatenate(
            [np.arange(base, base + m, dtype=np.int64), items[leftover]]
        )
        new_keys = np.concatenate([keys[is_a], keys[leftover]])
        order = np.argsort(new_keys, kind="stable")
        items = new_items[order]
        keys = new_keys[order]
        base += m

    bucket_slot = np.zeros((w, N_BUCKETS), dtype=np.int32)  # 0 => infinity
    bwin = (keys // N_BUCKETS).astype(np.int64)
    bdig = (keys % N_BUCKETS).astype(np.int64)
    bucket_slot[bwin, bdig] = items.astype(np.int32)
    return Schedule(rounds=rounds, total_slots=base, bucket_slot=bucket_slot,
                    n_points=n)


def build_subset_schedule(first_slots: np.ndarray, base: int):
    """Pair-reduction schedule for reducing groups of slots to single slots.

    first_slots: list over groups of 1-D arrays of slot ids. Returns
    (rounds, final_slot_per_group, new_base).
    """
    keys = np.concatenate(
        [np.full(len(s), g, dtype=np.int64) for g, s in enumerate(first_slots)]
    )
    items = np.concatenate(first_slots).astype(np.int64)
    order = np.argsort(keys, kind="stable")
    keys, items = keys[order], items[order]
    rounds: List[Round] = []
    while True:
        run_start = np.ones(len(items), dtype=bool)
        run_start[1:] = keys[1:] != keys[:-1]
        same_next = np.zeros(len(items), dtype=bool)
        if len(items) > 1:
            same_next[:-1] = keys[1:] == keys[:-1]
        if not same_next.any():
            break
        run_id = np.cumsum(run_start) - 1
        start_pos = np.flatnonzero(run_start)
        pos_in_run = np.arange(len(items)) - start_pos[run_id]
        run_len = np.bincount(run_id)
        is_a = (pos_in_run % 2 == 0) & (pos_in_run + 1 < run_len[run_id])
        is_b = np.zeros(len(items), dtype=bool)
        is_b[1:] = is_a[:-1]
        m = int(is_a.sum())
        rounds.append(Round(items[is_a].astype(np.int32),
                            items[is_b].astype(np.int32), base))
        leftover = ~(is_a | is_b)
        items = np.concatenate(
            [np.arange(base, base + m, dtype=np.int64), items[leftover]]
        )
        keys = np.concatenate([keys[is_a], keys[leftover]])
        order = np.argsort(keys, kind="stable")
        items, keys = items[order], keys[order]
        base += m
    final = np.zeros(len(first_slots), dtype=np.int32)
    final[keys.astype(np.int64)] = items.astype(np.int32)
    return rounds, final, base


# ---------------------------------------------------------------------------
# device kernels
# ---------------------------------------------------------------------------


class _G1:
    """Affine coordinate ops for the fast path (single Fq arrays)."""

    spec = L.FQ

    @staticmethod
    def gather(V, idx):
        return jax.tree_util.tree_map(lambda a: jnp.take(a, idx, axis=1), V)

    @staticmethod
    def batch_inv(d):
        return L.mont_batch_inv_logdepth(d, L.FQ)

    mul = staticmethod(lambda a, b: L.mont_mul(a, b, L.FQ))
    add = staticmethod(lambda a, b: L.add(a, b, L.FQ))
    sub = staticmethod(lambda a, b: L.sub(a, b, L.FQ))
    eq = staticmethod(L.eq)
    select = staticmethod(L.select)


class _G2:
    """Affine ops over Fq2 pairs; batch inversion via the norm map."""

    spec = L.FQ

    @staticmethod
    def gather(V, idx):
        return jax.tree_util.tree_map(lambda a: jnp.take(a, idx, axis=1), V)

    @staticmethod
    def mul(a, b):
        a0, a1 = a
        b0, b1 = b
        t0 = L.mont_mul(a0, b0, L.FQ)
        t1 = L.mont_mul(a1, b1, L.FQ)
        s = L.mont_mul(L.add(a0, a1, L.FQ), L.add(b0, b1, L.FQ), L.FQ)
        return (L.sub(t0, t1, L.FQ), L.sub(L.sub(s, t0, L.FQ), t1, L.FQ))

    @staticmethod
    def add(a, b):
        return (L.add(a[0], b[0], L.FQ), L.add(a[1], b[1], L.FQ))

    @staticmethod
    def sub(a, b):
        return (L.sub(a[0], b[0], L.FQ), L.sub(a[1], b[1], L.FQ))

    @staticmethod
    def eq(a, b):
        return L.eq(a[0], b[0]) & L.eq(a[1], b[1])

    @staticmethod
    def select(mask, a, b):
        return (L.select(mask, a[0], b[0]), L.select(mask, a[1], b[1]))

    @staticmethod
    def batch_inv(d):
        # 1/(c0 + c1 u) = (c0 - c1 u) / (c0^2 + c1^2)
        c0, c1 = d
        norm = L.add(
            L.mont_mul(c0, c0, L.FQ), L.mont_mul(c1, c1, L.FQ), L.FQ
        )
        ninv = L.mont_batch_inv_logdepth(norm, L.FQ)
        return (L.mont_mul(c0, ninv, L.FQ),
                L.neg(L.mont_mul(c1, ninv, L.FQ), L.FQ))


def _ops(curve):
    return _G1 if curve == "g1" else _G2


@functools.partial(
    jax.jit, static_argnames=("curve",), donate_argnums=(0, 1, 2)
)
def _k_round(Vx, Vy, Vinf, idx_a, idx_b, out_start, curve):
    """One pair-reduction round: affine add gathered slot pairs, write out."""
    F = _ops(curve)
    ax, ay = F.gather(Vx, idx_a), F.gather(Vy, idx_a)
    bx, by = F.gather(Vx, idx_b), F.gather(Vy, idx_b)
    ainf = jnp.take(Vinf, idx_a)
    binf = jnp.take(Vinf, idx_b)

    x_eq = F.eq(ax, bx)
    y_eq = F.eq(ay, by)
    dbl = x_eq & y_eq

    # slope: (3 x^2) / (2 y) for doubling, (y2 - y1) / (x2 - x1) otherwise
    ax2 = F.mul(ax, ax)
    three_ax2 = F.add(F.add(ax2, ax2), ax2)
    two_ay = F.add(ay, ay)
    num = F.select(dbl, three_ax2, F.sub(by, ay))
    den = F.select(dbl, two_ay, F.sub(bx, ax))
    lam = F.mul(num, F.batch_inv(den))

    x3 = F.sub(F.sub(F.mul(lam, lam), ax), bx)
    y3 = F.sub(F.mul(lam, F.sub(ax, x3)), ay)

    # infinity handling
    res_inf = (x_eq & ~y_eq) | (ainf & binf)
    x3 = F.select(ainf, bx, F.select(binf, ax, x3))
    y3 = F.select(ainf, by, F.select(binf, ay, y3))
    res_inf = jnp.where(ainf, binf, jnp.where(binf, ainf, res_inf))

    write = lambda V, val: jax.tree_util.tree_map(  # noqa: E731
        lambda buf, v: jax.lax.dynamic_update_slice_in_dim(
            buf, v, out_start, axis=1
        ),
        V,
        val,
    )
    Vx = write(Vx, x3)
    Vy = write(Vy, y3)
    Vinf = jax.lax.dynamic_update_slice_in_dim(Vinf, res_inf, out_start, axis=0)
    return Vx, Vy, Vinf


@functools.partial(jax.jit, static_argnames=("curve",))
def _k_bits_horner(Tx, Ty, Tinf, curve):
    """T: (16, 8, W) bit-subset sums -> (W,)-batched window sums (Jacobian)
    via Horner over the 8 digit bits."""
    from .curve_ops import FqOps, Fq2Ops, point_add, point_double

    PF = FqOps if curve == "g1" else Fq2Ops

    def to_jac(x, y, inf):
        one = PF.one_mont(jax.tree_util.tree_leaves(x)[0].shape[1:])
        zeros = PF.zeros_like(one)
        z = PF.select(inf, zeros, one)
        return (x, y, z)

    def tslice(i):
        x = jax.tree_util.tree_map(lambda a: a[:, i], Tx)
        y = jax.tree_util.tree_map(lambda a: a[:, i], Ty)
        return to_jac(x, y, Tinf[i])

    acc = tslice(WINDOW_BITS - 1)
    for t in range(WINDOW_BITS - 2, -1, -1):
        acc = point_double(PF, acc)
        acc = point_add(PF, acc, tslice(t))
    return acc


@functools.partial(jax.jit, static_argnames=("curve",))
def _combine_windows(window_sums, curve):
    """Window Horner as one scanned kernel (a host loop here would pay
    ~31 remote-dispatch round trips for single-point work)."""
    from .curve_ops import FqOps, Fq2Ops, point_add, point_double

    PF = FqOps if curve == "g1" else Fq2Ops

    def wnd(i):
        return tuple(
            jax.tree_util.tree_map(
                lambda a: jax.lax.dynamic_slice_in_dim(a, i, 1, axis=-1),
                window_sums,
            )
        )

    def step(acc, w):
        for _ in range(WINDOW_BITS):
            acc = point_double(PF, acc)
        return point_add(PF, acc, wnd(w)), None

    res, _ = jax.lax.scan(
        step, wnd(N_WINDOWS - 1), jnp.arange(N_WINDOWS - 2, -1, -1)
    )
    return res


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------


def _pad_round(arr, size):
    """Pad gather indices with the infinity slot (0)."""
    return np.pad(arr, (0, size - len(arr)))


def _round_size(m: int) -> int:
    """Quantize round sizes so kernel shapes repeat across MSM calls."""
    return max(64, 1 << (m - 1).bit_length())


def _msm_fast(coords, digits_np, curve: str):
    sched = build_schedule(digits_np)

    # bit-subset reduction schedule appended after the bucket rounds
    first_slots = []
    for t in range(WINDOW_BITS):
        for w in range(N_WINDOWS):
            ds = np.flatnonzero((np.arange(N_BUCKETS) >> t) & 1)
            slots = sched.bucket_slot[w, ds]
            slots = slots[slots != 0]
            if len(slots) == 0:
                slots = np.zeros(1, dtype=np.int32)  # infinity
            first_slots.append(slots)
    extra_rounds, finals, total = build_subset_schedule(
        first_slots, sched.total_slots
    )
    rounds = sched.rounds + extra_rounds
    finals = finals.reshape(WINDOW_BITS, N_WINDOWS)

    # allocate the slot pool: slot 0 = infinity. Padded round lanes write
    # garbage past out_start + m; the pool must cover the padded extent so
    # dynamic_update_slice never clamps (a clamp would corrupt live slots).
    n = sched.n_points
    X, Y = coords
    total_alloc = total
    for rnd in rounds:
        total_alloc = max(
            total_alloc, rnd.out_start + _round_size(len(rnd.idx_a))
        )

    def alloc(leaf):
        buf = jnp.zeros((L.NLIMBS, total_alloc), jnp.uint32)
        return jax.lax.dynamic_update_slice_in_dim(buf, leaf, 1, axis=1)

    Vx = jax.tree_util.tree_map(alloc, X)
    Vy = jax.tree_util.tree_map(alloc, Y)
    inf0 = np.zeros(total_alloc, dtype=bool)
    inf0[0] = True
    # input infinities (points at slot i+1 with digits zeroed) never appear in
    # the schedule, so their pool flags don't matter
    Vinf = jnp.asarray(inf0)

    for rnd in rounds:
        m = len(rnd.idx_a)
        size = _round_size(m)
        ia = jnp.asarray(_pad_round(rnd.idx_a, size))
        ib = jnp.asarray(_pad_round(rnd.idx_b, size))
        # padded lanes compute inf+inf -> inf and write slots beyond out_start
        # + m; those slots are only ever read if they belong to the schedule,
        # which they don't (slot ids grow monotonically), except the padding
        # writes stay within the pool bounds via total-slot padding below.
        Vx, Vy, Vinf = _k_round(
            Vx, Vy, Vinf, ia, ib, jnp.int32(rnd.out_start), curve
        )

    gx = jax.tree_util.tree_map(lambda a: a[:, finals.reshape(-1)], Vx)
    gy = jax.tree_util.tree_map(lambda a: a[:, finals.reshape(-1)], Vy)
    ginf = Vinf[finals.reshape(-1)]
    Tx = jax.tree_util.tree_map(
        lambda a: a.reshape(L.NLIMBS, WINDOW_BITS, N_WINDOWS), gx
    )
    Ty = jax.tree_util.tree_map(
        lambda a: a.reshape(L.NLIMBS, WINDOW_BITS, N_WINDOWS), gy
    )
    Tinf = ginf.reshape(WINDOW_BITS, N_WINDOWS)
    window_sums = _k_bits_horner(Tx, Ty, Tinf, curve)
    return _combine_windows(window_sums, curve)


def msm_g1(points, scalars):
    if not points:
        return None
    coords, inf = g1_points_to_device(points)
    digits = scalar_digits(scalars, inf)
    jac = _msm_fast(coords, digits, "g1")
    return _jac_to_affine_host(jac, fq2=False)


def msm_g2(points, scalars):
    if not points:
        return None
    coords, inf = g2_points_to_device(points)
    digits = scalar_digits(scalars, inf)
    jac = _msm_fast(coords, digits, "g2")
    return _jac_to_affine_host(jac, fq2=True)
