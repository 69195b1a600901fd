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
        return L.mont_batch_inv_nested(d, L.FQ)

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
        ninv = L.mont_batch_inv_nested(norm, L.FQ)
        return (L.mont_mul(c0, ninv, L.FQ),
                L.neg(L.mont_mul(c1, ninv, L.FQ), L.FQ))


def _ops(curve):
    return _G1 if curve == "g1" else _G2


def _round_math(Vx, Vy, Vinf, idx_a, idx_b, out_start, curve):
    """One pair-reduction round: affine add gathered slot pairs, write out.

    Plain traceable function -- all rounds of an MSM run inside one jit
    (_run_msm) so the remote-dispatch latency is paid once per MSM, not
    once per round."""
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


class _JacField:
    """Host bigint Jacobian arithmetic, generic over Fq / Fq2.

    The MSM tail -- 15 bit-Horner point ops per window plus the 248-doubling
    window combine -- is pure sequential latency on the vector unit
    (measured 380 ms as device kernels). As host bigint Jacobian math it is
    a few ms and needs ONE field inversion at the very end."""

    def __init__(self, fq2: bool):
        from ..fields.bn254 import P
        from ..fields import tower as tw

        if fq2:
            self.mul = tw.fq2_mul
            self.add = tw.fq2_add
            self.sub = tw.fq2_sub
            self.sqr = tw.fq2_sqr
            self.inv = tw.fq2_inv
            self.zero = (0, 0)
        else:
            self.mul = lambda a, b: a * b % P
            self.add = lambda a, b: (a + b) % P
            self.sub = lambda a, b: (a - b) % P
            self.sqr = lambda a: a * a % P
            self.inv = lambda a: pow(a, P - 2, P)
            self.zero = 0

    def dbl(self, pt):
        x, y, z = pt
        if z == self.zero:
            return pt
        A = self.sqr(x)
        B = self.sqr(y)
        C = self.sqr(B)
        D = self.sub(self.sqr(self.add(x, B)), self.add(A, C))
        D = self.add(D, D)
        E = self.add(self.add(A, A), A)
        F = self.sqr(E)
        x3 = self.sub(F, self.add(D, D))
        c8 = self.add(self.add(C, C), self.add(C, C))
        c8 = self.add(c8, c8)
        y3 = self.sub(self.mul(E, self.sub(D, x3)), c8)
        z3 = self.mul(self.add(y, y), z)
        return (x3, y3, z3)

    def addp(self, p1, p2):
        x1, y1, z1 = p1
        x2, y2, z2 = p2
        if z1 == self.zero:
            return p2
        if z2 == self.zero:
            return p1
        z1z1 = self.sqr(z1)
        z2z2 = self.sqr(z2)
        u1 = self.mul(x1, z2z2)
        u2 = self.mul(x2, z1z1)
        s1 = self.mul(self.mul(y1, z2), z2z2)
        s2 = self.mul(self.mul(y2, z1), z1z1)
        if u1 == u2:
            if s1 == s2:
                return self.dbl(p1)
            return (self.zero, self.zero, self.zero)  # P + (-P)
        h = self.sub(u2, u1)
        i = self.sqr(self.add(h, h))
        j = self.mul(h, i)
        r = self.sub(s2, s1)
        r = self.add(r, r)
        v = self.mul(u1, i)
        x3 = self.sub(self.sub(self.sqr(r), j), self.add(v, v))
        s1j = self.mul(s1, j)
        y3 = self.sub(self.mul(r, self.sub(v, x3)), self.add(s1j, s1j))
        z3 = self.mul(self.sub(self.sub(self.sqr(self.add(z1, z2)), z1z1),
                               z2z2), h)
        return (x3, y3, z3)

    def to_affine(self, pt):
        x, y, z = pt
        if z == self.zero:
            return None
        zi = self.inv(z)
        zi2 = self.sqr(zi)
        return (self.mul(x, zi2), self.mul(self.mul(y, zi2), zi))


def _finish_host(gx, gy, ginf, curve):
    """Host tail: bit-Horner each window's 8 bit-subset sums, then the
    window Horner, all in Jacobian bigints; one inversion at the end."""
    fq2 = curve == "g2"
    F = _JacField(fq2)

    def decode(leaf):
        return L.decode_mont(np.asarray(leaf), L.FQ)

    inf = np.asarray(ginf).reshape(-1)
    one = (1, 0) if fq2 else 1
    if not fq2:
        xs, ys = decode(gx), decode(gy)
        pts = [
            (x, y, one) if not i else (F.zero, F.zero, F.zero)
            for x, y, i in zip(xs, ys, inf)
        ]
    else:
        x0, x1 = decode(gx[0]), decode(gx[1])
        y0, y1 = decode(gy[0]), decode(gy[1])
        pts = [
            ((x0[k], x1[k]), (y0[k], y1[k]), one)
            if not inf[k] else (F.zero, F.zero, F.zero)
            for k in range(len(x0))
        ]
    # pts laid out as (WINDOW_BITS, N_WINDOWS)
    windows = []
    for w in range(N_WINDOWS):
        acc = pts[(WINDOW_BITS - 1) * N_WINDOWS + w]
        for t in range(WINDOW_BITS - 2, -1, -1):
            acc = F.dbl(acc)
            acc = F.addp(acc, pts[t * N_WINDOWS + w])
        windows.append(acc)
    acc = windows[-1]
    for w in range(N_WINDOWS - 2, -1, -1):
        for _ in range(WINDOW_BITS):
            acc = F.dbl(acc)
        acc = F.addp(acc, windows[w])
    return F.to_affine(acc)


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------


def _pad_round(arr, size):
    """Pad gather indices with the infinity slot (0)."""
    return np.pad(arr, (0, size - len(arr)))


def _round_size(m: int) -> int:
    """Quantize round sizes so kernel shapes repeat across MSM calls.

    Minimum 1024 on TPU: that keeps every round's batch inversion on the
    fused Pallas path (whose Fermat base case works on one (16, 8, 128)
    block) -- the padding lanes are inf+inf no-ops. On CPU (tests) the
    padding would only inflate XLA work."""
    floor = 1024 if jax.default_backend() != "cpu" else 64
    return max(floor, 1 << (m - 1).bit_length())


_NOOP_PAD = 64  # scratch lanes at the pool tail for round-count padding


@functools.partial(
    jax.jit, static_argnames=("curve", "sizes", "total_alloc")
)
def _run_msm(X, Y, all_idx, starts, finals_idx, curve, sizes, total_alloc):
    """The full MSM device program: pool construction, every pair-reduction
    round, and the bit-subset Horner fold in ONE jit -- a prove pays one
    dispatch and one index-array upload per MSM instead of one per round
    (the axon relay's dispatch/transfer latency is milliseconds).

    all_idx: every round's padded idx_a|idx_b concatenated; `sizes` gives
    the static per-round widths for slicing."""

    def alloc(leaf):
        buf = jnp.zeros((L.NLIMBS, total_alloc), jnp.uint32)
        return jax.lax.dynamic_update_slice_in_dim(buf, leaf, 1, axis=1)

    Vx = jax.tree_util.tree_map(alloc, X)
    Vy = jax.tree_util.tree_map(alloc, Y)
    Vinf = jnp.zeros(total_alloc, bool).at[0].set(True)

    off = 0
    for r, size in enumerate(sizes):
        ia = jax.lax.slice_in_dim(all_idx, off, off + size)
        ib = jax.lax.slice_in_dim(all_idx, off + size, off + 2 * size)
        off += 2 * size
        Vx, Vy, Vinf = _round_math(Vx, Vy, Vinf, ia, ib, starts[r], curve)
    gx = jax.tree_util.tree_map(lambda a: a[:, finals_idx], Vx)
    gy = jax.tree_util.tree_map(lambda a: a[:, finals_idx], Vy)
    ginf = Vinf[finals_idx]
    return gx, gy, ginf  # (WINDOW_BITS * N_WINDOWS,) bit-subset sums


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
    # Pool width and round count are quantized (pow2 / multiple-of-4 with
    # no-op rounds aimed at a scratch tail) so the _run_msm program shape
    # repeats across proves and the compile cache hits.
    X, Y = coords
    total_alloc = total
    for rnd in rounds:
        total_alloc = max(
            total_alloc, rnd.out_start + _round_size(len(rnd.idx_a))
        )
    total_alloc = 1 << (total_alloc + _NOOP_PAD - 1).bit_length()
    scratch_start = total_alloc - _NOOP_PAD

    # one flat upload of every round's indices (input-infinity points never
    # appear in the schedule, so their pool flags don't matter)
    chunks, sizes, starts = [], [], []
    for rnd in rounds:
        size = _round_size(len(rnd.idx_a))
        chunks.append(_pad_round(rnd.idx_a, size))
        chunks.append(_pad_round(rnd.idx_b, size))
        sizes.append(size)
        starts.append(rnd.out_start)
    # no-op rounds (inf+inf -> scratch tail) pad the round count to a
    # multiple of 4; tiny MSMs can have ZERO real rounds (every bucket a
    # singleton), in which case this also guarantees a non-empty index list
    while not sizes or len(sizes) % 4 != 0:
        chunks.append(np.zeros(2 * _NOOP_PAD, np.int32))
        sizes.append(_NOOP_PAD)
        starts.append(scratch_start)
    all_idx = jnp.asarray(np.concatenate(chunks).astype(np.int32))

    return _run_msm(
        X,
        Y,
        all_idx,
        jnp.asarray(starts, jnp.int32),
        jnp.asarray(finals.reshape(-1)),
        curve,
        tuple(sizes),
        total_alloc,
    )


def prepare_g1(points):
    """Device-resident G1 point set; reuse across MSMs with the same basis
    (Groth16 query points are fixed per proving key)."""
    return g1_points_to_device(points)


def prepare_g2(points):
    return g2_points_to_device(points)


def msm_g1_prepared(prepared, scalars):
    coords, inf = prepared
    digits = scalar_digits(scalars, inf)
    gx, gy, ginf = _msm_fast(coords, digits, "g1")
    return _finish_host(gx, gy, ginf, "g1")


def msm_g2_prepared(prepared, scalars):
    coords, inf = prepared
    digits = scalar_digits(scalars, inf)
    gx, gy, ginf = _msm_fast(coords, digits, "g2")
    return _finish_host(gx, gy, ginf, "g2")


def msm_g1(points, scalars):
    if not points:
        return None
    return msm_g1_prepared(prepare_g1(points), scalars)


def msm_g2(points, scalars):
    if not points:
        return None
    return msm_g2_prepared(prepare_g2(points), scalars)
