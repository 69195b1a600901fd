"""Fast Pippenger MSM: host-scheduled bucket pair-reduction as a step tape.

The performance-critical MSM design (the segmented-scan variant in msm.py is
the didactic/fallback path). Work per MSM is the Pippenger optimum --
~W*N point additions total -- instead of W*N*log N from a scan:

1. Scalars decompose into W=32 8-bit window digits (host, numpy).
2. Because witness scalars are host-resident, the entire bucket-accumulation
   ADDITION SCHEDULE is precomputed: every (window, bucket) multiset of
   points is pair-reduced round by round, and the rounds are chunked into
   UNIFORM steps of S lanes. The device program is one lax.scan over a
   (steps, 2, S) gather-index tape -- a single small XLA program whose shape
   is independent of the scalar data, so it compile-caches across proves.
3. Additions use COMPLETE projective formulas (Renes-Costello a=0, 12 muls
   + 2 muls by 3b): branch-free, no batch inversion, identity/doubling/
   cancellation all uniform. The batched-affine alternative (5 muls + a
   shared batch inversion) loses on TPU: each round's inversion bottoms out
   in a ~500-step *sequential* Fermat ladder (~9 ms measured on the bench
   chip), while the complete add keeps every multiply at full batch width.
4. The slot pool lives in ONE (48, slots) array (96 for G2); each step
   gathers its operand pairs, runs one fused Pallas complete-add kernel, and
   the kernel writes its output block IN PLACE into the pool via
   input_output_aliases + a scalar-prefetch dynamic block index. Writing
   through XLA dynamic_update_slice instead costs a full pool copy per step
   (measured ~2.3 ms/step vs ~1.1 ms/step fused at S=8192).
5. Bucket-weighted reduction sum_d d*S_d splits by digit bits:
   sum_t 2^t * (sum_{d: bit t} S_d); the inner sums reuse the same
   pair-reduction tape, and the final Horner over bits and windows is host
   bigint math on the 256 subset sums (a few ms, one field inversion).
6. Host scheduling is allocation-light numpy: one radix-friendly argsort of
   the (window, digit) keys, then each round's survivors are produced by a
   searchsorted MERGE of two already-sorted streams (no per-round argsort).

This matches how state-of-the-art GPU/FPGA MSM engines schedule Pippenger
(sorted buckets + batched adds), re-expressed as a shape-stable scanned
device program driven by a host tape.

Reference counterpart: the rayon-parallel MSMs inside ark-groth16's
`Groth16::prove` (invoked at core/src/sequencer/settlement/prover.rs:408).
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass

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

ROWS = 8  # sublane rows per kernel block; S and slot bases align to ROWS*128
ALIGN = ROWS * 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# tape construction (host, numpy)
# ---------------------------------------------------------------------------


@dataclass
class Tape:
    idx: np.ndarray  # (steps, 2, S) int32 gather slot ids; slot 0 = identity
    S: int
    a0: int  # first output slot; step t writes slots [a0 + t*S, a0 + (t+1)*S)
    total_slots: int  # pool width (power of two)
    finals: np.ndarray  # (WINDOW_BITS * N_WINDOWS,) int32 bit-subset slots
    n_points: int
    mixed_steps: int  # tape prefix whose operand pairs are ALL original
    # input points (Z = 1): bucket round 0. Those steps run the cheaper
    # mixed-add kernel and skip gathering the Z rows.


def _step_size(n_points: int) -> int:
    """Uniform step width: a function of the MSM size only (so program
    shapes repeat across proves), balancing per-step fixed cost against
    padding waste on the small tail rounds."""
    lanes = N_WINDOWS * n_points
    s = 1024
    while s < 8192 and s * 48 < lanes:
        s *= 2
    return s


def build_tape(digits: np.ndarray) -> Tape:
    """digits: (W, N) int32. Input point i lives at slot i + 1; slot 0 is
    the canonical identity. Returns the uniform-step addition tape.

    Dispatches to the native C++ builder (csrc/msm_tape.cpp, ~10x) and
    falls back to the numpy implementation below; the two may pair
    equal-key items differently, which is algebraically irrelevant."""
    w, n = digits.shape
    S = _step_size(n)
    a0 = _round_up(n + 1, ALIGN)

    from . import tape_native

    native = tape_native.build_tape_arrays(digits, N_BUCKETS, WINDOW_BITS,
                                           S, a0)
    if native is not None:
        idx, finals, steps, mixed, base = native
        total = 1 << (base - 1).bit_length()
        return Tape(idx=idx, S=S, a0=a0, total_slots=total, finals=finals,
                    n_points=n, mixed_steps=mixed)

    win = np.repeat(np.arange(w, dtype=np.int64), n)
    slot = np.tile(np.arange(1, n + 1, dtype=np.int64), w)
    dig = digits.reshape(-1).astype(np.int64)
    keep = dig != 0
    keys = win[keep] * N_BUCKETS + dig[keep]
    items = slot[keep]
    # max key = W * 256 + 255 < 2^16: 16-bit keys take numpy's radix path
    order = np.argsort(keys.astype(np.uint16), kind="stable")
    keys, items = keys[order], items[order]

    chunks_a: list = []
    chunks_b: list = []
    state = {"base": a0}

    def emit_round(ia: np.ndarray, ib: np.ndarray) -> np.ndarray:
        m = len(ia)
        k = -(-m // S)
        pad = k * S - m
        pa = np.pad(ia.astype(np.int32), (0, pad))
        pb = np.pad(ib.astype(np.int32), (0, pad))
        for c in range(k):
            chunks_a.append(pa[c * S:(c + 1) * S])
            chunks_b.append(pb[c * S:(c + 1) * S])
        outs = np.arange(state["base"], state["base"] + m, dtype=np.int64)
        state["base"] += k * S
        return outs

    def reduce_iter(keys: np.ndarray, items: np.ndarray):
        """One pair-reduction pass over key-sorted (keys, items); emits one
        round; survivors stay key-sorted via a searchsorted merge."""
        mlen = len(items)
        if mlen <= 1:
            return keys, items, False
        same_next = keys[1:] == keys[:-1]
        if not same_next.any():
            return keys, items, False
        run_start = np.ones(mlen, bool)
        run_start[1:] = ~same_next
        run_id = np.cumsum(run_start) - 1
        start_pos = np.flatnonzero(run_start)
        pos_in_run = np.arange(mlen) - start_pos[run_id]
        run_len = np.bincount(run_id)
        is_a = (pos_in_run % 2 == 0) & (pos_in_run + 1 < run_len[run_id])
        is_b = np.zeros(mlen, bool)
        is_b[1:] = is_a[:-1]
        outs = emit_round(items[is_a], items[is_b])
        ka = keys[is_a]
        leftover = ~(is_a | is_b)
        kl, il = keys[leftover], items[leftover]
        # stable merge of the two key-sorted streams (outs win ties)
        pos_a = np.arange(len(ka)) + np.searchsorted(kl, ka, side="left")
        pos_l = np.arange(len(kl)) + np.searchsorted(ka, kl, side="right")
        keys = np.empty(len(ka) + len(kl), np.int64)
        items = np.empty_like(keys)
        keys[pos_a], keys[pos_l] = ka, kl
        items[pos_a], items[pos_l] = outs, il
        return keys, items, True

    def reduce_all(keys: np.ndarray, items: np.ndarray):
        while True:
            keys, items, again = reduce_iter(keys, items)
            if not again:
                return keys, items

    def pad_steps(align_from: int):
        while (len(chunks_a) - align_from) % 4 != 0:
            chunks_a.append(np.zeros(S, np.int32))
            chunks_b.append(np.zeros(S, np.int32))
            state["base"] += S

    # bucket round 0 pairs ORIGINAL points only (Z = 1): split it out as
    # the tape's mixed-kernel prefix, quantized for compile caching
    keys, items, _ = reduce_iter(keys, items)
    pad_steps(0)
    mixed_steps = len(chunks_a)
    keys, items = reduce_all(keys, items)
    bucket_slot = np.zeros((w, N_BUCKETS), np.int64)
    bucket_slot[keys // N_BUCKETS, keys % N_BUCKETS] = items

    # bit-subset phase: group (t, w) sums buckets whose digit has bit t set
    gkeys, gitems = [], []
    all_d = np.arange(N_BUCKETS)
    for t in range(WINDOW_BITS):
        ds = np.flatnonzero((all_d >> t) & 1)
        for wi in range(N_WINDOWS):
            slots = bucket_slot[wi, ds]
            slots = slots[slots != 0]
            if len(slots) == 0:
                slots = np.zeros(1, np.int64)  # identity
            gkeys.append(np.full(len(slots), t * N_WINDOWS + wi, np.int64))
            gitems.append(slots)
    keys2, items2 = reduce_all(np.concatenate(gkeys), np.concatenate(gitems))
    finals = np.zeros(WINDOW_BITS * N_WINDOWS, np.int64)
    finals[keys2] = items2

    # quantize the general step count (no-op identity steps) so shapes
    # repeat across proves; guarantee at least one general step
    pad_steps(mixed_steps)
    if len(chunks_a) == mixed_steps:
        for _ in range(4):
            chunks_a.append(np.zeros(S, np.int32))
            chunks_b.append(np.zeros(S, np.int32))
            state["base"] += S
    idx = np.stack(
        [np.stack(chunks_a), np.stack(chunks_b)], axis=1
    )  # (steps, 2, S)
    total = 1 << (state["base"] - 1).bit_length()
    return Tape(idx=idx, S=S, a0=a0, total_slots=total,
                finals=finals.astype(np.int32), n_points=n,
                mixed_steps=mixed_steps)


# ---------------------------------------------------------------------------
# tape wire format: ONE uint8 buffer per MSM
# ---------------------------------------------------------------------------
#
# The bench device sits behind a relay with ~24 ms per-transfer latency and
# ~55 MB/s host->device bandwidth (docs/DEVNOTES.md), so the tape upload --
# not the device compute -- dominates the MSM. Two levers: (a) ship 2-3
# bytes per slot index instead of 4 (mixed-prefix operands are original
# input points, slot <= n+1, so uint16 is exact; general operands carry a
# separate hi-byte plane), and (b) ship everything (both tape sections +
# the finals index list) as a SINGLE flat little-endian uint8 buffer so the
# whole MSM costs exactly one host->device transfer. Chunked uploads were
# measured 4-10x SLOWER than one shot through the relay, so no pipelining.


def _pack_tape(tape: Tape):
    """Serialize a Tape into one LE uint8 buffer + static decode metadata.

    Layout: [mixed idx (u2 or i4)] [general lo (u2)] [general hi (4-bit
    nibble pair, u1, or u2 per index -- picked from total_slots)]
    [finals (i4)]. Returns (buf, mixed16, hi_mode, gen_steps)."""
    im = tape.idx[: tape.mixed_steps]
    ig = tape.idx[tape.mixed_steps:]
    mixed16 = tape.n_points + 1 <= 0xFFFF
    if tape.total_slots <= (1 << 20):
        hi_mode = 4  # hi <= 15: pack the A/B nibbles of a pair in one byte
        hi_plane = ((ig[:, 0] >> 16) | ((ig[:, 1] >> 16) << 4)).astype(
            np.uint8
        )
    elif tape.total_slots <= (1 << 24):
        hi_mode = 8
        hi_plane = (ig >> 16).astype("u1")
    else:
        hi_mode = 16
        hi_plane = (ig >> 16).astype("<u2")
    parts = [
        im.astype("<u2" if mixed16 else "<i4").tobytes(),
        (ig & 0xFFFF).astype("<u2").tobytes(),
        hi_plane.tobytes(),
        tape.finals.astype("<i4").tobytes(),
    ]
    buf = np.frombuffer(b"".join(parts), np.uint8)
    return buf, mixed16, hi_mode, ig.shape[0]


def _decode_tape(buf, S, mixed_steps, gen_steps, mixed16, hi_mode):
    """Device-side inverse of _pack_tape: uint8 buffer -> (idx_mixed,
    idx_general, finals) int32 arrays. Explicit byte shifts (not bitcast)
    keep the decode endian-defined on every backend."""

    def u16(b):
        return b[..., 0].astype(jnp.int32) | (b[..., 1].astype(jnp.int32) << 8)

    def i32(b):
        return (
            b[..., 0].astype(jnp.int32)
            | (b[..., 1].astype(jnp.int32) << 8)
            | (b[..., 2].astype(jnp.int32) << 16)
            | (b[..., 3].astype(jnp.int32) << 24)
        )

    off = 0

    def take(shape, nbytes):
        nonlocal off
        n = int(np.prod(shape)) * nbytes
        part = buf[off: off + n].reshape(*shape, nbytes)
        off += n
        return part

    if mixed_steps:
        m_raw = take((mixed_steps, 2, S), 2 if mixed16 else 4)
        idx_m = u16(m_raw) if mixed16 else i32(m_raw)
    else:
        idx_m = jnp.zeros((0, 2, S), jnp.int32)
    lo = u16(take((gen_steps, 2, S), 2))
    if hi_mode == 4:
        nib = take((gen_steps, S), 1)[..., 0].astype(jnp.int32)
        hi = jnp.stack([nib & 0xF, nib >> 4], axis=1)
    elif hi_mode == 8:
        hi = take((gen_steps, 2, S), 1)[..., 0].astype(jnp.int32)
    else:
        hi = u16(take((gen_steps, 2, S), 2))
    idx_g = lo | (hi << 16)
    finals = i32(take((WINDOW_BITS * N_WINDOWS,), 4))
    return idx_m, idx_g, finals


# ---------------------------------------------------------------------------
# device program: one scan over the tape
# ---------------------------------------------------------------------------


def _use_fused() -> bool:
    if os.environ.get("ZELANA_FORCE_PALLAS") == "1":
        return True
    return jax.default_backend() != "cpu"


def _split_coords(a, curve: str):
    if curve == "g1":
        return (a[0:16], a[16:32], a[32:48])
    return ((a[0:16], a[16:32]), (a[32:48], a[48:64]), (a[64:80], a[80:96]))


@functools.partial(
    jax.jit,
    static_argnames=(
        "curve", "S", "a0", "total_alloc", "mixed_steps", "gen_steps",
        "mixed16", "hi_mode",
    ),
)
def _run_tape(X, Y, buf, curve, S, a0, total_alloc, mixed_steps, gen_steps,
              mixed16, hi_mode):
    """Execute the whole MSM tape as two jitted scans (mixed prefix, then
    general steps). `buf` is the single packed uint8 tape from _pack_tape;
    the index planes and finals list are decoded on device.

    Pool layout (TPU): one (C, total_alloc/128, 128) uint32 array with
    PACKED 16-bit limb pairs -- 8 rows per field element, C = 24 (G1) or
    48 (G2), rows grouped X | Y | Z (x0 x1 y0 y1 z0 z1 for G2). Slot 0 is
    the identity (0 : 1 : 0); input point i sits at slot i + 1; step t
    writes slots a0 + [t*S, (t+1)*S). Each step's add + pool write is ONE
    fused Pallas kernel writing in place (input_output_aliases); the tape
    prefix uses the 9-mul mixed kernel and skips gathering Z rows.

    On CPU the same complete-add math runs as XLA ops over an UNPACKED
    (3*16 | 6*16, total_alloc) pool with dynamic_update_slice writes."""
    from .pallas_curve import (
        complete_add_mixed,
        proj_add_xla,
        step_call,
        pack_rows_py,
        XlaFq,
        XlaFq2,
    )

    leaves = ([X, Y] if curve == "g1" else [X[0], X[1], Y[0], Y[1]])
    n_pts = leaves[0].shape[1]
    ny = len(leaves)
    idx_m, idx_g, finals_idx = _decode_tape(
        buf, S, mixed_steps, gen_steps, mixed16, hi_mode
    )
    fused = _use_fused()
    interpret = jax.default_backend() == "cpu"

    if fused:
        C = 24 if curve == "g1" else 48
        one_packed = np.array(
            pack_rows_py(L.FQ.one_mont), dtype=np.uint32
        ).reshape(8, 1)

        def pack(leaf):  # (16, n) limb rows -> (8, n) packed
            pairs = leaf.reshape(8, 2, leaf.shape[1])
            return pairs[:, 0] + (pairs[:, 1] << 16)

        pool = jnp.zeros((C, total_alloc), jnp.uint32)
        for r, leaf in enumerate(leaves):
            pool = jax.lax.dynamic_update_slice(pool, pack(leaf), (r * 8, 1))
        one_col = jnp.asarray(one_packed)
        z_rows = jnp.broadcast_to(one_col, (8, n_pts))
        pool = jax.lax.dynamic_update_slice(pool, z_rows, (ny * 8, 1))
        # identity at slot 0: Y (first component) = 1
        pool = jax.lax.dynamic_update_slice(pool, one_col, (ny * 4, 0))
        pool = pool.reshape(C, total_alloc // 128, 128)
        a_rows = 2 * C // 3  # mixed steps gather X | Y only

        def make_step(mixed: bool):
            call = step_call(L.FQ.modulus, curve, S, total_alloc, interpret,
                             mixed)

            def step(pool, xs):
                idx, t = xs
                src = pool[:a_rows] if mixed else pool
                A = src[:, idx[0] // 128, idx[0] % 128]
                B = src[:, idx[1] // 128, idx[1] % 128]
                st = (a0 + t * S).reshape(1).astype(jnp.int32)
                rows = A.shape[0]
                out = call(
                    st,
                    A.reshape(rows, S // 128, 128),
                    B.reshape(rows, S // 128, 128),
                    pool,
                )
                return out, None

            return step

        if mixed_steps:
            pool, _ = jax.lax.scan(
                make_step(True), pool,
                (idx_m, jnp.arange(mixed_steps, dtype=jnp.int32)),
            )
        pool, _ = jax.lax.scan(
            make_step(False), pool,
            (idx_g,
             jnp.arange(mixed_steps, mixed_steps + gen_steps,
                        dtype=jnp.int32)),
        )
        packed = pool.reshape(C, total_alloc)[:, finals_idx]
        # unpack to (2C, finals) 16-bit limb rows for the host tail
        lo = packed & 0xFFFF
        hi = packed >> 16
        return jnp.stack([lo, hi], axis=1).reshape(2 * C, -1)

    C = 48 if curve == "g1" else 96
    one_col = jnp.asarray(
        np.asarray(L.FQ.one_mont, dtype=np.uint32).reshape(L.NLIMBS, 1)
    )
    pool = jnp.zeros((C, total_alloc), jnp.uint32)
    for r, leaf in enumerate(leaves):
        pool = jax.lax.dynamic_update_slice(pool, leaf, (r * 16, 1))
    z_rows = jnp.broadcast_to(one_col, (L.NLIMBS, n_pts))
    pool = jax.lax.dynamic_update_slice(pool, z_rows, (ny * 16, 1))
    pool = jax.lax.dynamic_update_slice(pool, one_col, (ny * 8, 0))

    def step_xla(mixed: bool):
        def step(pool, xs):
            idx, t = xs
            A = jnp.take(pool, idx[0], axis=1)
            B = jnp.take(pool, idx[1], axis=1)
            if mixed:
                F = XlaFq if curve == "g1" else XlaFq2
                if curve == "g1":
                    V = complete_add_mixed(
                        F, (A[0:16], A[16:32]), (B[0:16], B[16:32])
                    )
                else:
                    V = complete_add_mixed(
                        F,
                        ((A[0:16], A[16:32]), (A[32:48], A[48:64])),
                        ((B[0:16], B[16:32]), (B[32:48], B[48:64])),
                    )
            else:
                V = proj_add_xla(_split_coords(A, curve),
                                 _split_coords(B, curve), curve)
            flat = jnp.concatenate(
                [V[0], V[1], V[2]] if curve == "g1"
                else [V[0][0], V[0][1], V[1][0], V[1][1], V[2][0], V[2][1]],
                axis=0,
            )
            st = a0 + t * S
            return jax.lax.dynamic_update_slice(pool, flat, (0, st)), None

        return step

    if mixed_steps:
        pool, _ = jax.lax.scan(
            step_xla(True), pool,
            (idx_m, jnp.arange(mixed_steps, dtype=jnp.int32)),
        )
    pool, _ = jax.lax.scan(
        step_xla(False), pool,
        (idx_g,
         jnp.arange(mixed_steps, mixed_steps + gen_steps, dtype=jnp.int32)),
    )
    return pool[:, finals_idx]  # (C, WINDOW_BITS * N_WINDOWS)


# ---------------------------------------------------------------------------
# host tail: Horner over bits and windows in Jacobian bigints
# ---------------------------------------------------------------------------


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


def _finish_host(g, curve, window_bits: int = WINDOW_BITS,
                 n_windows: int = N_WINDOWS):
    """Host tail: bit-Horner each window's bit-subset sums, then the
    window Horner, all in Jacobian bigints; one inversion at the end.

    g: (C, window_bits * n_windows) device array of projective sums.
    A projective point maps into Jacobian coordinates as (X*Z, Y*Z^2, Z)."""
    fq2 = curve == "g2"
    F = _JacField(fq2)
    g = np.asarray(g)

    def decode(rows):
        return L.decode_mont(rows, L.FQ)

    if not fq2:
        coords = list(zip(decode(g[0:16]), decode(g[16:32]),
                          decode(g[32:48])))
    else:
        coords = list(zip(
            zip(decode(g[0:16]), decode(g[16:32])),
            zip(decode(g[32:48]), decode(g[48:64])),
            zip(decode(g[64:80]), decode(g[80:96])),
        ))
    pts = [
        (F.mul(x, z), F.mul(y, F.sqr(z)), z) if z != F.zero
        else (F.zero, F.zero, F.zero)
        for x, y, z in coords
    ]
    # pts laid out as (window_bits, n_windows)
    windows = []
    for w in range(n_windows):
        acc = pts[(window_bits - 1) * n_windows + w]
        for t in range(window_bits - 2, -1, -1):
            acc = F.dbl(acc)
            acc = F.addp(acc, pts[t * n_windows + w])
        windows.append(acc)
    acc = windows[-1]
    for w in range(n_windows - 2, -1, -1):
        for _ in range(window_bits):
            acc = F.dbl(acc)
        acc = F.addp(acc, windows[w])
    return F.to_affine(acc)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def prepare_g1(points):
    """Device-resident G1 point set; reuse across MSMs with the same basis
    (Groth16 query points are fixed per proving key)."""
    return g1_points_to_device(points)


def prepare_g2(points):
    return g2_points_to_device(points)


def msm_begin(prepared, scalars, curve: str, digits: np.ndarray = None):
    """Phase 1: build + upload the tape and DISPATCH the device scans
    (asynchronous). Returns a handle for msm_end. Callers with several MSMs
    should begin them all, then end them all: the host tape construction of
    MSM k+1 then overlaps the device execution of MSM k (the relay executes
    dispatches in order; only msm_end forces a device->host sync).

    `digits` optionally supplies a precomputed scalar_digits matrix (the
    Groth16 prover reuses one digit decomposition across the a/b1/b2
    queries, which share the assignment vector as scalars); infinity-point
    masking is applied here either way."""
    coords, inf = prepared
    if digits is None:
        digits = scalar_digits(scalars, inf)
    elif inf is not None and inf.any():
        digits = digits.copy()
        digits[:, inf] = 0
    tape = build_tape(digits)
    buf, mixed16, hi_mode, gen_steps = _pack_tape(tape)
    X, Y = coords
    g = _run_tape(
        X, Y, jnp.asarray(buf), curve, tape.S, tape.a0, tape.total_slots,
        tape.mixed_steps, gen_steps, mixed16, hi_mode,
    )
    return (g, curve)


def msm_end(handle):
    """Phase 2: sync the device result and run the host Horner tail."""
    g, curve = handle
    return _finish_host(g, curve)


def _msm(prepared, scalars, curve: str):
    return msm_end(msm_begin(prepared, scalars, curve))


def msm_g1_prepared(prepared, scalars):
    return _msm(prepared, scalars, "g1")


def msm_g2_prepared(prepared, scalars):
    return _msm(prepared, scalars, "g2")


def msm_g1(points, scalars):
    if not points:
        return None
    return msm_g1_prepared(prepare_g1(points), scalars)


def msm_g2(points, scalars):
    if not points:
        return None
    return msm_g2_prepared(prepare_g2(points), scalars)
