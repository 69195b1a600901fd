"""Run-scan Pippenger MSM: device-side bucket accumulation, one kernel.

The round-2 MSM engine. The tape design (ops/msm_fast.py) ships an explicit
(a, b) slot-index pair per point addition -- ~5 bytes/add -- so on a
bandwidth-limited link the upload, not the compute, bounds throughput. This
design ships ONE index per stream element instead (~2 bytes), and turns the
whole bucket accumulation into a single Pallas kernel:

1. Host: decompose scalars into 32x8-bit window digits, key each digit slot
   by (window, digit), and stably sort the (key, point_id) stream -- one
   uint16 radix argsort. Zero digits stay in the stream (keys (w, 0)) and
   their bucket sums are simply never read: shapes stay fixed.
2. The sorted stream is laid out column-major over L lanes x R rows. A flag
   marks each element that begins a new (window, digit) run.
3. Device: gather the affine points into stream order, then ONE pallas_call
   (pallas_curve.runscan_call) scans the R+1 rows: each lane carries a
   running partial bucket sum in VMEM scratch; on a flag it emits the
   finished run total and resets to the incoming point. Every addition is
   the 11-mul complete Z2=1 add -- the incoming operand is always an
   ORIGINAL affine point -- and operands arrive by block streaming, never
   by per-step XLA gathers.
4. Runs that straddle a lane boundary emit one partial per lane; the host
   knows every emit position, so bucket totals are assembled by gathering
   K layers of partials into a dense (32 windows x 256 digits) layout and
   K-1 fixed full-width complete adds (pallas_curve.pairs_add_call).
5. Bucket-weighted reduction sum_d d*S_d splits by digit bits (as in
   msm_fast): 8 x 32 bit-subset sums, computed by a FIXED masked gather +
   7-level pairwise reduction tree -- structure known at compile time, no
   per-MSM upload. The final Horner over bits and windows reuses
   msm_fast._finish_host (host bigints, one field inversion).

Upload per MSM: the (R+1, L) uint16 perm/flag plane + K x 8192 dense
indices -- ~2.5x less than the tape format -- and nothing else; scalars
that are already device-resident (the production witness path) need no
per-MSM transfer at all beyond the perm, which the a/b1/b2 MSMs of one
Groth16 prove share (same scalar vector -> same schedule).

Reference counterpart: the rayon MSMs inside ark-groth16's prove
(core/src/sequencer/settlement/prover.rs:408).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from . import limbs as L
from ..fields.bn254 import R as _FR
from .msm import g1_points_to_device, g2_points_to_device
from .msm_fast import _finish_host

LANES = 8192  # stream lanes; rows R = padded_stream / LANES
# G2 lane cap: the scan kernel's VMEM footprint scales with C x lanes, and
# Fq2 state is 3x G1's -- at 8192 lanes the Mosaic scoped-VMEM stack
# overflows (26.3M vs the 16M limit, first hit by the b2 query MSM of the
# production chunk key). Narrower tiles trade rows for fitting; total
# adds are unchanged.
LANES_G2 = 2048

# Window size. 11-bit windows cut the digit stream (and with it both the
# per-MSM upload and the scan's add count) 25% on paper, but MEASURED
# 3.5x SLOWER end to end on the bench slice (555 ms vs 158 ms pipelined
# at 2^16): the dense bucket space grows 6x (24 x 2048) and the
# bucket-phase gathers + K-layer merge + 10-level subset tree ride this
# device's pathologically slow XLA gather (~30 ns/row) and dwarf the
# stream saving. Byte windows stay the default; larger windows are a
# real-hardware option via ZELANA_SCAN_WINDOW_BITS. Keys (w * 2^c + d)
# must fit uint16 for the sort and the native scheduler.
SCAN_BITS = int(__import__("os").environ.get("ZELANA_SCAN_WINDOW_BITS",
                                             "8"))
SCAN_WINDOWS = -(-254 // SCAN_BITS)
SCAN_BUCKETS = 1 << SCAN_BITS
assert SCAN_WINDOWS * SCAN_BUCKETS <= 0xFFFF, "keys must fit uint16"


def scalar_digits(scalars, inf_mask=None) -> np.ndarray:
    """(SCAN_WINDOWS, N) int32 c-bit window digits; infinity points get
    all-zero digits (they land in the dropped (w, 0) buckets).

    `scalars`: list of ints, or an (N, 4) uint64 little-endian limb array
    (the native-synthesis assignment format -- no per-element conversion)."""
    if isinstance(scalars, np.ndarray):
        limbs = np.ascontiguousarray(scalars, dtype=np.uint64)
        n = len(limbs)
    else:
        n = len(scalars)
        buf = b"".join(int(s).to_bytes(32, "little") for s in scalars)
        limbs = np.frombuffer(buf, dtype="<u8").reshape(n, 4)
    digits = np.empty((SCAN_WINDOWS, n), np.int32)
    mask = np.uint64(SCAN_BUCKETS - 1)
    for w in range(SCAN_WINDOWS):
        bit = w * SCAN_BITS
        idx, sh = bit // 64, np.uint64(bit % 64)
        lo = limbs[:, idx] >> sh
        if int(sh) and idx + 1 < 4:
            lo = lo | (limbs[:, idx + 1] << (np.uint64(64) - sh))
        digits[w] = (lo & mask).astype(np.int32)
    if inf_mask is not None:
        digits[:, inf_mask] = 0
    return digits


def _round_pow2(x: int, lo: int = 1) -> int:
    return max(lo, 1 << (x - 1).bit_length())


# ---------------------------------------------------------------------------
# host schedule
# ---------------------------------------------------------------------------


@dataclass
class Schedule:
    perm: np.ndarray  # (R+1, L) uint16 point ids (flag in bit 15 if n<=2^15)
    flag_bits: np.ndarray | None  # (R+1, L/32) uint32 bitmap for n > 2^15
    dense_idx: np.ndarray  # (K, W * 2^c) int32 emit-buffer positions
    R: int
    K: int
    n_points: int
    # two-level variant (level-2 run-scan partial merge): when pos2 is
    # set, dense_idx indexes the LEVEL-2 emit buffer and K counts its
    # (small) layers; pos2 carries the level-2 stream (positions into the
    # level-1 emit buffer, run flag in bit 31)
    pos2: np.ndarray | None = None  # (R2+1, lanes2) int32
    R2: int = 0
    lanes2: int = 0


# The level-2 run-scan replaces the K-layer dense merge of per-lane
# partials: the partials become a second key-sorted (projective) stream
# through the same scan kernel, so a degenerate bucket with hundreds of
# partials (the wide-window trap, docs/DEVNOTES.md) costs rows instead of
# dense layers. Opt out with ZELANA_SCAN_L2=0.
SCAN_L2 = __import__("os").environ.get("ZELANA_SCAN_L2", "1") == "1"


def _quantize_schedule(s: Schedule, fold: bool) -> Schedule:
    """Pad the data-dependent schedule dims (R, K, R2) to stable buckets.

    Every distinct (R, K, R2, lanes2) tuple is a distinct _device_msm
    XLA program, and on the axon relay a NEW program costs minutes of
    remote compile at first execution EVEN when jax's persistent cache
    hits (the relay recompiles server-side). R and R2 are data-dependent
    (R via n, R2 via the run/lane-crossing count), so without quantization
    the five MSMs of one Groth16 prove compile five programs and repeat
    proves with different witnesses can recompile mid-flight. Padding:

    - R -> next pow2: extra stream rows AFTER the flush row with flag=1
      and point id 0; their emits land beyond every dense_idx reference.
    - K -> pow2 floor 4: all-zero dense layers gather emit position 0
      (always the identity) and fold as no-op complete adds.
    - R2 -> next pow2: extra level-2 rows with the run flag set and
      position 0 (the identity emit).

    Upload cost of the padding is bytes-to-tens-of-KB; the win is one
    compiled program per (lanes, curve) bucket."""
    Rp = _round_pow2(s.R)
    perm, fbits = s.perm, s.flag_bits
    if Rp != s.R:
        pad = Rp - s.R
        fill = np.uint16(0x8000) if fold else np.uint16(0)
        perm = np.concatenate(
            [perm, np.full((pad, perm.shape[1]), fill, np.uint16)])
        if fbits is not None:
            fbits = np.concatenate(
                [fbits,
                 np.full((pad, fbits.shape[1]), 0xFFFFFFFF, np.uint32)])
    Kp = max(s.K, 4)
    dense = s.dense_idx
    if Kp != s.K:
        dense = np.concatenate(
            [dense, np.zeros((Kp - s.K, dense.shape[1]), dense.dtype)])
    pos2, R2 = s.pos2, s.R2
    if pos2 is not None:
        R2p = _round_pow2(R2)
        if R2p != R2:
            pos2 = np.concatenate(
                [pos2, np.full((R2p - R2, pos2.shape[1]),
                               np.int32(-0x80000000), np.int32)])
            R2 = R2p
    return Schedule(perm=perm, flag_bits=fbits, dense_idx=dense, R=Rp,
                    K=Kp, n_points=s.n_points, pos2=pos2, R2=R2,
                    lanes2=s.lanes2)


def build_schedule(digits: np.ndarray, lanes: int = LANES,
                   level2: bool | None = None) -> Schedule:
    """digits: (W, N) int32 window digits (zeros included).

    Upload budget is the design constraint (docs/DEVNOTES.md link numbers):
    ~2 bytes per stream element -- uint16 point ids with the run flag in
    bit 15 when ids fit 15 bits, else a separate 1-bit/element bitmap.

    Dispatches to the native C++ builder (csrc/scan_sched.cpp, ~5-10x);
    the numpy implementation below is the fallback. Layering order of
    same-bucket partials may differ between the two -- algebraically
    irrelevant (bucket sums commute)."""
    w, n = digits.shape
    assert n <= CHUNK_N, (
        f"schedule point ids are uint16: {n} > {CHUNK_N} points must be "
        "segmented (msm_begin does this automatically)")
    nw = w * n
    lanes0 = min(lanes, _round_pow2(max(nw // 8, 128), 128))
    R0 = -(-nw // lanes0)
    fold = n <= (1 << 15)
    from . import sched_native

    if level2 is None:
        level2 = SCAN_L2
    if level2:
        bound = w * SCAN_BUCKETS + lanes0
        lanes2 = min(1024, _round_pow2(max(bound // 8, 128), 128))
        native2 = sched_native.build_schedule_arrays2(
            digits, SCAN_BUCKETS, lanes0, R0, fold, lanes2)
        if native2 is not None:
            perm, flag_bits, pos2, dense2, K2, R2 = native2
            Kp = _round_pow2(K2)
            return _quantize_schedule(Schedule(
                perm=perm, flag_bits=None if fold else flag_bits,
                dense_idx=np.ascontiguousarray(dense2[:Kp]), R=R0, K=Kp,
                n_points=n, pos2=pos2, R2=R2, lanes2=lanes2), fold)

    native = sched_native.build_schedule_arrays(digits, SCAN_BUCKETS,
                                                lanes0, R0, fold)
    if native is not None:
        perm, flag_bits, dense, K = native
        Kp = _round_pow2(K)
        return _quantize_schedule(
            Schedule(perm=perm, flag_bits=None if fold else flag_bits,
                     dense_idx=np.ascontiguousarray(dense[:Kp]), R=R0,
                     K=Kp, n_points=n), fold)

    keys = (
        np.arange(w, dtype=np.int32)[:, None] * SCAN_BUCKETS + digits
    ).astype(np.uint16).reshape(-1)
    order = np.argsort(keys, kind="stable").astype(np.int32)
    skeys = keys[order]
    spid = order % np.int32(n)

    lanes = min(lanes, _round_pow2(max(nw // 8, 128), 128))
    R = -(-nw // lanes)
    pad = R * lanes - nw
    SENT = np.uint16(0xFFFF)  # > every real key (w*256+d < 2^13+...)
    if pad:
        skeys = np.concatenate([skeys, np.full(pad, SENT, np.uint16)])
        spid = np.concatenate([spid, np.zeros(pad, np.int32)])

    # column-major: lane l processes stream slice [l*R, (l+1)*R)
    keys_col = skeys.reshape(lanes, R).T  # (R, L) view
    pid_col = spid.reshape(lanes, R).T
    flags = np.ones((R, lanes), bool)
    np.not_equal(keys_col[1:], keys_col[:-1], out=flags[1:])

    # emit accounting: the run ending at row r-1 of lane l is emitted at
    # (r, l) when flags[r, l]; the last row's runs are emitted by the
    # flush row R (all flags set)
    er, el = np.nonzero(flags[1:])
    pos = np.concatenate([(er.astype(np.int64) + 1) * lanes + el,
                          R * lanes + np.arange(lanes)])
    key = np.concatenate([keys_col[er, el], keys_col[R - 1, :]]).astype(
        np.int64)
    valid = (key < int(SENT)) & (key % SCAN_BUCKETS != 0)
    pos, key = pos[valid], key[valid]
    o = np.argsort(key.astype(np.uint16), kind="stable")
    pos, key = pos[o], key[o]

    # layer the per-lane partials: occurrence index within each bucket
    first = np.ones(len(key), bool)
    first[1:] = key[1:] != key[:-1]
    start = np.flatnonzero(first)
    gid = np.cumsum(first) - 1
    occ = np.arange(len(key)) - start[gid]
    K = _round_pow2(int(occ.max()) + 1 if len(occ) else 1)
    # emit position 0 is row 0 of lane 0 -- always the identity (every
    # lane's first flag emits the initial carry), the default filler
    dense_idx = np.zeros((K, w * SCAN_BUCKETS), np.int32)
    dense_idx[occ, key] = pos

    flag_rows = np.ones((R + 1, lanes), bool)
    flag_rows[:R] = flags
    perm = np.zeros((R + 1, lanes), np.uint16)
    perm[:R] = pid_col
    if n <= (1 << 15):
        perm |= flag_rows.astype(np.uint16) << 15
        flag_bits = None
    else:
        # pack the flag bitmap: bit (l % 32) of word [r, l // 32]
        fb = flag_rows.reshape(R + 1, lanes // 32, 32)
        flag_bits = (fb.astype(np.uint32)
                     << np.arange(32, dtype=np.uint32)).sum(
                         axis=2, dtype=np.uint32)
    return _quantize_schedule(
        Schedule(perm=perm, flag_bits=flag_bits, dense_idx=dense_idx,
                 R=R, K=K, n_points=n), fold)


@functools.lru_cache(maxsize=1)
def _subset_idx():
    """Fixed gather of the bit-subset groups: (c bits x W windows x 2^(c-1)
    digits-with-bit-set) into the dense (W * 2^c) bucket layout; group
    order t*W + w matches msm_fast._finish_host's finals layout."""
    idx = np.zeros((SCAN_BITS, SCAN_WINDOWS, SCAN_BUCKETS // 2), np.int32)
    for t in range(SCAN_BITS):
        ds = np.flatnonzero((np.arange(SCAN_BUCKETS) >> t) & 1)
        for wi in range(SCAN_WINDOWS):
            idx[t, wi] = wi * SCAN_BUCKETS + ds
    return jnp.asarray(idx.reshape(-1))


# ---------------------------------------------------------------------------
# device program
# ---------------------------------------------------------------------------


def _pack_pool(coords, curve: str):
    """prepared leaves (16, n) u32 -> packed (VC, ceil(n/128), 128) pool."""
    leaves = ([coords[0], coords[1]] if curve == "g1"
              else [coords[0][0], coords[0][1], coords[1][0], coords[1][1]])
    n = leaves[0].shape[1]
    npad = -(-n // 128) * 128

    def pack(leaf):
        if npad != n:
            leaf = jnp.pad(leaf, ((0, 0), (0, npad - n)))
        pairs = leaf.reshape(8, 2, npad)
        return pairs[:, 0] + (pairs[:, 1] << 16)

    pool = jnp.concatenate([pack(lf) for lf in leaves], axis=0)
    return pool.reshape(pool.shape[0], npad // 128, 128)


def _use_fused() -> bool:
    import os

    if os.environ.get("ZELANA_FORCE_PALLAS") == "1":
        return True
    return jax.default_backend() != "cpu"


def _ident_packed(C: int, shape) -> jnp.ndarray:
    """Packed identity (0 : 1 : 0) broadcast over trailing `shape`."""
    from .pallas_curve import pack_rows_py

    one = np.asarray(pack_rows_py(L.FQ.one_mont), np.uint32)
    ident = np.zeros(C, np.uint32)
    ident[C // 3: C // 3 + 8] = one
    return jnp.broadcast_to(
        jnp.asarray(ident).reshape(C, *([1] * len(shape))), (C, *shape)
    )


def _runscan_xla(vals2, flags2, curve: str, proj_in: bool = False):
    """CPU/test fallback: the run-scan as one lax.scan over stream rows
    (same math as pallas_curve.runscan_call, XLA field ops)."""
    from .pallas_curve import (
        XlaFq,
        XlaFq2,
        _coords,
        _flat,
        complete_add,
        complete_add_z1,
        kernel_pack,
        kernel_unpack,
    )

    C = 24 if curve == "g1" else 48
    F = XlaFq if curve == "g1" else XlaFq2
    lanes = vals2.shape[2]
    ident = _ident_packed(C, (lanes,))
    one_limbs = L.broadcast_scalar(L.encode_mont([1], L.FQ)[:, 0], (lanes,))

    def step(carry, xs):
        v, f = xs
        fb = (f != 0)[None, :]
        emit = jnp.where(fb, carry, ident)
        cu = kernel_unpack(carry)
        vu = kernel_unpack(v)
        P = _coords(cu, curve, 3 if curve == "g1" else 6)
        if proj_in:
            Q = _coords(vu, curve, 3 if curve == "g1" else 6)
            S3 = complete_add(F, P, Q)
            prom = Q
        else:
            Q = _coords(vu, curve, 2 if curve == "g1" else 4)
            S3 = complete_add_z1(F, P, Q)
            if curve == "g1":
                prom = (vu[0:16], vu[16:32], one_limbs)
            else:
                zero = jnp.zeros_like(one_limbs)
                prom = ((vu[0:16], vu[16:32]), (vu[32:48], vu[48:64]),
                        (one_limbs, zero))
        if curve == "g1":
            newc = tuple(jnp.where(fb, prom[i], S3[i]) for i in range(3))
        else:
            newc = tuple(
                (jnp.where(fb, prom[i][0], S3[i][0]),
                 jnp.where(fb, prom[i][1], S3[i][1]))
                for i in range(3)
            )
        return kernel_pack(_flat(newc, curve)), emit

    _, emits = jax.lax.scan(step, ident, (vals2, flags2))
    return emits  # (R+1, C, lanes)


def _pack_sched(s: Schedule) -> np.ndarray:
    """All schedule planes -> ONE contiguous uint32 buffer.

    The relay link charges a large fixed cost PER TRANSFER (~tens of ms,
    docs/DEVNOTES.md: 8 chunked uploads are 4-10x slower than one shot), so
    the perm/flag/dense/pos2 arrays ship as a single upload and slice apart
    on device with static offsets."""
    parts = [np.ascontiguousarray(s.perm).reshape(-1).view(np.uint32)]
    if s.flag_bits is not None:
        parts.append(np.ascontiguousarray(s.flag_bits).reshape(-1))
    if _dense16(s):
        # level-2 emit positions fit uint16: ship the dense layer half-size
        parts.append(np.ascontiguousarray(
            s.dense_idx.astype(np.uint16)).reshape(-1).view(np.uint32))
    else:
        parts.append(
            np.ascontiguousarray(s.dense_idx).reshape(-1).view(np.uint32))
    if s.pos2 is not None:
        parts.append(np.ascontiguousarray(s.pos2).reshape(-1).view(np.uint32))
    return np.concatenate(parts)


def _dense16(s: Schedule) -> bool:
    """dense_idx indexes the level-2 emit buffer when pos2 is set; if that
    buffer is small enough its positions pack as uint16 (halves the dense
    component of the upload -- it is 6x larger at 11-bit windows)."""
    return s.pos2 is not None and (s.R2 + 1) * s.lanes2 <= 0xFFFF


@functools.partial(
    jax.jit,
    static_argnames=("curve", "R", "lanes", "K", "has_bits", "R2", "lanes2",
                     "has_l2", "dense16"),
)
def _device_msm(pool, sched, subset_idx, curve, R,
                lanes, K, has_bits, R2=0, lanes2=0, has_l2=False,
                dense16=False):
    from .pallas_curve import pairs_add_call, proj_add_xla, runscan_call

    fused = _use_fused()
    interpret = jax.default_backend() == "cpu"
    C = 24 if curve == "g1" else 48
    Ls = lanes // 128

    # unpack the single schedule buffer (see _pack_sched); offsets are
    # static functions of the shape args
    off = 0
    npw = (R + 1) * lanes // 2
    pw = jax.lax.slice(sched, (off,), (off + npw,))
    off += npw
    perm = jnp.stack([pw & 0xFFFF, pw >> 16], axis=1).reshape(R + 1, lanes)
    if has_bits:
        nfb = (R + 1) * (lanes // 32)
        flag_bits = jax.lax.slice(sched, (off,), (off + nfb,)).reshape(
            R + 1, lanes // 32)
        off += nfb
    nd = K * SCAN_WINDOWS * SCAN_BUCKETS
    if dense16:
        dw = jax.lax.slice(sched, (off,), (off + nd // 2,))
        dense_idx = jnp.stack([dw & 0xFFFF, dw >> 16], axis=1).astype(
            jnp.int32).reshape(K, SCAN_WINDOWS * SCAN_BUCKETS)
        off += nd // 2
    else:
        dense_idx = jax.lax.slice(sched, (off,), (off + nd,)).astype(
            jnp.int32).reshape(K, SCAN_WINDOWS * SCAN_BUCKETS)
        off += nd
    if has_l2:
        np2 = (R2 + 1) * lanes2
        pos2 = jax.lax.slice(sched, (off,), (off + np2,)).reshape(
            R2 + 1, lanes2)
        off += np2

    if has_bits:
        pid = perm.astype(jnp.int32)
        bits = jnp.right_shift(
            flag_bits[:, :, None], jnp.arange(32, dtype=jnp.uint32)
        ) & 1
        flag = bits.reshape(R + 1, lanes).astype(jnp.int32)
    else:
        pid = (perm & 0x7FFF).astype(jnp.int32)
        flag = (perm >> 15).astype(jnp.int32)

    vals = pool[:, pid // 128, pid % 128]  # (VC, R+1, lanes)
    VC = vals.shape[0]

    if fused:
        vals4 = vals.reshape(VC, R + 1, Ls, 128).transpose(1, 0, 2, 3)
        flag3 = flag.reshape(R + 1, Ls, 128)
        emit = runscan_call(L.FQ.modulus, curve, Ls, R, interpret)(
            vals4, flag3
        )
        flat = emit.transpose(1, 0, 2, 3).reshape(C, (R + 1) * lanes)
    else:
        vals2 = vals.transpose(1, 0, 2)  # (R+1, VC, lanes)
        emit = _runscan_xla(vals2, flag, curve)
        flat = emit.transpose(1, 0, 2).reshape(C, (R + 1) * lanes)

    if has_l2:
        # level-2 run-scan: gather the per-lane partials (projective) into
        # key-sorted stream order and scan them; dense_idx then indexes
        # the level-2 emit buffer with a small K
        Ls2 = lanes2 // 128
        flag2 = ((pos2 >> 31) & 1).astype(jnp.int32)  # run flag in bit 31
        pid2 = (pos2 & 0x7FFFFFFF).astype(jnp.int32)
        flat3 = flat.reshape(C, (R + 1) * lanes // 128, 128)
        vals_l2 = flat3[:, pid2 // 128, pid2 % 128]  # (C, R2+1, lanes2)
        if fused:
            v4 = vals_l2.transpose(1, 0, 2).reshape(R2 + 1, C, Ls2, 128)
            f3 = flag2.reshape(R2 + 1, Ls2, 128)
            emit2 = runscan_call(L.FQ.modulus, curve, Ls2, R2, interpret,
                                 proj_in=True)(v4, f3)
            flat = emit2.transpose(1, 0, 2, 3).reshape(
                C, (R2 + 1) * lanes2)
        else:
            v2 = vals_l2.transpose(1, 0, 2)  # (R2+1, C, lanes2)
            emit2 = _runscan_xla(v2, flag2, curve, proj_in=True)
            flat = emit2.transpose(1, 0, 2).reshape(C, (R2 + 1) * lanes2)

    def _unpack2(p):
        from .pallas_curve import kernel_unpack

        return kernel_unpack(p)

    def padd(a, b):
        m = a.shape[1]
        if fused:
            # pad to a lane-tile multiple; the padded adds are garbage
            # lanes that are sliced away (complete adds cannot fault)
            mp = -(-m // 128) * 128
            if mp != m:
                a = jnp.pad(a, ((0, 0), (0, mp - m)))
                b = jnp.pad(b, ((0, 0), (0, mp - m)))
            call = pairs_add_call(L.FQ.modulus, curve, mp, interpret)
            out = call(a.reshape(C, mp // 128, 128),
                       b.reshape(C, mp // 128, 128))
            return out.reshape(C, mp)[:, :m]
        from .pallas_curve import _coords, _flat, kernel_pack

        P = _coords(_unpack2(a), curve, 3 if curve == "g1" else 6)
        Q = _coords(_unpack2(b), curve, 3 if curve == "g1" else 6)
        return kernel_pack(_flat(proj_add_xla(P, Q, curve), curve))

    dense = flat[:, dense_idx]  # (C, K, W*256)
    merged = dense[:, 0]
    for k in range(1, K):
        merged = padd(merged, dense[:, k])

    sub = merged[:, subset_idx]  # (C, c * W * 2^(c-1))
    h = SCAN_BUCKETS // 2
    x = sub.reshape(C, SCAN_BITS * SCAN_WINDOWS, h)
    while h > 1:
        h //= 2
        a = x[:, :, :h].reshape(C, -1)
        b = x[:, :, h:2 * h].reshape(C, -1)
        x = padd(a, b).reshape(C, SCAN_BITS * SCAN_WINDOWS, h)
    finals = x[:, :, 0]  # (C, c * W) packed

    lo = finals & 0xFFFF
    hi = finals >> 16
    return jnp.stack([lo, hi], axis=1).reshape(2 * C, -1)


# ---------------------------------------------------------------------------
# public API (mirrors msm_fast: begin/end for pipelining)
# ---------------------------------------------------------------------------


def prepare_g1(points):
    """Device-resident packed pool. Identity (None) points are stored as
    the GENERATOR and corrected at msm_end (one host scalar-mul), so the
    digit stream -- and with it the whole host schedule -- is independent
    of the pool's infinity pattern. That is what lets the Groth16
    a/b1/l query MSMs share ONE schedule build + upload per prove even
    though their queries have different infinity masks (VERDICT r04 ask
    #2: the schedule phase was the largest warm-prove term)."""
    from ..curves import g1 as G1

    gen = G1.generator()
    pts = [gen if p is None else p for p in points]
    coords, _ = g1_points_to_device(pts)
    inf = np.array([p is None for p in points], dtype=bool)
    return (_pack_pool(coords, "g1"), inf, "g1")


def prepare_g2(points):
    from ..curves import g2 as G2

    gen = G2.generator()
    pts = [gen if p is None else p for p in points]
    coords, _ = g2_points_to_device(pts)
    inf = np.array([p is None for p in points], dtype=bool)
    return (_pack_pool(coords, "g2"), inf, "g2")


def _inf_correction(digits: np.ndarray, inf) -> int:
    """Combined scalar of the identity slots: sum_i z_i over inf positions
    (mod r), reconstructed from the window digits. The pool stores the
    generator there, so the scan result is off by exactly corr * G."""
    if inf is None or not inf.any():
        return 0
    sums = digits[:, inf].sum(axis=1, dtype=np.int64)
    corr = 0
    for w in range(digits.shape[0] - 1, -1, -1):
        corr = (corr << SCAN_BITS) + int(sums[w])
    return corr % _FR


def _apply_corr(res, curve: str, corr: int):
    if corr == 0:
        return res
    from ..curves import g1 as G1, g2 as G2

    C = G1 if curve == "g1" else G2
    return C.add(res, C.mul(C.generator(), _FR - corr))


# Max points per device dispatch. Two hard reasons: (1) the schedule's
# point ids are uint16, so a single scan covers at most 2^16 points;
# (2) the scan's emit buffer is C x W x n x 4 bytes of HBM (3.5 GB for a
# G1 MSM at the production chunk's 1.13M points) -- segmenting bounds it
# at ~200 MB per in-flight segment. Segments share one compiled kernel
# shape; partial results fold host-side (one point add per segment).
CHUNK_N = 1 << 16  # must stay 128-aligned: pool columns pack 128 points
MAX_INFLIGHT = 4  # segments allowed in the device queue at once


class _MultiMsm:
    """Handle for a segmented MSM: finals fold at msm_end."""

    def __init__(self):
        self.pending = []  # device handles, dispatch order
        self.done = []  # np finals


def msm_begin(prepared, scalars, curve: str, digits: np.ndarray = None,
              schedule: Schedule = None):
    """Dispatch the device program (async). Returns a handle for msm_end.

    `schedule` lets callers reuse one host schedule across MSMs that share
    a scalar vector (the Groth16 a/b1/b2 queries). MSMs beyond CHUNK_N
    points dispatch as point segments with a bounded device queue.

    Identity points in the pool carry their real digits into the stream
    (they are stored as the generator, see prepare_g1); the handle records
    the combined correction scalar for msm_end."""
    pool, inf, pcurve = prepared
    assert pcurve == curve
    lanes = LANES if curve == "g1" else LANES_G2
    corr = 0
    if schedule is None:
        if digits is None:
            digits = scalar_digits(scalars)
        corr = _inf_correction(digits, inf)
        n = digits.shape[1]
        if n > CHUNK_N:
            multi = _MultiMsm()
            for lo in range(0, n, CHUNK_N):
                hi = min(lo + CHUNK_N, n)
                seg_sched = build_schedule(digits[:, lo:hi], lanes=lanes)
                c0 = lo // 128
                c1 = c0 + (-(-(hi - lo) // 128))
                g = _dispatch_schedule(pool[:, c0:c1], seg_sched, curve)
                multi.pending.append(g)
                if len(multi.pending) >= MAX_INFLIGHT:
                    multi.done.append(np.asarray(multi.pending.pop(0)))
            return (multi, curve, corr)
        schedule = build_schedule(digits, lanes=lanes)
    s = schedule
    return (_dispatch_schedule(pool, s, curve), curve, corr)


def build_segment_schedules(digits: np.ndarray, lanes: int = LANES) -> list:
    """Host schedules for each CHUNK_N-point segment of one scalar vector.

    The returned list is SHAREABLE: msm_begin_scheds uploads each packed
    schedule once and caches the device buffer in the entry, so the
    Groth16 a/b1/l query MSMs (same scalars z) pay one schedule build and
    one upload instead of three -- the largest warm-chunk-prove term
    after the h pipeline (docs/PERFORMANCE.md round-4 table)."""
    n = digits.shape[1]
    segs = []
    for lo in range(0, max(n, 1), CHUNK_N):
        hi = min(lo + CHUNK_N, n)
        segs.append({
            "lo": lo, "hi": hi,
            "sched": build_schedule(digits[:, lo:hi], lanes=lanes),
            "dev": None,
        })
    return segs


def upload_segment_schedules(segs: list) -> None:
    """Start the (async) device upload of every segment schedule that is
    not on the device yet. Called from pipeline worker threads so the
    packed schedule buffers stream over the link while the main thread
    is busy dispatching other work; msm_begin_scheds then finds
    seg["dev"] populated and pays no upload on the critical path."""
    for seg in segs:
        if seg["dev"] is None:
            seg["dev"] = jnp.asarray(_pack_sched(seg["sched"]))


def msm_begin_scheds(prepared, segs: list, corr: int = 0):
    """msm_begin over prebuilt (shareable) segment schedules.

    `corr` is the identity-slot correction scalar for THIS pool
    (_inf_correction of the same digits the schedules were built from)."""
    pool, _inf, curve = prepared
    multi = _MultiMsm()
    for seg in segs:
        if seg["dev"] is None:
            seg["dev"] = jnp.asarray(_pack_sched(seg["sched"]))
        s = seg["sched"]
        c0 = seg["lo"] // 128
        c1 = c0 + (-(-(seg["hi"] - seg["lo"]) // 128))
        g = _device_msm(
            pool[:, c0:c1], seg["dev"], _subset_idx(), curve, s.R,
            s.perm.shape[1], s.K, s.flag_bits is not None, R2=s.R2,
            lanes2=s.lanes2, has_l2=s.pos2 is not None,
            dense16=_dense16(s))
        multi.pending.append(g)
        if len(multi.pending) >= MAX_INFLIGHT:
            multi.done.append(np.asarray(multi.pending.pop(0)))
    return (multi, curve, corr)


def _dispatch_schedule(pool, s: Schedule, curve: str):
    g = _device_msm(
        pool,
        jnp.asarray(_pack_sched(s)),
        _subset_idx(),
        curve,
        s.R,
        s.perm.shape[1],
        s.K,
        s.flag_bits is not None,
        R2=s.R2,
        lanes2=s.lanes2,
        has_l2=s.pos2 is not None,
        dense16=_dense16(s),
    )
    return g


@functools.partial(
    jax.jit,
    static_argnames=("curve", "R", "lanes", "K", "has_bits", "R2", "lanes2",
                     "has_l2"),
)
def _device_msm_unpacked(pool, perm, flag_bits, dense_idx, subset_idx, pos2,
                         curve, R, lanes, K, has_bits, R2=0, lanes2=0,
                         has_l2=False):
    """A/B variant of _device_msm taking the schedule planes as separate
    arrays (multiple uploads). Kept for profiling the relay's per-transfer
    cost (tools/profile_sched_pack.py); _dispatch_schedule uses the packed
    single-upload path."""
    npw = (R + 1) * lanes // 2
    nfb = (R + 1) * (lanes // 32) if has_bits else 0
    nd = K * SCAN_WINDOWS * SCAN_BUCKETS
    np2 = (R2 + 1) * lanes2 if has_l2 else 0
    parts = [jax.lax.bitcast_convert_type(
        perm.reshape(-1, 2), jnp.uint32).reshape(-1)]
    if has_bits:
        parts.append(flag_bits.reshape(-1))
    parts.append(jax.lax.bitcast_convert_type(dense_idx, jnp.uint32)
                 .reshape(-1))
    if has_l2:
        parts.append(jax.lax.bitcast_convert_type(pos2, jnp.uint32)
                     .reshape(-1))
    sched = jnp.concatenate(parts)
    del npw, nfb, nd, np2
    return _device_msm(pool, sched, subset_idx, curve, R, lanes, K,
                       has_bits, R2=R2, lanes2=lanes2, has_l2=has_l2)


def _dispatch_schedule_unpacked(pool, s: Schedule, curve: str):
    has_bits = s.flag_bits is not None
    has_l2 = s.pos2 is not None
    return _device_msm_unpacked(
        pool,
        jnp.asarray(s.perm),
        jnp.asarray(s.flag_bits) if has_bits
        else jnp.zeros((1, 1), jnp.uint32),
        jnp.asarray(s.dense_idx),
        _subset_idx(),
        jnp.asarray(s.pos2) if has_l2 else jnp.zeros((1, 1), jnp.int32),
        curve,
        s.R,
        s.perm.shape[1],
        s.K,
        has_bits,
        R2=s.R2,
        lanes2=s.lanes2,
        has_l2=has_l2,
    )


def _finish_multi(finals, curve):
    from ..curves import g1 as G1, g2 as G2

    add = G1.add if curve == "g1" else G2.add
    acc = None
    for f in finals:
        pt = _finish_host(f, curve, window_bits=SCAN_BITS,
                          n_windows=SCAN_WINDOWS)
        if pt is not None:
            acc = add(acc, pt)
    return acc


def msm_end(handle):
    g, curve, corr = handle if len(handle) == 3 else (*handle, 0)
    if isinstance(g, _MultiMsm):
        res = _finish_multi(g.done + [np.asarray(p) for p in g.pending],
                            curve)
    else:
        res = _finish_host(g, curve, window_bits=SCAN_BITS,
                           n_windows=SCAN_WINDOWS)
    return _apply_corr(res, curve, corr)


def msm_end_many(handles):
    """msm_end over several handles with the device->host copies of ALL
    result buffers issued asynchronously before any is awaited (one
    relay round trip each otherwise -- ~120 ms x 5 per Groth16 prove).
    jax.device_get issues copy_to_host_async on every leaf first."""
    import jax

    handles = [h if len(h) == 3 else (*h, 0) for h in handles]
    flat = []
    for g, _curve, _corr in handles:
        flat.extend(g.pending if isinstance(g, _MultiMsm) else [g])
    fetched = iter(jax.device_get(flat))
    out = []
    for g, curve, corr in handles:
        if isinstance(g, _MultiMsm):
            finals = g.done + [np.asarray(next(fetched))
                               for _ in g.pending]
            res = _finish_multi(finals, curve)
        else:
            res = _finish_host(np.asarray(next(fetched)), curve,
                               window_bits=SCAN_BITS,
                               n_windows=SCAN_WINDOWS)
        out.append(_apply_corr(res, curve, corr))
    return out


def msm_g1_prepared(prepared, scalars):
    return msm_end(msm_begin(prepared, scalars, "g1"))


def msm_g2_prepared(prepared, scalars):
    return msm_end(msm_begin(prepared, scalars, "g2"))


def msm_g1(points, scalars):
    if not points:
        return None
    return msm_g1_prepared(prepare_g1(points), scalars)


def msm_g2(points, scalars):
    if not points:
        return None
    return msm_g2_prepared(prepare_g2(points), scalars)
