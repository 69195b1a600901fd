"""Batched fixed-base scalar multiplication on TPU — the keygen engine.

Groth16 setup computes every proving-key query as `scalar * G` for ONE base
per group (reference keygen.rs:84-94 does this with arkworks' host
`FixedBase` tables; minutes for thousands of points, days for the ~1.6M
variables of the 8/4/4 batch circuit). Here the per-scalar work runs on the
TPU as a balanced tree of complete projective additions:

  1. Host precomputes the classic windowed table once per base:
     table[w][d] = d * 2^(8w) * G for w < 32, 1 <= d < 256 (8,160 points,
     ~8k host point ops), uploaded as the leaf section of a slot pool.
  2. Scalars upload as PACKED standard-form limbs (8 x uint32 rows = the
     raw 32 bytes/scalar — the relay link is the bottleneck, see
     docs/DEVNOTES.md). Digits, table-slot ids, and ALL schedule indices
     derive on device; unlike the bucket MSM there is no tape to ship,
     because the reduction tree is shape-uniform: point i's 32 window
     slots sit adjacently, and round r pairs lanes 2j/2j+1 of round r-1's
     contiguous output block (a reshape, not a gather — only round 1
     gathers, from device-computed indices).
  3. Every addition uses the complete projective kernel
     (pallas_curve.step_call), so zero digits flow through as the identity
     slot with no case analysis; z_i = 0 yields the point at infinity,
     matching arkworks' infinity entries for zero QAP evaluations.

Results return as projective points; the host converts to affine with one
batched inversion.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.bn254 import P as FQ_MOD
from ..fields import tower as tw
from . import limbs as L
from .msm import g1_points_to_device, g2_points_to_device
from .msm_fast import ALIGN, _round_up, _use_fused
from .pallas_curve import pack_rows_py, proj_add_xla, step_call

WINDOW_BITS = 8
N_WINDOWS = 32
ROW = (1 << WINDOW_BITS) - 1  # 255 non-zero digits per window
N_TABLE = N_WINDOWS * ROW  # 8160 leaf points


# ---------------------------------------------------------------------------
# host: table construction (once per base point)
# ---------------------------------------------------------------------------


def build_table(base, curve):
    """[w * 255 + (d-1)] = d * 2^(8w) * base, slot-major order."""
    pts = []
    step = base
    for _ in range(N_WINDOWS):
        acc = None
        for _ in range(ROW):
            acc = curve.add(acc, step)
            pts.append(acc)
        for _ in range(WINDOW_BITS):
            step = curve.add(step, step)
    return pts


def prepare_table_g1(base):
    """Device-resident table for a G1 base; reuse across all of that base's
    query arrays (a/b1/h/l share g1_gen in keygen)."""
    from ..curves import g1 as G1

    coords, _ = g1_points_to_device(build_table(base, G1))
    return ("g1", coords)


def prepare_table_g2(base):
    from ..curves import g2 as G2

    coords, _ = g2_points_to_device(build_table(base, G2))
    return ("g2", coords)


# ---------------------------------------------------------------------------
# device: 5-round pairwise tree over the window slots
# ---------------------------------------------------------------------------


def _slot_plan(n: int):
    """Static write offsets: round r (1-based) writes S_r = n*32/2^r lanes."""
    a0 = _round_up(N_TABLE + 1, ALIGN)
    bases, sizes = [], []
    off = a0
    size = n * N_WINDOWS // 2
    for _ in range(5):
        bases.append(off)
        sizes.append(size)
        off += size
        size //= 2
    total = 1 << (off - 1).bit_length()
    return bases, sizes, total


@functools.partial(jax.jit, static_argnames=("curve", "n", "total_alloc"))
def _run_fb(X, Y, packed_scalars, curve, n, total_alloc):
    """packed_scalars: (8, n) uint32, standard-form 16-bit limb pairs.
    Returns (2C, n) 16-bit limb rows of projective results (X : Y : Z)."""
    bases, sizes, _ = _slot_plan(n)

    # unpack scalars -> 32 8-bit digit rows (w-major), then table slot ids
    digs = []
    for k in range(8):
        row = packed_scalars[k]
        lo = row & 0xFFFF
        hi = row >> 16
        digs.extend([lo & 0xFF, lo >> 8, hi & 0xFF, hi >> 8])
    D = jnp.stack(digs)  # (32, n) uint32
    w_idx = jnp.arange(N_WINDOWS, dtype=jnp.uint32)[:, None]
    slots = jnp.where(D == 0, 0, 1 + w_idx * ROW + D - 1).astype(jnp.int32)
    # pairing layout: point i's windows adjacent; i-major flatten
    idx_a = slots[0::2].T.reshape(-1)  # (16n,)
    idx_b = slots[1::2].T.reshape(-1)

    leaves = ([X, Y] if curve == "g1" else [X[0], X[1], Y[0], Y[1]])
    ny = len(leaves)
    fused = _use_fused()
    interpret = jax.default_backend() == "cpu"

    if fused:
        C = 24 if curve == "g1" else 48
        one_packed = np.array(
            pack_rows_py(L.FQ.one_mont), dtype=np.uint32
        ).reshape(8, 1)

        def pack(leaf):
            pairs = leaf.reshape(8, 2, leaf.shape[1])
            return pairs[:, 0] + (pairs[:, 1] << 16)

        pool = jnp.zeros((C, total_alloc), jnp.uint32)
        for r, leaf in enumerate(leaves):
            pool = jax.lax.dynamic_update_slice(pool, pack(leaf), (r * 8, 1))
        one_col = jnp.asarray(one_packed)
        z_rows = jnp.broadcast_to(one_col, (8, N_TABLE))
        pool = jax.lax.dynamic_update_slice(pool, z_rows, (ny * 8, 1))
        pool = jax.lax.dynamic_update_slice(pool, one_col, (ny * 4, 0))
        pool = pool.reshape(C, total_alloc // 128, 128)

        for r in range(5):
            S = sizes[r]
            st = np.array([bases[r]], dtype=np.int32)
            if r == 0:
                A = pool[:, idx_a // 128, idx_a % 128]
                B = pool[:, idx_b // 128, idx_b % 128]
            else:
                prev = jax.lax.slice(
                    pool,
                    (0, bases[r - 1] // 128, 0),
                    (C, (bases[r - 1] + sizes[r - 1]) // 128, 128),
                )
                pair = prev.reshape(C, S, 2)
                A, B = pair[:, :, 0], pair[:, :, 1]
            call = step_call(L.FQ.modulus, curve, S, total_alloc, interpret)
            pool = call(
                jnp.asarray(st),
                A.reshape(C, S // 128, 128),
                B.reshape(C, S // 128, 128),
                pool,
            )
        out_b = bases[4]
        packed = pool.reshape(C, total_alloc)[:, out_b: out_b + n]
        lo = packed & 0xFFFF
        hi = packed >> 16
        return jnp.stack([lo, hi], axis=1).reshape(2 * C, -1)

    # XLA fallback (CPU tests): unpacked 16-limb pool
    C = 48 if curve == "g1" else 96
    one_col = jnp.asarray(
        np.asarray(L.FQ.one_mont, dtype=np.uint32).reshape(L.NLIMBS, 1)
    )
    pool = jnp.zeros((C, total_alloc), jnp.uint32)
    for r, leaf in enumerate(leaves):
        pool = jax.lax.dynamic_update_slice(pool, leaf, (r * 16, 1))
    z_rows = jnp.broadcast_to(one_col, (L.NLIMBS, N_TABLE))
    pool = jax.lax.dynamic_update_slice(pool, z_rows, (ny * 16, 1))
    pool = jax.lax.dynamic_update_slice(pool, one_col, (ny * 8, 0))

    def split(a):
        if curve == "g1":
            return (a[0:16], a[16:32], a[32:48])
        return ((a[0:16], a[16:32]), (a[32:48], a[48:64]),
                (a[64:80], a[80:96]))

    for r in range(5):
        S = sizes[r]
        if r == 0:
            A = jnp.take(pool, idx_a, axis=1)
            B = jnp.take(pool, idx_b, axis=1)
        else:
            prev = jax.lax.slice(
                pool, (0, bases[r - 1]), (C, bases[r - 1] + sizes[r - 1])
            )
            pair = prev.reshape(C, S, 2)
            A, B = pair[:, :, 0], pair[:, :, 1]
        V = proj_add_xla(split(A), split(B), curve)
        flat = jnp.concatenate(
            [V[0], V[1], V[2]] if curve == "g1"
            else [V[0][0], V[0][1], V[1][0], V[1][1], V[2][0], V[2][1]],
            axis=0,
        )
        pool = jax.lax.dynamic_update_slice(pool, flat, (0, bases[r]))
    out_b = bases[4]
    return pool[:, out_b: out_b + n]


# ---------------------------------------------------------------------------
# host tail: projective -> affine with one batched inversion
# ---------------------------------------------------------------------------


def _finish_fb_native_g1(g: np.ndarray):
    """Native batch projective->affine for G1 (csrc
    zelana_proj_affine_any): Montgomery decode + ONE-inversion batch
    affine in C. The Python tail below is per-element bigints -- minutes
    over the ~5.7M G1 points of a production chunk keygen."""
    try:
        from ..r1cs.native_synth import load

        lib = load()
    except Exception:
        return None
    if lib is None or not hasattr(lib, "zelana_proj_affine_any"):
        return None
    n = g.shape[1]

    def to_u64(rows):  # (16, n) u32 16-bit planes -> (n, 4) u64 LE
        return np.ascontiguousarray(
            rows.T.astype(np.uint16)).view("<u8").reshape(n, 4)

    xs, ys, zs = to_u64(g[0:16]), to_u64(g[16:32]), to_u64(g[32:48])
    mod = np.frombuffer(int(FQ_MOD).to_bytes(32, "little"), "<u8").copy()
    r2 = np.frombuffer(
        int(L.FQ.r2_mod_p).to_bytes(32, "little"), "<u8").copy()
    inv64 = (-pow(FQ_MOD, -1, 1 << 64)) % (1 << 64)
    out = np.empty((n, 8), np.uint64)
    inf = np.empty(n, np.uint8)
    lib.zelana_proj_affine_any(
        xs.ctypes.data, ys.ctypes.data, zs.ctypes.data, n,
        mod.ctypes.data, r2.ctypes.data, L.ctypes_u64(inv64),
        out.ctypes.data, inf.ctypes.data)
    buf = out.tobytes()
    pts = []
    for i in range(n):
        if inf[i]:
            pts.append(None)
            continue
        off = 64 * i
        pts.append((int.from_bytes(buf[off:off + 32], "little"),
                    int.from_bytes(buf[off + 32:off + 64], "little")))
    return pts


def _finish_fb_native_g2(g: np.ndarray):
    """Native batch projective->affine for G2 (zelana_proj_affine_fq2):
    Fq2 inversion via one batched Fq norm inversion in C."""
    try:
        from ..r1cs.native_synth import load

        lib = load()
    except Exception:
        return None
    if lib is None or not hasattr(lib, "zelana_proj_affine_fq2"):
        return None
    n = g.shape[1]

    def to_u64_pair(rows0, rows1):  # two (16, n) planes -> (n, 8) u64
        c0 = np.ascontiguousarray(
            rows0.T.astype(np.uint16)).view("<u8").reshape(n, 4)
        c1 = np.ascontiguousarray(
            rows1.T.astype(np.uint16)).view("<u8").reshape(n, 4)
        return np.ascontiguousarray(np.concatenate([c0, c1], axis=1))

    xs = to_u64_pair(g[0:16], g[16:32])
    ys = to_u64_pair(g[32:48], g[48:64])
    zs = to_u64_pair(g[64:80], g[80:96])
    mod = np.frombuffer(int(FQ_MOD).to_bytes(32, "little"), "<u8").copy()
    r2 = np.frombuffer(
        int(L.FQ.r2_mod_p).to_bytes(32, "little"), "<u8").copy()
    inv64 = (-pow(FQ_MOD, -1, 1 << 64)) % (1 << 64)
    out = np.empty((n, 16), np.uint64)
    inf = np.empty(n, np.uint8)
    lib.zelana_proj_affine_fq2(
        xs.ctypes.data, ys.ctypes.data, zs.ctypes.data, n,
        mod.ctypes.data, r2.ctypes.data, L.ctypes_u64(inv64),
        out.ctypes.data, inf.ctypes.data)
    buf = out.tobytes()
    pts = []
    for i in range(n):
        if inf[i]:
            pts.append(None)
            continue
        off = 128 * i
        vs = [int.from_bytes(buf[off + 32 * j:off + 32 * (j + 1)],
                             "little") for j in range(4)]
        pts.append(((vs[0], vs[1]), (vs[2], vs[3])))
    return pts


def _finish_fb(g, curve: str):
    """(2C, n) limb rows -> list of affine points (None for infinity)."""
    fq2 = curve == "g2"
    g = np.asarray(g)
    if not fq2:
        native = _finish_fb_native_g1(g)
        if native is not None:
            return native
    else:
        native = _finish_fb_native_g2(g)
        if native is not None:
            return native

    def dec(rows):
        return L.decode_mont(rows, L.FQ)

    if not fq2:
        xs, ys, zs = dec(g[0:16]), dec(g[16:32]), dec(g[32:48])
        mul = lambda a, b: a * b % FQ_MOD
        inv = lambda a: pow(a, FQ_MOD - 2, FQ_MOD)
        zero, one = 0, 1
    else:
        xs = list(zip(dec(g[0:16]), dec(g[16:32])))
        ys = list(zip(dec(g[32:48]), dec(g[48:64])))
        zs = list(zip(dec(g[64:80]), dec(g[80:96])))
        mul, inv = tw.fq2_mul, tw.fq2_inv
        zero, one = (0, 0), (1, 0)

    # batched inversion over the non-zero Zs
    n = len(zs)
    prefix = [one] * (n + 1)
    for i in range(n):
        v = zs[i] if zs[i] != zero else one
        prefix[i + 1] = mul(prefix[i], v)
    acc = inv(prefix[n])
    zinv = [zero] * n
    for i in range(n - 1, -1, -1):
        v = zs[i] if zs[i] != zero else one
        zinv[i] = mul(acc, prefix[i])
        acc = mul(acc, v)

    out = []
    for i in range(n):
        if zs[i] == zero:
            out.append(None)
        else:
            out.append((mul(xs[i], zinv[i]), mul(ys[i], zinv[i])))
    return out


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

FB_CHUNK = 1 << 15  # scalars per device dispatch (pool ~100 MB for G1)


def _chunk_size(n: int) -> int:
    c = ALIGN
    while c < FB_CHUNK and c < n:
        c *= 2
    return c


def fixed_base_msm(table, scalars):
    """scalar_i * base for each i. `table` from prepare_table_g1/g2;
    scalars are python ints (standard form) or an (n, 4) u64 LE limb
    array (the native keygen format -- no per-element conversion).
    Returns affine points with None for the zero scalar. Chunks are
    dispatched back to back, so chunk k+1's host prep overlaps chunk k's
    device execution."""
    curve, coords = table
    X, Y = coords
    is_arr = isinstance(scalars, np.ndarray)
    n = len(scalars)
    if n == 0:
        return []
    chunk = _chunk_size(n)
    handles = []
    for lo in range(0, n, chunk):
        part = scalars[lo: lo + chunk]
        pad = chunk - len(part)
        if is_arr:
            rows = np.ascontiguousarray(part, dtype=np.uint64)
            if pad:
                rows = np.concatenate(
                    [rows, np.zeros((pad, 4), np.uint64)])
            # (chunk, 4) u64 -> (16, chunk) u32 16-bit planes
            limbs = np.ascontiguousarray(
                rows.view("<u2").reshape(chunk, 16).T).astype(np.uint32)
        else:
            limbs = L.to_limbs(list(part) + [0] * pad)
        packed = (limbs[0::2] + (limbs[1::2] << 16)).astype(np.uint32)
        _, _, total = _slot_plan(chunk)
        handles.append(
            (_run_fb(X, Y, jnp.asarray(packed), curve, chunk, total),
             len(part))
        )
    out = []
    for g, keep in handles:
        out.extend(_finish_fb(g, curve)[:keep])
    return out
