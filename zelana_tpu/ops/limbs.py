"""Batched multi-limb modular arithmetic for TPU (JAX).

This is the foundation of the proving compute path: BN254 Fq/Fr elements as
16 x 16-bit limbs in uint32 lanes, **limbs-first** layout ``(16, *batch)`` so
that every limb row is a full vector register sweep and the batch dimension
rides the VPU lanes. Montgomery representation (R = 2^256) everywhere.

Why 16-bit limbs: the TPU VPU has no widening 32x32 multiply, but a uint32
multiply of two 16-bit values is exact. Column sums of the schoolbook product
stay below 2^23 << 2^32, so carries can be deferred across the whole
multiply + Montgomery reduction and propagated once at the end.

This replaces the arkworks `ark-ff` 64-bit-limb Montgomery arithmetic that
sits under the reference's entire proving stack (prover/Cargo.toml:20); the
semantics (values, Montgomery domain) are identical, only the limb split and
batch orientation are TPU-native.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

LIMB_BITS = 16
NLIMBS = 16
MASK = (1 << LIMB_BITS) - 1


def int_to_limbs_py(x: int) -> tuple:
    return tuple((x >> (LIMB_BITS * i)) & MASK for i in range(NLIMBS))


def limbs_to_int_py(limbs) -> int:
    return sum(int(l) << (LIMB_BITS * i) for i, l in enumerate(limbs))


@dataclass(frozen=True)
class FieldSpec:
    """Static per-field constants (hashable; safe as a jit static arg)."""

    modulus: int

    @functools.cached_property
    def p_limbs(self) -> np.ndarray:
        return np.array(int_to_limbs_py(self.modulus), dtype=np.uint32)

    @functools.cached_property
    def n0inv(self) -> int:
        # -p^{-1} mod 2^16
        p0 = self.modulus & MASK
        return (-pow(p0, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)

    @functools.cached_property
    def r_mod_p(self) -> int:
        return (1 << (LIMB_BITS * NLIMBS)) % self.modulus

    @functools.cached_property
    def r2_mod_p(self) -> int:
        return pow(1 << (LIMB_BITS * NLIMBS), 2, self.modulus)

    @functools.cached_property
    def r2_limbs(self) -> np.ndarray:
        return np.array(int_to_limbs_py(self.r2_mod_p), dtype=np.uint32)

    @functools.cached_property
    def one_mont(self) -> np.ndarray:
        return np.array(int_to_limbs_py(self.r_mod_p), dtype=np.uint32)

    def __hash__(self):
        return hash(self.modulus)


from ..fields.bn254 import P as _P, R as _R
from ..hashes.poseidon import BLS12_381_FR as _BLS_R

FQ = FieldSpec(_P)
FR = FieldSpec(_R)
BLS_FR = FieldSpec(_BLS_R)


# ---------------------------------------------------------------------------
# host <-> device conversion
# ---------------------------------------------------------------------------


def to_limbs(values, spec: FieldSpec | None = None) -> np.ndarray:
    """List/array of python ints -> uint32 (NLIMBS, N). Not Montgomery.

    Vectorized through a byte buffer: per-value work is one 32-byte LE
    serialization; the limb split is a numpy view (matters at MSM sizes,
    where a per-limb python loop costs more than the device compute).
    """
    buf = b"".join(int(v).to_bytes(32, "little") for v in values)
    n = len(buf) // 32
    arr = np.frombuffer(buf, dtype="<u2").reshape(n, NLIMBS)
    return np.ascontiguousarray(arr.T).astype(np.uint32)


def from_limbs(arr) -> list:
    """uint32 (NLIMBS, N) -> list of python ints.

    Vectorized through a byte buffer (mirror of to_limbs): one numpy
    transpose + per-value int.from_bytes, instead of NLIMBS * N python-int
    shift-adds."""
    arr = np.asarray(arr)
    flat = arr.reshape(NLIMBS, -1).T.astype("<u2")
    buf = flat.tobytes()
    return [
        int.from_bytes(buf[32 * j: 32 * (j + 1)], "little")
        for j in range(flat.shape[0])
    ]


def zeros(batch_shape, dtype=jnp.uint32):
    return jnp.zeros((NLIMBS, *batch_shape), dtype)


def broadcast_scalar(limbs_1d, batch_shape):
    """(16,) constant -> (16, *batch)."""
    limbs_1d = jnp.asarray(limbs_1d, jnp.uint32)
    return jnp.broadcast_to(limbs_1d.reshape((NLIMBS,) + (1,) * len(batch_shape)),
                            (NLIMBS, *batch_shape))


# ---------------------------------------------------------------------------
# carry / compare primitives
# ---------------------------------------------------------------------------


def _carry_sweep(limbs):
    """Propagate carries so each limb < 2^16. Input limbs may hold up to 32-bit
    sums; one sequential sweep suffices when values < 2^31."""

    def step(carry, row):
        v = row + carry
        return v >> LIMB_BITS, v & MASK

    carry, outs = jax.lax.scan(step, jnp.zeros_like(limbs[0]), limbs)
    return outs, carry


def _sub_limbs(a, b):
    """a - b with borrow chain; returns (diff_limbs, borrow_out in {0,1})."""

    def step(borrow, rows):
        ai, bi = rows
        v = ai.astype(jnp.int32) - bi.astype(jnp.int32) - borrow.astype(jnp.int32)
        return (v < 0).astype(jnp.uint32), (v & MASK).astype(jnp.uint32)

    borrow, outs = jax.lax.scan(step, jnp.zeros_like(a[0]), (a[:NLIMBS], b[:NLIMBS]))
    return outs, borrow


def _geq_p(a, spec: FieldSpec):
    _, borrow = _sub_limbs(a, broadcast_scalar(spec.p_limbs, a.shape[1:]))
    return borrow == 0


def cond_sub_p(a, spec: FieldSpec):
    diff, borrow = _sub_limbs(a, broadcast_scalar(spec.p_limbs, a.shape[1:]))
    return jnp.where(borrow == 0, diff, a)


# ---------------------------------------------------------------------------
# field ops (all inputs/outputs normalized limbs < 2^16, Montgomery domain
# for mul-family ops)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("spec",))
def add(a, b, spec: FieldSpec):
    s = a + b  # < 2^17
    s, _ = _carry_sweep(s)
    return cond_sub_p(s, spec)


@functools.partial(jax.jit, static_argnames=("spec",))
def sub(a, b, spec: FieldSpec):
    diff, borrow = _sub_limbs(a, b)
    p_bcast = broadcast_scalar(spec.p_limbs, a.shape[1:])
    corrected, _ = _carry_sweep(diff + p_bcast)
    return jnp.where(borrow == 1, corrected, diff)


@functools.partial(jax.jit, static_argnames=("spec",))
def neg(a, spec: FieldSpec):
    z = jnp.zeros_like(a)
    is_zero_mask = is_zero(a)
    p_minus_a, _ = _sub_limbs(broadcast_scalar(spec.p_limbs, a.shape[1:]), a)
    return jnp.where(is_zero_mask[None, ...], z, p_minus_a)


def is_zero(a):
    return jnp.all(a == 0, axis=0)


def eq(a, b):
    return jnp.all(a == b, axis=0)


def select(mask, a, b):
    """mask over batch dims; choose a where True."""
    return jnp.where(mask[None, ...], a, b)


def _skew_sum(mat):
    """(16, 16, *B) -> (31, *B): out[k] = sum_{i+j=k} mat[i, j].

    Diagonal alignment via the pad-flatten-reshape trick: padding each row to
    width 32 and re-slicing rows of width 31 shifts row i right by i, turning
    anti-diagonal sums into a plain axis-0 reduction. One fused XLA op chain
    instead of 256 scalar-slice adds.
    """
    h, w = NLIMBS, NLIMBS
    batch = mat.shape[2:]
    padded = jnp.concatenate([mat, jnp.zeros((h, h, *batch), mat.dtype)], axis=1)
    flat = padded.reshape((h * (w + h), *batch))
    skewed = flat[: h * (w + h - 1)].reshape((h, w + h - 1, *batch))
    return skewed.sum(axis=0)


@functools.partial(jax.jit, static_argnames=("spec",))
def mont_mul(a, b, spec: FieldSpec):
    """Montgomery product: a * b * R^{-1} mod p. a, b: (16, *B) normalized.

    Dispatch: on TPU with a large batch, the fused Pallas kernel
    (ops/pallas_field.py, f32 8-bit limb planes, measured ~2x the XLA u32
    path and ~50% of this device's f32 FMA ceiling); otherwise the XLA u32
    CIOS path. The pure-XLA f32 variant (_mont_mul_f32) is kept for
    reference -- it loses its arithmetic advantage to HBM spills (~9 Mmul/s
    vs 17 for u32, vs ~31 for the fused kernel).
    """
    batch = 1
    for d in a.shape[1:]:
        batch *= d
    if jax.default_backend() != "cpu" and batch >= 2048 and batch % 128 == 0:
        from .pallas_field import mont_mul_pallas

        flat_a = a.reshape(NLIMBS, batch)
        flat_b = b.reshape(NLIMBS, batch)
        out = mont_mul_pallas(flat_a, flat_b, spec)
        return out.reshape(a.shape)
    return _mont_mul_u32(a, b, spec)


@functools.partial(jax.jit, static_argnames=("spec",))
def _mont_mul_f32(a, b, spec: FieldSpec):
    batch = a.shape[1:]
    nd = len(batch)
    n8 = NLIMBS * 2  # 32 8-bit limbs

    def split8(x):
        lo = (x & 0xFF).astype(jnp.float32)
        hi = (x >> 8).astype(jnp.float32)
        # interleave: limb 2i = lo_i, 2i+1 = hi_i
        return jnp.stack([lo, hi], axis=1).reshape((n8, *batch))

    a8 = split8(a)
    b8 = split8(b)

    # schoolbook product in 8-bit columns via the diagonal-skew reshape:
    # (32, 32, *B) -> (63, *B); column sums < 2^21, exact in f32
    prod = a8[:, None, ...] * b8[None, :, ...]
    padded = jnp.concatenate(
        [prod, jnp.zeros((n8, n8, *batch), jnp.float32)], axis=1
    )
    flat = padded.reshape((n8 * 2 * n8, *batch))
    cols63 = flat[: n8 * (2 * n8 - 1)].reshape((n8, 2 * n8 - 1, *batch)).sum(axis=0)
    cols = jnp.concatenate(
        [cols63, jnp.zeros((3, *batch), jnp.float32)], axis=0
    )  # (66, *B): headroom for reduction carries

    # interleaved Montgomery reduction, one 8-bit limb at a time
    n0inv8 = jnp.float32((-pow(spec.modulus, -1, 256)) % 256)
    p8_np = np.zeros(n8, np.float32)
    for i in range(n8):
        p8_np[i] = (spec.modulus >> (8 * i)) & 0xFF
    p8 = jnp.asarray(p8_np).reshape((n8,) + (1,) * nd)

    def red_step(i, cols):
        ci = jax.lax.dynamic_index_in_dim(cols, i, axis=0, keepdims=False)
        ci_lo = ci - 256.0 * jnp.floor(ci / 256.0)
        m = ci_lo * n0inv8
        m = m - 256.0 * jnp.floor(m / 256.0)  # < 256
        win = jax.lax.dynamic_slice_in_dim(cols, i, n8, axis=0)
        cols = jax.lax.dynamic_update_slice_in_dim(
            cols, win + m[None] * p8, i, axis=0
        )
        # column i now divisible by 256; push its carry up
        low = jax.lax.dynamic_index_in_dim(cols, i, axis=0, keepdims=True)
        nxt = jax.lax.dynamic_slice_in_dim(cols, i + 1, 1, axis=0)
        cols = jax.lax.dynamic_update_slice_in_dim(
            cols, nxt + low / 256.0, i + 1, axis=0
        )
        return cols

    cols = jax.lax.fori_loop(0, n8, red_step, cols)

    # propagate carries over columns 32..64 (base 256), then pack to 16-bit
    def carry_step(carry, row):
        v = row + carry
        c = jnp.floor(v / 256.0)
        return c, v - 256.0 * c

    _, res8 = jax.lax.scan(carry_step, jnp.zeros(batch, jnp.float32),
                           jax.lax.dynamic_slice_in_dim(cols, n8, n8 + 1, axis=0))
    res8 = res8[:n8].astype(jnp.uint32)
    res = res8.reshape((NLIMBS, 2, *batch))
    res = res[:, 0] + (res[:, 1] << 8)
    return cond_sub_p(res, spec)


@functools.partial(jax.jit, static_argnames=("spec",))
def _mont_mul_u32(a, b, spec: FieldSpec):
    """Reference u32 16-bit-limb CIOS implementation (slower on TPU; kept
    for cross-checking the f32 path)."""
    batch = a.shape[1:]

    # schoolbook product with deferred carries: column sums < 2^21
    prod = a[:, None, ...] * b[None, :, ...]  # (16, 16, *B), exact in uint32
    lo_cols = _skew_sum(prod & MASK)  # (31, *B)
    hi_cols = _skew_sum(prod >> LIMB_BITS)
    zero_row = jnp.zeros((1, *batch), jnp.uint32)
    cols = jnp.concatenate([lo_cols, zero_row, zero_row], axis=0)
    cols = cols.at[1:32].add(hi_cols)  # (33, *B)

    # interleaved Montgomery reduction, one limb at a time (sequential in i,
    # vectorized over limbs and batch). A fori_loop keeps the traced graph
    # small; the loop is inherently sequential either way.
    n0inv = jnp.uint32(spec.n0inv)
    p_col = jnp.asarray(spec.p_limbs).reshape((NLIMBS,) + (1,) * len(batch))

    def red_step(i, cols):
        t_i = jax.lax.dynamic_index_in_dim(cols, i, axis=0, keepdims=False)
        m = (t_i * n0inv) & MASK
        mp = m[None, ...] * p_col  # (16, *B) < 2^32 exact
        lo_win = jax.lax.dynamic_slice_in_dim(cols, i, NLIMBS, axis=0)
        cols = jax.lax.dynamic_update_slice_in_dim(
            cols, lo_win + (mp & MASK), i, axis=0
        )
        hi_win = jax.lax.dynamic_slice_in_dim(cols, i + 1, NLIMBS, axis=0)
        cols = jax.lax.dynamic_update_slice_in_dim(
            cols, hi_win + (mp >> LIMB_BITS), i + 1, axis=0
        )
        # low limb now divisible by 2^16; push its carry upward
        low = jax.lax.dynamic_index_in_dim(cols, i, axis=0, keepdims=True)
        nxt = jax.lax.dynamic_slice_in_dim(cols, i + 1, 1, axis=0)
        cols = jax.lax.dynamic_update_slice_in_dim(
            cols, nxt + (low >> LIMB_BITS), i + 1, axis=0
        )
        return cols

    cols = jax.lax.fori_loop(0, NLIMBS, red_step, cols)

    res, top = _carry_sweep(cols[NLIMBS : 2 * NLIMBS])
    # t / R < 2p < 2^256, so the final carry can only make the value >= p,
    # never overflow 16 limbs; top is folded by the conditional subtract.
    del top
    return cond_sub_p(res, spec)


def mont_sqr(a, spec: FieldSpec):
    return mont_mul(a, a, spec)


@functools.partial(jax.jit, static_argnames=("spec",))
def to_mont(a, spec: FieldSpec):
    return mont_mul(a, broadcast_scalar(spec.r2_limbs, a.shape[1:]), spec)


@functools.partial(jax.jit, static_argnames=("spec",))
def from_mont(a, spec: FieldSpec):
    one = jnp.zeros_like(a).at[0].set(1)
    return mont_mul(a, one, spec)


@functools.partial(jax.jit, static_argnames=("exponent", "spec"))
def mont_pow(a, exponent: int, spec: FieldSpec):
    """a^exponent (Montgomery domain), static exponent.

    Short exponents (< 2^8, e.g. the s-box alpha) unroll inline; long ones
    (Fermat inversion) run as a lax.scan over the bit string so the traced
    graph stays one-squaring large instead of 254 squarings large.
    """
    bits = bin(exponent)[2:]
    if len(bits) <= 8:
        result = broadcast_scalar(spec.one_mont, a.shape[1:])
        for bit in bits:
            result = mont_mul(result, result, spec)
            if bit == "1":
                result = mont_mul(result, a, spec)
        return result

    bit_arr = jnp.asarray([int(b) for b in bits], dtype=jnp.uint32)
    init = broadcast_scalar(spec.one_mont, a.shape[1:])

    def body(result, bit):
        result = mont_mul(result, result, spec)
        with_mul = mont_mul(result, a, spec)
        result = jnp.where(bit == 1, with_mul, result)
        return result, None

    result, _ = jax.lax.scan(body, init, bit_arr)
    return result


@functools.partial(jax.jit, static_argnames=("spec",))
def mont_inv(a, spec: FieldSpec):
    """Batched inversion via Fermat: a^(p-2). inv(0) = 0 by convention."""
    return mont_pow(a, spec.modulus - 2, spec)


@functools.partial(jax.jit, static_argnames=("spec",))
def mont_batch_inv(a, spec: FieldSpec):
    """Montgomery's batch-inversion trick along the last batch axis.

    Cost: 3(N-1) muls + one Fermat inversion, vs N Fermat inversions.
    Zero elements pass through as zero.
    """
    zero_mask = is_zero(a)
    safe = select(zero_mask, broadcast_scalar(spec.one_mont, a.shape[1:]), a)

    # scan over the last axis: move it to the front as the scan dimension
    seq = jnp.moveaxis(safe, -1, 0)  # (n, 16, *rest)
    one = broadcast_scalar(spec.one_mont, seq.shape[2:])

    def fwd(acc, x):
        return mont_mul(acc, x, spec), acc  # emit exclusive prefix

    total, prefixes = jax.lax.scan(fwd, one, seq)
    total_inv = mont_inv(total, spec)

    def bwd(suffix, xs):
        x, prefix = xs
        out = mont_mul(suffix, prefix, spec)
        return mont_mul(suffix, x, spec), out

    _, outs = jax.lax.scan(bwd, total_inv, (seq, prefixes), reverse=True)
    out = jnp.moveaxis(outs, 0, -1)
    return select(zero_mask, jnp.zeros_like(out), out)


@functools.partial(jax.jit, static_argnames=("spec",))
def mont_batch_inv_logdepth(a, spec: FieldSpec):
    """Batch inversion along the last axis in log depth (TPU-friendly).

    inv(d_i) = prefix_excl(i) * suffix_excl(i) * total^{-1}, with both
    exclusive products from associative scans (O(N) work, O(log N) depth)
    and a single Fermat inversion of the total. Zeros pass through as zero.
    """
    zero_mask = is_zero(a)
    safe = select(zero_mask, broadcast_scalar(spec.one_mont, a.shape[1:]), a)

    def combine(x, y):
        return mont_mul(x, y, spec)

    axis = safe.ndim - 1
    prefix_incl = jax.lax.associative_scan(combine, safe, axis=axis)
    suffix_incl = jax.lax.associative_scan(combine, safe, axis=axis, reverse=True)
    one = broadcast_scalar(spec.one_mont, a.shape[1:-1] + (1,))
    prefix_excl = jnp.concatenate([one, prefix_incl[..., :-1]], axis=-1)
    suffix_excl = jnp.concatenate([suffix_incl[..., 1:], one], axis=-1)

    total = prefix_incl[..., -1]
    total_inv = mont_inv(total, spec)[..., None]
    out = mont_mul(
        mont_mul(prefix_excl, suffix_excl, spec),
        jnp.broadcast_to(total_inv, a.shape),
        spec,
    )
    return select(zero_mask, jnp.zeros_like(out), out)


@functools.partial(jax.jit, static_argnames=("spec",))
def mont_batch_inv_nested(a, spec: FieldSpec):
    """Batch inversion along the last axis via nested serial chains.

    Montgomery's trick over chains of 16 along the last axis, with the
    chain totals inverted recursively (one more chain level per factor of
    16) down to a small log-depth base case. Work is O(N) -- vs the
    O(N log N) of the associative-scan variant -- and every multiply in
    the forward/backward scans runs at batch N/16, large enough to stay
    on the fused Pallas multiplier path for MSM-sized rounds. Zeros pass
    through as zero.
    """
    n = a.shape[-1]
    chain = 16
    if (
        a.ndim == 2
        and n % 1024 == 0
        and jax.default_backend() != "cpu"
    ):
        from .pallas_field import batch_inv_pallas

        zero_mask = is_zero(a)
        safe = select(zero_mask, broadcast_scalar(spec.one_mont, a.shape[1:]), a)
        out = batch_inv_pallas(safe, spec)
        return select(zero_mask, jnp.zeros_like(out), out)
    if n % chain != 0 or n <= 4096:
        return mont_batch_inv_logdepth(a, spec)
    zero_mask = is_zero(a)
    safe = select(zero_mask, broadcast_scalar(spec.one_mont, a.shape[1:]), a)

    a4 = safe.reshape(safe.shape[:-1] + (n // chain, chain))
    seq = jnp.moveaxis(a4, -1, 0)  # (chain, NLIMBS, *batch, n//chain)
    one = broadcast_scalar(spec.one_mont, seq.shape[2:])

    def fwd(acc, x):
        return mont_mul(acc, x, spec), acc  # emit exclusive prefix

    total, prefixes = jax.lax.scan(fwd, one, seq)
    total_inv = mont_batch_inv_nested(total, spec)

    def bwd(suffix, xs):
        x, prefix = xs
        out = mont_mul(suffix, prefix, spec)
        return mont_mul(suffix, x, spec), out

    _, outs = jax.lax.scan(bwd, total_inv, (seq, prefixes), reverse=True)
    out = jnp.moveaxis(outs, 0, -1).reshape(a.shape)
    return select(zero_mask, jnp.zeros_like(out), out)


# ---------------------------------------------------------------------------
# host-side helpers for tests / witness prep
# ---------------------------------------------------------------------------


def encode_mont(values, spec: FieldSpec) -> np.ndarray:
    """ints -> Montgomery limb array (host side, exact).

    Uses the native batch encoder when the chunk library is built (the
    per-value python `(v * R) % p` costs minutes over a production key's
    5.7M point coordinates); pure-python fallback otherwise."""
    out = _encode_mont_native(values, spec)
    if out is not None:
        return out
    R_ = 1 << (LIMB_BITS * NLIMBS)
    return to_limbs([(int(v) * R_) % spec.modulus for v in values], spec)


def _encode_mont_native(values, spec: FieldSpec):
    if len(values) < 1024:  # ctypes/setup overhead beats the win
        return None
    try:
        from ..r1cs import native_synth as NS

        lib = NS.load()
    except Exception:
        return None
    if lib is None:
        return None
    try:
        buf = b"".join(int(v).to_bytes(32, "little") for v in values)
    except (OverflowError, ValueError):  # negative / >= 2^256: python path
        return None
    vals = np.frombuffer(buf, dtype="<u8").reshape(len(values), 4)
    mod = np.frombuffer(
        int(spec.modulus).to_bytes(32, "little"), dtype="<u8").copy()
    r2 = np.frombuffer(
        int(spec.r2_mod_p).to_bytes(32, "little"), dtype="<u8").copy()
    inv64 = (-pow(spec.modulus, -1, 1 << 64)) % (1 << 64)
    out = np.empty((len(values), 4), np.uint64)
    lib.zelana_mont_encode_any(
        vals.ctypes.data, len(values), mod.ctypes.data, r2.ctypes.data,
        ctypes_u64(inv64), out.ctypes.data)
    # (n, 4) u64 -> (16, n) u32 16-bit limb planes
    return np.ascontiguousarray(
        out.view("<u2").reshape(len(values), NLIMBS).T).astype(np.uint32)


def ctypes_u64(x: int):
    import ctypes

    return ctypes.c_uint64(x)


def decode_mont(arr, spec: FieldSpec) -> list:
    R_ = 1 << (LIMB_BITS * NLIMBS)
    rinv = pow(R_, -1, spec.modulus)
    return [(v * rinv) % spec.modulus for v in from_limbs(arr)]
