"""Fused Pallas kernels for BN254 field arithmetic (the speed-of-light path).

Why Pallas here: a Montgomery multiply in 8-bit f32 limb planes is ~2.5k
native VPU FMAs per element, but expressed as XLA ops the 64-column working
state spills to HBM between fusions (measured ~9 Mmul/s). Inside one Pallas
kernel the whole schoolbook product + base-256 interleaved reduction stays in
VMEM.

Kernel layout: limbs ride the leading (sublane-tiled) axis, the batch rides
(subbatch, 128-lane) tiles -- every statement is a full-width VPU op over a
(32|64, SUB, 128) array, so the traced kernel is ~400 large vector ops
rather than thousands of 1-D ones. f32 exactness: 8-bit limb products are
<= 255^2 and column sums stay below 2^23 < 2^24.

Layout contract matches ops/limbs.py: (16, B) uint32 16-bit limbs,
Montgomery domain, batch along lanes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import limbs as L

N8 = 32  # 8-bit limbs
TILE = 2048  # batch elements per grid step
SUB = TILE // 128  # subbatch rows of 128 lanes


def _sos_mul_fn(spec_mod: int):
    """Width-generic register column-SOS Montgomery multiply.

    Returns mul(a, b) mapping (16, S, 128) u32 -> (16, S, 128) u32 canonical
    for any sublane width S. Every output column is accumulated in registers
    and written once; a windowed read-modify-write state measured VMEM-bound.
    Column sums stay < 2^23: exact in f32."""
    n0inv8 = float((-pow(spec_mod, -1, 256)) % 256)
    p16 = [(spec_mod >> (16 * i)) & 0xFFFF for i in range(L.NLIMBS)]
    p8f = [float((spec_mod >> (8 * j)) & 0xFF) for j in range(N8)]
    inv256 = 1.0 / 256.0

    def mul(a, b):
        sub = a.shape[1]

        def split8(x):
            # (16, S, 128) u32 -> (32, S, 128) f32 of 8-bit limbs,
            # interleaved [lo0, hi0, lo1, hi1, ...] via leading-dim stack
            lo = (x & 0xFF).astype(jnp.int32).astype(jnp.float32)
            hi = (x >> 8).astype(jnp.int32).astype(jnp.float32)
            return jnp.stack([lo, hi], axis=1).reshape(N8, sub, 128)

        a8 = split8(a)
        b8 = split8(b)

        # low product columns c_0..c_31 (only needed for the m-chain)
        low = []
        for k in range(N8):
            acc = a8[0] * b8[k]
            for i in range(1, k + 1):
                acc = acc + a8[i] * b8[k - i]
            low.append(acc)

        # m-chain: m_i = (c_i + sum_{j<i} m_j p_{i-j}) * n0inv8 mod 256,
        # with the running carry of the zeroed-out low columns folded in
        m = []
        carry = jnp.zeros((sub, 128), jnp.float32)
        for i in range(N8):
            t = low[i] + carry
            for j in range(i):
                if p8f[i - j] != 0.0:
                    t = t + m[j] * p8f[i - j]
            t_lo = t - 256.0 * jnp.floor(t * inv256)
            mi = t_lo * n0inv8
            mi = mi - 256.0 * jnp.floor(mi * inv256)  # < 256
            if p8f[0] != 0.0:
                t = t + mi * p8f[0]
            # column i is now divisible by 256; its carry feeds column i+1
            carry = t * inv256
            m.append(mi)

        # high columns k = 32..63: product part + reduction part, then the
        # base-256 carry propagation in the same sweep
        res8 = []
        for k in range(N8, 2 * N8):
            acc = carry
            for i in range(k - N8 + 1, N8):
                acc = acc + a8[i] * b8[k - i]
            for j in range(k - N8 + 1, N8):
                if p8f[k - j] != 0.0:
                    acc = acc + m[j] * p8f[k - j]
            carry = jnp.floor(acc * inv256)
            res8.append(acc - 256.0 * carry)
        res8.append(carry)  # top (must be < 256; t/R < 2p)

        # pack to 16-bit uint32 limbs: limb i = res8[2i] + res8[2i+1] << 8
        limbs = []
        for i in range(L.NLIMBS):
            lo = res8[2 * i].astype(jnp.int32).astype(jnp.uint32)
            hi = res8[2 * i + 1].astype(jnp.int32).astype(jnp.uint32)
            limbs.append(lo + (hi << 8))

        # conditional subtract p (borrow chain, integer ops)
        borrow = jnp.zeros((sub, 128), jnp.int32)
        diff = []
        for i in range(L.NLIMBS):
            v = limbs[i].astype(jnp.int32) - jnp.int32(p16[i]) - borrow
            diff.append((v & 0xFFFF).astype(jnp.uint32))
            borrow = (v < 0).astype(jnp.int32)
        ge_p = borrow == 0
        out = [jnp.where(ge_p, diff[i], limbs[i]) for i in range(L.NLIMBS)]
        return jnp.stack(out)

    return mul


def _mont_mul_kernel_body(spec_mod: int):
    mul = _sos_mul_fn(spec_mod)

    def kernel(a_ref, b_ref, o_ref):
        o_ref[...] = mul(a_ref[...], b_ref[...])

    return kernel


@functools.lru_cache(maxsize=None)
def _mont_mul_call(modulus: int, n: int, interpret: bool):
    kernel = _mont_mul_kernel_body(modulus)
    grid = n // TILE

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L.NLIMBS, n // 128, 128), jnp.uint32),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((L.NLIMBS, SUB, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L.NLIMBS, SUB, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L.NLIMBS, SUB, 128), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )


# ---------------------------------------------------------------------------
# fused batch inversion: Montgomery's trick with 16-long serial chains along
# the sublane axis, fwd/bwd each ONE kernel. The alternative -- 48 separate
# mont_mul dispatches per inversion -- pays ~0.5 ms of per-call overhead each
# on this device, which made inversion the MSM's dominant cost.
# ---------------------------------------------------------------------------

INV_T = 16  # chain length: tile = (limbs, 128, 128); chain element i of
# the 1024 chains in a tile lives at sublane rows [8i, 8i+8) -- every chain
# step is a full-(8,128)-vreg multiply (a (1,128) step wastes 7/8 sublanes)
INV_ROWS = INV_T * 8  # sublane rows per tile
INV_TILE = INV_ROWS * 128  # batch elements per tile


def _inv_fwd_kernel_body(spec_mod: int, one_mont, chain: int):
    mul = _sos_mul_fn(spec_mod)
    one_vals = tuple(int(v) for v in one_mont)

    def kernel(d_ref, pref_ref, tot_ref):
        one = jnp.stack(
            [jnp.full((8, 128), v, jnp.uint32) for v in one_vals]
        )

        def body(i, acc):
            pref_ref[:, pl.ds(8 * i, 8), :] = acc  # exclusive prefix
            return mul(acc, d_ref[:, pl.ds(8 * i, 8), :])

        tot_ref[...] = jax.lax.fori_loop(0, chain, body, one)

    return kernel


def _inv_bwd_kernel_body(spec_mod: int, chain: int):
    mul = _sos_mul_fn(spec_mod)

    def kernel(d_ref, pref_ref, tinv_ref, out_ref):
        def body(k, suffix):
            i = chain - 1 - k
            out_ref[:, pl.ds(8 * i, 8), :] = mul(
                suffix, pref_ref[:, pl.ds(8 * i, 8), :]
            )
            return mul(suffix, d_ref[:, pl.ds(8 * i, 8), :])

        jax.lax.fori_loop(0, chain, body, tinv_ref[...])

    return kernel


def _fermat_kernel_body(spec_mod: int):
    """a^(p-2) for one (16, 8, 128) block: in-kernel square-and-multiply.

    This is the recursion BASE of the fused batch inversion. The XLA
    alternative (mont_pow scan over 254 bits of tiny muls) is pure
    sequential dispatch latency (~20 ms) and was the hidden floor under
    every MSM round's inversion."""
    mul = _sos_mul_fn(spec_mod)
    bits = bin(spec_mod - 2)[2:]
    nbits = len(bits)

    def kernel(bits_ref, a_ref, o_ref):
        a = a_ref[...]

        def body(i, acc):
            acc = mul(acc, acc)
            withm = mul(acc, a)
            return jnp.where(bits_ref[0, i] == 1, withm, acc)

        o_ref[...] = jax.lax.fori_loop(1, nbits, body, a)

    return kernel


@functools.lru_cache(maxsize=None)
def _fermat_call(modulus: int, interpret: bool):
    kernel = _fermat_kernel_body(modulus)
    bits = bin(modulus - 2)[2:]
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L.NLIMBS, 8, 128), jnp.uint32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    ), np.array([[int(b) for b in bits]], dtype=np.int32)


@functools.lru_cache(maxsize=None)
def _inv_fwd_call(modulus: int, n: int, interpret: bool):
    spec = L.FieldSpec(modulus)
    rows = min(INV_ROWS, n // 128)
    chain = rows // 8
    kernel = _inv_fwd_kernel_body(modulus, spec.one_mont, chain)
    tiles = n // (rows * 128)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((L.NLIMBS, n // 128, 128), jnp.uint32),
            jax.ShapeDtypeStruct((L.NLIMBS, tiles * 8, 128), jnp.uint32),
        ),
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((L.NLIMBS, rows, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((L.NLIMBS, rows, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L.NLIMBS, 8, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _inv_bwd_call(modulus: int, n: int, interpret: bool):
    rows = min(INV_ROWS, n // 128)
    chain = rows // 8
    kernel = _inv_bwd_kernel_body(modulus, chain)
    tiles = n // (rows * 128)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L.NLIMBS, n // 128, 128), jnp.uint32),
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((L.NLIMBS, rows, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L.NLIMBS, rows, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L.NLIMBS, 8, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L.NLIMBS, rows, 128), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )


@functools.partial(jax.jit, static_argnames=("spec", "interpret"))
def batch_inv_pallas(a, spec: L.FieldSpec, interpret: bool | None = None):
    """Batch inversion of (16, N) nonzero Montgomery values; N % 1024 == 0.

    Chain kernels (fwd: prefixes + totals, bwd: combine) recurse on the
    16x-smaller totals down to a single (16, 8, 128) block, which a Fermat
    kernel inverts in-kernel. Zero handling is the caller's job
    (limbs.mont_batch_inv_nested wraps this with the zero mask)."""
    n = a.shape[1]
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if n == 1024:
        call, bits = _fermat_call(spec.modulus, interpret)
        return call(jnp.asarray(bits), a.reshape(L.NLIMBS, 8, 128)).reshape(
            L.NLIMBS, n
        )
    rows = min(INV_ROWS, n // 128)
    tiles = n // (rows * 128)
    a3 = a.reshape(L.NLIMBS, n // 128, 128)
    prefix, totals8 = _inv_fwd_call(spec.modulus, n, interpret)(a3)
    tot = totals8.reshape(L.NLIMBS, tiles * 8 * 128)
    tot_inv = batch_inv_pallas(tot, spec, interpret)
    tinv8 = tot_inv.reshape(L.NLIMBS, tiles * 8, 128)
    out = _inv_bwd_call(spec.modulus, n, interpret)(a3, prefix, tinv8)
    return out.reshape(L.NLIMBS, n)


@functools.partial(jax.jit, static_argnames=("spec",))
def mont_mul_pallas(a, b, spec: L.FieldSpec):
    """Drop-in fused mont_mul for (16, N) batches; pads N to the tile size."""
    n = a.shape[1]
    padded = -(-n // TILE) * TILE
    if padded != n:
        pad = ((0, 0), (0, padded - n))
        a = jnp.pad(a, pad)
        b = jnp.pad(b, pad)
    interpret = jax.default_backend() == "cpu"
    a3 = a.reshape(L.NLIMBS, padded // 128, 128)
    b3 = b.reshape(L.NLIMBS, padded // 128, 128)
    out = _mont_mul_call(spec.modulus, padded, interpret)(a3, b3)
    return out.reshape(L.NLIMBS, padded)[:, :n]


# ---------------------------------------------------------------------------
# fused MiMC permutation: all 91 x^7 rounds with the state in VMEM
# ---------------------------------------------------------------------------
#
# The XLA lax.scan path (hashes/mimc_jax.py) spills the (16, B) state to
# HBM between every round's 4 mont_muls -- measured ~65% of the multiplier
# bound. Here the grid is (batch tiles, rounds): the round axis iterates
# fastest, the state lives in a VMEM scratch across rounds, and each grid
# step is one add + 4 fused multiplies. Round constants ride SMEM.

MIMC_SUB = 8  # sublane rows per tile (1024 batch elements)


@functools.lru_cache(maxsize=None)
def mimc_permute_call(modulus: int, n: int, n_rounds: int, interpret: bool):
    """call(rc, x) -> MiMC-permuted x (key 0).

    rc: (n_rounds, 16) u32 Montgomery round-constant limbs (SMEM);
    x:  (16, n//128, 128) u32 Montgomery batch."""
    mul = _sos_mul_fn(modulus)
    add_mod, _ = _mod_add_sub(modulus)
    rows = min(MIMC_SUB, n // 128)
    tiles = n // (rows * 128)

    def kernel(rc_ref, x_ref, o_ref, state_ref):
        r = pl.program_id(1)

        @pl.when(r == 0)
        def _():
            state_ref[...] = x_ref[...]

        c = jnp.stack([
            jnp.full((rows, 128), rc_ref[r, i], jnp.uint32)
            for i in range(L.NLIMBS)
        ])
        t = add_mod(state_ref[...], c)
        t2 = mul(t, t)
        t4 = mul(t2, t2)
        t6 = mul(t4, t2)
        out = mul(t6, t)
        state_ref[...] = out
        o_ref[...] = out  # same block all rounds; last write lands

    return pl.pallas_call(
        kernel,
        grid=(tiles, n_rounds),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((L.NLIMBS, rows, 128), lambda i, r: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L.NLIMBS, rows, 128), lambda i, r: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L.NLIMBS, n // 128, 128),
                                       jnp.uint32),
        scratch_shapes=[pltpu.VMEM((L.NLIMBS, rows, 128), jnp.uint32)],
        interpret=interpret,
    )


# ---------------------------------------------------------------------------
# fused NTT butterfly stage: (a, b, tw) -> (a + tw*b, a - tw*b) in ONE kernel
# ---------------------------------------------------------------------------
#
# A radix-2 stage expressed as XLA ops pays one Pallas multiply plus ~100
# elementwise ops of unrolled carry chains for the modular add/sub -- all
# HBM round trips at (16, n/2) width. Fusing the multiply and both
# reductions into a single kernel keeps the butterfly in VMEM: one read of
# a/b/tw, one write of even/odd (ops/ntt.py dispatches here on TPU).

BF_SUB = 8  # sublane rows per butterfly block


def _mod_add_sub(spec_mod: int):
    p16 = [(spec_mod >> (16 * i)) & 0xFFFF for i in range(L.NLIMBS)]

    def p_like(a):
        return jnp.stack(
            [jnp.full(a.shape[1:], c, jnp.uint32) for c in p16]
        )

    def add_raw(a, b):
        outs = []
        carry = jnp.zeros_like(a[0])
        for i in range(L.NLIMBS):
            v = a[i] + b[i] + carry
            outs.append(v & 0xFFFF)
            carry = v >> 16
        return jnp.stack(outs)

    def sub_raw(a, b):
        outs = []
        borrow = jnp.zeros_like(a[0], dtype=jnp.int32)
        for i in range(L.NLIMBS):
            v = a[i].astype(jnp.int32) - b[i].astype(jnp.int32) - borrow
            outs.append((v & 0xFFFF).astype(jnp.uint32))
            borrow = (v < 0).astype(jnp.int32)
        return jnp.stack(outs), borrow

    def add_mod(a, b):
        s = add_raw(a, b)
        d, bor = sub_raw(s, p_like(a))
        return jnp.where(bor == 0, d, s)

    def sub_mod(a, b):
        d, bor = sub_raw(a, b)
        corr = add_raw(d, p_like(a))
        return jnp.where(bor == 1, corr, d)

    return add_mod, sub_mod


@functools.lru_cache(maxsize=None)
def butterfly_call(modulus: int, n_half: int, interpret: bool):
    """call(a, b, tw) -> (even, odd), all (16, n_half//128, 128) u32."""
    mul = _sos_mul_fn(modulus)
    add_mod, sub_mod = _mod_add_sub(modulus)

    def kernel(a_ref, b_ref, tw_ref, e_ref, o_ref):
        a = a_ref[...]
        bt = mul(b_ref[...], tw_ref[...])
        e_ref[...] = add_mod(a, bt)
        o_ref[...] = sub_mod(a, bt)

    rows = min(BF_SUB, n_half // 128)
    spec = pl.BlockSpec((L.NLIMBS, rows, 128), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n_half // (rows * 128),),
        in_specs=[spec, spec, spec],
        out_specs=(spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct((L.NLIMBS, n_half // 128, 128), jnp.uint32),
            jax.ShapeDtypeStruct((L.NLIMBS, n_half // 128, 128), jnp.uint32),
        ),
        interpret=interpret,
    )
