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


def _mont_mul_kernel_body(spec_mod: int):
    n0inv8 = float((-pow(spec_mod, -1, 256)) % 256)
    p8_np = np.array(
        [float((spec_mod >> (8 * i)) & 0xFF) for i in range(N8)], np.float32
    ).reshape(N8, 1, 1)
    p16 = [(spec_mod >> (16 * i)) & 0xFFFF for i in range(L.NLIMBS)]

    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[...]  # (16, SUB, 128) uint32
        b = b_ref[...]

        def split8(x):
            # (16, SUB, 128) u32 -> (32, SUB, 128) f32 of 8-bit limbs,
            # interleaved [lo0, hi0, lo1, hi1, ...] via leading-dim stack
            lo = (x & 0xFF).astype(jnp.int32).astype(jnp.float32)
            hi = (x >> 8).astype(jnp.int32).astype(jnp.float32)
            return jnp.stack([lo, hi], axis=1).reshape(N8, SUB, 128)

        a8 = split8(a)
        b8 = split8(b)

        inv256 = jnp.float32(1.0 / 256.0)
        p8f = [float((spec_mod >> (8 * j)) & 0xFF) for j in range(N8)]

        # ---- column-wise SOS Montgomery ----
        # Each output value is accumulated in registers and written once;
        # no windowed read-modify-write over a 66-row state (that pattern
        # measured VMEM-bound). Column sums stay < 2^23: exact in f32.

        # low product columns c_0..c_31 (only needed for the m-chain)
        low = []
        for k in range(N8):
            acc = a8[0] * b8[k] if k < N8 else None
            for i in range(1, k + 1):
                acc = acc + a8[i] * b8[k - i]
            low.append(acc)

        # m-chain: m_i = (c_i + sum_{j<i} m_j p_{i-j}) * n0inv8 mod 256,
        # with the running carry of the zeroed-out low columns folded in
        m = []
        carry = jnp.zeros((SUB, 128), jnp.float32)
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
        borrow = jnp.zeros((SUB, 128), jnp.int32)
        diff = []
        for i in range(L.NLIMBS):
            v = limbs[i].astype(jnp.int32) - jnp.int32(p16[i]) - borrow
            diff.append((v & 0xFFFF).astype(jnp.uint32))
            borrow = (v < 0).astype(jnp.int32)
        ge_p = borrow == 0
        out = [jnp.where(ge_p, diff[i], limbs[i]) for i in range(L.NLIMBS)]
        o_ref[...] = jnp.stack(out)

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
