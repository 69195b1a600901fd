"""Fused Pallas kernels for BN254 field arithmetic (the speed-of-light path).

Why Pallas here: a Montgomery multiply in 8-bit f32 limb planes is ~2.5k
native VPU FMAs per element, but expressed as XLA ops the 64-column working
state spills to HBM between fusions (measured: the XLA f32 path moves ~1 GB
per 2^18-batch multiply and lands at ~9 Mmul/s). Inside one Pallas kernel
the entire schoolbook product + base-256 interleaved reduction lives in
VMEM/vregs; HBM traffic drops to the 192 B/element operands.

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
TILE = 1024  # batch elements per grid step


def _split8_f32(x_u32_row_pair):
    raise NotImplementedError


def _mont_mul_kernel_body(spec_mod: int):
    n0inv8 = float((-pow(spec_mod, -1, 256)) % 256)
    p8 = [float((spec_mod >> (8 * i)) & 0xFF) for i in range(N8)]
    p16 = [(spec_mod >> (16 * i)) & 0xFFFF for i in range(L.NLIMBS)]

    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[...]  # (16, T) uint32
        b = b_ref[...]

        a8 = []
        b8 = []
        for i in range(L.NLIMBS):
            ai = a[i]
            bi = b[i]
            # Mosaic has no u32<->f32 cast; round-trip through i32
            a8.append((ai & 0xFF).astype(jnp.int32).astype(jnp.float32))
            a8.append((ai >> 8).astype(jnp.int32).astype(jnp.float32))
            b8.append((bi & 0xFF).astype(jnp.int32).astype(jnp.float32))
            b8.append((bi >> 8).astype(jnp.int32).astype(jnp.float32))

        zero = jnp.zeros_like(a8[0])
        cols = [zero] * (2 * N8 + 2)

        # schoolbook product: 32x32 f32 FMAs, all register-resident
        for i in range(N8):
            ai = a8[i]
            for j in range(N8):
                cols[i + j] = cols[i + j] + ai * b8[j]

        # interleaved Montgomery reduction, base 256
        for i in range(N8):
            ci = cols[i]
            ci_lo = ci - 256.0 * jnp.floor(ci * (1.0 / 256.0))
            m = ci_lo * n0inv8
            m = m - 256.0 * jnp.floor(m * (1.0 / 256.0))
            for j in range(N8):
                cols[i + j] = cols[i + j] + m * p8[j]
            # cols[i] is now exactly divisible by 256; push the carry up
            cols[i + 1] = cols[i + 1] + cols[i] * (1.0 / 256.0)

        # carry propagation over the high half, base 256
        res8 = []
        carry = zero
        for k in range(N8, 2 * N8 + 1):
            v = cols[k] + carry
            carry = jnp.floor(v * (1.0 / 256.0))
            res8.append(v - 256.0 * carry)

        # pack to 16-bit uint32 limbs
        limbs = []
        for i in range(L.NLIMBS):
            lo = res8[2 * i].astype(jnp.int32).astype(jnp.uint32)
            hi = res8[2 * i + 1].astype(jnp.int32).astype(jnp.uint32)
            limbs.append(lo + (hi << 8))

        # conditional subtract p (borrow chain, integer adds only)
        borrow = jnp.zeros_like(limbs[0], dtype=jnp.int32)
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
        out_shape=jax.ShapeDtypeStruct((L.NLIMBS, n), jnp.uint32),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((L.NLIMBS, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L.NLIMBS, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L.NLIMBS, TILE), lambda i: (0, i),
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
    out = _mont_mul_call(spec.modulus, padded, interpret)(a, b)
    return out[:, :n]
