"""Batched Poseidon kernels for TPU (JAX, Montgomery limbs).

Vectorized twin of zelana_tpu.hashes.poseidon for bulk commitment/nullifier
hashing (the privacy SDK's note stack) and witness generation for the L2
circuit's Poseidon folds. Supports every config the reference uses (BN254
8/56 + 8/57, BLS12-381 8/57).

State layout: (width=3, 16, *B) Montgomery limbs. Full rounds s-box all
three lanes, partial rounds only lane 0; the MDS apply is 9 mont_muls + adds
on the batch. Rounds run as a lax.scan over a precomputed (rounds, width, 16)
ARK tensor with a per-round full/partial flag.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .poseidon import PoseidonConfig, bn254_config, bls12_381_config
from ..ops import limbs as L


def _spec_for(cfg: PoseidonConfig) -> L.FieldSpec:
    return L.FieldSpec(cfg.modulus)


@functools.lru_cache(maxsize=None)
def _tables(cfg: PoseidonConfig):
    spec = _spec_for(cfg)
    total = cfg.full_rounds + cfg.partial_rounds
    ark = np.zeros((total, cfg.width, L.NLIMBS), np.uint32)
    for r in range(total):
        ark[r] = L.encode_mont(list(cfg.ark[r]), spec).T
    mds = np.zeros((cfg.width, cfg.width, L.NLIMBS), np.uint32)
    for i in range(cfg.width):
        mds[i] = L.encode_mont(list(cfg.mds[i]), spec).T
    half = cfg.full_rounds // 2
    is_full = np.array(
        [r < half or r >= half + cfg.partial_rounds for r in range(total)],
        np.uint32,
    )
    return ark, mds, is_full


@functools.partial(jax.jit, static_argnames=("cfg",))
def poseidon_permute_batch(state, cfg: PoseidonConfig):
    """state: (width, 16, *B) -> same, one permutation."""
    spec = _spec_for(cfg)
    ark_np, mds_np, is_full_np = _tables(cfg)
    ark = jnp.asarray(ark_np)
    mds = jnp.asarray(mds_np)
    is_full = jnp.asarray(is_full_np)
    width = cfg.width
    batch = state.shape[2:]

    def bcast(limbs_row):
        return jnp.broadcast_to(
            limbs_row.reshape((L.NLIMBS,) + (1,) * len(batch)),
            (L.NLIMBS, *batch),
        )

    def sbox5(x):
        x2 = L.mont_mul(x, x, spec)
        x4 = L.mont_mul(x2, x2, spec)
        return L.mont_mul(x4, x, spec)

    def round_fn(st, inputs):
        ark_row, full_flag = inputs
        st = jnp.stack(
            [L.add(st[i], bcast(ark_row[i]), spec) for i in range(width)]
        )
        powed = jnp.stack([sbox5(st[i]) for i in range(width)])
        partial = st.at[0].set(powed[0])
        st = jnp.where(full_flag != 0, powed, partial)
        new = []
        for i in range(width):
            acc = L.mont_mul(st[0], bcast(mds[i][0]), spec)
            for j in range(1, width):
                acc = L.add(acc, L.mont_mul(st[j], bcast(mds[i][j]), spec), spec)
            new.append(acc)
        return jnp.stack(new), None

    state, _ = jax.lax.scan(round_fn, state, (ark, is_full))
    return state


def poseidon_hash_batch(cfg: PoseidonConfig, columns):
    """absorb(columns); squeeze(1) for a batch. columns: list of (16, *B).

    Matches PoseidonSponge.absorb(list)+squeeze(1) for rate 2 / capacity 1:
    elements fill rate slots two at a time with a permutation between chunks,
    plus the final squeeze permutation; output is state[1].
    """
    spec = _spec_for(cfg)
    batch = columns[0].shape[1:]
    zero = jnp.zeros((L.NLIMBS, *batch), jnp.uint32)
    state = jnp.stack([zero, zero, zero])

    idx = 0
    for col in columns:
        if idx == cfg.rate:
            state = poseidon_permute_batch(state, cfg)
            idx = 0
        state = state.at[cfg.capacity + idx].set(
            L.add(state[cfg.capacity + idx], col, spec)
        )
        idx += 1
    state = poseidon_permute_batch(state, cfg)
    return state[cfg.capacity]


# ---------------------------------------------------------------------------
# host conveniences (privacy SDK primitives, sdk/privacy/src/*.rs)
# ---------------------------------------------------------------------------


def hash_many(cfg: PoseidonConfig, rows) -> list:
    """rows: list of equal-length tuples of ints -> list of hashes."""
    spec = _spec_for(cfg)
    k = len(rows[0])
    cols = [
        jnp.asarray(L.encode_mont([row[i] for row in rows], spec))
        for i in range(k)
    ]
    out = poseidon_hash_batch(cfg, cols)
    return L.decode_mont(np.asarray(out), spec)
