"""Batched MiMC-91 kernels for TPU (JAX, Montgomery limbs).

Vectorized twin of zelana_tpu.hashes.mimc: hashes thousands of independent
inputs per call (account leaves, nullifiers, commitments, tree levels). The
91-round x^7 permutation runs as a lax.scan over precomputed Montgomery round
constants; each round costs 4 mont_muls on the whole batch.

Used for bulk witness generation and the sequencer's account-SMT updates --
the reference's hottest host loop (AccountTree::insert walks 32 levels x 91
rounds per transaction, core/src/sequencer/storage/account_tree.rs:339-392).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.bn254 import R as FR_MOD
from .mimc import round_constants
from ..ops import limbs as L


@functools.lru_cache(maxsize=1)
def _round_constants_mont() -> np.ndarray:
    """(91, 16) Montgomery limb array of the MiMC round constants."""
    rc = round_constants()
    return L.encode_mont(list(rc), L.FR).T.copy()  # (91, 16)


def _use_fused() -> bool:
    """Fused-kernel opt-in (ZELANA_FUSED_MIMC=1 / ZELANA_FORCE_PALLAS=1).

    MEASURED NEUTRAL on the bench slice (0.177 vs ~0.16 Mhash/s): the
    permutation is VPU-bound there either way, and the kernel costs one
    extra ~minutes remote compile per process. On real chips (higher
    VPU:HBM ratio) the VMEM-resident state is the right default; flip
    this when the deployment target changes."""
    import os

    if os.environ.get("ZELANA_FORCE_PALLAS") == "1":
        return True
    if os.environ.get("ZELANA_FUSED_MIMC") != "1":
        return False
    return jax.default_backend() != "cpu"


@functools.partial(jax.jit, static_argnames=())
def _mimc_permute_scan(x):
    rc = jnp.asarray(_round_constants_mont())  # (91, 16)
    batch = x.shape[1:]

    def round_fn(state, c_limbs):
        c = jnp.broadcast_to(
            c_limbs.reshape((L.NLIMBS,) + (1,) * len(batch)), state.shape
        )
        t = L.add(state, c, L.FR)
        t2 = L.mont_mul(t, t, L.FR)
        t4 = L.mont_mul(t2, t2, L.FR)
        t6 = L.mont_mul(t4, t2, L.FR)
        return L.mont_mul(t6, t, L.FR), None

    state, _ = jax.lax.scan(round_fn, x, rc)
    return state  # key = 0, so no final key addition


@functools.partial(jax.jit, static_argnames=("interpret",))
def _mimc_permute_fused(x, interpret=False):
    """All 91 rounds in one Pallas kernel, state VMEM-resident
    (pallas_field.mimc_permute_call); (16, B) batches, B padded to 1024."""
    from ..ops.pallas_field import mimc_permute_call

    rc = jnp.asarray(_round_constants_mont())  # (91, 16)
    n = x.shape[1]
    padded = -(-n // 1024) * 1024
    if padded != n:
        x = jnp.pad(x, ((0, 0), (0, padded - n)))
    x3 = x.reshape(L.NLIMBS, padded // 128, 128)
    out = mimc_permute_call(L.FR.modulus, padded, rc.shape[0], interpret)(
        rc, x3)
    return out.reshape(L.NLIMBS, padded)[:, :n]


def mimc_permute_batch(x):
    """MiMC permutation with key 0 on a (16, *B) Montgomery batch."""
    if _use_fused() and x.ndim == 2 and x.shape[1] >= 1024:
        return _mimc_permute_fused(x)
    return _mimc_permute_scan(x)


def mimc_sponge_batch(inputs):
    """Sponge absorb over the leading axis: inputs (k, 16, *B) -> (16, *B).

    Equivalent to mimc_sponge_absorb([v_1..v_k], 0) per batch element.
    """
    state = jnp.zeros_like(inputs[0])
    for i in range(inputs.shape[0]):
        state = mimc_permute_batch(L.add(state, inputs[i], L.FR))
    return state


def hash2_batch(a, b):
    """Batched hash_2: leaves of the account/commitment SMTs."""
    two = L.broadcast_scalar(L.encode_mont([2], L.FR)[:, 0], a.shape[1:])
    return mimc_sponge_batch(jnp.stack([two, a, b]))


def hash_n_batch(columns):
    """Batched hash_n over a list of (16, *B) columns."""
    n = len(columns)
    dom = L.broadcast_scalar(
        L.encode_mont([n], L.FR)[:, 0], columns[0].shape[1:]
    )
    return mimc_sponge_batch(jnp.stack([dom, *columns]))


# ---------------------------------------------------------------------------
# host conveniences
# ---------------------------------------------------------------------------


def hash2_many(pairs) -> list:
    """[(a, b)] ints -> [hash_2(a, b)] via the device kernel."""
    a = jnp.asarray(L.encode_mont([p[0] for p in pairs], L.FR))
    b = jnp.asarray(L.encode_mont([p[1] for p in pairs], L.FR))
    return L.decode_mont(np.asarray(hash2_batch(a, b)), L.FR)
