"""Batched radix-2 NTT/iNTT over BN254 Fr for TPU (JAX, Montgomery limbs).

Computes the same transform as ark-poly's `Radix2EvaluationDomain::fft` /
`ifft` / coset variants (see zelana_tpu.poly.domain for the semantics), but on
the limbs-first Montgomery representation from zelana_tpu.ops.limbs.

Design notes (TPU):
- Decimation-in-time with a host-precomputed bit-reversal gather followed by
  log2(n) butterfly stages. Each stage is one batched mont_mul over n/2
  elements plus vectorized add/sub -- everything rides the VPU lanes; no
  data-dependent control flow, shapes static per domain size.
- Twiddle tables are precomputed host-side per (domain, direction) and live
  in HBM as (log n) stage arrays; stage s uses 2^s twiddles broadcast over
  n / 2^(s+1) butterfly groups.
- Multi-chip: the sharded variant splits the batch axis; a single transform
  sharded across devices exchanges halves per stage (future work in
  zelana_tpu.parallel).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.bn254 import R as FR_MOD, FR_GENERATOR
from ..poly.domain import Domain
from . import limbs as L


@dataclass
class NttPlan:
    domain: Domain
    bitrev: np.ndarray  # (n,) int32 permutation
    stage_twiddles: list  # per stage: (16, 2^s) Montgomery limbs, forward
    stage_twiddles_inv: list
    n_inv_mont: np.ndarray  # (16,) Montgomery limbs of 1/n
    coset_pows: np.ndarray  # (16, n) Montgomery limbs of g^j
    coset_pows_inv: np.ndarray

    @property
    def n(self):
        return self.domain.size

    # device-resident copies (tuples so the jitted core sees a stable pytree)
    def twiddles_dev(self):
        if not hasattr(self, "_tw_dev"):
            self._tw_dev = tuple(jnp.asarray(t) for t in self.stage_twiddles)
        return self._tw_dev

    def twiddles_inv_dev(self):
        if not hasattr(self, "_twi_dev"):
            self._twi_dev = tuple(
                jnp.asarray(t) for t in self.stage_twiddles_inv
            )
        return self._twi_dev

    def bitrev_dev(self):
        if not hasattr(self, "_br_dev"):
            self._br_dev = jnp.asarray(self.bitrev)
        return self._br_dev

    def coset_dev(self):
        if not hasattr(self, "_cs_dev"):
            self._cs_dev = jnp.asarray(self.coset_pows)
        return self._cs_dev

    def coset_inv_dev(self):
        if not hasattr(self, "_csi_dev"):
            self._csi_dev = jnp.asarray(self.coset_pows_inv)
        return self._csi_dev


@functools.lru_cache(maxsize=None)
def make_plan(min_size: int) -> NttPlan:
    dom = Domain.new(min_size)
    n, log_n = dom.size, dom.log_size

    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int32)
    for i in range(n):
        rev[i] = int(format(i, f"0{log_n}b")[::-1], 2)

    def twiddle_tables(omega):
        tables = []
        for s in range(log_n):
            length = 1 << (s + 1)
            wlen = pow(omega, n // length, FR_MOD)
            tw = [pow(wlen, k, FR_MOD) for k in range(length // 2)]
            tables.append(L.encode_mont(tw, L.FR))
        return tables

    g = FR_GENERATOR
    coset = [pow(g, j, FR_MOD) for j in range(n)]
    ginv = pow(g, FR_MOD - 2, FR_MOD)
    coset_inv = [pow(ginv, j, FR_MOD) for j in range(n)]

    return NttPlan(
        domain=dom,
        bitrev=rev,
        stage_twiddles=twiddle_tables(dom.group_gen),
        stage_twiddles_inv=twiddle_tables(dom.group_gen_inv),
        n_inv_mont=L.encode_mont([dom.size_inv], L.FR)[:, 0],
        coset_pows=L.encode_mont(coset, L.FR),
        coset_pows_inv=L.encode_mont(coset_inv, L.FR),
    )


def _use_fused_butterfly(n: int) -> bool:
    import os

    if os.environ.get("ZELANA_FORCE_PALLAS") == "1":
        return True
    return jax.default_backend() != "cpu" and n >= 4096


@jax.jit
def _ntt_core(x, stage_twiddles, bitrev):
    """x: (16, n) Montgomery limbs -> (16, n) evaluations (natural order).

    Whole transform under one jit: the eager per-stage version paid ~5
    device dispatches per butterfly stage, which dominates through the
    remote execution relay.
    """
    n = x.shape[1]
    x = jnp.take(x, bitrev, axis=1)
    log_n = n.bit_length() - 1
    fused = _use_fused_butterfly(n)
    if fused:
        from .pallas_field import butterfly_call

        call = butterfly_call(L.FR.modulus, n // 2,
                              jax.default_backend() == "cpu")
    for s in range(log_n):
        half = 1 << s
        groups = n // (2 * half)
        x = x.reshape(L.NLIMBS, groups, 2, half)
        a = x[:, :, 0, :]
        b = x[:, :, 1, :]
        tw = jnp.broadcast_to(
            stage_twiddles[s][:, None, :], (L.NLIMBS, groups, half)
        )
        if fused:
            # one fused Pallas butterfly: multiply + both modular
            # reductions in VMEM (pallas_field.butterfly_call); the XLA
            # expression of the carry chains is ~100 elementwise HBM
            # round trips per stage
            a3 = a.reshape(L.NLIMBS, n // 256, 128)
            b3 = b.reshape(L.NLIMBS, n // 256, 128)
            t3 = tw.reshape(L.NLIMBS, n // 256, 128)
            even, odd = call(a3, b3, t3)
            even = even.reshape(L.NLIMBS, groups, half)
            odd = odd.reshape(L.NLIMBS, groups, half)
        else:
            bt = L.mont_mul(b, tw, L.FR)
            even = L.add(a, bt, L.FR)
            odd = L.sub(a, bt, L.FR)
        x = jnp.stack([even, odd], axis=2).reshape(L.NLIMBS, n)
    return x


def ntt(x, plan: NttPlan):
    """Forward NTT: coefficients -> evaluations at powers of group_gen."""
    return _ntt_core(x, plan.twiddles_dev(), plan.bitrev_dev())


def intt(x, plan: NttPlan):
    """Inverse NTT: evaluations -> coefficients."""
    y = _ntt_core(x, plan.twiddles_inv_dev(), plan.bitrev_dev())
    n_inv = L.broadcast_scalar(plan.n_inv_mont, y.shape[1:])
    return L.mont_mul(y, n_inv, L.FR)


def coset_ntt(x, plan: NttPlan):
    """Evaluate on the coset g * <omega> (g = 5, matching ark-poly)."""
    scaled = L.mont_mul(x, plan.coset_dev(), L.FR)
    return ntt(scaled, plan)


def coset_intt(x, plan: NttPlan):
    coeffs = intt(x, plan)
    return L.mont_mul(coeffs, plan.coset_inv_dev(), L.FR)
