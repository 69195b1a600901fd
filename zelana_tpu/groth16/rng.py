"""Deterministic randomness for keygen and proving.

The reference derives reproducibility from `StdRng::seed_from_u64(0)` for
setup (prover/src/bin/keygen.rs:87) and `seed_from_u64(batch_id)` for each
proof (core/src/sequencer/settlement/prover.rs:354). We keep the same
seed-discipline (seed 0 for setup, batch_id for proofs) with a documented
PRF: field elements are sampled as SHA-256(seed || counter) reduced by
rejection over 254-bit draws, which reproduces arkworks' rejection-sampling
distribution. Bit-identical rand_chacha stream reproduction is tracked as a
compatibility TODO; proofs remain verifier-equivalent either way (Groth16
proofs are randomized; the on-chain verifier accepts any valid (r, s)).
"""

from __future__ import annotations

import hashlib


class DeterministicRng:
    def __init__(self, seed: int):
        self.seed = int(seed)
        self.counter = 0

    def _next_bytes(self) -> bytes:
        h = hashlib.sha256(
            self.seed.to_bytes(8, "little") + self.counter.to_bytes(8, "little")
        ).digest()
        self.counter += 1
        return h

    def next_u256(self) -> int:
        lo = int.from_bytes(self._next_bytes(), "little")
        hi = int.from_bytes(self._next_bytes(), "little")
        return lo | (hi << 256) & 0  # single 256-bit draw is enough

    def rand_fr(self, modulus: int) -> int:
        """Rejection sampling of a uniform field element (mask to 254/255
        bits, retry while >= modulus) -- the arkworks UniformRand shape."""
        nbits = modulus.bit_length()
        mask = (1 << nbits) - 1
        while True:
            v = int.from_bytes(self._next_bytes(), "little") & mask
            if v < modulus:
                return v

    def rand_nonzero_fr(self, modulus: int) -> int:
        while True:
            v = self.rand_fr(modulus)
            if v != 0:
                return v
