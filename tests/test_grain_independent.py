"""Cross-validation of hashes/grain.py by an INDEPENDENT Grain derivation.

hashes/grain.py mirrors ark-crypto-primitives' `find_poseidon_ark_and_mds`
structure (boolean-list state, head pointer). This file re-derives the
generator directly from the Poseidon reference implementation's
`generate_parameters_grain.sage` layout -- integer bitboard state, shift
semantics (pop front / push back), MSB-first section packing -- sharing no
code or data layout with the production module. The two must agree
bit-for-bit on every config the framework uses:

  - 8/56 over BN254 Fr (l2_circuit.rs:68-83)
  - 8/57 over BN254 Fr (circuit/shielded.rs:365-368, pinned to 254 bits)
  - 8/57 over BLS12-381 Fr at 255 bits (sdk/privacy merkle.rs:122-123)

A divergence in either implementation (taps, warm-up, pair discard,
MSB/LSB packing, rejection width) breaks the agreement, so this test pins
the Grain constants the whole fidelity story rests on.
"""

from zelana_tpu.hashes.grain import find_poseidon_ark_and_mds

BN254_FR = 21888242871839275222246405745257275088548364400416034343698204186575808495617
BLS12_381_FR = 52435875175126190479447740508185965837690552500527637822603658699938581184513


class SageStyleGrain:
    """80-bit Grain LFSR as an integer bitboard, bit 0 = OLDEST bit.

    The reference sage script keeps a python list, pops the front and
    appends; here the state is an int with the oldest bit at the LOW end
    and every update shifts right -- structurally unlike the production
    module's fixed ring buffer with a moving head."""

    # taps (positions from the front of the sequence)
    TAPS = (62, 51, 38, 23, 13, 0)

    def __init__(self, field_bits: int, state_cells: int, r_full: int,
                 r_partial: int):
        # INIT_SEQUENCE, MSB-first per section:
        # field(2)=0b01, sbox(4)=0, n(12), t(12), R_F(10), R_P(10), 30x1
        bits = []

        def section(value: int, width: int):
            bits.extend(
                (value >> (width - 1 - i)) & 1 for i in range(width)
            )

        section(1, 2)
        section(0, 4)
        section(field_bits, 12)
        section(state_cells, 12)
        section(r_full, 10)
        section(r_partial, 10)
        bits.extend([1] * 30)
        assert len(bits) == 80
        # bit i of the sequence lives at integer bit i
        self.state = sum(b << i for i, b in enumerate(bits))
        self.field_bits = field_bits
        for _ in range(160):
            self._shift()

    def _shift(self) -> int:
        s = self.state
        new = 0
        for t in self.TAPS:
            new ^= (s >> t) & 1
        self.state = (s >> 1) | (new << 79)
        return new

    def _sample_bit(self) -> int:
        # pair-discard: first bit must be 1 for the second to be emitted
        first = self._shift()
        while first == 0:
            self._shift()  # discard the pair's second bit
            first = self._shift()
        return self._shift()

    def field_candidate(self) -> int:
        v = 0
        for _ in range(self.field_bits):
            v = (v << 1) | self._sample_bit()
        return v

    def rejection(self, modulus: int):
        while True:
            v = self.field_candidate()
            if v < modulus:
                return v

    def mod_p(self, modulus: int):
        return self.field_candidate() % modulus


def sage_style_ark_and_mds(modulus, prime_bits, rate, full, partial,
                           skip_matrices=0):
    t = rate + 1
    g = SageStyleGrain(prime_bits, t, full, partial)
    ark = tuple(
        tuple(g.rejection(modulus) for _ in range(t))
        for _ in range(full + partial)
    )
    for _ in range(skip_matrices):
        for _ in range(2 * t):
            g.mod_p(modulus)
    xs = [g.mod_p(modulus) for _ in range(t)]
    ys = [g.mod_p(modulus) for _ in range(t)]
    mds = tuple(
        tuple(pow(xs[i] + ys[j], modulus - 2, modulus) for j in range(t))
        for i in range(t)
    )
    return ark, mds


def _check(modulus, bits, rate, full, partial):
    got = find_poseidon_ark_and_mds(modulus, bits, rate, full, partial)
    want = sage_style_ark_and_mds(modulus, bits, rate, full, partial)
    assert got[0] == want[0], "round constants diverge"
    assert got[1] == want[1], "MDS diverges"


def test_grain_bn254_8_56():
    _check(BN254_FR, 254, 2, 8, 56)


def test_grain_bn254_8_57():
    _check(BN254_FR, 254, 2, 8, 57)


def test_grain_bls12_381_8_57():
    _check(BLS12_381_FR, 255, 2, 8, 57)


def test_grain_skip_matrices():
    got = find_poseidon_ark_and_mds(BN254_FR, 254, 2, 8, 56,
                                    skip_matrices=2)
    want = sage_style_ark_and_mds(BN254_FR, 254, 2, 8, 56, skip_matrices=2)
    assert got == want
