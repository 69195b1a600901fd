"""rand 0.8 StdRng (ChaCha12) + arkworks UniformRand reproduction.

The ChaCha permutation core is pinned against the RFC 7539 block-function
test vector at 20 rounds (rand_chacha's 12-round variant uses the same
core, counter layout, and output order). seed_from_u64 pins the PCG32
expansion constants of rand_core 0.6. Fp sampling pins ark-ff 0.5's
reject-and-mask loop and the Montgomery-repr convention
(reference seed discipline: keygen.rs:87-91, settlement/prover.rs:354).
"""

from zelana_tpu.fields.bn254 import P, R as FR
from zelana_tpu.groth16.stdrng import (
    ChaChaRng,
    StdRng,
    chacha_block,
    rand_bool,
    rand_fp,
    rand_fp_mont,
    rand_g1,
    rand_g2,
    seed_from_u64,
)


def test_chacha20_rfc7539_block():
    key = bytes(range(32))
    key_words = [int.from_bytes(key[4 * i:4 * i + 4], "little")
                 for i in range(8)]
    nonce_words = [
        1,
        int.from_bytes(bytes([0, 0, 0, 9]), "little"),
        int.from_bytes(bytes([0, 0, 0, 0x4A]), "little"),
        0,
    ]
    out = chacha_block(key_words, 1, nonce_words, 20)
    got = b"".join(w.to_bytes(4, "little") for w in out)
    expect = bytes.fromhex(
        "10f1e7e4d13b5915500fdd1fa32071c4"
        "c7d1f4c733c068030422aa9ac3d46c4e"
        "d2826446079faa0914c2d705d98b02a2"
        "b5129cd1de164eb9cbd083e8a2503c4e"
    )
    assert got == expect


def test_chacha12_strombergson_tc1_keystream():
    """External anchor for the 12-round stream (rand 0.8 StdRng's core):
    draft-strombergson-chacha-test-vectors-01 TC1, 256-bit all-zero key,
    all-zero IV, ChaCha12 keystream block 0 -- the same published vector
    rand_chacha's own test_chacha_true_values uses for its round-count
    variants. Anchors that \"12 rounds\" means 6 double-rounds and that
    next_u32 reads keystream words little-endian."""
    rng = ChaChaRng(b"\x00" * 32, rounds=12)
    got = b"".join(rng.next_u32().to_bytes(4, "little") for _ in range(8))
    assert got.hex() == (
        "9bf49a6a0755f953811fce125f2683d5"
        "0429c3bb49e074147e0089a52eae155f"
    )


def test_chacha20_zero_key_keystream_rand_chacha_words():
    """The famous all-zero-key ChaCha20 keystream (strombergson TC1 /
    known-answer in countless implementations), read back as the exact
    u32 word sequence rand_chacha's test_chacha_true_values_a asserts --
    anchoring the word-consumption convention against the crate's own
    published test."""
    rng = ChaChaRng(b"\x00" * 32, rounds=20)
    words = [rng.next_u32() for _ in range(8)]
    assert words == [
        0xade0b876, 0x903df1a0, 0xe56a5d40, 0x28bd8653,
        0xb819d2bd, 0x1aed8da0, 0xccef36a8, 0xc70d778b,
    ]
    # same words as bytes = the canonical keystream
    stream = b"".join(w.to_bytes(4, "little") for w in words)
    assert stream.hex() == (
        "76b8e0ada0f13d90405d6ae55386bd28"
        "bdd219b8a08ded1aa836efcc8b770dc7"
    )


def test_pcg32_xsh_rr_reference_outputs():
    """External anchor for the XSH-RR output function + LCG multiplier
    inside seed_from_u64: O'Neill's pcg32-demo published outputs for
    pcg32_srandom(42, 54) -- \"0xa15c02b7 0x7b47f409 0xba1d3330
    0x83d2f293\". The reference seeding is state=0; step; state+=42; step;
    outputs come from the PRE-step state with inc=(54<<1)|1."""
    from zelana_tpu.groth16.stdrng import pcg_xsh_rr

    MUL = 6364136223846793005
    MASK = (1 << 64) - 1
    inc = ((54 << 1) | 1) & MASK
    state = 0
    state = (state * MUL + inc) & MASK
    state = (state + 42) & MASK
    state = (state * MUL + inc) & MASK
    out = []
    for _ in range(4):
        out.append(pcg_xsh_rr(state))
        state = (state * MUL + inc) & MASK
    assert out == [0xA15C02B7, 0x7B47F409, 0xBA1D3330, 0x83D2F293]


def test_seed_from_u64_pcg32_expansion():
    # deterministic, distinct across seeds, 32 bytes
    s0 = seed_from_u64(0)
    s1 = seed_from_u64(1)
    assert len(s0) == 32 and len(s1) == 32 and s0 != s1
    assert s0 == seed_from_u64(0)
    # first PCG step from state 0: state = INC, output = XSH-RR(state)
    state = 11634580027462260723
    xorshifted = (((state >> 18) ^ state) >> 27) & 0xFFFFFFFF
    rot = state >> 59
    x = ((xorshifted >> rot) | (xorshifted << (32 - rot)) & 0xFFFFFFFF) \
        & 0xFFFFFFFF
    assert s0[:4] == x.to_bytes(4, "little")


def test_chacha_stream_block_boundaries():
    rng = ChaChaRng(seed_from_u64(7), rounds=12)
    first = [rng.next_u32() for _ in range(20)]  # crosses one block
    rng2 = ChaChaRng(seed_from_u64(7), rounds=12)
    b0 = chacha_block(rng2.key, 0, [0, 0, 0, 0], 12)
    b1 = chacha_block(rng2.key, 1, [1, 0, 0, 0], 12)
    assert first[:16] == b0
    assert first[16:20] == b1[:4]


def test_next_u64_word_order():
    rng = StdRng.seed_from_u64(3)
    w = chacha_block(rng.key, 0, [0, 0, 0, 0], 12)
    v = StdRng.seed_from_u64(3).next_u64()
    assert v == (w[0] | (w[1] << 32))


def test_rand_fp_mont_is_masked_and_reduced():
    rng = StdRng.seed_from_u64(0)
    for _ in range(8):
        v = rand_fp_mont(rng, FR)
        assert 0 <= v < FR
    # value form = repr * R^{-1}
    rng_a = StdRng.seed_from_u64(5)
    rng_b = StdRng.seed_from_u64(5)
    repr_ = rand_fp_mont(rng_a, FR)
    val = rand_fp(rng_b, FR)
    assert val == repr_ * pow((1 << 256) % FR, -1, FR) % FR


def test_rand_bool_msb():
    rng_a = StdRng.seed_from_u64(9)
    rng_b = StdRng.seed_from_u64(9)
    u = rng_b.next_u32()
    assert rand_bool(rng_a) == bool(u & (1 << 31))


def test_rand_g1_on_curve_and_deterministic():
    from zelana_tpu.curves import g1 as G1

    p1 = rand_g1(StdRng.seed_from_u64(0))
    p2 = rand_g1(StdRng.seed_from_u64(0))
    assert p1 == p2
    assert G1.is_on_curve(p1)


def test_rand_g2_in_subgroup():
    from zelana_tpu.curves import g2 as G2

    q1 = rand_g2(StdRng.seed_from_u64(0))
    q2 = rand_g2(StdRng.seed_from_u64(0))
    assert q1 == q2
    assert G2.is_on_curve(q1)
    assert G2.in_subgroup(q1)
