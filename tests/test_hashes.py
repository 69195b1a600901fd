"""Hash-layer tests.

MiMC assertions reuse the reference's own inline unit-test vectors
(sdk/ownership-prover/src/mimc.rs:143-162, account_tree.rs:467-476).
Poseidon has no offline vectors available without a Rust toolchain; tests
check derivation invariants (rejection-sampled constants in range, Cauchy MDS
structure, sponge duplex mechanics) and cross-config separation.
"""

from zelana_tpu.fields.bn254 import R as FR
from zelana_tpu.hashes import mimc
from zelana_tpu.hashes.grain import GrainLFSR, find_poseidon_ark_and_mds
from zelana_tpu.hashes.poseidon import (
    BLS12_381_FR,
    PoseidonSponge,
    bls12_381_config,
    bn254_config,
    bn254_config_57,
    poseidon_hash,
)


# ---------------------------------------------------------------------- MiMC

def test_mimc_round_constants():
    rc = mimc.round_constants()
    assert rc[0] == 2  # 1^3 + 1
    assert rc[1] == 10  # 2^3 + 2
    assert rc[2] == 30  # 3^3 + 3
    assert len(rc) == 91


def test_mimc_single_round_vector():
    # (1 + 2 + 3)^7 = 279936 (mimc.rs test_mimc_round)
    t = (1 + 2 + 3) % FR
    assert pow(t, 7, FR) == 279936


def test_mimc_hash_properties():
    assert mimc.hash_2(123, 456) == mimc.hash_2(123, 456)
    assert mimc.hash_2(123, 456) != mimc.hash_2(456, 123)
    assert mimc.hash_2(100, 200) != mimc.hash_3(100, 200, 300)


def test_account_leaf_matches_hash4_with_domain():
    # compute_account_leaf absorbs [4, 1, pk, bal, nonce]
    leaf = mimc.compute_account_leaf(12345, 1000, 5)
    manual = mimc.mimc_sponge_absorb([4, 1, 12345, 1000, 5], 0)
    assert leaf == manual
    assert leaf != mimc.compute_account_leaf(12345, 1001, 5)


def test_withdrawal_root_empty():
    r0 = mimc.compute_withdrawal_root(0)
    expected = mimc.hash_2(mimc.hash_2(5, 0), 0)
    assert r0 == expected


# ------------------------------------------------------------------ Grain

def test_grain_lfsr_deterministic():
    a = GrainLFSR(False, 254, 3, 8, 56)
    b = GrainLFSR(False, 254, 3, 8, 56)
    assert a.get_bits(64) == b.get_bits(64)
    # different params -> different stream
    c = GrainLFSR(False, 254, 3, 8, 57)
    a2 = GrainLFSR(False, 254, 3, 8, 56)
    assert a2.get_bits(64) != c.get_bits(64)


def test_find_ark_and_mds_shapes():
    ark, mds = find_poseidon_ark_and_mds(FR, 254, 2, 8, 56, 0)
    assert len(ark) == 64 and all(len(row) == 3 for row in ark)
    assert len(mds) == 3 and all(len(row) == 3 for row in mds)
    assert all(0 <= v < FR for row in ark for v in row)
    assert all(0 < v < FR for row in mds for v in row)


def test_mds_is_cauchy_invertible():
    import itertools

    _, mds = find_poseidon_ark_and_mds(FR, 254, 2, 8, 56, 0)
    # 3x3 determinant mod FR must be nonzero
    det = 0
    for perm, sign in [((0, 1, 2), 1), ((1, 2, 0), 1), ((2, 0, 1), 1),
                       ((2, 1, 0), -1), ((1, 0, 2), -1), ((0, 2, 1), -1)]:
        term = sign
        for i, j in enumerate(perm):
            term *= mds[i][j]
        det = (det + term) % FR
    assert det != 0


# ---------------------------------------------------------------- Poseidon

def test_poseidon_sponge_two_absorbs_equal_one():
    """absorb([a]); absorb([b]) == absorb([a, b]) for rate 2 (privacy SDK
    hashes pairs with two separate absorb calls, merkle.rs:84-86)."""
    cfg = bls12_381_config()
    s1 = PoseidonSponge(cfg)
    s1.absorb([11])
    s1.absorb([22])
    h1 = s1.squeeze_field_elements(1)[0]
    h2 = poseidon_hash(cfg, [11, 22])
    assert h1 == h2


def test_poseidon_three_element_absorb_permutes():
    cfg = bn254_config()
    h3 = poseidon_hash(cfg, [1, 2, 3])
    h2 = poseidon_hash(cfg, [1, 2])
    assert h3 != h2
    assert h3 == poseidon_hash(cfg, [1, 2, 3])


def test_poseidon_configs_differ():
    h56 = poseidon_hash(bn254_config(), [1, 2])
    h57 = poseidon_hash(bn254_config_57(), [1, 2])
    hbls = poseidon_hash(bls12_381_config(), [1, 2])
    assert len({h56, h57, hbls}) == 3
    assert h56 < FR and h57 < FR and hbls < BLS12_381_FR


def test_poseidon_ds_fold_init():
    """S0 = Poseidon(ds, batch_id) with the l2 circuit domain separator."""
    from zelana_tpu.fields.fp import from_le_bytes_mod_order

    ds = from_le_bytes_mod_order(b"zelana:accounts-fold:v1", FR)
    cfg = bn254_config()
    s0 = poseidon_hash(cfg, [ds, 0])
    s1 = poseidon_hash(cfg, [ds, 1])
    assert s0 != s1
