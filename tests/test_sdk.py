"""SDK layer tests: privacy notes, threshold crypto, zephyr transport."""

import pytest

from zelana_tpu.sdk import aead, ownership, privacy, threshold, txblob
from zelana_tpu.sdk.keypair import ZelanaKeypair


# ------------------------------------------------------------------ crypto


def test_x25519_rfc7748_vector():
    k = bytes.fromhex(
        "a546e36bf0527c9d3b16154b82465edd62144c0ac1fc5a18506a2244ba449ac4")
    u = bytes.fromhex(
        "e6db6867583030db3594c1a424b15f7c726624ec26b3353b10a903a6d0ab1c4c")
    assert aead.x25519(k, u) == bytes.fromhex(
        "c3da55379de9c6908e94ea4df28d084f32eccf03491c71f754b4075577a28552")


def test_chacha20poly1305_rfc8439_vector():
    key = bytes(range(0x80, 0xA0))
    nonce = bytes.fromhex("070000004041424344454647")
    aad = bytes.fromhex("50515253c0c1c2c3c4c5c6c7")
    pt = (b"Ladies and Gentlemen of the class of '99: If I could offer you "
          b"only one tip for the future, sunscreen would be it.")
    ct = aead.chacha20poly1305_encrypt(key, nonce, pt, aad)
    assert ct[-16:] == bytes.fromhex("1ae10b594f09e26a7e902ecbd0600691")
    assert aead.chacha20poly1305_decrypt(key, nonce, ct, aad) == pt
    with pytest.raises(ValueError):
        aead.chacha20poly1305_decrypt(key, nonce, ct[:-1] + b"\x00", aad)


# ------------------------------------------------------------------ notes


def test_note_commitment_and_nullifier():
    note = privacy.Note(1000, b"\x2a" * 32, b"\x01" * 32)
    cm = note.commitment()
    assert cm == privacy.commit(1000, b"\x2a" * 32, b"\x01" * 32)
    assert cm != privacy.commit(1001, b"\x2a" * 32, b"\x01" * 32)
    nf1 = privacy.derive_nullifier(b"\x05" * 32, cm, 3)
    nf2 = privacy.derive_nullifier(b"\x05" * 32, cm, 4)
    assert nf1 != nf2
    assert privacy.derive_nk(b"\x05" * 32) != privacy.derive_nk(b"\x06" * 32)


def test_note_encryption_roundtrip():
    sk, pk = aead.x25519_keypair(b"\x07" * 32)
    note = privacy.Note(555, b"\x11" * 32, b"\x22" * 32)
    blob = privacy.encrypt_note(note, pk)
    out = privacy.decrypt_note(blob, sk)
    assert out == note
    # wrong key fails
    sk2, _ = aead.x25519_keypair(b"\x08" * 32)
    assert privacy.decrypt_note(blob, sk2) is None


def test_ownership_witness():
    w = ownership.OwnershipWitness.generate(12345, 777, 999, 5)
    assert w.check()
    w.note_value = 778
    assert not w.check()
    # bytes APIs agree with int APIs
    from zelana_tpu.hashes import mimc

    pk_b = ownership.derive_public_key_bytes((12345).to_bytes(32, "little"))
    assert int.from_bytes(pk_b, "little") == mimc.derive_public_key(12345)


# --------------------------------------------------------------- threshold


def test_shamir_roundtrip():
    secret = bytes(range(32))
    shares = threshold.share_secret(secret, 3, 5)
    assert threshold.reconstruct(shares[:3]) == secret
    assert threshold.reconstruct(shares[2:]) == secret
    assert threshold.reconstruct([shares[0], shares[2], shares[4]]) == secret
    # fewer than k shares gives garbage (not the secret)
    assert threshold.reconstruct(shares[:2]) != secret


def test_encrypted_mempool_flow():
    committee, sks = threshold.Committee.create_test(k=3, n=5)
    pool = threshold.EncryptedMempool()
    etx = threshold.encrypt_for_mempool(b"transfer:alice->bob:100", committee)
    pool.submit(etx)
    ordered = pool.ordered()
    assert len(ordered) == 1
    coord = threshold.DecryptionCoordinator(committee)
    member_sks = {i + 1: sks[i] for i in range(3)}
    assert coord.decrypt(ordered[0], member_sks) == b"transfer:alice->bob:100"
    with pytest.raises(ValueError):
        coord.decrypt(ordered[0], {1: sks[0]})


# ------------------------------------------------------------------ txblob


def test_txblob_roundtrip():
    seq_sk, seq_pk = aead.x25519_keypair(b"\x09" * 32)
    blob = txblob.encrypt_tx(b"payload bytes", seq_pk, sender_hint=b"\x01\x02")
    parsed = txblob.TxBlob.from_bytes(blob.to_bytes())
    assert txblob.decrypt_tx(parsed, seq_sk) == b"payload bytes"
    # tampered hint fails auth
    parsed.sender_hint = b"\x09\x09"
    assert txblob.decrypt_tx(parsed, seq_sk) is None


# ----------------------------------------------------------------- keypair


def test_dual_keypair():
    kp = ZelanaKeypair.from_seed(b"\x31" * 32)
    msg = kp.frame_message("Transfer", {"to": "abc", "amount": 5})
    sig = kp.sign_message("Transfer", {"to": "abc", "amount": 5})
    assert ZelanaKeypair.verify_raw(kp.pubkey, msg, sig)
    assert len(kp.privacy_pk) == 32


# ------------------------------------------------------------------ zephyr


def test_zephyr_udp_end_to_end():
    from zelana_tpu.sdk.zephyr import ZephyrClient, ZephyrServer

    received = []

    def handler(req):
        received.append(req)
        return {"ok": True, "echo": req.get("n")}

    server = ZephyrServer(handler).start()
    try:
        client = ZephyrClient(("127.0.0.1", server.port))
        client.handshake()
        resp = client.request({"n": 42})
        assert resp == {"ok": True, "echo": 42}
        resp2 = client.request({"n": 43})
        assert resp2["echo"] == 43
        assert len(received) == 2
        client.close()
    finally:
        server.stop()
