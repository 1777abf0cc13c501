"""Twisted ElGamal tests, mirroring /root/reference/src/elgamal.rs:392-464."""

from xelis_he_tpu.elgamal import (
    ElGamalCiphertext,
    ElGamalKeypair,
    PedersenCommitment,
    PedersenOpening,
)
from xelis_he_tpu.pyref.ristretto import IDENTITY, mul_base


def test_homomorphic_ct_scalar():
    keypair = ElGamalKeypair.keygen()
    ct = keypair.pubkey().encrypt(60)
    assert keypair.secret().decrypt(ct + 15).as_point() == mul_base(75)
    assert keypair.secret().decrypt(ct - 15).as_point() == mul_base(45)


def test_homomorphic_ct_ct():
    keypair = ElGamalKeypair.keygen()
    a = keypair.pubkey().encrypt(60)
    b = keypair.pubkey().encrypt(13)
    assert keypair.secret().decrypt(a + b).as_point() == mul_base(73)
    assert keypair.secret().decrypt(a - b).as_point() == mul_base(47)


def test_identity():
    keypair = ElGamalKeypair.keygen()
    assert keypair.secret().decrypt(keypair.pubkey().encrypt(0)).as_point().is_identity()


def test_universal_identity():
    keypair = ElGamalKeypair.keygen()
    pt = keypair.secret().decrypt(ElGamalCiphertext.zero()).as_point()
    assert pt.is_identity()
    assert pt == mul_base(0)


def test_dud_commitment():
    assert PedersenCommitment.new_with_opening(0, PedersenOpening(0)).point == IDENTITY


def test_signature():
    keypair = ElGamalKeypair.keygen()
    message = b"Hello, world!"
    signature = keypair.sign(message)
    assert signature.verify(message, keypair.pubkey())
    assert not signature.verify(b"hello world", keypair.pubkey())
    assert not signature.verify(message, ElGamalKeypair.keygen().pubkey())


def test_signature_serialization():
    keypair = ElGamalKeypair.keygen()
    sig = keypair.sign(b"m")
    from xelis_he_tpu.elgamal import Signature

    assert Signature.from_bytes(sig.to_bytes()) == sig
    assert len(sig.to_bytes()) == 64


def test_compressed_roundtrips():
    keypair = ElGamalKeypair.keygen()
    ct = keypair.pubkey().encrypt(42)
    compressed = ct.compress()
    assert compressed.decompress() == ct
    assert len(compressed.data) == 64
    pk = keypair.pubkey().compress()
    assert pk.decompress() == keypair.pubkey()
