"""Sigma proof tests, mirroring /root/reference/src/proofs.rs:374-448."""

import pytest

from xelis_he_tpu.elgamal import ElGamalKeypair, PedersenCommitment, PedersenOpening
from xelis_he_tpu.errors import TranscriptError
from xelis_he_tpu.sigma import BatchCollector, CiphertextValidityProof, CommitmentEqProof
from xelis_he_tpu.transcript import ProtocolTranscript


def _eq_proof_setup():
    keypair = ElGamalKeypair.keygen()
    balance, amount = 100, 5
    source_balance = keypair.pubkey().encrypt(balance)
    opening = PedersenOpening.generate_new()
    ciphertext = keypair.pubkey().encrypt_with_opening(amount, opening)
    commitment = PedersenCommitment.new_with_opening(balance - amount, opening)
    final_balance = source_balance - ciphertext
    return keypair, opening, commitment, final_balance


def test_eq_proof():
    keypair, opening, commitment, final_balance = _eq_proof_setup()
    t = ProtocolTranscript(b"test_eq_proof")
    proof = CommitmentEqProof.new(keypair, final_balance, opening, 95, t)

    t = ProtocolTranscript(b"test_eq_proof")
    collector = BatchCollector()
    proof.pre_verify(keypair.pubkey(), final_balance, commitment, t, collector)
    assert collector.verify()


def test_eq_proof_wrong_commitment_fails():
    keypair, opening, commitment, final_balance = _eq_proof_setup()
    t = ProtocolTranscript(b"test_eq_proof")
    proof = CommitmentEqProof.new(keypair, final_balance, opening, 95, t)

    bad_commitment = PedersenCommitment.new_with_opening(96, opening)
    t = ProtocolTranscript(b"test_eq_proof")
    collector = BatchCollector()
    proof.pre_verify(keypair.pubkey(), final_balance, bad_commitment, t, collector)
    assert not collector.verify()


def test_eq_proof_serialization():
    keypair, opening, commitment, final_balance = _eq_proof_setup()
    t = ProtocolTranscript(b"ser")
    proof = CommitmentEqProof.new(keypair, final_balance, opening, 95, t)
    raw = proof.to_bytes()
    assert len(raw) == 192
    proof2 = CommitmentEqProof.from_bytes(raw)
    t = ProtocolTranscript(b"ser")
    collector = BatchCollector()
    proof2.pre_verify(keypair.pubkey(), final_balance, commitment, t, collector)
    assert collector.verify()


def test_ciphertext_validity_proof():
    alice, bob = ElGamalKeypair.keygen(), ElGamalKeypair.keygen()
    amount = 5
    opening = PedersenOpening.generate_new()
    commitment = PedersenCommitment.new_with_opening(amount, opening)
    bob_handle = bob.pubkey().decrypt_handle(opening)
    alice_handle = alice.pubkey().decrypt_handle(opening)

    t = ProtocolTranscript(b"test_ciphertext_proof")
    proof = CiphertextValidityProof.new(bob.pubkey(), alice.pubkey(), amount, opening, t)

    t = ProtocolTranscript(b"test_ciphertext_proof")
    collector = BatchCollector()
    proof.pre_verify(commitment, bob.pubkey(), alice.pubkey(), bob_handle, alice_handle, t, collector)
    assert collector.verify()
    assert len(proof.to_bytes()) == 160


def test_batch_collector_mixes_proofs():
    """One collector over several proofs — a single bad proof must poison the
    whole batch (proofs.rs batch semantics)."""
    collector = BatchCollector()
    for amount in (1, 2, 3):
        alice, bob = ElGamalKeypair.keygen(), ElGamalKeypair.keygen()
        opening = PedersenOpening.generate_new()
        commitment = PedersenCommitment.new_with_opening(amount, opening)
        t = ProtocolTranscript(b"batch")
        proof = CiphertextValidityProof.new(bob.pubkey(), alice.pubkey(), amount, opening, t)
        t = ProtocolTranscript(b"batch")
        proof.pre_verify(
            commitment,
            bob.pubkey(),
            alice.pubkey(),
            bob.pubkey().decrypt_handle(opening),
            alice.pubkey().decrypt_handle(opening),
            t,
            collector,
        )
    assert collector.verify()

    # now poison with a proof over the wrong commitment
    alice, bob = ElGamalKeypair.keygen(), ElGamalKeypair.keygen()
    opening = PedersenOpening.generate_new()
    t = ProtocolTranscript(b"batch")
    proof = CiphertextValidityProof.new(bob.pubkey(), alice.pubkey(), 9, opening, t)
    t = ProtocolTranscript(b"batch")
    proof.pre_verify(
        PedersenCommitment.new_with_opening(8, opening),
        bob.pubkey(),
        alice.pubkey(),
        bob.pubkey().decrypt_handle(opening),
        alice.pubkey().decrypt_handle(opening),
        t,
        collector,
    )
    assert not collector.verify()


def test_identity_point_rejected_in_transcript():
    keypair, opening, commitment, final_balance = _eq_proof_setup()
    t = ProtocolTranscript(b"id")
    proof = CommitmentEqProof.new(keypair, final_balance, opening, 95, t)
    tampered = CommitmentEqProof(b"\x00" * 32, proof.Y_1, proof.Y_2, proof.z_s, proof.z_x, proof.z_r)
    t = ProtocolTranscript(b"id")
    with pytest.raises(TranscriptError):
        tampered.pre_verify(keypair.pubkey(), final_balance, commitment, t, BatchCollector())
