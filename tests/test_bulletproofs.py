"""Bulletproofs range proof tests (SURVEY.md D6/D7 capabilities)."""

import pytest

from xelis_he_tpu import scalars
from xelis_he_tpu.bulletproofs.generators import BulletproofGens, PedersenGens
from xelis_he_tpu.bulletproofs.range_proof import RangeProof
from xelis_he_tpu.errors import ProofVerificationError
from xelis_he_tpu.pyref.ristretto import IDENTITY
from xelis_he_tpu.transcript import ProtocolTranscript

BP = BulletproofGens(64, 8)
PC = PedersenGens()


def _prove(label, values, blindings=None, n=64):
    if blindings is None:
        blindings = [scalars.random_scalar() for _ in values]
    t = ProtocolTranscript(label)
    proof, comms = RangeProof.prove_multiple(BP, PC, t, values, blindings, n)
    return proof, comms


def test_single_value_roundtrip():
    proof, comms = _prove(b"t1", [17])
    t = ProtocolTranscript(b"t1")
    proof.verify_multiple(BP, PC, t, comms, 64)


def test_aggregated_roundtrip():
    proof, comms = _prove(b"t4", [0, 1, (1 << 64) - 1, 123456789])
    t = ProtocolTranscript(b"t4")
    proof.verify_multiple(BP, PC, t, comms, 64)


def test_dud_commitments():
    """Identity commitments from (0 value, 0 blinding) duds must be accepted
    (the reference pads aggregation size with duds, builder.rs:512-521)."""
    proof, comms = _prove(b"dud", [42, 0], [scalars.random_scalar(), 0])
    assert comms[1] == IDENTITY.compress()
    t = ProtocolTranscript(b"dud")
    proof.verify_multiple(BP, PC, t, comms, 64)


def test_serialization_roundtrip():
    proof, comms = _prove(b"ser", [5, 6])
    raw = proof.to_bytes()
    # 7 * 32 + 2*lg(128)*32 + 64 = 736
    assert len(raw) == 736
    proof2 = RangeProof.from_bytes(raw)
    t = ProtocolTranscript(b"ser")
    proof2.verify_multiple(BP, PC, t, comms, 64)


def test_wrong_transcript_fails():
    proof, comms = _prove(b"a", [5])
    t = ProtocolTranscript(b"b")
    with pytest.raises(ProofVerificationError):
        proof.verify_multiple(BP, PC, t, comms, 64)


def test_tampered_proof_fails():
    proof, comms = _prove(b"tam", [5])
    raw = bytearray(proof.to_bytes())
    raw[200] ^= 1  # tweak t_x_blinding region
    try:
        bad = RangeProof.from_bytes(bytes(raw))
    except ProofVerificationError:
        return  # non-canonical scalar rejection also acceptable
    t = ProtocolTranscript(b"tam")
    with pytest.raises(ProofVerificationError):
        bad.verify_multiple(BP, PC, t, comms, 64)


def test_out_of_range_value_rejected_at_prove():
    with pytest.raises(ProofVerificationError):
        _prove(b"oor", [1 << 64])


def test_value_out_of_range_proof_fails_verification():
    """A proof over value v against a commitment of v' != v must fail."""
    blind = scalars.random_scalar()
    proof, comms = _prove(b"mismatch", [10], [blind])
    # verify against a commitment to 11 with the same blinding
    from xelis_he_tpu.pyref.ristretto import multiscalar_mul

    other = multiscalar_mul([11, blind], [PC.B, PC.B_blinding]).compress()
    t = ProtocolTranscript(b"mismatch")
    with pytest.raises(ProofVerificationError):
        proof.verify_multiple(BP, PC, t, [other], 64)


def test_verify_batch_mixed_sizes():
    """Batch across different aggregation sizes (1, 2, 4 values)."""
    batches = [
        _prove(b"b0", [7]),
        _prove(b"b1", [1, 2]),
        _prove(b"b2", [3, 4, 5, 6]),
    ]
    views = []
    for i, (proof, comms) in enumerate(batches):
        t = ProtocolTranscript(b"b%d" % i)
        views.append(proof.verification_view(t, comms, 64))
    RangeProof.verify_batch(views, BP, PC)


def test_verify_batch_one_bad_poisons_all():
    good, comms_g = _prove(b"g", [7])
    bad, comms_b = _prove(b"x", [8])
    views = [
        good.verification_view(ProtocolTranscript(b"g"), comms_g, 64),
        # wrong transcript label for the second proof
        bad.verification_view(ProtocolTranscript(b"y"), comms_b, 64),
    ]
    with pytest.raises(ProofVerificationError):
        RangeProof.verify_batch(views, BP, PC)


def test_generators_deterministic():
    bp2 = BulletproofGens(64, 8, use_disk_cache=False)
    assert bp2.G(4, 2)[0] == BP.G(4, 2)[0]
    assert bp2.H(64, 1)[-1] == BP.H(64, 1)[-1]
    # party-major aggregation order
    assert bp2.G(4, 2)[4] == bp2.share_G(1, 4)[0]
