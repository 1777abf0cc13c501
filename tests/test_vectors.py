"""Frozen-vector regression tests (VERDICT r1 item 5).

tests/vectors/vectors.json pins the byte-level behavior of every derived
artifact: the second generator H, the Bulletproof generator chains, the
Fiat-Shamir challenge stream across all domain separators, a serialized
aggregated range proof, and a full wire-encoded transaction.  The underlying
primitives are separately pinned to PUBLISHED vectors (merlin STROBE vector,
RFC 9496, FIPS-202, BLAKE3, RFC 8439 — see tests/test_hashes.py and
tests/test_field_ristretto.py); one byte of drift in any derivation
(dom-sep, fold order, serialization) fails here.

Regenerate (only after an INTENTIONAL protocol change):
    python scripts/freeze_vectors.py
"""

import json
import pathlib

import pytest

VECTORS = json.loads(
    (pathlib.Path(__file__).parent / "vectors" / "vectors.json").read_text()
)


def _install_det_rng():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "freeze_vectors",
        pathlib.Path(__file__).parent.parent / "scripts" / "freeze_vectors.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.install_det_rng


@pytest.fixture(autouse=True)
def restore_rng():
    from xelis_he_tpu import scalars

    orig = scalars.random_scalar
    yield
    scalars.random_scalar = orig


def test_h_generator_frozen():
    from xelis_he_tpu.elgamal import H

    assert H.compress().hex() == VECTORS["h_compressed"]


def test_h_matches_dalek_b_blinding_published_constant():
    """EXTERNAL vector: dalek bulletproofs' `PedersenGens::default()`
    documents B_blinding as the SHA3-512 hash-to-group of the compressed
    Ristretto basepoint, with compressed value
    8c9240b456a9e6dc65c377a1048d745f94a08cdb7f44cbcd7b46f34048871134
    (dalek-cryptography/bulletproofs src/generators.rs doc constant; the
    reference's H is the same construction, elgamal.rs:16-24).  This pins
    our from_uniform_bytes (Elligator2) + SHA3-512 derivation to the
    upstream crate, not merely to yesterday's self."""
    from xelis_he_tpu.bulletproofs.generators import PC_GENS
    from xelis_he_tpu.elgamal import H

    published = "8c9240b456a9e6dc65c377a1048d745f94a08cdb7f44cbcd7b46f34048871134"
    assert H.compress().hex() == published
    assert PC_GENS.B_blinding.compress().hex() == published
    # B is the Ristretto basepoint (RFC 9496 / dalek RISTRETTO_BASEPOINT_COMPRESSED)
    assert (
        PC_GENS.B.compress().hex()
        == "e2f2ae0a6abc4e71a884a961c500515f58e30b6aa582dd8db6a65945e08d2d76"
    )


def test_bp_generator_chains_frozen():
    from xelis_he_tpu.bulletproofs.generators import BulletproofGens

    gens = BulletproofGens(16, 4, use_disk_cache=False)
    got = {
        "G0": [p.compress().hex() for p in gens.share_G(0, 4)],
        "H0": [p.compress().hex() for p in gens.share_H(0, 4)],
        "G1": [p.compress().hex() for p in gens.share_G(1, 4)],
        "H1": [p.compress().hex() for p in gens.share_H(1, 4)],
    }
    assert got == VECTORS["bp_gens"]


def test_transcript_challenge_stream_frozen():
    from xelis_he_tpu import NATIVE_ASSET
    from xelis_he_tpu.transcript import ProtocolTranscript

    t = ProtocolTranscript(b"transaction-proof")
    t.append_u64(b"version", 1)
    t.new_commitment_eq_proof_domain_separator()
    t.append_hash(b"asset", NATIVE_ASSET)
    c1 = t.challenge_scalar(b"c")
    t.transfer_proof_domain_separator()
    t.append_scalar(b"s", 12345)
    t.burn_proof_domain_separator()
    t.multisig_proof_domain_separator()
    t.equality_proof_domain_separator()
    t.ciphertext_validity_proof_domain_separator()
    c2 = t.challenge_scalar(b"w")
    assert [hex(c1), hex(c2)] == VECTORS["transcript_challenges"]


def test_range_proof_bytes_frozen_and_verify():
    """The frozen proof must (a) regenerate byte-identically under the
    deterministic RNG, (b) verify from bytes alone, (c) fail on a bitflip."""
    from xelis_he_tpu.bulletproofs.generators import BP_GENS, PC_GENS
    from xelis_he_tpu.bulletproofs.range_proof import RangeProof
    from xelis_he_tpu.errors import ProofVerificationError
    from xelis_he_tpu.transcript import ProtocolTranscript

    vec = VECTORS["range_proof"]

    _install_det_rng()()
    pt = ProtocolTranscript(b"vector-range-proof")
    proof, commitments = RangeProof.prove_multiple(
        BP_GENS, PC_GENS, pt, vec["values"], vec["blindings"], 64
    )
    assert proof.to_bytes().hex() == vec["proof"]
    assert [c.hex() for c in commitments] == vec["commitments"]

    # verify purely from the frozen bytes
    frozen = RangeProof.from_bytes(bytes.fromhex(vec["proof"]))
    vt = ProtocolTranscript(b"vector-range-proof")
    frozen.verify_multiple(
        BP_GENS, PC_GENS, vt, [bytes.fromhex(c) for c in vec["commitments"]], 64
    )

    # one flipped byte must be rejected
    raw = bytearray(bytes.fromhex(vec["proof"]))
    raw[100] ^= 1
    bad = RangeProof.from_bytes(bytes(raw))
    bt = ProtocolTranscript(b"vector-range-proof")
    with pytest.raises(ProofVerificationError):
        bad.verify_multiple(
            BP_GENS, PC_GENS, bt, [bytes.fromhex(c) for c in vec["commitments"]], 64
        )


def test_transaction_wire_frozen_and_verify():
    """The frozen tx must regenerate byte-identically, decode from wire
    bytes, verify against the reconstructed ledger state, and apply."""
    from xelis_he_tpu import (
        NATIVE_ASSET,
        TransactionBuilder,
        TransferBuilder,
        TransfersBuilder,
    )
    from xelis_he_tpu.elgamal import ElGamalKeypair
    from xelis_he_tpu.mock import Account, GenerationBalance, Ledger
    from xelis_he_tpu.pyref.ristretto import mul_base
    from xelis_he_tpu.tx.verify import verify_batch
    from xelis_he_tpu.tx.wire import decode_transaction, encode_transaction
    from xelis_he_tpu.types import CompressedCiphertext

    vec = VECTORS["transaction"]

    # regenerate deterministically -> byte-identical wire encoding
    _install_det_rng()()
    ledger = Ledger()
    receiver = Account([(NATIVE_ASSET, 5)])
    pk_r = ledger.add_account(receiver)
    sender = Account([(NATIVE_ASSET, 100)])
    pk_s = ledger.add_account(sender)
    builder = TransactionBuilder(
        version=1,
        source=pk_s,
        data=TransfersBuilder(
            [TransferBuilder(asset=NATIVE_ASSET, amount=42, dest_pubkey=pk_r)]
        ),
        fee=3,
        nonce=0,
    )
    tx = builder.build(GenerationBalance({NATIVE_ASSET: 100}, sender), sender.keypair)
    assert encode_transaction(tx).hex() == vec["wire"]
    assert pk_s.data.hex() == vec["source_pubkey"]
    assert pk_r.data.hex() == vec["dest_pubkey"]

    # reconstruct the verifier state from the FROZEN fields only
    def account_from(secret_hex: str, ct_hex: str) -> Account:
        acc = object.__new__(Account)
        acc.keypair = ElGamalKeypair.keygen_with_secret(int(secret_hex, 16))
        acc.balances = {
            NATIVE_ASSET: CompressedCiphertext.from_bytes(
                bytes.fromhex(ct_hex)
            ).decompress()
        }
        acc.nonce = 0
        return acc

    state = Ledger()
    pk_r2 = state.add_account(
        account_from(vec["receiver_secret"], vec["receiver_balance_ct"])
    )
    pk_s2 = state.add_account(
        account_from(vec["sender_secret"], vec["sender_balance_ct"])
    )
    assert pk_r2.data.hex() == vec["dest_pubkey"]
    assert pk_s2.data.hex() == vec["source_pubkey"]

    decoded = decode_transaction(bytes.fromhex(vec["wire"]))
    verify_batch([decoded], state)
    assert state.get_bal_decrypted(pk_r2, NATIVE_ASSET) == mul_base(5 + 42)
    assert state.get_bal_decrypted(pk_s2, NATIVE_ASSET) == mul_base(100 - 42 - 3)
