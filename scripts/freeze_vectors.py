"""Freeze regression vectors into tests/vectors/vectors.json.

VERDICT r1 item 5: there is no Rust toolchain here to emit vectors from the
actual reference crate, so the bit-exactness chain is anchored the other way:
every primitive this file composes is pinned to PUBLISHED vectors in the
default test suite (merlin's STROBE vector, RFC 9496 ristretto vectors,
FIPS-202 SHA3, BLAKE3, RFC 8439 ChaCha20) and the derived artifacts below —
generator chains, transcript challenge streams, a serialized aggregated
range proof, a full signed transaction — are FROZEN so any drift in the
derivation (domain separators, fold order, serialization layout) fails
loudly.

All randomness is replaced by a deterministic SHAKE-256 stream for the
freeze; the regression test regenerates under the same stream and compares
bytes.  Run:  python scripts/freeze_vectors.py
"""

import hashlib
import json
import os
import pathlib
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEED = b"xelis-he-tpu frozen vectors v1"


def install_det_rng():
    """Swap scalars.random_scalar for a deterministic SHAKE-256 stream."""
    from xelis_he_tpu import scalars as sc

    stream = hashlib.shake_256(SEED).digest(64 * 8192)
    state = {"i": 0}

    def det_random_scalar():
        i = state["i"]
        state["i"] = i + 1
        return sc.from_bytes_mod_order_wide(stream[64 * i : 64 * i + 64])

    sc.random_scalar = det_random_scalar
    return det_random_scalar


def build_vectors() -> dict:
    install_det_rng()

    from xelis_he_tpu import (
        NATIVE_ASSET,
        TransactionBuilder,
        TransferBuilder,
        TransfersBuilder,
    )
    from xelis_he_tpu.bulletproofs.generators import BP_GENS, PC_GENS, BulletproofGens
    from xelis_he_tpu.bulletproofs.range_proof import RangeProof
    from xelis_he_tpu.elgamal import H
    from xelis_he_tpu.mock import Account, GenerationBalance, Ledger
    from xelis_he_tpu.transcript import ProtocolTranscript
    from xelis_he_tpu.tx.wire import encode_transaction

    out: dict = {"seed": SEED.decode()}

    # 1. The second generator H = from_uniform_bytes(SHA3-512(compress(G)))
    #    (reference elgamal.rs:16-24).
    out["h_compressed"] = H.compress().hex()

    # 2. Bulletproof generator chains (dalek GeneratorsChain: SHAKE-256 over
    #    b"GeneratorsChain" || label, 64 XOF bytes per point).
    gens = BulletproofGens(16, 4, use_disk_cache=False)
    out["bp_gens"] = {
        "G0": [p.compress().hex() for p in gens.share_G(0, 4)],
        "H0": [p.compress().hex() for p in gens.share_H(0, 4)],
        "G1": [p.compress().hex() for p in gens.share_G(1, 4)],
        "H1": [p.compress().hex() for p in gens.share_H(1, 4)],
    }

    # 3. Transcript challenge stream exercising every domain separator
    #    (transcript.rs:86-111) and typed append (transcript.rs:38-71).
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
    out["transcript_challenges"] = [hex(c1), hex(c2)]

    # 4. A deterministic aggregated range proof (m=2 values, 64-bit range).
    install_det_rng()  # reset the stream so this block is self-contained
    values = [123456789, 987654321]
    blindings = [11111 % (2**252), 22222]
    pt = ProtocolTranscript(b"vector-range-proof")
    proof, commitments = RangeProof.prove_multiple(
        BP_GENS, PC_GENS, pt, values, blindings, 64
    )
    out["range_proof"] = {
        "values": values,
        "blindings": blindings,
        "proof": proof.to_bytes().hex(),
        "commitments": [c.hex() for c in commitments],
    }

    # 5. A full deterministic transaction (transfer + fee), wire-encoded, plus
    #    the verifier state needed to replay it.
    install_det_rng()
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
    out["transaction"] = {
        "wire": encode_transaction(tx).hex(),
        "source_pubkey": pk_s.data.hex(),
        "dest_pubkey": pk_r.data.hex(),
        "sender_balance_ct": ledger.accounts[pk_s]
        .balances[NATIVE_ASSET]
        .compress()
        .data.hex(),
        "receiver_balance_ct": ledger.accounts[pk_r]
        .balances[NATIVE_ASSET]
        .compress()
        .data.hex(),
        "sender_secret": hex(sender.keypair.secret().scalar),
        "receiver_secret": hex(receiver.keypair.secret().scalar),
    }
    return out


def main():
    out = build_vectors()
    path = pathlib.Path(__file__).parent.parent / "tests" / "vectors"
    path.mkdir(parents=True, exist_ok=True)
    (path / "vectors.json").write_text(json.dumps(out, indent=1))
    print(f"wrote {path / 'vectors.json'}")


if __name__ == "__main__":
    main()
