"""Wire codec round-trip tests: decoded transactions must verify."""

import pytest

from xelis_he_tpu import (
    BurnBuilder,
    MultiSigBuilder,
    NATIVE_ASSET,
    PlaintextData,
    TransactionBuilder,
    TransferBuilder,
    TransfersBuilder,
    verify,
)
from xelis_he_tpu.errors import FormatError
from xelis_he_tpu.mock import Account, GenerationBalance, Ledger
from xelis_he_tpu.tx.wire import decode_transaction, encode_transaction


def _roundtrip_and_verify(tx, ledger):
    raw = encode_transaction(tx)
    tx2 = decode_transaction(raw)
    assert encode_transaction(tx2) == raw
    # the decoded tx must serialize to the same signing bytes and verify
    assert tx2.to_bytes() == tx.to_bytes()
    verify(tx2, ledger)
    return tx2


def test_transfer_roundtrip():
    alice, bob = Account([(NATIVE_ASSET, 100)]), Account([(NATIVE_ASSET, 0)])
    ledger = Ledger()
    pk_a, pk_b = ledger.add_account(alice), ledger.add_account(bob)
    tx = TransactionBuilder(
        version=1, source=pk_a,
        data=TransfersBuilder(
            [TransferBuilder(asset=NATIVE_ASSET, amount=5, dest_pubkey=pk_b,
                             extra_data=PlaintextData(b"memo"))]
        ),
        fee=1, nonce=0,
    ).build(GenerationBalance({NATIVE_ASSET: 100}, alice), alice.keypair)
    _roundtrip_and_verify(tx, ledger)


def test_burn_roundtrip():
    alice = Account([(NATIVE_ASSET, 100)])
    ledger = Ledger()
    pk_a = ledger.add_account(alice)
    tx = TransactionBuilder(
        version=1, source=pk_a, data=BurnBuilder(asset=NATIVE_ASSET, amount=3),
        fee=1, nonce=0,
    ).build(GenerationBalance({NATIVE_ASSET: 100}, alice), alice.keypair)
    _roundtrip_and_verify(tx, ledger)


def test_multisig_payload_roundtrip():
    alice, charlie = Account([(NATIVE_ASSET, 100)]), Account([(NATIVE_ASSET, 0)])
    ledger = Ledger()
    pk_a, pk_c = ledger.add_account(alice), ledger.add_account(charlie)
    tx = TransactionBuilder(
        version=1, source=pk_a, data=MultiSigBuilder(signers=[pk_c], threshold=1),
        fee=1, nonce=0,
    ).build(GenerationBalance({NATIVE_ASSET: 100}, alice), alice.keypair)
    _roundtrip_and_verify(tx, ledger)


def test_multisig_signatures_roundtrip():
    alice, bob, charlie = (
        Account([(NATIVE_ASSET, 100)]),
        Account([(NATIVE_ASSET, 0)]),
        Account([(NATIVE_ASSET, 0)]),
    )
    ledger = Ledger()
    pk_a, pk_b, pk_c = (
        ledger.add_account(alice), ledger.add_account(bob), ledger.add_account(charlie)
    )
    builder = TransactionBuilder(
        version=1, source=pk_a,
        data=TransfersBuilder([TransferBuilder(asset=NATIVE_ASSET, amount=5, dest_pubkey=pk_b)]),
        fee=1, nonce=0,
    )
    unsigned = builder.build_unsigned(GenerationBalance({NATIVE_ASSET: 100}, alice), alice.keypair)
    h = unsigned.hash()
    unsigned.set_multisig([(0, charlie.keypair.sign(h.data))])
    tx = unsigned.sign(alice.keypair)
    ledger.set_multisig_for_account(pk_a, [pk_c], 1)
    _roundtrip_and_verify(tx, ledger)


def test_malformed_rejected():
    alice = Account([(NATIVE_ASSET, 100)])
    ledger = Ledger()
    pk_a = ledger.add_account(alice)
    tx = TransactionBuilder(
        version=1, source=pk_a, data=BurnBuilder(asset=NATIVE_ASSET, amount=3),
        fee=1, nonce=0,
    ).build(GenerationBalance({NATIVE_ASSET: 100}, alice), alice.keypair)
    raw = encode_transaction(tx)
    with pytest.raises(FormatError):
        decode_transaction(raw[:-10])  # truncated
    with pytest.raises(FormatError):
        decode_transaction(raw + b"\x00")  # trailing
    with pytest.raises(FormatError):
        decode_transaction(b"\xff" + raw[1:])  # bad wire version
