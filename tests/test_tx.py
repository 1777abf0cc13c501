"""Transaction-layer integration tests against the mock ledger, mirroring
/root/reference/src/lib.rs:244-1094 scenario by scenario."""

import copy

import pytest

from xelis_he_tpu import (
    BurnBuilder,
    Hash,
    InvalidNonceError,
    MultiSigBuilder,
    NATIVE_ASSET,
    PlaintextData,
    ProofVerificationError,
    Role,
    TransactionBuilder,
    TransferBuilder,
    TransfersBuilder,
    apply_without_verify,
    mul_base,
    verify,
    verify_batch,
)
from xelis_he_tpu.mock import Account, GenerationBalance, Ledger

ASSET_2 = Hash(b"\x01" + b"\x00" * 31)


def _ledger_with(*accounts):
    ledger = Ledger()
    pks = [ledger.add_account(a) for a in accounts]
    return ledger, pks


def _transfer_builder(source_pk, dest_pk, amount=10, fee=1, nonce=0, asset=NATIVE_ASSET, extra=None):
    return TransactionBuilder(
        version=1,
        source=source_pk,
        data=TransfersBuilder(
            [TransferBuilder(asset=asset, amount=amount, dest_pubkey=dest_pk, extra_data=extra)]
        ),
        fee=fee,
        nonce=nonce,
    )


def test_transfer_and_balances():
    alice, bob = Account([(NATIVE_ASSET, 100)]), Account([(NATIVE_ASSET, 0)])
    ledger, (pk_a, pk_b) = _ledger_with(alice, bob)

    builder = _transfer_builder(pk_a, pk_b, amount=10, fee=1)
    assert builder.get_transaction_cost(NATIVE_ASSET) == 11
    assert len(builder.used_assets()) == 1

    tx = builder.build(GenerationBalance({NATIVE_ASSET: 100}, alice), alice.keypair)

    verify_batch([tx], ledger)
    assert ledger.get_bal_decrypted(pk_a, NATIVE_ASSET) == mul_base(89)
    assert ledger.get_bal_decrypted(pk_b, NATIVE_ASSET) == mul_base(10)


def test_burn():
    alice = Account([(NATIVE_ASSET, 100)])
    ledger, (pk_a,) = _ledger_with(alice)
    builder = TransactionBuilder(
        version=1, source=pk_a, data=BurnBuilder(asset=NATIVE_ASSET, amount=10), fee=1, nonce=0
    )
    assert builder.get_transaction_cost(NATIVE_ASSET) == 11
    tx = builder.build(GenerationBalance({NATIVE_ASSET: 100}, alice), alice.keypair)
    verify_batch([tx], ledger)
    assert ledger.get_bal_decrypted(pk_a, NATIVE_ASSET) == mul_base(89)


def test_burn_non_native_asset():
    alice = Account([(NATIVE_ASSET, 100), (ASSET_2, 50)])
    ledger, (pk_a,) = _ledger_with(alice)
    builder = TransactionBuilder(
        version=1, source=pk_a, data=BurnBuilder(asset=ASSET_2, amount=20), fee=1, nonce=0
    )
    assert builder.get_transaction_cost(NATIVE_ASSET) == 1
    assert builder.get_transaction_cost(ASSET_2) == 20
    assert len(builder.used_assets()) == 2
    tx = builder.build(
        GenerationBalance({NATIVE_ASSET: 100, ASSET_2: 50}, alice), alice.keypair
    )
    verify_batch([tx], ledger)
    assert ledger.get_bal_decrypted(pk_a, NATIVE_ASSET) == mul_base(99)
    assert ledger.get_bal_decrypted(pk_a, ASSET_2) == mul_base(30)


def test_non_native_asset_transfer():
    alice = Account([(NATIVE_ASSET, 100), (ASSET_2, 50)])
    bob = Account([(NATIVE_ASSET, 0), (ASSET_2, 0)])
    ledger, (pk_a, pk_b) = _ledger_with(alice, bob)
    builder = _transfer_builder(pk_a, pk_b, amount=30, fee=2, asset=ASSET_2)
    assert len(builder.used_assets()) == 2
    tx = builder.build(
        GenerationBalance({NATIVE_ASSET: 100, ASSET_2: 50}, alice), alice.keypair
    )
    verify_batch([tx], ledger)
    assert ledger.get_bal_decrypted(pk_a, NATIVE_ASSET) == mul_base(98)
    assert ledger.get_bal_decrypted(pk_a, ASSET_2) == mul_base(20)
    assert ledger.get_bal_decrypted(pk_b, ASSET_2) == mul_base(30)


def test_realistic_chained_batch():
    """Two chained txs: the second is built on post-tx1 state advanced via
    apply_without_verify (lib.rs realistic_test pattern)."""
    alice = Account([(NATIVE_ASSET, 100)])
    bob = Account([(NATIVE_ASSET, 5)])
    charlie = Account([(NATIVE_ASSET, 0)])
    ledger, (pk_a, pk_b, pk_c) = _ledger_with(alice, bob, charlie)

    tx1 = _transfer_builder(pk_a, pk_b, amount=40, fee=1).build(
        GenerationBalance({NATIVE_ASSET: 100}, alice), alice.keypair
    )

    # advance a wallet-side copy of bob's account to build tx2 on top of tx1
    wallet_ledger = ledger.clone()
    apply_without_verify(tx1, wallet_ledger)
    bob_after = wallet_ledger.get_account(pk_b)
    assert wallet_ledger.get_bal_decrypted(pk_b, NATIVE_ASSET) == mul_base(45)

    tx2 = _transfer_builder(pk_b, pk_c, amount=30, fee=1).build(
        GenerationBalance({NATIVE_ASSET: 45}, bob_after), bob.keypair
    )

    verify_batch([tx1, tx2], ledger)
    assert ledger.get_bal_decrypted(pk_a, NATIVE_ASSET) == mul_base(59)
    assert ledger.get_bal_decrypted(pk_b, NATIVE_ASSET) == mul_base(14)
    assert ledger.get_bal_decrypted(pk_c, NATIVE_ASSET) == mul_base(30)


def test_insufficient_funds():
    alice = Account([(NATIVE_ASSET, 10)])
    ledger, (pk_a,) = _ledger_with(alice)
    from xelis_he_tpu import InsufficientFundsError

    with pytest.raises(InsufficientFundsError):
        _transfer_builder(pk_a, pk_a, amount=100).build(
            GenerationBalance({NATIVE_ASSET: 10}, alice), alice.keypair
        )


def test_invalid_nonce():
    alice, bob = Account([(NATIVE_ASSET, 100)]), Account([(NATIVE_ASSET, 0)])
    ledger, (pk_a, pk_b) = _ledger_with(alice, bob)
    tx = _transfer_builder(pk_a, pk_b, nonce=3).build(
        GenerationBalance({NATIVE_ASSET: 100}, alice), alice.keypair
    )
    with pytest.raises(InvalidNonceError):
        verify_batch([tx], ledger)


def test_invalid_transfer_tamper_suite():
    """lib.rs test_invalid_transfer_tx: tamper signature / asset / commitments
    / fee / nonce — each must fail verification."""
    alice, bob = Account([(NATIVE_ASSET, 100)]), Account([(NATIVE_ASSET, 0)])
    ledger, (pk_a, pk_b) = _ledger_with(alice, bob)
    tx = _transfer_builder(pk_a, pk_b).build(
        GenerationBalance({NATIVE_ASSET: 100}, alice), alice.keypair
    )
    verify(tx, ledger.clone())  # sanity: the untampered tx passes

    # tampered signature
    bad = copy.copy(tx)
    from xelis_he_tpu.elgamal import Signature

    bad.signature = Signature(tx.signature.s + 1, tx.signature.e)
    with pytest.raises(ProofVerificationError):
        verify(bad, ledger.clone())

    # tampered source commitment asset
    bad = copy.deepcopy(tx)
    bad.new_source_commitments[0].asset = ASSET_2
    with pytest.raises(ProofVerificationError):
        verify(bad, ledger.clone())

    # cleared source commitments
    bad = copy.copy(tx)
    bad.new_source_commitments = []
    with pytest.raises(ProofVerificationError):
        verify(bad, ledger.clone())

    # tampered fee
    bad = copy.copy(tx)
    bad.fee = 0
    with pytest.raises(ProofVerificationError):
        verify(bad, ledger.clone())

    # tampered nonce (goes through nonce check first)
    bad = copy.copy(tx)
    bad.nonce = 1
    with pytest.raises((ProofVerificationError, InvalidNonceError)):
        verify(bad, ledger.clone())


def test_invalid_burn_tamper():
    alice = Account([(NATIVE_ASSET, 100), (ASSET_2, 50)])
    ledger, (pk_a,) = _ledger_with(alice)
    tx = TransactionBuilder(
        version=1, source=pk_a, data=BurnBuilder(asset=NATIVE_ASSET, amount=10), fee=1, nonce=0
    ).build(GenerationBalance({NATIVE_ASSET: 100, ASSET_2: 50}, alice), alice.keypair)

    bad = copy.deepcopy(tx)
    bad.data.amount = 5
    with pytest.raises(ProofVerificationError):
        verify(bad, ledger.clone())

    bad = copy.deepcopy(tx)
    bad.data.asset = ASSET_2
    with pytest.raises(ProofVerificationError):
        verify(bad, ledger.clone())


# ---------------------------------------------------------------------------
# multisig lifecycle (lib.rs:254-612)
# ---------------------------------------------------------------------------


def _build_multisig_transfer(alice, pk_a, pk_b, cosigners, indices):
    builder = _transfer_builder(pk_a, pk_b)
    unsigned = builder.build_unsigned(GenerationBalance({NATIVE_ASSET: 100}, alice), alice.keypair)
    h = unsigned.hash()
    unsigned.set_multisig([(i, k.keypair.sign(h.data)) for i, k in zip(indices, cosigners)])
    return unsigned.sign(alice.keypair)


def test_invalid_multisig():
    """State has a multisig config but the tx carries none → reject."""
    alice, bob, charlie = (
        Account([(NATIVE_ASSET, 100)]),
        Account([(NATIVE_ASSET, 0)]),
        Account([(NATIVE_ASSET, 0)]),
    )
    ledger, (pk_a, pk_b, pk_c) = _ledger_with(alice, bob, charlie)
    tx = _transfer_builder(pk_a, pk_b).build(
        GenerationBalance({NATIVE_ASSET: 100}, alice), alice.keypair
    )
    verify(tx, ledger.clone())
    ledger.set_multisig_for_account(pk_a, [pk_c], 1)
    with pytest.raises(ProofVerificationError):
        verify(tx, ledger)


def test_multisig_threshold_1():
    alice, bob, charlie = (
        Account([(NATIVE_ASSET, 100)]),
        Account([(NATIVE_ASSET, 0)]),
        Account([(NATIVE_ASSET, 0)]),
    )
    ledger, (pk_a, pk_b, pk_c) = _ledger_with(alice, bob, charlie)
    tx = _build_multisig_transfer(alice, pk_a, pk_b, [charlie], [0])
    ledger.set_multisig_for_account(pk_a, [pk_c], 1)
    verify(tx, ledger)


def test_multisig_threshold_2():
    alice, bob, charlie, dave = (
        Account([(NATIVE_ASSET, 100)]),
        Account([(NATIVE_ASSET, 0)]),
        Account([(NATIVE_ASSET, 0)]),
        Account([(NATIVE_ASSET, 0)]),
    )
    ledger, (pk_a, pk_b, pk_c, pk_d) = _ledger_with(alice, bob, charlie, dave)
    tx = _build_multisig_transfer(alice, pk_a, pk_b, [charlie, dave], [0, 1])
    ledger.set_multisig_for_account(pk_a, [pk_c, pk_d], 2)
    verify(tx, ledger)


def test_multisig_one_of_two():
    alice, bob, charlie, dave = (
        Account([(NATIVE_ASSET, 100)]),
        Account([(NATIVE_ASSET, 0)]),
        Account([(NATIVE_ASSET, 0)]),
        Account([(NATIVE_ASSET, 0)]),
    )
    ledger, (pk_a, pk_b, pk_c, pk_d) = _ledger_with(alice, bob, charlie, dave)
    tx = _build_multisig_transfer(alice, pk_a, pk_b, [dave], [1])
    ledger.set_multisig_for_account(pk_a, [pk_c, pk_d], 1)
    verify(tx, ledger)


def test_multisig_wrong_signer_rejected():
    alice, bob, charlie, dave = (
        Account([(NATIVE_ASSET, 100)]),
        Account([(NATIVE_ASSET, 0)]),
        Account([(NATIVE_ASSET, 0)]),
        Account([(NATIVE_ASSET, 0)]),
    )
    ledger, (pk_a, pk_b, pk_c, pk_d) = _ledger_with(alice, bob, charlie, dave)
    # dave signs but claims charlie's index 0
    tx = _build_multisig_transfer(alice, pk_a, pk_b, [dave], [0])
    ledger.set_multisig_for_account(pk_a, [pk_c, pk_d], 1)
    with pytest.raises(ProofVerificationError):
        verify(tx, ledger)


def test_multisig_setup_and_delete():
    alice, charlie, dave = (
        Account([(NATIVE_ASSET, 100)]),
        Account([(NATIVE_ASSET, 0)]),
        Account([(NATIVE_ASSET, 0)]),
    )
    ledger, (pk_a, pk_c, pk_d) = _ledger_with(alice, charlie, dave)

    # setup
    tx = TransactionBuilder(
        version=1, source=pk_a, data=MultiSigBuilder(signers=[pk_c, pk_d], threshold=2),
        fee=1, nonce=0,
    ).build(GenerationBalance({NATIVE_ASSET: 100}, alice), alice.keypair)
    verify(tx, ledger)
    assert ledger.get_multisig_for_account(pk_a) == ([pk_c, pk_d], 2)

    # delete (empty signer set) — must itself be multisig-signed.
    # NOTE nonce stays 0: the reference's verify stores tx.nonce back
    # unchanged (verify.rs:219-221), leaving nonce-increment policy to the
    # state implementation; the mock mirrors lib.rs.
    builder = TransactionBuilder(
        version=1, source=pk_a, data=MultiSigBuilder(signers=[], threshold=0), fee=1, nonce=0
    )
    alice_after = ledger.get_account(pk_a)
    unsigned = builder.build_unsigned(GenerationBalance({NATIVE_ASSET: 99}, alice_after), alice.keypair)
    h = unsigned.hash()
    unsigned.set_multisig([(0, charlie.keypair.sign(h.data)), (1, dave.keypair.sign(h.data))])
    tx2 = unsigned.sign(alice.keypair)
    verify(tx2, ledger)
    assert ledger.get_multisig_for_account(pk_a) is None


def test_multisig_builder_validation():
    alice = Account([(NATIVE_ASSET, 100)])
    ledger, (pk_a,) = _ledger_with(alice)
    from xelis_he_tpu.errors import FormatError

    # threshold > signers
    with pytest.raises(FormatError):
        TransactionBuilder(
            version=1, source=pk_a, data=MultiSigBuilder(signers=[], threshold=1), fee=1, nonce=0
        ).build(GenerationBalance({NATIVE_ASSET: 100}, alice), alice.keypair)
    # source as signer
    with pytest.raises(FormatError):
        TransactionBuilder(
            version=1, source=pk_a, data=MultiSigBuilder(signers=[pk_a], threshold=1), fee=1, nonce=0
        ).build(GenerationBalance({NATIVE_ASSET: 100}, alice), alice.keypair)


# ---------------------------------------------------------------------------
# extra data (lib.rs:951-1029)
# ---------------------------------------------------------------------------


def test_extra_data_roundtrip():
    alice, bob = Account([(NATIVE_ASSET, 100)]), Account([(NATIVE_ASSET, 0)])
    ledger, (pk_a, pk_b) = _ledger_with(alice, bob)
    tx = _transfer_builder(pk_a, pk_b, extra=PlaintextData(b"the quick brown fox")).build(
        GenerationBalance({NATIVE_ASSET: 100}, alice), alice.keypair
    )
    verify_batch([tx], ledger)
    transfer = tx.data[0]
    assert transfer.decrypt_extra_data(bob.keypair.secret(), Role.RECEIVER).data == b"the quick brown fox"
    assert transfer.decrypt_extra_data(alice.keypair.secret(), Role.SENDER).data == b"the quick brown fox"
    # amounts decrypt to the right points for both roles
    assert transfer.decrypt_amount(bob.keypair.secret(), Role.RECEIVER).as_point() == mul_base(10)
    assert transfer.decrypt_amount(alice.keypair.secret(), Role.SENDER).as_point() == mul_base(10)
    # wrong key yields garbage, not the plaintext
    assert transfer.decrypt_extra_data(bob.keypair.secret(), Role.SENDER).data != b"the quick brown fox"


def test_host_crossover(monkeypatch):
    """Small blocks route to the host C++ Pippenger path even when an
    accelerator is passed (verify.py small-batch crossover); results and
    state effects are identical to the device path."""
    monkeypatch.setenv("XELIS_HOST_VERIFY_MAX", "32")
    from xelis_he_tpu.ops.accel import Accelerator

    accel = Accelerator("numpy")
    calls = {"n": 0}
    orig = Accelerator.begin_block_async

    def spy(self, encodings):
        calls["n"] += 1
        return orig(self, encodings)

    monkeypatch.setattr(Accelerator, "begin_block_async", spy)

    alice, bob = Account([(NATIVE_ASSET, 100)]), Account([(NATIVE_ASSET, 0)])
    ledger, (pk_a, pk_b) = _ledger_with(alice, bob)
    tx = _transfer_builder(pk_a, pk_b, amount=10, fee=1).build(
        GenerationBalance({NATIVE_ASSET: 100}, alice), alice.keypair
    )
    verify_batch([tx], ledger, accel=accel)
    assert calls["n"] == 0, "small block must not touch the device pipeline"
    assert ledger.get_bal_decrypted(pk_a, NATIVE_ASSET) == mul_base(89)
    assert ledger.get_bal_decrypted(pk_b, NATIVE_ASSET) == mul_base(10)

    # tampered tx still rejected on the host path
    bad = _transfer_builder(pk_a, pk_b, amount=10, fee=1, nonce=0).build(
        GenerationBalance({NATIVE_ASSET: 89}, alice), alice.keypair
    )
    bad.fee = 2
    with pytest.raises(ProofVerificationError):
        verify_batch([bad], ledger, accel=accel)
