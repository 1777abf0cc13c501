"""Transactional batch verification (SURVEY.md §5 improvement; VERDICT r1
item 10): a failing batch must leave the state UNTOUCHED; a passing batch
must apply identically to the non-transactional path — without the
per-attempt ledger clone the reference requires (lib.rs:296)."""

import copy

import pytest

from xelis_he_tpu import (
    NATIVE_ASSET,
    TransactionBuilder,
    TransferBuilder,
    TransfersBuilder,
)
from xelis_he_tpu.errors import ProofVerificationError
from xelis_he_tpu.mock import Account, GenerationBalance, Ledger
from xelis_he_tpu.pyref.ristretto import mul_base
from xelis_he_tpu.tx.verify import verify_batch


@pytest.fixture(scope="module")
def block():
    ledger = Ledger()
    receiver = Account([(NATIVE_ASSET, 0)])
    pk_r = ledger.add_account(receiver)
    txs = []
    pks = []
    for i in range(2):
        sender = Account([(NATIVE_ASSET, 100)])
        pk_s = ledger.add_account(sender)
        pks.append(pk_s)
        builder = TransactionBuilder(
            version=1,
            source=pk_s,
            data=TransfersBuilder(
                [TransferBuilder(asset=NATIVE_ASSET, amount=10 + i, dest_pubkey=pk_r)]
            ),
            fee=1,
            nonce=0,
        )
        txs.append(
            builder.build(GenerationBalance({NATIVE_ASSET: 100}, sender), sender.keypair)
        )
    return txs, ledger, pk_r, pks


def test_transactional_success_applies(block):
    txs, ledger, pk_r, pks = block
    state = ledger.clone()
    verify_batch(txs, state, transactional=True)
    assert state.get_bal_decrypted(pk_r, NATIVE_ASSET) == mul_base(21)
    assert state.get_bal_decrypted(pks[0], NATIVE_ASSET) == mul_base(100 - 10 - 1)
    assert state.get_account_nonce(pks[0]) == 0  # nonce buffered then applied


def test_transactional_failure_leaves_state_untouched(block):
    txs, ledger, pk_r, pks = block
    bad = copy.deepcopy(txs)
    bad[1].fee = 9  # second tx fails AFTER the first tx's writes
    state = ledger.clone()
    with pytest.raises(ProofVerificationError):
        verify_batch(bad, state, transactional=True)
    # NOTHING applied: balances and nonces identical to the pre-block state
    assert state.get_bal_decrypted(pk_r, NATIVE_ASSET) == mul_base(0)
    for pk in pks:
        assert state.get_bal_decrypted(pk, NATIVE_ASSET) == mul_base(100)
        assert state.get_account_nonce(pk) == 0


def test_non_transactional_failure_mutates(block):
    """Reference-parity default: partial mutation on failure (verify.rs
    writes receiver balances before proof checks)."""
    txs, ledger, pk_r, _ = block
    bad = copy.deepcopy(txs)
    bad[1].fee = 9
    state = ledger.clone()
    with pytest.raises(ProofVerificationError):
        verify_batch(bad, state)
    # the receiver credit of tx0 (and bad tx1) already landed
    assert state.get_bal_decrypted(pk_r, NATIVE_ASSET) != mul_base(0)


def test_transactional_with_accel(block):
    from xelis_he_tpu.ops.accel import Accelerator

    txs, ledger, pk_r, _ = block
    accel = Accelerator("numpy")
    state = ledger.clone()
    verify_batch(txs, state, accel=accel, transactional=True)
    assert state.get_bal_decrypted(pk_r, NATIVE_ASSET) == mul_base(21)

    bad = copy.deepcopy(txs)
    bad[0].fee = 9
    state2 = ledger.clone()
    with pytest.raises(ProofVerificationError):
        verify_batch(bad, state2, accel=accel, transactional=True)
    assert state2.get_bal_decrypted(pk_r, NATIVE_ASSET) == mul_base(0)
