"""End-to-end verify_batch through the fused accelerator path (numpy
backend: same code path as the TPU jit, without compiles)."""

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
from xelis_he_tpu.ops.accel import Accelerator
from xelis_he_tpu.pyref.ristretto import mul_base
from xelis_he_tpu.tx.verify import verify_batch


@pytest.fixture(scope="module")
def block():
    ledger = Ledger()
    receiver = Account([(NATIVE_ASSET, 0)])
    pk_r = ledger.add_account(receiver)
    txs = []
    for i in range(2):
        sender = Account([(NATIVE_ASSET, 100)])
        pk_s = ledger.add_account(sender)
        builder = TransactionBuilder(
            version=1,
            source=pk_s,
            data=TransfersBuilder(
                [TransferBuilder(asset=NATIVE_ASSET, amount=10 + i, dest_pubkey=pk_r)]
            ),
            fee=1,
            nonce=0,
        )
        txs.append(builder.build(GenerationBalance({NATIVE_ASSET: 100}, sender), sender.keypair))
    return txs, ledger, pk_r


@pytest.fixture(scope="module")
def accel():
    return Accelerator("numpy")


def test_fused_verify_and_balances(block, accel):
    txs, ledger, pk_r = block
    state = ledger.clone()
    verify_batch(txs, state, accel=accel)
    assert state.get_bal_decrypted(pk_r, NATIVE_ASSET) == mul_base(21)


def test_fused_rejects_bad_signature(block, accel):
    txs, ledger, _ = block
    bad = copy.deepcopy(txs)
    bad[1].signature.s = (bad[1].signature.s + 1) % (2**252 + 27742317777372353535851937790883648493)
    with pytest.raises(ProofVerificationError):
        verify_batch(bad, ledger.clone(), accel=accel)


def test_fused_rejects_tampered_fee(block, accel):
    txs, ledger, _ = block
    bad = copy.deepcopy(txs)
    bad[0].fee = 2
    with pytest.raises(ProofVerificationError):
        verify_batch(bad, ledger.clone(), accel=accel)


def test_fused_rejects_tampered_range_proof(block, accel):
    from xelis_he_tpu.bulletproofs.range_proof import RangeProof

    txs, ledger, _ = block
    bad = copy.deepcopy(txs)
    rb = bytearray(bad[0].range_proof.to_bytes())
    rb[33] ^= 1
    bad[0].range_proof = RangeProof.from_bytes(bytes(rb))
    with pytest.raises(ProofVerificationError):
        verify_batch(bad, ledger.clone(), accel=accel)
