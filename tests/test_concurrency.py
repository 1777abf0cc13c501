"""Concurrent verify_batch safety.

The reference library is &mut-single-threaded by construction; this rebuild's
batch verifier is explicitly parallel (VERDICT r1 item 8): the decompression
caches, the block-lazy flag (types.py), the accelerator's block context, and
the native fold worker pool are all per-thread, so independent verify_batch
calls may run concurrently in one process sharing one Accelerator.
"""

import threading

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


def _build_block(n_txs: int, amount0: int):
    ledger = Ledger()
    receiver = Account([(NATIVE_ASSET, 0)])
    pk_r = ledger.add_account(receiver)
    txs = []
    for i in range(n_txs):
        sender = Account([(NATIVE_ASSET, 100)])
        pk_s = ledger.add_account(sender)
        builder = TransactionBuilder(
            version=1,
            source=pk_s,
            data=TransfersBuilder(
                [TransferBuilder(asset=NATIVE_ASSET, amount=amount0 + i, dest_pubkey=pk_r)]
            ),
            fee=1,
            nonce=0,
        )
        txs.append(
            builder.build(GenerationBalance({NATIVE_ASSET: 100}, sender), sender.keypair)
        )
    return txs, ledger, pk_r


def test_concurrent_verify_batch_shared_accelerator():
    """Two verify_batch calls on DIFFERENT blocks run concurrently in two
    threads, sharing one Accelerator; both must verify and apply correctly."""
    accel = Accelerator("numpy")
    blocks = [_build_block(2, 10), _build_block(2, 30)]
    errors: list = [None, None]
    states = [ledger.clone() for _, ledger, _ in blocks]

    barrier = threading.Barrier(2)

    def run(k):
        try:
            barrier.wait(timeout=30)
            txs, _, _ = blocks[k]
            # several rounds to widen the interleaving window
            for _ in range(3):
                verify_batch(txs, blocks[k][1].clone(), accel=accel)
            verify_batch(txs, states[k], accel=accel)
        except BaseException as e:  # pragma: no cover - failure reporting
            errors[k] = e

    threads = [threading.Thread(target=run, args=(k,)) for k in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert errors == [None, None], f"concurrent verify failed: {errors}"
    for k, (txs, _, pk_r) in enumerate(blocks):
        expected = sum(10 + 20 * k + i for i in range(2))
        assert states[k].get_bal_decrypted(pk_r, NATIVE_ASSET) == mul_base(expected)


def test_concurrent_one_valid_one_tampered():
    """A failing batch in one thread must not poison a valid batch verifying
    concurrently in another thread."""
    import copy

    accel = Accelerator("numpy")
    good_txs, good_ledger, pk_r = _build_block(2, 10)
    bad_txs, bad_ledger, _ = _build_block(2, 10)
    bad_txs = copy.deepcopy(bad_txs)
    bad_txs[0].fee = 2  # breaks the signature + sigma statement

    results: dict = {}
    barrier = threading.Barrier(2)

    def run_good():
        barrier.wait(timeout=30)
        state = good_ledger.clone()
        verify_batch(good_txs, state, accel=accel)
        results["good"] = state.get_bal_decrypted(pk_r, NATIVE_ASSET)

    def run_bad():
        barrier.wait(timeout=30)
        with pytest.raises(ProofVerificationError):
            verify_batch(bad_txs, bad_ledger.clone(), accel=accel)
        results["bad"] = "raised"

    threads = [threading.Thread(target=run_good), threading.Thread(target=run_bad)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert results.get("bad") == "raised"
    assert results.get("good") == mul_base(21)
