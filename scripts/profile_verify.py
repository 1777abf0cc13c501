"""Profiling harness: builds (or loads a cached) tx batch, runs verify_batch
with metrics spans, prints a breakdown.  Not part of the library surface.

Usage: python scripts/profile_verify.py [n_txs] [n_transfers]
Cache: /tmp/xelis_profile_batch_{n}x{t}.pkl
"""

import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def get_batch(n_txs: int, n_transfers: int):
    path = f"/tmp/xelis_profile_batch_{n_txs}x{n_transfers}.pkl"
    if os.path.exists(path):
        with open(path, "rb") as f:
            return pickle.load(f)

    from xelis_he_tpu import (
        NATIVE_ASSET,
        TransactionBuilder,
        TransferBuilder,
        TransfersBuilder,
    )
    from xelis_he_tpu.mock import Account, GenerationBalance, Ledger

    ledger = Ledger()
    receiver = Account([(NATIVE_ASSET, 0)])
    pk_r = ledger.add_account(receiver)
    txs = []
    t0 = time.time()
    for i in range(n_txs):
        sender = Account([(NATIVE_ASSET, 1_000_000)])
        pk_s = ledger.add_account(sender)
        builder = TransactionBuilder(
            version=1,
            source=pk_s,
            data=TransfersBuilder(
                [
                    TransferBuilder(asset=NATIVE_ASSET, amount=10 + j, dest_pubkey=pk_r)
                    for j in range(n_transfers)
                ]
            ),
            fee=1,
            nonce=0,
        )
        txs.append(
            builder.build(GenerationBalance({NATIVE_ASSET: 1_000_000}, sender), sender.keypair)
        )
        if (i + 1) % 50 == 0:
            print(f"  built {i+1}/{n_txs} ({time.time()-t0:.1f}s)", file=sys.stderr)
    with open(path, "wb") as f:
        pickle.dump((txs, ledger), f)
    return txs, ledger


def main():
    n_txs = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    n_transfers = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    iters = int(os.environ.get("ITERS", "3"))

    txs, ledger = get_batch(n_txs, n_transfers)
    print(f"batch ready: {n_txs}x{n_transfers}", file=sys.stderr)

    from xelis_he_tpu.metrics import metrics
    from xelis_he_tpu.ops.accel import Accelerator
    from xelis_he_tpu.tx.verify import verify_batch

    accel = Accelerator(os.environ.get("BACKEND", "jax"))

    t0 = time.time()
    verify_batch(txs, ledger.clone(), accel=accel)
    print(f"warmup: {time.time()-t0:.1f}s", file=sys.stderr)

    import json

    best = float("inf")
    for i in range(iters):
        metrics.reset()
        state = ledger.clone()
        t0 = time.time()
        verify_batch(txs, state, accel=accel)
        dt = time.time() - t0
        best = min(best, dt)
        snap = metrics.snapshot()
        print(f"iter {i}: {dt*1000:.1f} ms total ({dt*1000/n_txs:.3f} ms/tx)")
        for k, v in sorted(snap["span_seconds"].items()):
            print(f"    {k}: {v*1000:.1f} ms")
    print(json.dumps({"best_ms_per_tx": best * 1000 / n_txs}))


if __name__ == "__main__":
    main()
