"""Sweep XELIS_VERIFY_CHUNK_TXS (and optionally other env knobs) over one
pre-built block to find the best host/device overlap point at large
batches.  The knob is read per verify_batch call, so one process sweeps
every value against the same block with warm caches.

    python scripts/sweep_chunks.py [n_txs] [chunk,chunk,...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_txs = int(sys.argv[1]) if len(sys.argv) > 1 else 2500
    chunks = (
        [int(c) for c in sys.argv[2].split(",")]
        if len(sys.argv) > 2
        else [334, 512, 840, 1250, 2500]
    )
    iters = int(os.environ.get("XELIS_SWEEP_ITERS", "3"))

    from xelis_he_tpu import (
        NATIVE_ASSET,
        TransactionBuilder,
        TransferBuilder,
        TransfersBuilder,
        build_batch,
        verify_batch,
    )
    from xelis_he_tpu.mock import Account, GenerationBalance, Ledger
    from xelis_he_tpu.ops.accel import Accelerator

    accel = Accelerator("jax")
    ledger = Ledger()
    recv = Account([(NATIVE_ASSET, 0)])
    pk_r = ledger.add_account(recv)
    jobs = []
    for _ in range(n_txs):
        s = Account([(NATIVE_ASSET, 1_000_000)])
        pk_s = ledger.add_account(s)
        b = TransactionBuilder(
            version=1,
            source=pk_s,
            data=TransfersBuilder(
                [TransferBuilder(asset=NATIVE_ASSET, amount=10, dest_pubkey=pk_r)]
            ),
            fee=1,
            nonce=0,
        )
        jobs.append((b, GenerationBalance({NATIVE_ASSET: 1_000_000}, s), s.keypair))
    t0 = time.time()
    txs = build_batch(jobs)
    print(f"built {n_txs} txs in {time.time() - t0:.1f}s", flush=True)

    verify_batch(txs, ledger.clone(), accel=accel)  # warmup/compile

    import gc

    gc.collect()
    gc.freeze()

    for chunk in chunks:
        os.environ["XELIS_VERIFY_CHUNK_TXS"] = str(chunk)
        times = []
        for _ in range(iters):
            st = ledger.clone()
            t0 = time.time()
            verify_batch(txs, st, accel=accel)
            times.append(time.time() - t0)
        best = min(times) * 1000
        print(
            f"chunk={chunk}: best {best:.1f} ms total, "
            f"{best / n_txs:.4f} ms/tx (all: "
            + ", ".join(f"{t * 1000:.0f}" for t in times)
            + ")",
            flush=True,
        )


if __name__ == "__main__":
    main()
