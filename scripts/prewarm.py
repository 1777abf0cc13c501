"""Populate the persistent XLA compile cache for the standard verification
shape buckets (VERDICT r2 item 4).

Shapes are power-of-two bucketed (ops/accel.py), so one pass per bucket
persists every program the production batch sizes hit; later cold processes
pay only trace+lower+cache-load (~10-20 s/program) instead of full XLA/
Mosaic compiles.  Run once per machine/toolchain:

    python scripts/prewarm.py [batch sizes...]      # default: 16 1000

Note: cache entries are keyed by backend fingerprint; TPU entries are
portable across processes on the same runtime, while XLA:CPU AOT entries
may be rejected across hosts with differing detected CPU features.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sizes = [int(a) for a in sys.argv[1:] if a.isdigit()] or [16, 1000]

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
    for n in sizes:
        ledger = Ledger()
        receiver = Account([(NATIVE_ASSET, 0)])
        pk_r = ledger.add_account(receiver)
        jobs = []
        for _ in range(n):
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
        txs = build_batch(jobs)
        t0 = time.time()
        verify_batch(txs, ledger.clone(), accel=accel)
        print(f"prewarmed {n}-tx shapes in {time.time() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
