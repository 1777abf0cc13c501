"""Profile the host side of verify_batch (device dispatch is async, so
cProfile shows almost pure host work).  Usage:
    python scripts/profile_verify.py [n_txs] [backend]
"""

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_txs = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    backend = sys.argv[2] if len(sys.argv) > 2 else "jax"

    from xelis_he_tpu import (
        NATIVE_ASSET,
        TransactionBuilder,
        TransferBuilder,
        TransfersBuilder,
        verify_batch,
    )
    from xelis_he_tpu.mock import Account, GenerationBalance, Ledger
    from xelis_he_tpu.ops.accel import Accelerator

    accel = Accelerator(backend)
    ledger = Ledger()
    receiver = Account([(NATIVE_ASSET, 0)])
    pk_r = ledger.add_account(receiver)
    txs = []
    for i in range(n_txs):
        sender = Account([(NATIVE_ASSET, 1000)])
        pk_s = ledger.add_account(sender)
        b = TransactionBuilder(
            version=1, source=pk_s,
            data=TransfersBuilder([TransferBuilder(asset=NATIVE_ASSET, amount=10, dest_pubkey=pk_r)]),
            fee=1, nonce=0,
        )
        txs.append(b.build(GenerationBalance({NATIVE_ASSET: 1000}, sender), sender.keypair))
    print(f"built {n_txs} txs", file=sys.stderr)

    # warmup (compiles)
    verify_batch(txs, ledger.clone(), accel=accel)
    t0 = time.time()
    verify_batch(txs, ledger.clone(), accel=accel)
    print(f"warm verify: {(time.time()-t0)*1000:.1f} ms", file=sys.stderr)

    pr = cProfile.Profile()
    state = ledger.clone()
    pr.enable()
    verify_batch(txs, state, accel=accel)
    pr.disable()
    s = io.StringIO()
    ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
    ps.print_stats(45)
    print(s.getvalue())


if __name__ == "__main__":
    main()
