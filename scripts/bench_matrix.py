"""Reference-parity benchmark matrix (criterion configs, SURVEY.md §6 /
/root/reference/benches/tx.rs):

  A. create + verify a single tx with n transfers (tx.rs:10-127)
  B. batch-verify N txs x 1 transfer (tx.rs:129-250)
  C. aggregation stress: M txs x T transfers (tx.rs:231-233; default 16x64,
     pass --full for the reference's 16x255)

Usage: python scripts/bench_matrix.py [--backend jax|numpy|pyref] [--full]
Prints one JSON line per configuration.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_block(n_txs, n_transfers):
    from xelis_he_tpu import (
        NATIVE_ASSET,
        TransactionBuilder,
        TransferBuilder,
        TransfersBuilder,
        build_batch,
    )
    from xelis_he_tpu.mock import Account, GenerationBalance, Ledger

    ledger = Ledger()
    receiver = Account([(NATIVE_ASSET, 0)])
    pk_r = ledger.add_account(receiver)
    jobs = []
    t0 = time.perf_counter()
    for _ in range(n_txs):
        sender = Account([(NATIVE_ASSET, 10_000_000)])
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
        jobs.append(
            (builder, GenerationBalance({NATIVE_ASSET: 10_000_000}, sender), sender.keypair)
        )
    txs = build_batch(jobs)
    build_s = time.perf_counter() - t0
    return txs, ledger, build_s


def build_mixed_block(n_txs):
    """SURVEY §7 configs[4]: a mixed block — 80% plain transfers, 10%
    multi-asset transfers (native + second asset), 10% multisig spends
    (1-of-1 cosigner, config pre-set in the ledger)."""
    import concurrent.futures

    from xelis_he_tpu import (
        Hash,
        NATIVE_ASSET,
        TransactionBuilder,
        TransferBuilder,
        TransfersBuilder,
    )
    from xelis_he_tpu.mock import Account, GenerationBalance, Ledger

    ASSET_2 = Hash(b"\x01" + b"\x00" * 31)
    ledger = Ledger()
    receiver = Account([(NATIVE_ASSET, 0), (ASSET_2, 0)])
    pk_r = ledger.add_account(receiver)
    cosigner = Account([(NATIVE_ASSET, 0)])
    pk_cs = ledger.add_account(cosigner)

    t0 = time.perf_counter()
    jobs = []
    for i in range(n_txs):
        kind = i % 10  # 0-7 plain, 8 multi-asset, 9 multisig spend
        if kind == 8:
            sender = Account([(NATIVE_ASSET, 10_000_000), (ASSET_2, 10_000_000)])
            pk_s = ledger.add_account(sender)
            builder = TransactionBuilder(
                version=1, source=pk_s,
                data=TransfersBuilder(
                    [
                        TransferBuilder(asset=NATIVE_ASSET, amount=10, dest_pubkey=pk_r),
                        TransferBuilder(asset=ASSET_2, amount=20, dest_pubkey=pk_r),
                    ]
                ),
                fee=1, nonce=0,
            )
            bal = GenerationBalance(
                {NATIVE_ASSET: 10_000_000, ASSET_2: 10_000_000}, sender
            )

            def job(builder=builder, bal=bal, kp=sender.keypair):
                return builder.build(bal, kp)

        else:
            sender = Account([(NATIVE_ASSET, 10_000_000)])
            pk_s = ledger.add_account(sender)
            builder = TransactionBuilder(
                version=1, source=pk_s,
                data=TransfersBuilder(
                    [TransferBuilder(asset=NATIVE_ASSET, amount=10, dest_pubkey=pk_r)]
                ),
                fee=1, nonce=0,
            )
            bal = GenerationBalance({NATIVE_ASSET: 10_000_000}, sender)
            if kind == 9:
                ledger.set_multisig_for_account(pk_s, [pk_cs], 1)

                def job(builder=builder, bal=bal, kp=sender.keypair,
                        cs=cosigner.keypair):
                    unsigned = builder.build_unsigned(bal, kp)
                    h = unsigned.hash()
                    unsigned.set_multisig([(0, cs.sign(h.data))])
                    return unsigned.sign(kp)

            else:

                def job(builder=builder, bal=bal, kp=sender.keypair):
                    return builder.build(bal, kp)

        jobs.append(job)

    try:
        from xelis_he_tpu.hashcore.prover_native import lib as _plib
    except Exception:
        _plib = None
    if _plib is not None:
        _plib.xhe_ipp_set_threads(1)
    try:
        first = jobs[0]()
        with concurrent.futures.ThreadPoolExecutor(os.cpu_count() or 2) as ex:
            rest = list(ex.map(lambda j: j(), jobs[1:]))
    finally:
        if _plib is not None:
            _plib.xhe_ipp_set_threads(2)
    txs = [first, *rest]
    build_s = time.perf_counter() - t0
    return txs, ledger, build_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default=os.environ.get("XELIS_BENCH_BACKEND", "jax"))
    ap.add_argument("--full", action="store_true", help="(default now) 16x255 stress")
    ap.add_argument("--small-agg", action="store_true", help="16x64 aggregation instead of 16x255")
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    from xelis_he_tpu.tx.verify import verify_batch

    accel = None
    if args.backend != "pyref":
        from xelis_he_tpu.ops.accel import Accelerator

        accel = Accelerator(args.backend)

    results = []

    def timed_verify(txs, ledger):
        verify_batch(txs, ledger.clone(), accel=accel)  # warmup/compile
        best = float("inf")
        for _ in range(args.iters):
            state = ledger.clone()
            t0 = time.perf_counter()
            verify_batch(txs, state, accel=accel)
            best = min(best, time.perf_counter() - t0)
        return best

    sections = os.environ.get("XELIS_MATRIX_SECTIONS", "A,B,C,M").split(",")

    # A. single tx, n transfers (create + verify); one throwaway build
    # first so the timed number is steady-state (generator chains, packed
    # blobs, and C++ Straus tables are one-time per-process artifacts)
    for n in (1, 2, 4, 8, 16) if "A" in sections else ():
        build_block(1, n)
        txs, ledger, build_s = build_block(1, n)
        best = timed_verify(txs, ledger)
        rec = {
            "config": f"single_tx_{n}_transfers",
            "build_ms": round(build_s * 1000, 2),
            "verify_ms": round(best * 1000, 3),
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)

    # B. batch sizes x 1 transfer (XELIS_MATRIX_BATCHES to override;
    # superset of the reference's criterion matrix incl. its 2500-tx
    # stress and the README's 100-tx baseline config, benches/tx.rs:227-229)
    batches = tuple(
        int(x)
        for x in os.environ.get(
            "XELIS_MATRIX_BATCHES", "1,4,16,64,100,256,1000,2500,10000"
        ).split(",")
    )
    for n in batches if "B" in sections else ():
        txs, ledger, build_s = build_block(n, 1)
        best = timed_verify(txs, ledger)
        rec = {
            "config": f"batch_{n}x1",
            "build_ms_per_tx": round(build_s * 1000 / n, 2),
            "verify_ms_per_tx": round(best * 1000 / n, 4),
            "verify_ms_total": round(best * 1000, 2),
        }
        if n <= 100 and args.backend == "jax":
            # fixed remote-tunnel sync (~20-30 ms/call on axon) dominates
            # small batches; see the tunnel_control row for the raw RTT
            rec["note"] = "includes fixed tunnel RTT; see tunnel_control"
        results.append(rec)
        print(json.dumps(rec), flush=True)

    # M. SURVEY §7 configs[4]: 10k mixed block (80% plain transfers, 10%
    # multi-asset, 10% multisig spends).  Target: within 1.5x of the
    # plain-transfer batch_10000x1 row (VERDICT r4 item 3).
    if "M" in sections:
        n = int(os.environ.get("XELIS_MATRIX_MIXED_TXS", "10000"))
        txs, ledger, build_s = build_mixed_block(n)
        best = timed_verify(txs, ledger)
        rec = {
            "config": f"mixed_{n}",
            "share_multisig": 0.1,
            "share_multiasset": 0.1,
            "build_ms_per_tx": round(build_s * 1000 / n, 2),
            "verify_ms_per_tx": round(best * 1000 / n, 4),
            "verify_ms_total": round(best * 1000, 2),
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)

    # C. aggregation stress (reference's 16 txs x 255 transfers = 256
    # aggregated commitments incl. the source commitment, benches/tx.rs:231)
    if "C" in sections:
        m, t = (16, 64) if args.small_agg else (16, 255)
        txs, ledger, build_s = build_block(m, t)
        best = timed_verify(txs, ledger)
        rec = {
            "config": f"aggregation_{m}x{t}",
            "build_ms_per_tx": round(build_s * 1000 / m, 1),
            "verify_ms_per_tx": round(best * 1000 / m, 3),
            "verify_ms_total": round(best * 1000, 1),
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)

    # D. fold-thread scaling (analog of the reference's 8-worker
    # shard-nothing bench, benches/tx.rs:252-343: the host-side fold work
    # parallelizes across cores; this container exposes 2)
    if "D" in sections:
        n = int(os.environ.get("XELIS_MATRIX_FOLD_TXS", "1000"))
        txs, ledger, _ = build_block(n, 1)
        from xelis_he_tpu.tx import verify as _v

        for threads in (1, 2, 4):
            os.environ["XELIS_FOLD_THREADS"] = str(threads)
            old = getattr(_v._fold_tls, "worker", None)
            if old is not None:  # refund the thread budget before dropping
                old.close()
            _v._fold_tls = type(_v._fold_tls)()  # drop per-thread pools
            best = timed_verify(txs, ledger)
            rec = {
                "config": f"fold_threads_{threads}_{n}x1",
                "host_cores": os.cpu_count(),
                "verify_ms_per_tx": round(best * 1000 / n, 4),
                "verify_ms_total": round(best * 1000, 2),
            }
            if threads > (os.cpu_count() or 2):
                rec["note"] = "threads exceed host cores; row not meaningful"
            results.append(rec)
            print(json.dumps(rec), flush=True)
        os.environ.pop("XELIS_FOLD_THREADS", None)

    # T. tunnel-cost control (VERDICT r3 #7): the fixed host<->device
    # round-trip and small-transfer cost on this backend, so readers can
    # separate engine cost from tunnel artifact in every small-batch row
    # (on the remote axon platform the RTT is ~20-100 ms and is
    # load-bearing in single-tx/small-batch numbers).
    if "T" in sections and args.backend == "jax":
        import numpy as np
        import jax
        import jax.numpy as jnp

        x1 = jnp.zeros((8,), dtype=jnp.uint32)
        np.asarray(x1 + 1)  # warm the trivial program
        rtts = []
        for _ in range(7):
            t0 = time.perf_counter()
            np.asarray(x1 + 1)
            rtts.append(time.perf_counter() - t0)
        rtts.sort()
        xb = jnp.zeros((1024, 1024), dtype=jnp.uint32)  # 4 MB
        np.asarray(xb + 1)
        t0 = time.perf_counter()
        np.asarray(xb + 1)
        big = time.perf_counter() - t0
        rec = {
            "config": "tunnel_control",
            "rtt_ms_p50": round(rtts[len(rtts) // 2] * 1000, 1),
            "rtt_ms_best": round(rtts[0] * 1000, 1),
            "pull_4mb_ms": round(big * 1000, 1),
            "implied_bw_MBps": round(4.0 / max(big - rtts[0], 1e-9), 0),
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
