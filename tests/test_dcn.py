"""2-process data-parallel verification over the jax distributed runtime
(the DCN stand-in): SURVEY.md §2.4 multi-host DP, VERDICT r1 item 6.

Each OS process verifies its round-robin tx shard against its own state
replica (the reference's clone-per-worker shard-nothing pattern,
benches/tx.rs:316-318), then a boolean all-reduce decides the block —
both processes must print the SAME verdict."""

import json
import os
import socket
import subprocess
import sys

import pytest

from xelis_he_tpu import (
    NATIVE_ASSET,
    TransactionBuilder,
    TransferBuilder,
    TransfersBuilder,
)
from xelis_he_tpu.mock import Account, GenerationBalance, Ledger
from xelis_he_tpu.tx.wire import encode_transaction

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "scripts", "dcn_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _build_block(n_txs: int):
    ledger = Ledger()
    receiver = Account([(NATIVE_ASSET, 0)])
    pk_r = ledger.add_account(receiver)
    accounts = [receiver]
    txs = []
    for i in range(n_txs):
        sender = Account([(NATIVE_ASSET, 100)])
        ledger.add_account(sender)
        accounts.append(sender)
        pk_s = sender.keypair.pubkey().compress()
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
    return txs, accounts


def _dump_block(txs, accounts, path):
    blob = {
        "accounts": [
            {
                "secret": hex(a.keypair.secret().scalar),
                "balance_ct": a.balances[NATIVE_ASSET].compress().data.hex(),
                "nonce": a.nonce,
            }
            for a in accounts
        ],
        "txs": [encode_transaction(tx).hex() for tx in txs],
    }
    with open(path, "w") as f:
        json.dump(blob, f)


def _run_workers(block_path: str) -> list[str]:
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)  # one device per process
    # the axon sitecustomize registers the tunneled-TPU backend whenever
    # PALLAS_AXON_POOL_IPS is set — two worker processes would then contend
    # for the single tunnel and hang; this test is CPU-only by design
    env.pop("PALLAS_AXON_POOL_IPS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, block_path, coord, "2", str(i)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            env=env,
            text=True,
        )
        for i in range(2)
    ]
    verdicts = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker failed: {err[-2000:]}"
        verdicts.append(out.strip().splitlines()[-1])
    return verdicts


@pytest.mark.parametrize("tamper", [False, True])
def test_two_process_block_verification(tmp_path, tamper):
    txs, accounts = _build_block(4)
    if tamper:
        # break a tx on process 1's shard (round-robin index 1)
        txs[1].fee = 7
    path = str(tmp_path / "block.json")
    _dump_block(txs, accounts, path)
    verdicts = _run_workers(path)
    expected = "REJECT" if tamper else "ACCEPT"
    assert verdicts == [expected, expected], verdicts
