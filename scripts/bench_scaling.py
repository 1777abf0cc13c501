"""SPMD scaling curve on the emulated CPU mesh (VERDICT r3 #10).

Real multi-chip hardware is unavailable in this environment, so this
measures RELATIVE scaling of the sharded verify_batch across 1/2/4/8
virtual CPU devices — the mesh/collective design's efficiency number, not
an absolute throughput (the CPU jnp engine is orders slower than the TPU
Pallas path).  Each device count runs in a fresh subprocess because
--xla_force_host_platform_device_count is process-global.

Usage: python scripts/bench_scaling.py [n_txs]   (default 256)
Prints one JSON line per device count with ms/tx and efficiency vs 1 dev.
"""

import json
import os
import subprocess
import sys

_CHILD = """
import os, sys, time, json
sys.path.insert(0, %(repo)r)
os.environ["XELIS_HOST_VERIFY_MAX"] = "0"
import jax
from xelis_he_tpu import (NATIVE_ASSET, TransactionBuilder, TransferBuilder,
                          TransfersBuilder, build_batch, verify_batch)
from xelis_he_tpu.mock import Account, GenerationBalance, Ledger
from xelis_he_tpu.ops.accel import Accelerator
from xelis_he_tpu.parallel.mesh import make_mesh

d = %(devices)d
n = %(n_txs)d
mesh = make_mesh(d, devices=jax.devices("cpu")[:d]) if d > 1 else None
accel = Accelerator("jax", mesh=mesh)
ledger = Ledger()
receiver = Account([(NATIVE_ASSET, 0)])
pk_r = ledger.add_account(receiver)
jobs = []
for i in range(n):
    s = Account([(NATIVE_ASSET, 1000)])
    pk = ledger.add_account(s)
    jobs.append((TransactionBuilder(version=1, source=pk,
        data=TransfersBuilder([TransferBuilder(asset=NATIVE_ASSET, amount=10,
                                               dest_pubkey=pk_r)]),
        fee=1, nonce=0), GenerationBalance({NATIVE_ASSET: 1000}, s), s.keypair))
txs = build_batch(jobs)
verify_batch(txs, ledger.clone(), accel=accel)  # warmup/compile
best = 1e9
for _ in range(%(iters)d):
    st = ledger.clone()
    t0 = time.time()
    verify_batch(txs, st, accel=accel)
    best = min(best, time.time() - t0)
print(json.dumps({"devices": d, "ms_per_tx": round(best * 1000 / n, 3)}))
"""


def main():
    n_txs = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    iters = int(os.environ.get("XELIS_SCALING_ITERS", "3"))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    base = None
    for d in (1, 2, 4, 8):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={d}"
        )
        code = _CHILD % {"repo": repo, "devices": d, "n_txs": n_txs,
                         "iters": iters}
        out = subprocess.run(
            [sys.executable, "-c", code], env=env, capture_output=True,
            text=True, timeout=3000,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if not line:
            print(json.dumps({"devices": d, "error": out.stderr[-400:]}))
            continue
        rec = json.loads(line[-1])
        if base is None:
            base = rec["ms_per_tx"]
        rec["speedup"] = round(base / rec["ms_per_tx"], 3)
        rec["efficiency"] = round(base / rec["ms_per_tx"] / d, 3)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
