"""Worker process for the 2-process DCN verification test (tests/test_dcn.py).

Loads a serialized block + ledger state, joins the jax distributed runtime,
verifies its round-robin tx shard, and participates in the boolean
all-reduce accept.  Prints ACCEPT or REJECT (identical on every process).

argv: block.json coordinator_address num_processes process_id
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# CPU backend, one local device per process
os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main():
    path, coord, num_procs, proc_id = (
        sys.argv[1],
        sys.argv[2],
        int(sys.argv[3]),
        int(sys.argv[4]),
    )

    from xelis_he_tpu.parallel.dcn import init_process, verify_batch_distributed

    init_process(coord, num_procs, proc_id)

    from xelis_he_tpu import NATIVE_ASSET
    from xelis_he_tpu.elgamal import ElGamalKeypair
    from xelis_he_tpu.mock import Account, Ledger
    from xelis_he_tpu.tx.wire import decode_transaction
    from xelis_he_tpu.types import CompressedCiphertext

    blob = json.load(open(path))
    state = Ledger()
    for acc in blob["accounts"]:
        a = object.__new__(Account)
        a.keypair = ElGamalKeypair.keygen_with_secret(int(acc["secret"], 16))
        a.balances = {
            NATIVE_ASSET: CompressedCiphertext.from_bytes(
                bytes.fromhex(acc["balance_ct"])
            ).decompress()
        }
        a.nonce = acc["nonce"]
        state.add_account(a)

    txs = [decode_transaction(bytes.fromhex(w)) for w in blob["txs"]]
    ok = verify_batch_distributed(txs, state)
    print("ACCEPT" if ok else "REJECT", flush=True)


if __name__ == "__main__":
    main()
