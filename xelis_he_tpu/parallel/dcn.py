"""Multi-host data parallelism over DCN: shard-nothing block verification.

Scaling design (SURVEY.md §2.4): the ICI axis shards the MSM *lane*
dimension inside one slice (parallel.mesh / the accelerator's phase
shardings); the DCN axis shards the *transaction batch* across hosts.  The
two compose: each host (or slice) verifies its tx sub-batch with its own
fused MSMs over ICI, then a single boolean all-reduce over DCN decides the
block accept — this is the TPU-native analog of the reference's 8-thread
shard-nothing bench (/root/reference/benches/tx.rs:252-343), with the
cloned-ledger-per-thread pattern (benches/tx.rs:316-318) becoming a state
replica per process.

Sharding policy: sub-batches must be closed under intra-block dependencies
(a tx spending an output of an earlier tx in the same block must land on
the same shard); ``shard_round_robin`` below is correct for the common
independent-sender block shape, and callers with dependent txs group by
account first.

Why a boolean all-reduce (and not sharded state merge): verification is
accept/reject — state application is deterministic replay
(``apply_without_verify``) that every node performs independently after
consensus, exactly as reference callers do (lib.rs:908-910).

Multi-process usage (one process per host; also works single-process):

    init_process(coordinator, num_processes, process_id)   # jax.distributed
    ok = verify_batch_distributed(all_txs, state, accel=accel)

Tested by tests/test_dcn.py with 2 OS processes on the CPU backend — the
all-reduce crosses a real process boundary through the jax distributed
runtime (the DCN stand-in).
"""

from __future__ import annotations

from ..tx.verify import verify_batch

AXIS = "dp"


def init_process(coordinator_address: str, num_processes: int, process_id: int) -> None:
    """Join the multi-process jax runtime (call once per process, before
    any other jax use).  On real pods the env-based auto-init usually
    suffices; this explicit form is what the 2-process CPU test uses."""
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def shard_round_robin(txs: list, process_index: int, num_processes: int) -> list:
    """Deterministic tx sub-batch for this process (independent-sender
    blocks; dependency-aware callers pre-group instead)."""
    return txs[process_index::num_processes]


def all_reduce_accept(local_ok: bool) -> bool:
    """Boolean AND across every process via one psum over the global device
    set.  Each process contributes its flag from its first local device;
    the reduction rides the jax distributed runtime (DCN on real pods)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devices = np.asarray(jax.devices())
    mesh = Mesh(devices, (AXIS,))

    n = devices.size
    # one flag lane per device: local devices carry this process's flag
    local_flags = [
        jax.device_put(jnp.asarray([jnp.uint32(local_ok)]), d)
        for d in jax.local_devices()
    ]
    global_flags = jax.make_array_from_single_device_arrays(
        (n,), NamedSharding(mesh, P(AXIS)), local_flags
    )

    def _reduce(flags):
        return lax.psum(flags, AXIS)

    summed = jax.jit(
        jax.shard_map(_reduce, mesh=mesh, in_specs=P(AXIS), out_specs=P(AXIS)),
    )(global_flags)
    # every device holds the same sum; read the local shard
    total = int(np.asarray(summed.addressable_shards[0].data)[0])
    return total == n


def verify_batch_distributed(
    txs: list,
    state,
    accel=None,
    process_index: int | None = None,
    num_processes: int | None = None,
) -> bool:
    """Verify ``txs`` sharded across processes; True iff EVERY shard
    verified.  ``state`` is this process's replica (mutated by its own
    shard only, reference clone-per-worker semantics)."""
    import jax

    if process_index is None:
        process_index = jax.process_index()
    if num_processes is None:
        num_processes = jax.process_count()

    local = shard_round_robin(txs, process_index, num_processes)
    ok = True
    if local:
        try:
            verify_batch(local, state, accel=accel)
        except Exception:
            ok = False
    return all_reduce_accept(ok)
