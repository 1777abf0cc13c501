"""Transaction verification + state application (verifier pipeline).

Mirrors /root/reference/src/tx/verify.rs: the
``BlockchainVerificationState`` protocol, nonce/signature/multisig checks,
per-asset CommitmentEqProof and per-transfer CiphertextValidityProof
collection into a shared sigma BatchCollector, and batched range proof
verification — whole-block verification costs exactly TWO multiscalar
multiplications (one sigma, one range mega-MSM), which the TPU engine runs
as fused kernels.

Parity notes:
- state mutations are interleaved with proof collection exactly as in the
  reference (verify.rs:294-341, 343-395), so a failing batch leaves state
  partially mutated; callers pass a snapshot/clone (lib.rs:296).
- an out-of-range multisig signer index is silently skipped, matching the
  reference's behavior (verify.rs:276).
"""

from __future__ import annotations

import os
from typing import Protocol

from ..bulletproofs.generators import BP_GENS, PC_GENS
from ..bulletproofs.range_proof import RangeProof
from ..elgamal import DecryptHandle, ElGamalCiphertext, PedersenCommitment
from ..errors import (
    DecompressionError,
    InvalidNonceError,
    ProofVerificationError,
    StateError,
)
from ..hashcore.blake3 import blake3
from ..ops.fe import NLIMBS as NLIMBS_
from ..pyref.ristretto import IDENTITY, multiscalar_mul
from ..sigma import BatchCollector
from ..types import CompressedCiphertext, CompressedPubkey, Hash, NATIVE_ASSET, Role
from .builder import prepare_transcript
from .model import BurnPayload, MultiSigPayload, SmartContractCall, Transaction, Transfer

_IDENTITY_COMPRESSED = b"\x00" * 32


class BlockchainVerificationState(Protocol):
    """Verifier-side state abstraction (verify.rs:25-77)."""

    def get_account_balance(self, account: CompressedPubkey, asset: Hash, role: Role): ...

    def update_account_balance(
        self, account: CompressedPubkey, asset: Hash, new_ct, role: Role
    ) -> None: ...

    def get_account_nonce(self, account: CompressedPubkey) -> int: ...

    def update_account_nonce(self, account: CompressedPubkey, new_nonce: int) -> None: ...

    def set_output_ciphertext(self, account: CompressedPubkey, asset: Hash, ct) -> None: ...

    def set_multisig_for_account(
        self, account: CompressedPubkey, signers: list, threshold: int
    ) -> None: ...

    def get_multisig_for_account(self, account: CompressedPubkey): ...


class _DecompressedTransferCt:
    __slots__ = ("amount_commitment", "amount_sender_handle", "amount_receiver_handle")

    def __init__(self, transfer: Transfer):
        self.amount_commitment = transfer.amount_commitment.decompress()
        self.amount_sender_handle = transfer.amount_sender_handle.decompress()
        self.amount_receiver_handle = transfer.amount_receiver_handle.decompress()

    def get_ciphertext(self, role: Role) -> ElGamalCiphertext:
        handle = (
            self.amount_receiver_handle if role == Role.RECEIVER else self.amount_sender_handle
        )
        return ElGamalCiphertext(self.amount_commitment, handle)


def _get_sender_output_ct(tx: Transaction, asset: Hash, decompressed_transfers) -> ElGamalCiphertext:
    """Total spend ciphertext for one asset (verify.rs:104-144)."""
    bal = ElGamalCiphertext.zero()
    if asset.is_zeros():
        bal = bal + tx.fee
    data = tx.data
    if isinstance(data, list):
        for transfer, d in zip(data, decompressed_transfers):
            if asset == transfer.asset:
                bal = bal + d.get_ciphertext(Role.SENDER)
    elif isinstance(data, BurnPayload):
        if asset == data.asset:
            bal = bal + data.amount
    elif isinstance(data, SmartContractCall):
        amount = data.assets.get(asset)
        if amount is not None:
            bal = bal + amount
    return bal


def _verify_commitment_assets(tx: Transaction) -> bool:
    """Native commitment mandatory, no duplicates, every used asset covered
    (verify.rs:160-199)."""
    commitment_assets = [c.asset for c in tx.new_source_commitments]
    if NATIVE_ASSET not in commitment_assets:
        return False
    if len(set(commitment_assets)) != len(commitment_assets):
        return False
    covered = set(commitment_assets)
    data = tx.data
    if isinstance(data, list):
        return all(t.asset in covered for t in data)
    if isinstance(data, BurnPayload):
        return data.asset in covered
    if isinstance(data, SmartContractCall):
        return all(a in covered for a in data.assets)
    return True


def pre_verify(
    tx: Transaction,
    state: BlockchainVerificationState,
    sigma_batch_collector: BatchCollector,
    sig_entries: list | None = None,
    tx_bytes_pair: tuple[bytes, int] | None = None,
):
    """verify.rs:201-485.  Returns (transcript, value_commitments) where
    value_commitments is the list of compressed commitment bytes for the
    range proof, identity-padded to a power of two.

    When ``sig_entries`` is given (batch path), signature checks are
    DEFERRED: (signature, pubkey_point, pubkey_compressed, message) tuples
    are appended for one fused device verification at the end of the batch
    (batch failure is transactional either way)."""
    account_nonce = state.get_account_nonce(tx.source)
    if account_nonce != tx.nonce:
        raise InvalidNonceError(f"expected {account_nonce}, got {tx.nonce}")
    state.update_account_nonce(tx.source, tx.nonce)

    if not _verify_commitment_assets(tx):
        raise ProofVerificationError("format", "commitment assets")

    transfers = tx.data if isinstance(tx.data, list) else []
    transfers_decompressed = [_DecompressedTransferCt(t) for t in transfers]

    new_source_commitments_decompressed = [
        c.new_source_commitment.decompress() for c in tx.new_source_commitments
    ]

    source_decompressed = tx.source.decompress()

    transcript = prepare_transcript(tx.version, tx.source, tx.fee, tx.nonce)

    # 0. Signature (verify.rs:252-256)
    tx_bytes, multisig_offset = tx_bytes_pair or tx.to_bytes()
    if sig_entries is not None:
        # pubkey as bytes: the fused check gathers its limbs from the block's
        # device-resident decompression
        sig_entries.append((tx.signature, tx.source.data, tx.source, tx_bytes))
    elif not tx.signature.verify(tx_bytes, source_decompressed):
        raise ProofVerificationError("signature")

    # Multisig config consistency + signatures (verify.rs:258-292)
    multisig_config = state.get_multisig_for_account(tx.source)
    if multisig_config is not None:
        signers, threshold = multisig_config
        signatures = tx.get_multisig()
        if signatures is None:
            raise ProofVerificationError("format", "state requires multisig")
        if len(signatures) == 0 or len(signatures) != threshold:
            raise ProofVerificationError("format", "multisig signature count")
        h = blake3(tx_bytes[:multisig_offset])
        seen_indices = set()
        for index, signature in signatures:
            if index in seen_indices:
                raise ProofVerificationError("format", "duplicate multisig signer")
            seen_indices.add(index)
            if index < len(signers):
                if sig_entries is not None:
                    sig_entries.append(
                        (signature, signers[index].data, signers[index], h)
                    )
                elif not signature.verify(h, signers[index].decompress()):
                    raise ProofVerificationError("signature", "multisig")
            # NOTE: out-of-range index silently skipped (reference parity,
            # verify.rs:276)
    elif tx.get_multisig() is not None:
        raise ProofVerificationError("format", "unexpected multisig")

    # 1. CommitmentEqProofs (verify.rs:294-341)
    for commitment, new_source_commitment in zip(
        tx.new_source_commitments, new_source_commitments_decompressed
    ):
        source_current_ciphertext = state.get_account_balance(
            tx.source, commitment.asset, Role.SENDER
        )

        output = _get_sender_output_ct(tx, commitment.asset, transfers_decompressed)
        new_ct = source_current_ciphertext - output

        transcript.new_commitment_eq_proof_domain_separator()
        transcript.append_hash(b"new_source_commitment_asset", commitment.asset)
        transcript.append_commitment(b"new_source_commitment", commitment.new_source_commitment)

        commitment.new_commitment_eq_proof.pre_verify(
            source_decompressed,
            new_ct,
            new_source_commitment,
            transcript,
            sigma_batch_collector,
        )

        state.update_account_balance(tx.source, commitment.asset, new_ct, Role.SENDER)
        state.set_output_ciphertext(tx.source, commitment.asset, output)

    # 2. CiphertextValidityProofs / burn / multisig payload (verify.rs:343-430)
    data = tx.data
    if isinstance(data, list):
        for transfer, decompressed in zip(data, transfers_decompressed):
            receiver = transfer.dest_pubkey.decompress()

            current_balance = state.get_account_balance(
                transfer.dest_pubkey, transfer.asset, Role.RECEIVER
            )
            receiver_ct = decompressed.get_ciphertext(Role.RECEIVER)
            receiver_new_balance = current_balance + receiver_ct
            state.update_account_balance(
                transfer.dest_pubkey,
                transfer.asset,
                receiver_new_balance,
                Role.RECEIVER,
            )

            transcript.transfer_proof_domain_separator()
            transcript.append_pubkey(b"dest_pubkey", transfer.dest_pubkey)
            transcript.append_commitment(b"amount_commitment", transfer.amount_commitment)
            transcript.append_handle(b"amount_sender_handle", transfer.amount_sender_handle)
            transcript.append_handle(b"amount_receiver_handle", transfer.amount_receiver_handle)

            transfer.ct_validity_proof.pre_verify(
                decompressed.amount_commitment,
                receiver,
                source_decompressed,
                decompressed.amount_receiver_handle,
                decompressed.amount_sender_handle,
                transcript,
                sigma_batch_collector,
            )
    elif isinstance(data, BurnPayload):
        transcript.burn_proof_domain_separator()
        transcript.append_hash(b"asset", data.asset)
        transcript.append_u64(b"amount", data.amount)
    elif isinstance(data, MultiSigPayload):
        if data.threshold > len(data.signers) or (data.signers and data.threshold == 0):
            raise ProofVerificationError("format", "multisig threshold")
        if len({s.data for s in data.signers}) != len(data.signers):
            raise ProofVerificationError("format", "duplicate multisig signer")
        if any(s == tx.source for s in data.signers):
            raise ProofVerificationError("format", "source in multisig")
        transcript.multisig_proof_domain_separator()
        transcript.append_u64(b"threshold", data.threshold)
        for signer in data.signers:
            transcript.append_pubkey(b"signer", signer)
        state.set_multisig_for_account(tx.source, data.signers, data.threshold)

    # Assemble value commitments for the range proof, identity-padded to a
    # power of two (verify.rs:432-478)
    value_commitments = [c.new_source_commitment.data for c in tx.new_source_commitments]
    if isinstance(data, list):
        value_commitments.extend(t.amount_commitment.data for t in data)
    n_commitments = len(value_commitments)
    next_pow2 = 1 << (n_commitments - 1).bit_length() if n_commitments > 1 else 1
    value_commitments.extend([_IDENTITY_COMPRESSED] * (next_pow2 - n_commitments))

    return transcript, value_commitments


def _collect_compressed(txs: list[Transaction]) -> list[bytes]:
    """All 32-byte encodings a block's verification will decompress; used to
    seed the decompression cache from ONE fused device call."""
    seen: dict[bytes, None] = {}

    def put(b: bytes):
        seen.setdefault(b, None)

    # identity first: dud/padding commitments resolve to a block row like
    # every other lane (the identity encoding decompresses validly)
    put(b"\x00" * 32)
    for tx in txs:
        put(tx.source.data)
        for c in tx.new_source_commitments:
            put(c.new_source_commitment.data)
            p = c.new_commitment_eq_proof
            put(p.Y_0), put(p.Y_1), put(p.Y_2)
        if isinstance(tx.data, list):
            for t in tx.data:
                put(t.dest_pubkey.data)
                put(t.amount_commitment.data)
                put(t.amount_sender_handle.data)
                put(t.amount_receiver_handle.data)
                vp = t.ct_validity_proof
                put(vp.Y_0), put(vp.Y_1), put(vp.Y_2)
        rp = tx.range_proof
        put(rp.A), put(rp.S), put(rp.T_1), put(rp.T_2)
        for b in rp.ipp_proof.L_vec:
            put(b)
        for b in rp.ipp_proof.R_vec:
            put(b)
    return list(seen)


class _FoldWorker:
    """Persistent background thread pool for the native per-tx fold scripts,
    with main-thread work stealing.

    The C++ executor (xhe_tx_fold) releases the GIL, so worker threads fold
    completed transactions WHILE the main thread keeps running pre_verify on
    later ones — all host cores stay busy (the reference's bench scales
    shard-nothing to 8 OS threads, benches/tx.rs:252-343; this is the
    shared-state analog).  After the main thread finishes producing jobs it
    drains the remaining queue itself (work stealing), then waits for the
    workers' in-flight jobs.

    Pool width: XELIS_FOLD_THREADS, default cpu_count - 1 (the main thread
    is the extra lane).  Each verification thread owns its own pool (see
    ``_get_fold_worker``), so concurrent ``verify_batch`` calls are safe.
    """

    # process-wide budget: concurrent verify_batch callers each get a pool,
    # but total fold worker threads stay bounded (a 16-thread caller on a
    # 64-core host must not mint ~1000 daemon threads)
    _budget_lock = None
    _budget_left = None

    def __init__(self, n_threads: int | None = None):
        import os
        import queue
        import threading

        cls = type(self)
        if cls._budget_lock is None:
            cls._budget_lock = threading.Lock()
            cls._budget_left = int(
                os.environ.get(
                    "XELIS_FOLD_THREADS_TOTAL", 2 * (os.cpu_count() or 2)
                )
            )
        if n_threads is None:
            n_threads = max(1, (os.cpu_count() or 2) - 1)
            n_threads = int(os.environ.get("XELIS_FOLD_THREADS", n_threads))
        with cls._budget_lock:
            n_threads = max(1, min(n_threads, cls._budget_left))
            cls._budget_left -= n_threads
        self.n_threads = max(1, n_threads)
        # one scalar-accumulator slot per worker + one for the main thread
        self.n_slots = self.n_threads + 1
        self._q = queue.SimpleQueue()
        self._lock = threading.Lock()
        self._done = threading.Event()
        self._pending = 0
        self._closed = False
        self._run = None
        self._error = None
        self._slot_of: dict[int, int] = {}
        for k in range(self.n_threads):
            t = threading.Thread(
                target=self._loop, daemon=True, name=f"xelis-fold-{k}"
            )
            t.start()
            self._slot_of[t.ident] = k

    def slot(self) -> int:
        """Accumulator slot of the calling thread (main = n_threads)."""
        import threading

        return self._slot_of.get(threading.get_ident(), self.n_threads)

    def _loop(self):
        while True:
            job = self._q.get()
            if job is None:  # close() sentinel
                return
            self._exec(job)

    def close(self):
        """Stop the worker threads and REFUND the process-wide thread
        budget (a discarded pool must not permanently shrink the budget —
        long-lived processes recreating pools would degrade to 1 thread)."""
        cls = type(self)
        for _ in range(self.n_threads):
            self._q.put(None)
        with cls._budget_lock:
            cls._budget_left += self.n_threads
        self.n_threads = 0

    def _exec(self, i):
        try:
            self._run(i)
        except BaseException as e:  # surfaced from drain()
            self._error = e
        finally:
            with self._lock:
                self._pending -= 1
                if self._pending == 0 and self._closed:
                    self._done.set()

    def begin(self, run_fn):
        self._run = run_fn
        self._pending = 0
        self._closed = False
        self._error = None
        self._done.clear()

    def submit(self, i):
        with self._lock:
            self._pending += 1
        self._q.put(i)

    def drain(self):
        import queue

        while True:
            try:
                i = self._q.get_nowait()
            except queue.Empty:
                break
            self._exec(i)
        with self._lock:
            self._closed = True
            done = self._pending == 0
        if not done:
            self._done.wait()
        if self._error is not None:
            raise self._error


import threading as _threading

_fold_tls = _threading.local()


def _get_fold_worker() -> _FoldWorker:
    """Per-verification-thread fold pool: concurrent verify_batch calls in
    different threads never share queue/accumulator state."""
    worker = getattr(_fold_tls, "worker", None)
    if worker is None:
        worker = _fold_tls.worker = _FoldWorker()
    return worker


class _DevicePump:
    """Forces in-flight device work to completion from a side thread.

    jax dispatch is nominally async, but on remote/tunneled backends
    execution can effectively start only when a result is demanded; this
    pump calls jax.block_until_ready on each dispatched chunk's outputs
    (a GIL-released wait, no transfer) so the device crunches chunk k
    while the main thread pre_verifies chunk k+1."""

    def __init__(self):
        import queue

        self._q = queue.SimpleQueue()
        self.first_error: Exception | None = None
        self._thread = _threading.Thread(
            target=self._loop, daemon=True, name="xelis-pump"
        )
        self._thread.start()

    def _loop(self):
        import jax

        while True:
            obj = self._q.get()
            try:
                jax.block_until_ready(obj)
            except Exception as e:
                # the block's single sync will surface the failure; stash
                # the FIRST dispatch error so it isn't lost if the sync's
                # context is stripped (VERDICT r2)
                if self.first_error is None:
                    self.first_error = e

    def submit(self, obj) -> None:
        self._q.put(obj)

    def take_error(self) -> Exception | None:
        e, self.first_error = self.first_error, None
        return e


def _get_device_pump() -> _DevicePump:
    pump = getattr(_fold_tls, "pump", None)
    if pump is None:
        pump = _fold_tls.pump = _DevicePump()
    return pump


def _tx_padded_commitments(tx: Transaction) -> int:
    n = len(tx.new_source_commitments) + (
        len(tx.data) if isinstance(tx.data, list) else 0
    )
    return 1 << (n - 1).bit_length() if n > 1 else 1


def _fused_deferred(
    accel, txs, state, collector, folds, sig_entries, tx_bytes_pairs,
    metrics, span,
):
    """Chunked, pipelined deferred-fold block verification.

    The block is processed in tx CHUNKS (XELIS_VERIFY_CHUNK_TXS, default
    256).  Per chunk: pre_verify every tx (queueing each tx's transcript
    replay + scalar fold as ONE native script on the GIL-free C++ worker
    pool), drain the chunk's folds, resolve the chunk's sigma + range
    scalars, and DISPATCH the chunk's dynamic MSM lanes to the device with
    the group reduction fused in — the device crunches chunk k while the
    host pre_verifies chunk k+1, so the block costs ~max(host, device)
    instead of their sum.  A final fused call folds the C per-chunk partial
    sums with the SHARED lanes (collector G/H slots, Pedersen bases, BP
    generators); the whole block still costs exactly ONE host sync."""
    import os

    import numpy as np

    from .. import scalarops, scalars
    from ..errors import TranscriptError
    from ..hashcore.verifyfold_native import lib as fold_lib

    n_txs = len(txs)
    max_nm = max(64 * _tx_padded_commitments(tx) for tx in txs)
    chunk_txs = max(1, int(os.environ.get("XELIS_VERIFY_CHUNK_TXS", "256")))
    # txs per fold job: ONE FFI call (one GIL release) per group — per-tx
    # jobs spend a measurable share of the 2-core host budget on Python/
    # ctypes dispatch overhead in the worker thread
    fold_group = max(1, int(os.environ.get("XELIS_FOLD_GROUP", "32")))

    worker = _get_fold_worker()
    # one accumulator set per worker thread + one for main (work stealing)
    n_slots = worker.n_slots
    g_bufs = [np.zeros((max_nm, 32), dtype=np.uint8) for _ in range(n_slots)]
    h_bufs = [np.zeros((max_nm, 32), dtype=np.uint8) for _ in range(n_slots)]
    b_bufs = [np.zeros((1, 32), dtype=np.uint8) for _ in range(n_slots)]
    bb_bufs = [np.zeros((1, 32), dtype=np.uint8) for _ in range(n_slots)]
    outs: list = [None] * n_txs
    scripts: list = [None] * n_txs
    rcs = np.zeros(n_txs, dtype=np.int32)

    # deferred pushes resolve encodings to device-row indices immediately
    # (one dict hit at push time; the chunk dispatch then gathers lanes with
    # one vectorized fromiter instead of a 30k-entry Python loop)
    row_get = accel._block_state().index.get
    collector.row_of = row_get

    def run_group(job) -> None:
        n_g, glo, h_arr, blob, offs, out_blob, out_offs = job
        ci = worker.slot()
        fold_lib.xhe_tx_fold_group(
            n_g, h_arr.ctypes.data, blob, offs.ctypes.data,
            out_blob.ctypes.data, out_offs.ctypes.data,
            g_bufs[ci].ctypes.data, h_bufs[ci].ctypes.data,
            b_bufs[ci].ctypes.data, bb_bufs[ci].ctypes.data,
            rcs[glo : glo + n_g].ctypes.data,
        )

    group_pending: list[int] = []

    def flush_group() -> None:
        if not group_pending:
            return
        glo = group_pending[0]
        n_g = len(group_pending)
        h_arr = np.fromiter(
            (folds[j].transcript.native_handle() for j in group_pending),
            dtype=np.uint64, count=n_g,
        )
        lens = np.fromiter(
            (len(scripts[j]) for j in group_pending), dtype=np.uint64, count=n_g
        )
        offs = np.zeros(n_g + 1, dtype=np.uint64)
        np.cumsum(lens, out=offs[1:])
        blob = b"".join(scripts[j] for j in group_pending)
        rows = np.fromiter(
            (folds[j].n_out for j in group_pending), dtype=np.uint64, count=n_g
        )
        out_offs = np.zeros(n_g + 1, dtype=np.uint64)
        np.cumsum(rows, out=out_offs[1:])
        out_blob = np.empty((int(out_offs[-1]), 32), dtype=np.uint8)
        for k, j in enumerate(group_pending):
            outs[j] = out_blob[int(out_offs[k]) : int(out_offs[k + 1])]
        worker.submit((n_g, glo, h_arr, blob, offs, out_blob, out_offs))
        group_pending.clear()

    chunk_states = []
    n_sigma_lanes = 0
    n_range_lanes = 0
    for lo in range(0, n_txs, chunk_txs):
        hi = min(lo + chunk_txs, n_txs)
        worker.begin(run_group)
        plan_lo = len(collector.plan)
        g_lo, h_lo = len(collector.plan_g), len(collector.plan_h)
        sig_lo = len(sig_entries)
        chunk_range_points: list = []
        dyn_info = []
        try:
            with span("verify_batch.pre_verify"):
                for i in range(lo, hi):
                    tx = txs[i]
                    collector.set_deferred(i, folds[i])
                    transcript, commitments = pre_verify(
                        tx,
                        state,
                        collector,
                        sig_entries=sig_entries,
                        tx_bytes_pair=tx_bytes_pairs[i] if tx_bytes_pairs else None,
                    )
                    view = tx.range_proof.verification_view(transcript, commitments, 64)
                    rho = scalars.random_scalar()
                    c = scalars.random_scalar()
                    base, cnt, pts = view.proof.queue_batch_fold(
                        folds[i], view.transcript, view.value_commitments,
                        view.n, BP_GENS, rho, c,
                    )
                    dyn_info.append((i, base, cnt))
                    chunk_range_points.extend([row_get(p, p) for p in pts])
                    scripts[i] = folds[i].script()
                    group_pending.append(i)
                    if len(group_pending) >= fold_group:
                        flush_group()
                collector.deferred = None
                flush_group()
        except BaseException:
            # settle in-flight fold jobs before propagating, so a later
            # verify_batch's worker.begin() never races them
            try:
                worker.drain()
            except BaseException:  # pragma: no cover - best-effort settle
                pass
            raise

        with span("verify_batch.fold_drain"):
            worker.drain()
        for i in range(lo, hi):
            if rcs[i] == 1:
                raise TranscriptError("point should not be the identity")
            if rcs[i] != 0:
                raise ProofVerificationError(
                    "format", f"malformed fold script (tx {i})"
                )

        with span("verify_batch.chunk_dispatch"):
            sigma_sc = collector.resolve_deferred_chunk(
                outs, lo, hi, plan_lo, g_lo, h_lo
            )
            sigma_pts = collector.dynamic_points[plan_lo:]
            range_sc = np.concatenate(
                [outs[i][base : base + cnt] for i, base, cnt in dyn_info]
            )
            st = accel.chunk_lanes_begin(
                (sigma_sc, sigma_pts),
                (range_sc, chunk_range_points),
                sig_entries[sig_lo:],
                floors=(
                    (
                        chunk_states[0]["ns"],
                        chunk_states[0]["nr"],
                        chunk_states[0]["nk"],
                        chunk_states[0]["e_pad"],
                    )
                    if chunk_states
                    else None
                ),
            )
            chunk_states.append(st)
            if accel.backend == "jax":
                _get_device_pump().submit(
                    (st["sigma"], st["range"], st["r_acc"])
                )
        n_sigma_lanes += len(sigma_sc)
        n_range_lanes += len(range_sc)

    metrics.incr("verify_batch.sigma_msm_points", n_sigma_lanes + 2)
    metrics.incr(
        "verify_batch.range_msm_points", n_range_lanes + 2 * max_nm + 2
    )

    with span("verify_batch.range_fold"):
        g_total, h_total = g_bufs[0], h_bufs[0]
        b_total, bb_total = b_bufs[0], bb_bufs[0]
        for k in range(1, n_slots):
            scalarops.axpy_(g_total, g_bufs[k], 1)
            scalarops.axpy_(h_total, h_bufs[k], 1)
            scalarops.axpy_(b_total, b_bufs[k], 1)
            scalarops.axpy_(bb_total, bb_bufs[k], 1)
        shared_sigma_sc = scalarops.ints_to_array(
            [collector.g_scalar % scalars.L, collector.h_scalar % scalars.L]
        )
        from ..sigma import G as _G
        from ..elgamal import H as _H

        shared_sigma = (shared_sigma_sc, [_G, _H])
        shared_range = (
            np.concatenate([b_total, bb_total, g_total, h_total]),
            [PC_GENS.B, PC_GENS.B_blinding, ("__bp_gens__", 64, max_nm // 64)],
        )

    with span("verify_batch.device_checks"):
        try:
            return accel.fused_chunks_finish(
                chunk_states, shared_sigma, shared_range, sig_entries
            )
        except Exception as e:
            # a failed chunk dispatch surfaces here at the block's single
            # sync; chain the pump's stashed first error for context
            pump_err = (
                _get_device_pump().take_error() if accel.backend == "jax" else None
            )
            if pump_err is not None:
                raise e from pump_err
            raise


def _bulk_state_setup(pv, sess, state, wire_blob, accel, txs, enc, n_rows):
    """Native bulk state pass (preverify.cpp xhe_blk_state_*): the ledger
    bookkeeping that verify.rs:201-485 does per transaction — nonce
    check/update, commitment-assets validation, homomorphic balance
    updates — runs in C++ for states that opt in via
    ``supports_bulk_block = True`` (mock.Ledger does).

    Contract for opting in: ``get_account_balance`` must be a plain
    role-independent read (the engine fetches each touched (account,
    asset) pair once, BEFORE any mutation, and writes the final balance
    back once), and ``set_output_ciphertext`` must not be load-bearing
    (it is not called on this path).  States that need per-transaction
    callbacks keep the generic per-tx path.

    Returns a ctx dict (term/draw counts, the global extras device rows,
    a writeback callable) or None to fall back to the generic path; on a
    state-level failure (bad nonce, commitment-assets) it writes back the
    mutations up to the failure point — reference parity, verify.rs
    streams mutations per tx — and raises the mapped error."""
    import numpy as np

    from .. import scalars
    from ..elgamal import (
        DecryptHandle as _DH,
        ElGamalCiphertext as _EC,
        H as _H,
        PedersenCommitment as _PC,
        PointExpr,
    )
    from ..errors import DecompressionError
    from ..pyref.ristretto import IDENTITY as _ID
    from ..types import CompressedPubkey, Hash

    L = scalars.L
    n_txs = len(txs)
    na_out = np.zeros(1, dtype=np.int32)
    np_out = np.zeros(1, dtype=np.int32)
    pv.lib.xhe_blk_state_schema(sess, na_out.ctypes.data, np_out.ctypes.data)
    n_acc = int(na_out[0])
    n_pairs = int(np_out[0])
    acct_off = np.zeros(n_acc, dtype=np.uint32)
    acct_sender = np.zeros(n_acc, dtype=np.uint8)
    pair_acct = np.zeros(n_pairs, dtype=np.int32)
    pair_asset_off = np.zeros(n_pairs, dtype=np.uint32)
    pair_role = np.zeros(n_pairs, dtype=np.uint8)
    pv.lib.xhe_blk_state_tables(
        sess, acct_off.ctypes.data, acct_sender.ctypes.data,
        pair_acct.ctypes.data, pair_asset_off.ctypes.data,
        pair_role.ctypes.data,
    )

    pks = [CompressedPubkey(wire_blob[o : o + 32]) for o in acct_off.tolist()]
    send_list = acct_sender.tolist()
    nonces = np.zeros(n_acc, dtype=np.uint64)
    get_nonce = state.get_account_nonce
    for i, pk in enumerate(pks):
        if send_list[i]:
            nonces[i] = get_nonce(pk)

    # initial multisig configs (sender accounts only — verify.rs:258 reads
    # the config for tx sources): u8 present, u8 threshold, u8 n, n x 32B
    get_ms = state.get_multisig_for_account
    ms_parts: list[bytes] = []
    ms_offs = np.zeros(n_acc + 1, dtype=np.uint64)
    ms_len = 0
    n_init_signers = 0
    for i, pk in enumerate(pks):
        if send_list[i]:
            cfg = get_ms(pk)
            if cfg is not None:
                signers, threshold = cfg
                if threshold > 255 or len(signers) > 255:
                    return None  # out of u8 range: generic path
                ms_parts.append(
                    bytes([1, threshold, len(signers)])
                    + b"".join(s.data for s in signers)
                )
                ms_len += 3 + 32 * len(signers)
                n_init_signers += len(signers)
        ms_offs[i + 1] = ms_len
    ms_blob = b"".join(ms_parts)
    asset_cache: dict = {}
    pair_assets = []
    for o in pair_asset_off.tolist():
        h = asset_cache.get(o)
        if h is None:
            h = asset_cache[o] = Hash(wire_blob[o : o + 32])
        pair_assets.append(h)

    # serialize each touched pair's INITIAL balance (fetched once)
    extra_base = accel.block_row_base()
    get_bal = state.get_account_balance
    pa = pair_acct.tolist()
    pr = pair_role.tolist()
    parts: list[bytes] = []
    offs = np.zeros(n_pairs + 1, dtype=np.uint64)
    extras: list = [_ID, _H]
    extra_ids: dict = {}
    blob_len = 0
    unk_cap = 0
    for p in range(n_pairs):
        bal = get_bal(
            pks[pa[p]], pair_assets[p],
            Role.RECEIVER if pr[p] else Role.SENDER,
        )
        ce = bal.commitment.as_expr()
        de = bal.handle.as_expr()
        if de.g_coeff:
            return None  # unsupported shape: generic path
        parts.append((ce.g_coeff % L).to_bytes(32, "little"))
        ct, dt = ce.terms, de.terms
        parts.append(
            len(ct).to_bytes(2, "little") + len(dt).to_bytes(2, "little")
        )
        blob_len += 36
        for coeff, atom in (*ct, *dt):
            if coeff == 1:
                pre = b"\x01"
            elif coeff == -1:
                pre = b"\xff"
            else:
                return None  # non-unit coefficient: generic path
            if type(atom) is bytes:
                parts.append(pre + b"\x01\x00\x00\x00\x00" + atom)
                blob_len += 38
                unk_cap += 1
            else:
                row = extra_ids.get(id(atom))
                if row is None:
                    extras.append(atom)
                    row = extra_ids[id(atom)] = extra_base + len(extras) - 1
                parts.append(pre + b"\x00" + row.to_bytes(4, "little"))
                blob_len += 6
        offs[p + 1] = blob_len
    blob = b"".join(parts)

    unk_cap += n_init_signers  # config signer encs may be out-of-block
    unk_coords = np.zeros(max(1, 128 * unk_cap), dtype=np.uint8)
    n_unk = np.zeros(1, dtype=np.int32)
    term_counts = np.zeros(n_txs, dtype=np.int32)
    draw_counts = np.zeros(n_txs, dtype=np.int32)
    sig_counts = np.ones(n_txs, dtype=np.int32)
    first_bad = np.full(1, -1, dtype=np.int32)
    bad_aux = np.zeros(1, dtype=np.uint64)
    rc = pv.lib.xhe_blk_state_run(
        sess, nonces.ctypes.data, blob, offs.ctypes.data,
        ms_blob, ms_offs.ctypes.data,
        extra_base, len(extras),
        unk_coords.ctypes.data, unk_cap, n_unk.ctypes.data,
        term_counts.ctypes.data, draw_counts.ctypes.data,
        sig_counts.ctypes.data,
        first_bad.ctypes.data, bad_aux.ctypes.data,
    )

    n_ex = len(extras)
    unk_base = extra_base + n_ex

    def writeback():
        c_lens = np.zeros(n_pairs, dtype=np.int32)
        d_lens = np.zeros(n_pairs, dtype=np.int32)
        pv.lib.xhe_blk_state_sizes(sess, c_lens.ctypes.data, d_lens.ctypes.data)
        total = int(c_lens.sum() + d_lens.sum())
        rows = np.zeros(max(1, total), dtype=np.int32)
        coeffs = np.zeros(max(1, total), dtype=np.int8)
        gcos = np.zeros((max(1, n_pairs), 32), dtype=np.uint8)
        roles = np.zeros(max(1, n_pairs), dtype=np.uint8)
        nonces_out = np.zeros(max(1, n_acc), dtype=np.uint64)
        nu = int(n_unk[0])
        unk_enc = np.zeros((max(1, nu), 32), dtype=np.uint8)
        pv.lib.xhe_blk_state_emit(
            sess, rows.ctypes.data, coeffs.ctypes.data, gcos.ctypes.data,
            roles.ctypes.data, nonces_out.ctypes.data, unk_enc.ctypes.data,
        )
        rl = rows.tolist()
        cl = coeffs.tolist()
        gco_b = gcos.tobytes()
        atom_cache: dict = {}

        def atom(r):
            a = atom_cache.get(r)
            if a is None:
                if r < n_rows:
                    a = enc[r].tobytes()
                elif extra_base <= r < unk_base:
                    a = extras[r - extra_base]
                elif r >= unk_base:
                    a = unk_enc[r - unk_base].tobytes()
                else:  # padding row: never referenced by real terms
                    raise StateError(f"dangling state term row {r}")
                atom_cache[r] = a
            return a

        upd = state.update_account_balance
        w = 0
        for p in range(n_pairs):
            cterms = []
            for _ in range(int(c_lens[p])):
                cterms.append((cl[w], atom(rl[w])))
                w += 1
            dterms = []
            for _ in range(int(d_lens[p])):
                dterms.append((cl[w], atom(rl[w])))
                w += 1
            g = int.from_bytes(gco_b[32 * p : 32 * p + 32], "little")
            new_ct = _EC(
                _PC(None, expr=PointExpr(tuple(cterms), g)),
                _DH(None, expr=PointExpr(tuple(dterms))),
            )
            upd(
                pks[pa[p]], pair_assets[p], new_ct,
                Role.RECEIVER if roles[p] else Role.SENDER,
            )
        upd_n = state.update_account_nonce
        nl = nonces_out.tolist()
        for i, pk in enumerate(pks):
            if send_list[i]:
                upd_n(pk, nl[i])

        # multisig configs changed by in-block payloads (empty signer set =
        # delete, mock.set_multisig_for_account semantics)
        ms_changed = np.zeros(max(1, n_acc), dtype=np.uint8)
        ms_thr = np.zeros(max(1, n_acc), dtype=np.uint8)
        ms_nsg = np.zeros(max(1, n_acc), dtype=np.int32)
        total_sg = pv.lib.xhe_blk_ms_sizes(
            sess, ms_changed.ctypes.data, ms_thr.ctypes.data,
            ms_nsg.ctypes.data,
        )
        if ms_changed.any():
            sg_offs = np.zeros(max(1, total_sg), dtype=np.uint32)
            pv.lib.xhe_blk_ms_emit(sess, sg_offs.ctypes.data)
            so = sg_offs.tolist()
            w = 0
            set_ms = state.set_multisig_for_account
            for i, pk in enumerate(pks):
                if not ms_changed[i]:
                    continue
                k = int(ms_nsg[i])
                signers = [
                    CompressedPubkey(wire_blob[o : o + 32])
                    for o in so[w : w + k]
                ]
                w += k
                set_ms(pk, signers, int(ms_thr[i]))

    if rc != 0:
        if int(first_bad[0]) >= 0:
            # failure mid-stream: keep mutations up to the failing tx
            writeback()
            if rc == pv.RC_NONCE:
                tx = txs[int(first_bad[0])]
                raise InvalidNonceError(
                    f"expected {int(bad_aux[0])}, got {tx.nonce}"
                )
            if rc == pv.RC_COMMASSETS:
                raise ProofVerificationError("format", "commitment assets")
            if rc == pv.RC_MSIG:
                raise ProofVerificationError("format", "multisig")
        if rc == pv.RC_STATE_DECOMP:
            raise DecompressionError("invalid state ciphertext encoding")
        return None  # init-parse shapes we don't cover: generic path

    # global extras table: [identity, H, host balance atoms..., native
    # decompressions of out-of-block encodings] — packed and uploaded ONCE
    # per block (each chunk jit receives the same device buffer)
    nu = int(n_unk[0])
    e_pad = max(512, 1 << (n_ex + nu - 1).bit_length())
    ex_rows = np.zeros((e_pad, 4, NLIMBS_), dtype=np.uint32)
    ex_rows[:n_ex] = accel._points_to_rows(extras)
    if nu:
        from ..ops.fe import numpy_field

        fe = numpy_field()
        coords = unk_coords[: 128 * nu].reshape(nu, 4, 32)
        ints = [
            int.from_bytes(coords[j, c].tobytes(), "little")
            for j in range(nu)
            for c in range(4)
        ]
        ex_rows[n_ex : n_ex + nu] = fe.from_ints(ints).reshape(nu, 4, NLIMBS_)
    extras_dev = ex_rows
    if accel.backend == "jax" and os.environ.get("XELIS_EXTRAS_DEV", "1") != "0":
        import jax.numpy as jnp

        extras_dev = jnp.asarray(ex_rows)

    return {
        "term_counts": term_counts,
        "draw_counts": draw_counts,
        "sig_counts": sig_counts,
        "extras_dev": extras_dev,
        "writeback": writeback,
    }


def _fused_native(accel, txs, state, metrics, span):
    """Whole-block verification with the C++ pre-verify engine
    (hashcore/csrc/preverify.cpp): transaction parsing, transcript
    construction, sigma/range folds and MSM lane emission all run in
    native code; Python keeps only the ledger-state bookkeeping (nonce
    checks, homomorphic balance updates) and the device dispatch.

    Returns True if the block was handled, False if the caller must fall
    back to the Python path (unsupported payloads / multisig / no native
    build) — the support decision is made BEFORE any state mutation."""
    import os

    import numpy as np

    from .. import scalarops, scalars
    from ..bulletproofs.generators import BP_GENS, PC_GENS
    from ..errors import TranscriptError
    from ..hashcore import preverify_native as pv
    from .wire import encode_transaction

    n_txs = len(txs)
    from .model import MultiSigPayload as _MSP

    # Multisig support lives in the native BULK state pass (config replay +
    # cosigner signature lanes).  The generic per-chunk state pass has no
    # multisig machinery, so without bulk any multisig feature — a config
    # in the state, carried signatures, or a config payload — routes to the
    # Python fused path (which handles all payload kinds since round 5).
    bulk_possible = getattr(state, "supports_bulk_block", False) and (
        os.environ.get("XELIS_BULK_STATE", "1") != "0"
    )
    get_ms = state.get_multisig_for_account
    needs_ms = any(
        tx.multisig is not None or isinstance(tx.data, _MSP) for tx in txs
    ) or any(get_ms(tx.source) is not None for tx in txs)
    if needs_ms and not bulk_possible:
        return False

    with span("verify_batch.collect"):
        # serialized FRESH each call: Transaction objects are mutable (tests
        # tamper fields in place), so a cross-call cache could verify stale
        # bytes that disagree with the object
        wires = [encode_transaction(tx) for tx in txs]
        wire_blob = b"".join(wires)
        offs = np.zeros(n_txs + 1, dtype=np.uint64)
        np.cumsum(
            np.fromiter((len(w) for w in wires), dtype=np.uint64, count=n_txs),
            out=offs[1:],
        )
        sess = pv.lib.xhe_blk_new(n_txs, BP_GENS.party_capacity)
    bulk_ctx = None
    wb_done = False
    try:
        with span("verify_batch.collect"):
            lane_counts = np.zeros((n_txs, 3), dtype=np.int32)
            rcs0 = np.zeros(n_txs, dtype=np.int32)
            rc = pv.lib.xhe_blk_collect(
                sess, wire_blob, offs.ctypes.data, n_txs,
                lane_counts.ctypes.data, rcs0.ctypes.data,
            )
            if rc != 0:
                return False  # unsupported/malformed: Python path decides
            n_rows = pv.lib.xhe_blk_nrows(sess)
            enc = np.empty((n_rows, 32), dtype=np.uint8)
            pv.lib.xhe_blk_encodings(sess, enc.ctypes.data)

        with span("verify_batch.decompress"):
            accel.begin_block_async_rows(enc)
            if accel.backend == "jax":
                _get_device_pump().submit(accel._block_state().pending)
        metrics.incr("verify_batch.decompressed_points", int(n_rows))

        bulk_ctx = None
        if bulk_possible:
            with span("verify_batch.state_native"):
                bulk_ctx = _bulk_state_setup(
                    pv, sess, state, wire_blob, accel, txs, enc, n_rows
                )
        if bulk_ctx is None and needs_ms:
            # bulk shape fallback with multisig in play: only the Python
            # fused path can finish this block — undo the block begin
            from ..types import clear_decompress_cache

            clear_decompress_cache()
            accel.end_block()
            return False

        max_nm = 64 * int(lane_counts[:, 2].max())
        # chunk sizing: with the bulk state pass the host gap between chunk
        # dispatches is just the fold drain; if that gap falls under the
        # tunnel RTT (~22 ms) the remote runtime's demand/dispatch pipeline
        # degrades badly (measured: 4x256-tx chunks 0.51 ms/tx vs 2x500
        # 0.21 at 1000 txs).  Keep bulk chunks >=334 txs so the fold gap
        # stays above RTT; around 1000 txs THREE chunks measure best
        # (0.150 vs 0.158 ms/tx at 2x512, round 5) — more fold/device
        # overlap without starving the dispatch pipeline.
        # large blocks: ~8 uniform chunks measure best (10k sweep, r5:
        # 512-tx chunks 1.33-1.99 s, 840 1.18, 1250 0.995, 2048 1.45 —
        # fewer dispatches amortize the per-dispatch tunnel cost until
        # the coarser pipeline starts losing host/device overlap)
        if bulk_ctx is not None:
            default_chunk = (
                max(200, -(-n_txs // 3))
                if n_txs <= 1536
                else max(512, -(-n_txs // 8))
            )
        else:
            default_chunk = 256
        chunk_txs = max(
            1, int(os.environ.get("XELIS_VERIFY_CHUNK_TXS", default_chunk))
        )
        worker = _get_fold_worker()
        n_slots = worker.n_slots
        g_lanes = [np.zeros((max_nm, 32), dtype=np.uint8) for _ in range(n_slots)]
        h_lanes = [np.zeros((max_nm, 32), dtype=np.uint8) for _ in range(n_slots)]
        b_bufs = [np.zeros((1, 32), dtype=np.uint8) for _ in range(n_slots)]
        bb_bufs = [np.zeros((1, 32), dtype=np.uint8) for _ in range(n_slots)]
        gs_bufs = [np.zeros((1, 32), dtype=np.uint8) for _ in range(n_slots)]
        hs_bufs = [np.zeros((1, 32), dtype=np.uint8) for _ in range(n_slots)]

        extra_base = accel.block_row_base()
        from ..elgamal import H as _H
        from ..pyref.ristretto import IDENTITY as _ID

        sigma_l = lane_counts[:, 0]
        range_l = lane_counts[:, 1]
        L = scalars.L
        T1P = b"\x01\x01\x00\x00\x00\x00"  # term record: +1, tag 1 (inline)
        T1N = b"\xff\x01\x00\x00\x00\x00"  # -1, tag 1

        def run_group(job) -> None:
            (lo_g, n_g, blob, soffs, rand, s_sc, s_rw, r_sc, r_rw,
             k_s, k_e, k_r, unk, unk_base, n_unk) = job
            ci = worker.slot()
            pv.lib.xhe_blk_fold_group(
                sess, lo_g, n_g, blob, soffs.ctypes.data, rand,
                extra_base,
                s_sc.ctypes.data, s_rw.ctypes.data,
                r_sc.ctypes.data, r_rw.ctypes.data,
                k_s.ctypes.data, k_e.ctypes.data, k_r.ctypes.data,
                g_lanes[ci].ctypes.data, h_lanes[ci].ctypes.data,
                b_bufs[ci].ctypes.data, bb_bufs[ci].ctypes.data,
                gs_bufs[ci].ctypes.data, hs_bufs[ci].ctypes.data,
                unk.ctypes.data, unk_base, unk.shape[0] // 128,
                n_unk.ctypes.data,
                rcs[lo_g : lo_g + n_g].ctypes.data,
            )

        rcs = np.zeros(n_txs, dtype=np.int32)
        chunk_states = []
        n_sigma_total = 0
        n_range_total = 0
        for lo in range(0, n_txs, chunk_txs):
            hi = min(lo + chunk_txs, n_txs)
            nc = hi - lo
            worker.begin(run_group)
            if bulk_ctx is not None:
                # state pass already ran natively for the whole block
                term_counts = bulk_ctx["term_counts"][lo:hi]
                draw_counts = bulk_ctx["draw_counts"][lo:hi]
                sig_counts_c = bulk_ctx["sig_counts"][lo:hi]
                blob = None
                extras = []
                tx_offs = np.zeros(nc + 1, dtype=np.uint64)
            else:
              with span("verify_batch.pre_verify"):
                # ---- state pass: nonce/balance bookkeeping + term blobs
                parts: list[bytes] = []
                tx_offs = np.zeros(nc + 1, dtype=np.uint64)
                term_counts = np.zeros(nc, dtype=np.int32)
                draw_counts = np.zeros(nc, dtype=np.int32)
                extras: list = [_ID, _H]
                extra_ids: dict = {}
                blob_len = 0
                for i in range(lo, hi):
                    tx = txs[i]
                    src = tx.source
                    account_nonce = state.get_account_nonce(src)
                    if account_nonce != tx.nonce:
                        raise InvalidNonceError(
                            f"expected {account_nonce}, got {tx.nonce}"
                        )
                    state.update_account_nonce(src, tx.nonce)
                    if not _verify_commitment_assets(tx):
                        raise ProofVerificationError("format", "commitment assets")
                    transfers = tx.data if isinstance(tx.data, list) else []
                    tdec = [_DecompressedTransferCt(t) for t in transfers]
                    n_terms = 0
                    for c in tx.new_source_commitments:
                        cur = state.get_account_balance(src, c.asset, Role.SENDER)
                        output = _get_sender_output_ct(tx, c.asset, tdec)
                        new_ct = cur - output
                        ce = new_ct.commitment._expr
                        de = new_ct.handle._expr
                        assert de.g_coeff == 0, "handle expressions carry no G term"
                        parts.append((ce.g_coeff % L).to_bytes(32, "little"))
                        parts.append(
                            len(ce.terms).to_bytes(2, "little")
                            + len(de.terms).to_bytes(2, "little")
                        )
                        for coeff, atom in (*ce.terms, *de.terms):
                            if type(atom) is bytes:
                                parts.append((T1P if coeff == 1 else T1N) + atom)
                                blob_len += 38
                            else:
                                row = extra_ids.get(id(atom))
                                if row is None:
                                    extras.append(atom)
                                    row = extra_ids[id(atom)] = (
                                        extra_base + len(extras) - 1
                                    )
                                parts.append(
                                    (b"\x01\x00" if coeff == 1 else b"\xff\x00")
                                    + row.to_bytes(4, "little")
                                )
                                blob_len += 6
                        blob_len += 36
                        n_terms += len(ce.terms) + len(de.terms)
                        state.update_account_balance(src, c.asset, new_ct, Role.SENDER)
                        state.set_output_ciphertext(src, c.asset, output)
                    for transfer, dec in zip(transfers, tdec):
                        cur = state.get_account_balance(
                            transfer.dest_pubkey, transfer.asset, Role.RECEIVER
                        )
                        state.update_account_balance(
                            transfer.dest_pubkey,
                            transfer.asset,
                            cur + dec.get_ciphertext(Role.RECEIVER),
                            Role.RECEIVER,
                        )
                    k = i - lo
                    term_counts[k] = n_terms
                    draw_counts[k] = (
                        len(tx.new_source_commitments) + len(transfers) + 2
                    )
                    tx_offs[k + 1] = blob_len
                blob = b"".join(parts)
                sig_counts_c = np.ones(nc, dtype=np.int32)  # no multisig

            with span("verify_batch.prep_lanes"):
                # ---- allocate chunk outputs, split into worker sub-groups
                s_lanes = sigma_l[lo:hi] + term_counts
                s_cum = np.zeros(nc + 1, dtype=np.int64)
                np.cumsum(s_lanes, out=s_cum[1:])
                r_cum = np.zeros(nc + 1, dtype=np.int64)
                np.cumsum(range_l[lo:hi], out=r_cum[1:])
                d_cum = np.zeros(nc + 1, dtype=np.int64)
                np.cumsum(draw_counts, out=d_cum[1:])
                t_cum = np.zeros(nc + 1, dtype=np.int64)
                np.cumsum(term_counts, out=t_cum[1:])
                ns_c = int(s_cum[-1])
                nr_c = int(r_cum[-1])
                sig_cum = np.zeros(nc + 1, dtype=np.int64)
                np.cumsum(sig_counts_c, out=sig_cum[1:])
                nk_c = int(sig_cum[-1])  # 1 + checked-multisig lanes per tx
                sigma_sc = np.empty((ns_c, 32), dtype=np.uint8)
                sigma_rows = np.empty(ns_c, dtype=np.int32)
                range_sc = np.empty((nr_c, 32), dtype=np.uint8)
                range_rows = np.empty(nr_c, dtype=np.int32)
                sig_s = np.empty((nk_c, 32), dtype=np.uint8)
                sig_e = np.empty((nk_c, 32), dtype=np.uint8)
                sig_rows = np.empty(nk_c, dtype=np.int32)
                import secrets

                rand = secrets.token_bytes(64 * int(d_cum[-1]))
                rand_buf = np.frombuffer(rand, dtype=np.uint8)

                n_sub = min(n_slots, nc)
                bounds = [nc * k // n_sub for k in range(n_sub + 1)]
                unk_bufs = []
                unk_counts = []
                unk_bases = []
                unk_cum = 0
                jobs = []
                for k in range(n_sub):
                    slo, shi = bounds[k], bounds[k + 1]
                    # bulk mode resolves every state term to a row up
                    # front, so the fold pass never decompresses unknowns
                    cap = 0 if bulk_ctx is not None else int(
                        t_cum[shi] - t_cum[slo]
                    )
                    unk = np.empty(128 * cap, dtype=np.uint8)
                    n_unk = np.zeros(1, dtype=np.int32)
                    ub = extra_base + len(extras) + unk_cum
                    unk_cum += cap
                    unk_bufs.append(unk)
                    unk_counts.append(n_unk)
                    unk_bases.append(ub)
                    jobs.append((
                        lo + slo, shi - slo, blob, tx_offs[slo:],
                        rand_buf.ctypes.data + 64 * int(d_cum[slo]),
                        sigma_sc[int(s_cum[slo]):], sigma_rows[int(s_cum[slo]):],
                        range_sc[int(r_cum[slo]):], range_rows[int(r_cum[slo]):],
                        sig_s[int(sig_cum[slo]):], sig_e[int(sig_cum[slo]):],
                        sig_rows[int(sig_cum[slo]):],
                        unk, ub, n_unk,
                    ))
                for job in jobs[1:]:
                    worker.submit(job)

            with span("verify_batch.fold_drain"):
                if jobs:
                    run_group(jobs[0])  # main thread takes the first share
                worker.drain()
            chunk_rcs = rcs[lo:hi]
            if chunk_rcs.any():
                bad = int(chunk_rcs[chunk_rcs != 0][0])
                if bad == pv.RC_IDENTITY:
                    raise TranscriptError("point should not be the identity")
                if bad == pv.RC_STATE_DECOMP:
                    raise DecompressionError("invalid state ciphertext encoding")
                raise ProofVerificationError("format", f"native fold rc={bad}")

            with span("verify_batch.chunk_dispatch"):
                if bulk_ctx is not None:
                    # global extras table, uploaded once per block
                    ex_rows = bulk_ctx["extras_dev"]
                else:
                    # extras: [identity, H, host state points...,
                    # unknown-state decompressions (C++ coords)]
                    ex_rows = np.zeros(
                        (len(extras) + unk_cum, 4, NLIMBS_), dtype=np.uint32
                    )
                    ex_rows[: len(extras)] = accel._points_to_rows(extras)
                    for k in range(n_sub):
                        nu = int(unk_counts[k][0])
                        if nu:
                            base = unk_bases[k] - extra_base
                            coords = unk_bufs[k][: 128 * nu].reshape(nu, 4, 32)
                            from ..ops.fe import numpy_field

                            fe = numpy_field()
                            ints = [
                                int.from_bytes(coords[j, c].tobytes(), "little")
                                for j in range(nu)
                                for c in range(4)
                            ]
                            ex_rows[base : base + nu] = fe.from_ints(
                                ints
                            ).reshape(nu, 4, NLIMBS_)
                st = accel.chunk_lanes_begin_rows(
                    (sigma_sc, sigma_rows),
                    (range_sc, range_rows),
                    (sig_s, sig_e, sig_rows, nk_c),
                    ex_rows,
                    floors=(
                        (
                            chunk_states[0]["ns"],
                            chunk_states[0]["nr"],
                            chunk_states[0]["nk"],
                            chunk_states[0]["e_pad"],
                        )
                        if chunk_states
                        else None
                    ),
                )
                chunk_states.append(st)
                if accel.backend == "jax":
                    _get_device_pump().submit((st["sigma"], st["range"], st["r_acc"]))
            n_sigma_total += ns_c
            n_range_total += nr_c

        def _writeback_overlapped():
            # final balances/nonces back to the state while the final
            # combine rides the device + tunnel round trip (one update per
            # touched pair; ~10 ms at 1000 txs, off the critical path)
            nonlocal wb_done
            if bulk_ctx is not None and not wb_done:
                with span("verify_batch.state_writeback"):
                    bulk_ctx["writeback"]()
                    wb_done = True

        metrics.incr("verify_batch.sigma_msm_points", n_sigma_total + 2)
        metrics.incr("verify_batch.range_msm_points", n_range_total + 2 * max_nm + 2)

        with span("verify_batch.range_fold"):
            g_total, h_total = g_lanes[0], h_lanes[0]
            b_total, bb_total = b_bufs[0], bb_bufs[0]
            gs_total, hs_total = gs_bufs[0], hs_bufs[0]
            for k in range(1, n_slots):
                scalarops.axpy_(g_total, g_lanes[k], 1)
                scalarops.axpy_(h_total, h_lanes[k], 1)
                scalarops.axpy_(b_total, b_bufs[k], 1)
                scalarops.axpy_(bb_total, bb_bufs[k], 1)
                scalarops.axpy_(gs_total, gs_bufs[k], 1)
                scalarops.axpy_(hs_total, hs_bufs[k], 1)
            from ..sigma import G as _G

            shared_sigma = (
                np.concatenate([gs_total, hs_total]), [_G, _H]
            )
            shared_range = (
                np.concatenate([b_total, bb_total, g_total, h_total]),
                [PC_GENS.B, PC_GENS.B_blinding, ("__bp_gens__", 64, max_nm // 64)],
            )

        def sig_hash_fn(r_rows: np.ndarray) -> bool:
            # r_rows: one device-compressed R per SIGNATURE LANE (main sig
            # + checked multisig cosigners), in global lane order
            r_cont = np.ascontiguousarray(r_rows)  # keep alive past the call
            ok = np.zeros(max(1, r_cont.shape[0]), dtype=np.int32)
            bad = pv.lib.xhe_blk_sig_check(
                sess, 0, n_txs, r_cont.ctypes.data, ok.ctypes.data
            )
            return bad == 0

        with span("verify_batch.device_checks"):
            try:
                sigma_ok, range_ok, sigs_ok = accel.fused_chunks_finish(
                    chunk_states, shared_sigma, shared_range, None,
                    sig_hash_fn=sig_hash_fn,
                    pre_pull_fn=_writeback_overlapped,
                )
            except Exception as e:
                pump_err = (
                    _get_device_pump().take_error()
                    if accel.backend == "jax"
                    else None
                )
                if pump_err is not None:
                    raise e from pump_err
                raise
        if not (sigma_ok and range_ok and sigs_ok):
            if not all(accel.block_valid_flags()):
                raise ProofVerificationError(
                    "decompression", "invalid point encoding in block"
                )
            if not sigs_ok:
                raise ProofVerificationError("signature")
            if not sigma_ok:
                raise ProofVerificationError("generic_proof", "sigma batch")
            raise ProofVerificationError("range_proof", "batch verification equation")
        return True
    except BaseException:
        # reference parity on failure: pre_verify mutations stay applied
        # (verify.rs streams them per tx; lib.rs:296 clones around this)
        if bulk_ctx is not None and not wb_done:
            bulk_ctx["writeback"]()
        raise
    finally:
        pv.lib.xhe_blk_free(sess)


def verify_batch(
    txs: list[Transaction],
    state: BlockchainVerificationState,
    msm=multiscalar_mul,
    accel=None,
    transactional: bool = False,
) -> None:
    """Whole-block verification: ONE sigma MSM + ONE range-proof mega-MSM
    (verify.rs:487-517).

    With ``accel`` (ops.accel.Accelerator): every encoding of the block is
    decompressed in one fused device call, every Schnorr signature (tx +
    multisig) is verified in one fused device call, and both mega-MSMs run
    on the device.

    With ``transactional=True``, state writes are buffered in an overlay
    and flushed only after the whole batch verified — a failing batch
    leaves ``state`` untouched (improvement over the reference's
    partial-mutation behavior, SURVEY.md §5; no per-attempt ledger clone
    needed)."""
    from ..metrics import metrics, span
    from ..types import clear_decompress_cache, set_block_lazy

    if transactional:
        from .transactional import TransactionalState

        overlay = TransactionalState(state)
        verify_batch(txs, overlay, msm=msm, accel=accel, transactional=False)
        overlay.commit()
        return

    metrics.incr("verify_batch.txs", len(txs))
    if accel is not None and txs:
        # small-block crossover: below ~32 single-transfer txs the device
        # pipeline is dominated by dispatch + sync latency (~45 ms
        # single-tx on a tunneled chip) while the host C++ Pippenger
        # serves the whole block in ~1-5 ms.  The threshold counts WORK
        # (commitments + transfers), not transactions: a 16x255
        # aggregation block is ~4096 units of MSM work and verifies 3x
        # faster on the device (19 vs 63 ms/tx measured round 4).
        # A mesh-configured accelerator NEVER crosses over: the caller asked
        # for the sharded device path (dryrun/scaling validation), and the
        # host path would silently validate nothing (round-4 false green).
        if accel.mesh is None and len(txs) <= int(
            os.environ.get("XELIS_HOST_VERIFY_MAX", "32")
        ):
            units = sum(
                len(tx.new_source_commitments)
                + (len(tx.data) if isinstance(tx.data, list) else 0)
                for tx in txs
            )
            if units <= int(os.environ.get("XELIS_HOST_VERIFY_UNITS", "64")):
                accel = None
    if accel is not None and txs:
        # native block engine first: C++ parse/transcript/fold, Python only
        # state bookkeeping.  Returns False (before any state mutation) for
        # shapes it doesn't cover — multisig, contract payloads — which
        # then take the per-tx fold-script path below.
        try:
            from ..hashcore import preverify_native as _pv  # noqa: F401
        except Exception:  # pragma: no cover - native build unavailable
            _pv = None
        if _pv is not None and os.environ.get("XELIS_NATIVE_PREVERIFY", "1") != "0":
            handled = None
            set_block_lazy(True)
            try:
                handled = _fused_native(accel, txs, state, metrics, span)
            finally:
                set_block_lazy(False)
                if handled is not False:  # success OR exception: clean up
                    clear_decompress_cache()
                    accel.end_block()
            if handled:
                return

    sig_entries = None
    seeded = False
    tx_bytes_pairs: list | None = None
    if accel is not None:
        msm = accel.msm
        sig_entries = []
        with span("verify_batch.decompress"):
            # Dispatch the block's fused decompression and do NOT wait: the
            # result (coords + valid flags) stays device-resident, the MSM
            # gathers rows by index, and the valid flags fold into the
            # single fused accept predicate.  The whole block costs ONE
            # host<->device sync.
            encodings = _collect_compressed(txs)
            accel.begin_block_async(encodings)
            if accel.backend == "jax":
                _get_device_pump().submit(accel._block_state().pending)
            # overlap the device work with host-side serialization
            tx_bytes_pairs = [tx.to_bytes() for tx in txs]
        metrics.incr("verify_batch.decompressed_points", len(encodings))
        set_block_lazy(True)
        seeded = True

    try:
        sigma_batch_collector = BatchCollector(
            msm_fn=msm, wants_bytes=accel is not None
        )
        deferred_folds = None
        if accel is not None:
            try:
                from ..hashcore.verifyfold_native import lib as _fold_lib  # noqa: F401
                from ..sigma import DeferredTxFold

                deferred_folds = [DeferredTxFold() for _ in txs]
            except Exception:  # pragma: no cover - native build unavailable
                deferred_folds = None

        if accel is not None and deferred_folds is not None:
            sigma_ok, range_ok, sigs_ok = _fused_deferred(
                accel, txs, state, sigma_batch_collector, deferred_folds,
                sig_entries, tx_bytes_pairs, metrics, span,
            )
            if not (sigma_ok and range_ok and sigs_ok):
                if not all(accel.block_valid_flags()):
                    raise ProofVerificationError(
                        "decompression", "invalid point encoding in block"
                    )
                if not sigs_ok:
                    raise ProofVerificationError("signature")
                if not sigma_ok:
                    raise ProofVerificationError("generic_proof", "sigma batch")
                raise ProofVerificationError("range_proof", "batch verification equation")
        elif accel is not None:
            prepared = []
            with span("verify_batch.pre_verify"):
                for i, tx in enumerate(txs):
                    transcript, commitments = pre_verify(
                        tx,
                        state,
                        sigma_batch_collector,
                        sig_entries=sig_entries,
                        tx_bytes_pair=tx_bytes_pairs[i] if tx_bytes_pairs else None,
                    )
                    prepared.append((transcript, commitments))
            views = [
                tx.range_proof.verification_view(transcript, commitments, 64)
                for tx, (transcript, commitments) in zip(txs, prepared)
            ]
            # Split dispatch, single sync: the sigma + signature lanes are
            # dispatched FIRST so the device crunches them (and the block
            # decompression) while the host folds the range proofs; the
            # range lanes then combine with phase A on device and the whole
            # block costs ONE host sync.
            with span("verify_batch.sigma_dispatch"):
                sigma_sc, sigma_pts = sigma_batch_collector.msm_inputs()
                state_a = accel.fused_block_begin((sigma_sc, sigma_pts), sig_entries)
            with span("verify_batch.range_fold"):
                range_inputs = {"sc": [], "pts": []}

                def _capture(scalars, points):
                    range_inputs["sc"] = scalars
                    range_inputs["pts"] = points
                    return None

                RangeProof.verify_batch(views, BP_GENS, PC_GENS, msm_check=_capture)
            metrics.incr(
                "verify_batch.sigma_msm_points", len(sigma_sc)
            )
            metrics.incr(
                "verify_batch.range_msm_points", len(range_inputs["sc"])
            )
            with span("verify_batch.device_checks"):
                sigma_ok, range_ok, sigs_ok = accel.fused_block_finish(
                    state_a, (range_inputs["sc"], range_inputs["pts"])
                )
            if not (sigma_ok and range_ok and sigs_ok):
                # failure diagnostics (extra sync, failure path only): an
                # invalid encoding surfaces as the reference's
                # ProofVerificationError::Decompression would (lib.rs:74-75)
                if not all(accel.block_valid_flags()):
                    raise ProofVerificationError(
                        "decompression", "invalid point encoding in block"
                    )
                if not sigs_ok:
                    raise ProofVerificationError("signature")
                if not sigma_ok:
                    raise ProofVerificationError("generic_proof", "sigma batch")
                raise ProofVerificationError("range_proof", "batch verification equation")
        else:
            prepared = []
            for tx in txs:
                transcript, commitments = pre_verify(tx, state, sigma_batch_collector)
                prepared.append((transcript, commitments))
            views = [
                tx.range_proof.verification_view(transcript, commitments, 64)
                for tx, (transcript, commitments) in zip(txs, prepared)
            ]
            if not sigma_batch_collector.verify():
                raise ProofVerificationError("generic_proof", "sigma batch")
            RangeProof.verify_batch(views, BP_GENS, PC_GENS, msm=msm)
    finally:
        if seeded:
            set_block_lazy(False)
            clear_decompress_cache()
            accel.end_block()


def verify(tx: Transaction, state: BlockchainVerificationState, msm=multiscalar_mul) -> None:
    """Single-transaction verification (verify.rs:519-542)."""
    sigma_batch_collector = BatchCollector(msm_fn=msm)
    transcript, commitments = pre_verify(tx, state, sigma_batch_collector)

    if not sigma_batch_collector.verify():
        raise ProofVerificationError("generic_proof", "sigma")

    tx.range_proof.verify_multiple(BP_GENS, PC_GENS, transcript, commitments, 64, msm=msm)


def apply_without_verify(tx: Transaction, state: BlockchainVerificationState) -> None:
    """Replay balance updates for an already-validated tx (verify.rs:544-619)."""
    transfers = tx.data if isinstance(tx.data, list) else []
    transfers_decompressed = [_DecompressedTransferCt(t) for t in transfers]

    for commitment in tx.new_source_commitments:
        asset = commitment.asset
        current = state.get_account_balance(tx.source, asset, Role.SENDER)
        output = _get_sender_output_ct(tx, asset, transfers_decompressed)
        new_ct = current - output
        state.update_account_balance(tx.source, asset, new_ct, Role.SENDER)
        state.set_output_ciphertext(tx.source, asset, output)

    data = tx.data
    if isinstance(data, list):
        for transfer, decompressed in zip(data, transfers_decompressed):
            current = state.get_account_balance(
                transfer.dest_pubkey, transfer.asset, Role.RECEIVER
            )
            receiver_new_balance = current + decompressed.get_ciphertext(Role.RECEIVER)
            state.update_account_balance(
                transfer.dest_pubkey,
                transfer.asset,
                receiver_new_balance,
                Role.RECEIVER,
            )
    elif isinstance(data, MultiSigPayload):
        state.set_multisig_for_account(tx.source, data.signers, data.threshold)
