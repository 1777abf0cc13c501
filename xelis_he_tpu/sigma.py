"""Sigma proofs (CommitmentEqProof, CiphertextValidityProof) + BatchCollector.

Bit-exact mirror of /root/reference/src/proofs.rs: transcript choreography,
challenge weights (1, w, w^2), per-proof random batch factors, and the shared
G/H scalar slots.  The BatchCollector accumulates every sigma proof of a batch
of transactions into ONE multiscalar multiplication (proofs.rs:40-68) — on
TPU this is executed as a single fused MSM kernel (ops.msm); the host
fallback uses pyref Pippenger.
"""

from __future__ import annotations

from . import scalars
from .errors import TranscriptError

try:  # native verification-fold engine (one FFI call per proof)
    from .hashcore.verifyfold_native import lib as _fold_lib
except Exception:  # pragma: no cover - native build unavailable
    _fold_lib = None

from .elgamal import (
    DecryptHandle,
    ElGamalCiphertext,
    ElGamalKeypair,
    ElGamalPubkey,
    H,
    PedersenCommitment,
    PedersenOpening,
)
from .errors import ProofVerificationError
from .pyref.ristretto import BASEPOINT as G, RistrettoPoint, multiscalar_mul
from .transcript import ProtocolTranscript


class BatchCollector:
    """Deferred-MSM accumulator for sigma proof verification (proofs.rs:40-68).

    ``verify()`` computes  sum(dynamic) + g_scalar*G + h_scalar*H  and accepts
    iff it is the identity.  ``msm_fn`` may be swapped for the TPU engine's
    fused MSM (signature: (scalars, points) -> RistrettoPoint).
    """

    def __init__(self, msm_fn=None, wants_bytes: bool = False):
        self.dynamic_scalars: list[int] = []
        # entries are RistrettoPoint objects, or (with ``wants_bytes``)
        # 32-byte encodings already validated by the block's fused device
        # decompression — the accelerator gathers those rows on-device
        # without ever materializing host point objects
        self.dynamic_points: list = []
        self.g_scalar = 0
        self.h_scalar = 0
        self.wants_bytes = wants_bytes
        self._msm = msm_fn or multiscalar_mul

    def extend(self, scalar_point_pairs) -> None:
        for s, p in scalar_point_pairs:
            self.dynamic_scalars.append(s % scalars.L)
            self.dynamic_points.append(p)

    @staticmethod
    def _resolve(p) -> RistrettoPoint:
        if isinstance(p, (bytes, bytearray)):
            from .types import _decompress_point

            return _decompress_point(bytes(p))
        return p

    def verify(self) -> bool:
        mega = self._msm(
            self.dynamic_scalars + [self.g_scalar % scalars.L, self.h_scalar % scalars.L],
            [self._resolve(p) for p in self.dynamic_points] + [G, H],
        )
        return mega.is_identity()

    def verify_deferred(self, msm_check):
        """Dispatch the identity check via ``msm_check`` (e.g. the
        accelerator's device-side predicate) without blocking."""
        return msm_check(*self.msm_inputs())

    def msm_inputs(self):
        """The collector's full (scalars, points) MSM input including the
        shared G/H slots."""
        return (
            self.dynamic_scalars + [self.g_scalar % scalars.L, self.h_scalar % scalars.L],
            self.dynamic_points + [G, H],
        )


def _decompress_or_fail(b: bytes, kind: str) -> RistrettoPoint:
    from .types import _decompress_point
    from .errors import DecompressionError

    try:
        return _decompress_point(b)
    except DecompressionError:
        raise ProofVerificationError(kind) from None


def _entry(b: bytes, kind: str, collector: "BatchCollector"):
    """Collector entry for a compressed encoding: the raw bytes when the
    accelerator path is active (no host point construction — the block's
    fused device decompression validates every encoding and its valid
    flags gate the single accept predicate), else a decompressed host
    point.  Invalid encodings fail verification either way (reference
    parity: decompression errors surface as proof verification errors)."""
    if collector.wants_bytes:
        return b
    return _decompress_or_fail(b, kind)


def _obj_entry(obj, collector: "BatchCollector"):
    """Collector entry for an already-decompressed wrapper object: prefer
    its compressed origin bytes when the accelerator path is active
    (validity of every block encoding is folded into the device-side
    accept predicate)."""
    if collector.wants_bytes:
        comp = getattr(obj, "compressed", None)
        if comp is not None:
            return comp
    return obj.point


def _fold_obj(obj, scale: int, collector: "BatchCollector") -> None:
    """Append ``scale * obj`` to the collector, expanding symbolic
    homomorphic combinations (elgamal.PointExpr) term-by-term so the
    combination itself is never evaluated — each atom rides the MSM as its
    own lane with coefficient ``coeff * scale``."""
    expr = getattr(obj, "_expr", None)
    if expr is not None and obj._point is None:
        if expr.g_coeff:
            collector.g_scalar += scale * expr.g_coeff
        collector.extend((c * scale, a) for c, a in expr.terms)
        return
    collector.extend(((scale, _obj_entry(obj, collector)),))


class CommitmentEqProof:
    """Proves that a ciphertext (under the prover's key) and a Pedersen
    commitment commit to the same value (proofs.rs:24-223; algebra in
    SURVEY.md §2.3)."""

    __slots__ = ("Y_0", "Y_1", "Y_2", "z_s", "z_x", "z_r")

    def __init__(self, Y_0: bytes, Y_1: bytes, Y_2: bytes, z_s: int, z_x: int, z_r: int):
        self.Y_0, self.Y_1, self.Y_2 = Y_0, Y_1, Y_2
        self.z_s, self.z_x, self.z_r = z_s % scalars.L, z_x % scalars.L, z_r % scalars.L

    @staticmethod
    def new(
        source_keypair: ElGamalKeypair,
        source_ciphertext: ElGamalCiphertext,
        opening: PedersenOpening,
        amount: int,
        transcript: ProtocolTranscript,
    ) -> "CommitmentEqProof":
        transcript.equality_proof_domain_separator()

        P_source = source_keypair.pubkey().point
        D_source = source_ciphertext.handle.point

        s = source_keypair.secret().scalar
        x = amount % scalars.L
        r = opening.scalar

        y_s = scalars.random_scalar()
        y_x = scalars.random_scalar()
        y_r = scalars.random_scalar()

        Y_0 = (y_s * P_source).compress()
        Y_1 = multiscalar_mul([y_x, y_s], [G, D_source]).compress()
        Y_2 = multiscalar_mul([y_x, y_r], [G, H]).compress()

        transcript.append_point(b"Y_0", Y_0)
        transcript.append_point(b"Y_1", Y_1)
        transcript.append_point(b"Y_2", Y_2)

        c = transcript.challenge_scalar(b"c")

        z_s = (c * s + y_s) % scalars.L
        z_x = (c * x + y_x) % scalars.L
        z_r = (c * r + y_r) % scalars.L

        transcript.append_scalar(b"z_s", z_s)
        transcript.append_scalar(b"z_x", z_x)
        transcript.append_scalar(b"z_r", z_r)

        # squeeze (and discard) w to keep transcript state aligned with the
        # verifier (proofs.rs:117)
        transcript.challenge_scalar(b"w")

        return CommitmentEqProof(Y_0, Y_1, Y_2, z_s, z_x, z_r)

    def pre_verify(
        self,
        source_pubkey: ElGamalPubkey,
        source_ciphertext: ElGamalCiphertext,
        destination_commitment: PedersenCommitment,
        transcript: ProtocolTranscript,
        batch_collector: BatchCollector,
    ) -> None:
        transcript.equality_proof_domain_separator()

        # C/D of the new-balance ciphertext are symbolic homomorphic
        # combinations (state balance − fee·G − transfer terms); they are
        # expanded term-by-term into the collector below, so neither the
        # combination nor any host point is ever evaluated.  P and C_dst
        # stay as encodings on the accelerator path.
        C_source = source_ciphertext.commitment
        D_source = source_ciphertext.handle

        batch_factor = scalars.random_scalar()
        nh = transcript.native_handle() if _fold_lib is not None else None
        if nh is not None:
            # one FFI call: transcript replay + all nine fold scalars
            import numpy as _np

            from . import scalarops

            pend = transcript.take_pending()
            out = _np.empty((9, 32), dtype=_np.uint8)
            rc = _fold_lib.xhe_eq_fold(
                nh, pend, len(pend),
                self.Y_0 + self.Y_1 + self.Y_2,
                scalarops.int_to_bytes32(self.z_s)
                + scalarops.int_to_bytes32(self.z_x)
                + scalarops.int_to_bytes32(self.z_r),
                scalarops.int_to_bytes32(batch_factor),
                out.ctypes.data,
            )
            if rc != 0:
                raise TranscriptError("point should not be the identity")
            raw = out.tobytes()
            s = [int.from_bytes(raw[i * 32 : i * 32 + 32], "little") for i in range(9)]
            batch_collector.g_scalar += s[7]
            batch_collector.h_scalar += s[8]
        else:
            transcript.validate_and_append_point(b"Y_0", self.Y_0)
            transcript.validate_and_append_point(b"Y_1", self.Y_1)
            transcript.validate_and_append_point(b"Y_2", self.Y_2)

            c = transcript.challenge_scalar(b"c")

            transcript.append_scalar(b"z_s", self.z_s)
            transcript.append_scalar(b"z_x", self.z_x)
            transcript.append_scalar(b"z_r", self.z_r)

            w = transcript.challenge_scalar(b"w")
            ww = w * w % scalars.L

            # w*z_x*G + ww*z_x*G ; -c*H + ww*z_r*H
            batch_collector.g_scalar += (w * self.z_x + ww * self.z_x) * batch_factor
            batch_collector.h_scalar += (-c + ww * self.z_r) * batch_factor
            s = [
                self.z_s * batch_factor,
                -batch_factor,
                w * self.z_s * batch_factor,
                -w * c * batch_factor,
                -w * batch_factor,
                -ww * c * batch_factor,
                -ww * batch_factor,
            ]

        Y_0 = _entry(self.Y_0, "commitment_eq_proof", batch_collector)
        Y_1 = _entry(self.Y_1, "commitment_eq_proof", batch_collector)
        Y_2 = _entry(self.Y_2, "commitment_eq_proof", batch_collector)
        P_entry = _obj_entry(source_pubkey, batch_collector)
        C_dst_entry = _obj_entry(destination_commitment, batch_collector)

        batch_collector.extend(
            zip(
                [s[0], s[1], s[4], s[5], s[6]],
                [P_entry, Y_0, Y_1, C_dst_entry, Y_2],
            )
        )
        _fold_obj(D_source, s[2], batch_collector)
        _fold_obj(C_source, s[3], batch_collector)

    def to_bytes(self) -> bytes:
        return (
            self.Y_0 + self.Y_1 + self.Y_2
            + scalars.to_bytes(self.z_s) + scalars.to_bytes(self.z_x) + scalars.to_bytes(self.z_r)
        )

    @staticmethod
    def from_bytes(data: bytes) -> "CommitmentEqProof":
        assert len(data) == 192
        zs = [scalars.from_canonical_bytes(data[i:i + 32]) for i in (96, 128, 160)]
        if any(z is None for z in zs):
            raise ProofVerificationError("format", "non-canonical scalar")
        return CommitmentEqProof(data[0:32], data[32:64], data[64:96], *zs)


class CiphertextValidityProof:
    """Proves a transfer ciphertext is well-formed for both sender and
    receiver keys (proofs.rs:225-372)."""

    __slots__ = ("Y_0", "Y_1", "Y_2", "z_r", "z_x")

    def __init__(self, Y_0: bytes, Y_1: bytes, Y_2: bytes, z_r: int, z_x: int):
        self.Y_0, self.Y_1, self.Y_2 = Y_0, Y_1, Y_2
        self.z_r, self.z_x = z_r % scalars.L, z_x % scalars.L

    @staticmethod
    def new(
        destination_pubkey: ElGamalPubkey,
        source_pubkey: ElGamalPubkey,
        amount: int,
        opening: PedersenOpening,
        transcript: ProtocolTranscript,
    ) -> "CiphertextValidityProof":
        transcript.ciphertext_validity_proof_domain_separator()

        P_dest = destination_pubkey.point
        P_source = source_pubkey.point

        x = amount % scalars.L
        r = opening.scalar

        y_r = scalars.random_scalar()
        y_x = scalars.random_scalar()

        Y_0 = multiscalar_mul([y_r, y_x], [H, G]).compress()
        Y_1 = (y_r * P_dest).compress()
        Y_2 = (y_r * P_source).compress()

        transcript.append_point(b"Y_0", Y_0)
        transcript.append_point(b"Y_1", Y_1)
        transcript.append_point(b"Y_2", Y_2)

        c = transcript.challenge_scalar(b"c")

        z_r = (c * r + y_r) % scalars.L
        z_x = (c * x + y_x) % scalars.L

        transcript.append_scalar(b"z_r", z_r)
        transcript.append_scalar(b"z_x", z_x)

        transcript.challenge_scalar(b"w")

        return CiphertextValidityProof(Y_0, Y_1, Y_2, z_r, z_x)

    def pre_verify(
        self,
        commitment: PedersenCommitment,
        dest_pubkey: ElGamalPubkey,
        source_pubkey: ElGamalPubkey,
        dest_handle: DecryptHandle,
        source_handle: DecryptHandle,
        transcript: ProtocolTranscript,
        batch_collector: BatchCollector,
    ) -> None:
        transcript.ciphertext_validity_proof_domain_separator()

        batch_factor = scalars.random_scalar()
        nh = transcript.native_handle() if _fold_lib is not None else None
        if nh is not None:
            import numpy as _np

            from . import scalarops

            pend = transcript.take_pending()
            out = _np.empty((10, 32), dtype=_np.uint8)
            rc = _fold_lib.xhe_validity_fold(
                nh, pend, len(pend),
                self.Y_0 + self.Y_1 + self.Y_2,
                scalarops.int_to_bytes32(self.z_r)
                + scalarops.int_to_bytes32(self.z_x),
                scalarops.int_to_bytes32(batch_factor),
                out.ctypes.data,
            )
            if rc != 0:
                raise TranscriptError("point should not be the identity")
            raw = out.tobytes()
            s = [int.from_bytes(raw[i * 32 : i * 32 + 32], "little") for i in range(10)]
            batch_collector.g_scalar += s[8]
            batch_collector.h_scalar += s[9]
        else:
            transcript.validate_and_append_point(b"Y_0", self.Y_0)
            transcript.validate_and_append_point(b"Y_1", self.Y_1)
            transcript.validate_and_append_point(b"Y_2", self.Y_2)

            c = transcript.challenge_scalar(b"c")

            transcript.append_scalar(b"z_r", self.z_r)
            transcript.append_scalar(b"z_x", self.z_x)

            w = transcript.challenge_scalar(b"w")

            batch_collector.g_scalar += self.z_x * batch_factor
            batch_collector.h_scalar += self.z_r * batch_factor

            w_z_r = w * self.z_r % scalars.L
            w_neg_c = -w * c % scalars.L
            s = [
                -c * batch_factor,
                -batch_factor,
                w_z_r * batch_factor,
                w_neg_c * batch_factor,
                -w * batch_factor,
                w * w_z_r * batch_factor,
                w * w_neg_c * batch_factor,
                -w * w * batch_factor,
            ]

        Y_0 = _entry(self.Y_0, "ciphertext_validity_proof", batch_collector)
        Y_1 = _entry(self.Y_1, "ciphertext_validity_proof", batch_collector)
        Y_2 = _entry(self.Y_2, "ciphertext_validity_proof", batch_collector)

        batch_collector.extend(
            zip(
                s[:8],
                [
                    _obj_entry(commitment, batch_collector),
                    Y_0,
                    _obj_entry(dest_pubkey, batch_collector),
                    _obj_entry(dest_handle, batch_collector),
                    Y_1,
                    _obj_entry(source_pubkey, batch_collector),
                    _obj_entry(source_handle, batch_collector),
                    Y_2,
                ],
            )
        )

    def to_bytes(self) -> bytes:
        return (
            self.Y_0 + self.Y_1 + self.Y_2
            + scalars.to_bytes(self.z_r) + scalars.to_bytes(self.z_x)
        )

    @staticmethod
    def from_bytes(data: bytes) -> "CiphertextValidityProof":
        assert len(data) == 160
        zs = [scalars.from_canonical_bytes(data[i:i + 32]) for i in (96, 128)]
        if any(z is None for z in zs):
            raise ProofVerificationError("format", "non-canonical scalar")
        return CiphertextValidityProof(data[0:32], data[32:64], data[64:96], *zs)
