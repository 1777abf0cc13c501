"""Merlin transcripts (bit-exact with merlin v4 / the xelis merlin fork).

Reference call sites: /root/reference/src/transcript.rs (trait over
merlin::Transcript), proofs.rs, tx/builder.rs, tx/verify.rs.

Uses the native C++ STROBE implementation (hashcore/csrc) when available,
falling back to the pure-Python Strobe128.
"""

from __future__ import annotations

from .keccak import Strobe128

try:  # native accelerated transcript (ctypes); optional
    from .native import NativeStrobe128 as _FastStrobe  # type: ignore
except Exception:  # pragma: no cover - native build unavailable
    _FastStrobe = None

MERLIN_PROTOCOL_LABEL = b"Merlin v1.0"


def _u32le(n: int) -> bytes:
    return n.to_bytes(4, "little")


class Transcript:
    """merlin::Transcript equivalent.

    Appends are BUFFERED as serialized STROBE op records and flushed in one
    native call per challenge (``run_batch``): the Fiat-Shamir replay of a
    whole block then costs ~1 FFI round trip per challenge instead of 3 per
    append, which dominates host verification time otherwise.  Byte
    semantics are identical to eager execution — STROBE ops are sequential
    state transitions either way.
    """

    __slots__ = ("strobe", "_pend")

    def __init__(self, label: bytes, _strobe=None):
        self._pend: list[bytes] = []
        if _strobe is not None:
            self.strobe = _strobe
            return
        cls = _FastStrobe if _FastStrobe is not None else Strobe128
        self.strobe = cls(MERLIN_PROTOCOL_LABEL)
        self.append_message(b"dom-sep", label)

    def append_message(self, label: bytes, message: bytes) -> None:
        # records: u8 op (0=meta_ad, 1=ad, 2=prf), u8 more, u32le len, data
        self._pend.append(
            b"\x00\x00" + _u32le(len(label)) + label
            + b"\x00\x01\x04\x00\x00\x00" + _u32le(len(message))
            + b"\x01\x00" + _u32le(len(message)) + message
        )

    def append_u64(self, label: bytes, value: int) -> None:
        self.append_message(label, value.to_bytes(8, "little"))

    def challenge_bytes(self, label: bytes, n: int) -> bytes:
        self._pend.append(
            b"\x00\x00" + _u32le(len(label)) + label
            + b"\x00\x01\x04\x00\x00\x00" + _u32le(n)
            + b"\x02\x00" + _u32le(n)
        )
        blob = b"".join(self._pend)
        self._pend.clear()
        return self.strobe.run_batch(blob, n)

    def _flush(self) -> None:
        if self._pend:
            blob = b"".join(self._pend)
            self._pend.clear()
            self.strobe.run_batch(blob, 0)

    def clone(self) -> "Transcript":
        self._flush()
        return Transcript(b"", _strobe=self.strobe.copy())
