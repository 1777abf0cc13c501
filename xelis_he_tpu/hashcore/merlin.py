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
    """merlin::Transcript equivalent."""

    __slots__ = ("strobe",)

    def __init__(self, label: bytes, _strobe=None):
        if _strobe is not None:
            self.strobe = _strobe
            return
        cls = _FastStrobe if _FastStrobe is not None else Strobe128
        self.strobe = cls(MERLIN_PROTOCOL_LABEL)
        self.append_message(b"dom-sep", label)

    def append_message(self, label: bytes, message: bytes) -> None:
        self.strobe.meta_ad(label, False)
        self.strobe.meta_ad(_u32le(len(message)), True)
        self.strobe.ad(message, False)

    def append_u64(self, label: bytes, value: int) -> None:
        self.append_message(label, value.to_bytes(8, "little"))

    def challenge_bytes(self, label: bytes, n: int) -> bytes:
        self.strobe.meta_ad(label, False)
        self.strobe.meta_ad(_u32le(n), True)
        return self.strobe.prf(n, False)

    def clone(self) -> "Transcript":
        return Transcript(b"", _strobe=self.strobe.copy())
