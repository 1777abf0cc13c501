"""hashcore tests: keccak/STROBE/merlin, BLAKE3, ChaCha20."""

import hashlib
import secrets

from xelis_he_tpu.hashcore.blake3 import blake3
from xelis_he_tpu.hashcore.chacha20 import _chacha20_xor_py, chacha20_xor
from xelis_he_tpu.hashcore.keccak import Strobe128, keccak_f1600
from xelis_he_tpu.hashcore.merlin import Transcript


def _sha3_256_from_f1600(data: bytes) -> bytes:
    rate = 136
    st = bytearray(200)
    msg = bytearray(data)
    msg.append(0x06)
    while len(msg) % rate:
        msg.append(0)
    msg[-1] |= 0x80
    for off in range(0, len(msg), rate):
        for i in range(rate):
            st[i] ^= msg[off + i]
        keccak_f1600(st)
    return bytes(st[:32])


def test_keccak_f1600_via_sha3():
    for data in [b"", b"abc", b"x" * 135, b"x" * 136, b"y" * 1000]:
        assert _sha3_256_from_f1600(data) == hashlib.sha3_256(data).digest()


def test_merlin_official_vector():
    t = Transcript(b"test protocol")
    t.append_message(b"some label", b"some data")
    assert t.challenge_bytes(b"challenge", 32).hex() == (
        "d5a21972d0d5fe320c0d263fac7fffb8145aa640af6e9bca177c03c7efcf0615"
    )


def test_merlin_interleaved_determinism():
    def run():
        t = Transcript(b"proto")
        t.append_u64(b"n", 42)
        c1 = t.challenge_bytes(b"c1", 64)
        t.append_message(b"m", b"x" * 300)  # crosses the 166-byte rate
        c2 = t.challenge_bytes(b"c2", 200)  # squeeze across permutation
        return c1, c2

    assert run() == run()
    # clone preserves state
    t = Transcript(b"proto")
    t.append_message(b"a", b"b")
    t2 = t.clone()
    assert t.challenge_bytes(b"c", 32) == t2.challenge_bytes(b"c", 32)


def test_strobe_rate_boundary():
    s = Strobe128(b"x")
    s.ad(b"q" * 166, False)  # exactly one rate block
    s.ad(b"q" * 167, False)
    out = s.prf(332, False)
    assert len(out) == 332


def test_blake3_known_vectors():
    # canonical empty-input hash
    assert blake3(b"").hex() == (
        "af1349b9f5f9a1a6a0404dea36dcc9499bcb25c9adc112b7cc9a93cae41f3262"
    )
    # structural: different chunk-tree shapes all distinct and stable
    inputs = [bytes(i % 251 for i in range(n)) for n in (1, 64, 1024, 1025, 3072, 5000)]
    digests = [blake3(d) for d in inputs]
    assert len(set(digests)) == len(digests)
    assert all(len(d) == 32 for d in digests)
    assert blake3(inputs[-1]) == digests[-1]


def test_chacha20_rfc8439():
    key = bytes(range(32))
    nonce = bytes.fromhex("000000090000004a00000000")
    ks = _chacha20_xor_py(key, nonce, bytes(64), counter=1)
    assert ks.hex().startswith("10f1e7e4d13b5915500fdd1fa32071c4")


def test_chacha20_native_matches_python():
    k, n = secrets.token_bytes(32), secrets.token_bytes(12)
    d = secrets.token_bytes(777)
    assert chacha20_xor(k, n, d) == _chacha20_xor_py(k, n, d)
    assert chacha20_xor(k, n, chacha20_xor(k, n, d)) == d


def test_native_hashcore_matches_python():
    """C++ hashcore (when buildable) must agree with the Python ground truth."""
    import pytest

    try:
        from xelis_he_tpu.hashcore import native
    except Exception:
        pytest.skip("native hashcore unavailable")
    import random

    random.seed(3)
    s1, s2 = Strobe128(b"p"), native.NativeStrobe128(b"p")
    for _ in range(50):
        op = random.choice(["meta_ad", "ad", "prf", "key"])
        n = random.randrange(0, 400)
        if op == "prf":
            assert s1.prf(n, False) == s2.prf(n, False)
        else:
            data = secrets.token_bytes(n)
            getattr(s1, op)(data, False)
            getattr(s2, op)(data, False)
    from xelis_he_tpu.hashcore.blake3 import _blake3_py

    for n in (0, 1, 64, 1024, 1025, 5000):
        d = secrets.token_bytes(n)
        assert native.blake3(d) == _blake3_py(d)
    k, nn = secrets.token_bytes(32), secrets.token_bytes(12)
    d = secrets.token_bytes(777)
    assert native.chacha20_xor(k, nn, d) == _chacha20_xor_py(k, nn, d)
    import hashlib

    assert native.sha3_512(d) == hashlib.sha3_512(d).digest()
