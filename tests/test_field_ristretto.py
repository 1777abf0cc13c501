"""Field + Ristretto ground-truth tests against RFC 9496 vectors."""

import hashlib
import secrets

from xelis_he_tpu.pyref.field import P, D, SQRT_M1, sqrt_ratio_m1, fe_abs
from xelis_he_tpu.pyref.ristretto import (
    BASEPOINT,
    IDENTITY,
    L,
    RISTRETTO_BASEPOINT_BYTES,
    RistrettoPoint,
    mul_base,
    multiscalar_mul,
)

RFC9496_SMALL_MULTIPLES = [
    "0000000000000000000000000000000000000000000000000000000000000000",
    "e2f2ae0a6abc4e71a884a961c500515f58e30b6aa582dd8db6a65945e08d2d76",
    "6a493210f7499cd17fecb510ae0cea23a110e8d5b901f8acadd3095c73a3b919",
    "94741f5d5d52755ece4f23f044ee27d5d1ea1e2bd196b462166b16152a9d0259",
    "da80862773358b466ffadfe0b3293ab3d9fd53c5ea6c955358f568322daf6a57",
    "e882b131016b52c1d3337080187cf768423efccbb517bb495ab812c4160ff44e",
    "f64746d3c92b13050ed8d80236a7f0007c3b3f962f5ba793d19a601ebb1df403",
    "44f53520926ec81fbd5a387845beb7df85a96a24ece18738bdcfa6a7822a176d",
]


def test_small_multiples():
    acc = IDENTITY
    for expected in RFC9496_SMALL_MULTIPLES:
        assert acc.compress().hex() == expected
        acc = acc + BASEPOINT


def test_sqrt_m1():
    assert SQRT_M1 * SQRT_M1 % P == P - 1
    assert SQRT_M1 & 1 == 0


def test_sqrt_ratio_edge_cases():
    # RFC 9496 §4.2 behavior table
    assert sqrt_ratio_m1(0, 1) == (True, 0)
    ok, r = sqrt_ratio_m1(1, 1)
    # CT_ABS picks the even root: for sqrt(1) that's p-1 (1 is odd)
    assert ok and r == P - 1 and r * r % P == 1
    ok, r = sqrt_ratio_m1(4, 1)
    assert ok and r * r % P == 4 and r & 1 == 0
    ok, _ = sqrt_ratio_m1(2, 1)  # 2 is nonsquare mod p
    assert not ok


def test_roundtrip_and_order():
    for _ in range(10):
        s = secrets.randbelow(L)
        p = mul_base(s)
        assert RistrettoPoint.decompress(p.compress()) == p
    assert (L * BASEPOINT).is_identity()
    assert ((L - 1) * BASEPOINT + BASEPOINT).is_identity()


def test_scalar_mul_matches_double_and_add():
    s = secrets.randbelow(L)
    assert mul_base(s) == BASEPOINT.scalar_mul(s)


def test_invalid_encodings_rejected():
    # non-canonical field element
    assert RistrettoPoint.decompress(((P + 3).to_bytes(32, "little"))) is None
    # negative (odd) s
    assert RistrettoPoint.decompress(b"\x01" + b"\x00" * 31) is None
    # high bit set (non-canonical)
    assert RistrettoPoint.decompress(b"\x00" * 31 + b"\x80") is None
    # wrong length
    assert RistrettoPoint.decompress(b"\x00" * 31) is None
    # random garbage should mostly fail; flip a valid encoding's byte
    valid = bytearray(mul_base(7).compress())
    valid[5] ^= 0xFF
    pt = RistrettoPoint.decompress(bytes(valid))
    if pt is not None:  # if it decodes, it must at least re-encode differently
        assert pt.compress() != bytes(mul_base(7).compress())


def test_elligator_rfc_vector():
    msg = b"Ristretto is traditionally a short shot of espresso coffee"
    pt = RistrettoPoint.from_uniform_bytes(hashlib.sha512(msg).digest())
    assert pt.compress().hex() == (
        "3066f82a1a747d45120d1740f14358531a8f04bbffe6a819f86dfe50f44a0a46"
    )


def test_h_derivation():
    # reference H = from_uniform_bytes(SHA3-512(compress(G))) (elgamal.rs:16-24)
    from xelis_he_tpu.elgamal import H

    h = hashlib.sha3_512(RISTRETTO_BASEPOINT_BYTES).digest()
    assert H == RistrettoPoint.from_uniform_bytes(h)
    # equals dalek bulletproofs' B_blinding constant
    assert H.compress().hex() == (
        "8c9240b456a9e6dc65c377a1048d745f94a08cdb7f44cbcd7b46f34048871134"
    )


def test_msm():
    pts = [mul_base(i + 1) for i in range(20)]
    scs = [secrets.randbelow(L) for _ in range(20)]
    expected = IDENTITY
    for s, p in zip(scs, pts):
        expected = expected + s * p
    assert multiscalar_mul(scs, pts) == expected
    assert multiscalar_mul([], []).is_identity()
