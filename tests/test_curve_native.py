"""Cross-checks of the host C++ ristretto engine (hashcore/csrc/curve25519.cpp)
against the pure-Python formulas it mirrors (pyref/ristretto.py).

The RFC 9496 vectors in test_field_ristretto.py validate whichever engine is
active; this file additionally pins the native engine to the direct formulas
on random inputs, so a native regression cannot hide behind self-consistency.
"""

import random

import pytest

import xelis_he_tpu.pyref.ristretto as R

pytestmark = pytest.mark.skipif(R._clib is None, reason="native curve engine unavailable")

P, D, L = R.P, R.D, R.L


def _py_add(a, b):
    X1, Y1, Z1, T1 = a.X, a.Y, a.Z, a.T
    X2, Y2, Z2, T2 = b.X, b.Y, b.Z, b.T
    A = (Y1 - X1) * (Y2 - X2) % P
    B = (Y1 + X1) * (Y2 + X2) % P
    C = T1 * (2 * D) % P * T2 % P
    Dd = 2 * Z1 * Z2 % P
    E, F, G, H = B - A, Dd - C, Dd + C, B + A
    return R.RistrettoPoint(E * F % P, G * H % P, F * G % P, E * H % P)


def test_add_double_mul_match_formulas():
    random.seed(42)
    pts = [R.mul_base(random.randrange(1, L)) for _ in range(6)]
    for i, a in enumerate(pts):
        b = pts[(i + 1) % len(pts)]
        assert (a + b).compress() == _py_add(a, b).compress()
        assert a.double().compress() == _py_add(a, a).compress()
        k = random.randrange(L)
        acc, add, kk = R.IDENTITY, a, k
        while kk:
            if kk & 1:
                acc = acc + add
            add = add.double()
            kk >>= 1
        assert a.scalar_mul(k) == acc


def test_msm_matches_sequential():
    random.seed(1)
    n = 37
    pts = [R.mul_base(random.randrange(1, L)) for _ in range(n)]
    scs = [random.randrange(L) for _ in range(n)]
    expect = R.IDENTITY
    for s, p in zip(scs, pts):
        expect = expect + p.scalar_mul(s)
    assert R.multiscalar_mul(scs, pts) == expect


def test_compress_decompress_roundtrip_and_rejection():
    random.seed(9)
    for _ in range(16):
        p = R.mul_base(random.randrange(1, L))
        enc = p.compress()
        q = R.RistrettoPoint.decompress(enc)
        assert q is not None and q == p and q.compress() == enc
    # odd s, non-canonical s, s >= p, high bit set
    assert R.RistrettoPoint.decompress(b"\x01" + b"\x00" * 31) is None
    assert R.RistrettoPoint.decompress(P.to_bytes(32, "little")) is None
    assert R.RistrettoPoint.decompress(b"\x00" * 31 + b"\x80") is None
    # identity is valid
    ident = R.RistrettoPoint.decompress(b"\x00" * 32)
    assert ident is not None and ident.is_identity()


def test_ct_scalar_mul_edge_scalars():
    """The constant-time ladder (pt_mul: masked-scan table select, wiped
    table) must be exact on the scalars that stress its window handling:
    0, 1, L-1, all-zero-nibble-heavy, and all-0xF patterns.  Secret scalar
    muls (decrypt s*D, sign k*H, handles r*P) route through this path via
    RistrettoPoint.scalar_mul whenever the native engine is loaded."""
    base = R.mul_base(7)
    cases = [
        0,
        1,
        2,
        L - 1,
        0x0F0F0F0F,
        int.from_bytes(b"\xf0" * 31 + b"\x0f", "little") % L,
        1 << 252,
        (1 << 252) + 27742317777372353535851937790883648492,  # L - 1 again via form
    ]
    for k in cases:
        acc, add, kk = R.IDENTITY, base, k % L
        while kk:
            if kk & 1:
                acc = acc + add
            add = add.double()
            kk >>= 1
        assert base.scalar_mul(k % L) == acc, f"ct ladder mismatch at k={k}"


def test_secret_ops_use_native_engine():
    """Guard: the elgamal secret operations actually reach the C++ CT
    ladder (not the Python fallback) when the native engine is loaded."""
    import xelis_he_tpu.elgamal as eg

    called = []
    orig = R._clib.xhe_pt_mul

    class _Spy:
        def __call__(self, *a):
            called.append(1)
            return orig(*a)

    R._clib.xhe_pt_mul = _Spy()
    try:
        kp = eg.ElGamalKeypair.keygen()
        ct = kp.pubkey().encrypt(5)
        kp.secret().decrypt(ct)
        kp.sign(b"msg")
    finally:
        R._clib.xhe_pt_mul = orig
    assert called, "secret ops bypassed the native CT scalar-mul"
