"""Batched limb engine (ops/) cross-checks against the pyref ground truth.

Runs on the numpy backend plus jax-CPU (conftest pins JAX_PLATFORMS=cpu with
an 8-device host mesh).
"""

import secrets

import numpy as np
import pytest

from xelis_he_tpu.ops.curve import numpy_curve
from xelis_he_tpu.ops.fe import Field, numpy_field
from xelis_he_tpu.ops.msm import MsmEngine, decompose_bits, decompose_digits
from xelis_he_tpu.pyref import field as pf
from xelis_he_tpu.pyref.ristretto import (
    BASEPOINT,
    IDENTITY,
    L,
    RistrettoPoint,
    mul_base,
    multiscalar_mul,
)

F = numpy_field()
C = numpy_curve()
P = pf.P

EDGE_INTS = [0, 1, 2, P - 1, P - 2, P, P + 1, 2**255 - 1, 19, 38]


def _rand_ints(n):
    return [secrets.randbelow(2**256) % P for _ in range(n)] + EDGE_INTS


def test_field_ring_ops():
    ints_a = _rand_ints(40)
    ints_b = list(reversed(ints_a))
    a, b = F.from_ints(ints_a), F.from_ints(ints_b)
    assert Field.to_ints(F.canon(F.mul(a, b))) == [x * y % P for x, y in zip(ints_a, ints_b)]
    assert Field.to_ints(F.canon(F.add(a, b))) == [(x + y) % P for x, y in zip(ints_a, ints_b)]
    assert Field.to_ints(F.canon(F.sub(a, b))) == [(x - y) % P for x, y in zip(ints_a, ints_b)]
    assert Field.to_ints(F.canon(F.neg(a))) == [(-x) % P for x in ints_a]


def test_field_inverse_and_sqrt():
    ints = [x for x in _rand_ints(20) if x % P != 0]
    a = F.from_ints(ints)
    assert Field.to_ints(F.canon(F.invert(a))) == [pow(x, P - 2, P) for x in ints]
    assert Field.to_ints(F.canon(F.pow_p58(a))) == [pow(x, (P - 5) // 8, P) for x in ints]
    u, v = F.from_ints(ints), F.from_ints(list(reversed(ints)))
    ok, r = F.sqrt_ratio_m1(u, v)
    exp = [pf.sqrt_ratio_m1(x, y) for x, y in zip(ints, reversed(ints))]
    assert list(np.asarray(ok)) == [e[0] for e in exp]
    assert Field.to_ints(F.canon(r)) == [e[1] for e in exp]


def test_field_predicates_and_bytes():
    ints = _rand_ints(10)
    a = F.from_ints(ints)
    assert list(F.is_negative(a)) == [pf.is_negative(x) for x in ints]
    back = F.from_bytes_le(F.to_bytes_le(a))
    assert Field.to_ints(F.canon(back)) == [x % P for x in ints]


def _rand_points(n):
    return [mul_base(secrets.randbelow(L)) for _ in range(n)] + [IDENTITY, BASEPOINT]


def test_curve_group_ops():
    pts = _rand_points(12)
    qts = list(reversed(pts))
    Pb, Qb = C.from_points(pts), C.from_points(qts)
    assert all(g == p + q for g, p, q in zip(C.to_points(C.add(Pb, Qb)), pts, qts))
    assert all(g == p.double() for g, p in zip(C.to_points(C.double(Pb)), pts))
    # unified add doubles correctly
    assert all(g == p.double() for g, p in zip(C.to_points(C.add(Pb, Pb)), pts))
    assert all(g == -p for g, p in zip(C.to_points(C.neg(Pb)), pts))
    assert list(C.is_identity(Pb)) == [p.is_identity() for p in pts]


def test_curve_compress_decompress():
    pts = _rand_points(12)
    Pb = C.from_points(pts)
    enc = np.asarray(C.compress(Pb))
    assert all(bytes(enc[i]) == pts[i].compress() for i in range(len(pts)))
    # decompress valid + invalid lanes
    rows = [np.frombuffer(p.compress(), dtype=np.uint8) for p in pts]
    rows.append(np.frombuffer(b"\x01" + b"\x00" * 31, dtype=np.uint8))  # negative s
    rows.append(np.frombuffer((P + 5).to_bytes(32, "little"), dtype=np.uint8))  # non-canonical
    pt, valid = C.decompress(np.stack(rows))
    assert list(valid) == [True] * len(pts) + [False, False]
    assert all(g == p for g, p in zip(C.to_points(pt)[: len(pts)], pts))


def test_curve_elligator():
    import hashlib

    blobs = [hashlib.sha512(bytes([i])).digest() for i in range(6)]
    data = np.stack([np.frombuffer(b, dtype=np.uint8) for b in blobs])
    got = C.to_points(C.from_uniform_bytes(data))
    assert all(g == RistrettoPoint.from_uniform_bytes(b) for g, b in zip(got, blobs))


@pytest.mark.parametrize("n", [1, 2, 7, 64])
def test_msm_pippenger_numpy(n):
    eng = MsmEngine(C, window=8, use_jax=False)
    pts = [mul_base(i + 3) for i in range(n)]
    scs = [secrets.randbelow(L) for _ in range(n)]
    if n >= 3:
        scs[0], scs[1] = 0, L - 1
        pts[2] = IDENTITY
    assert eng.msm_points(scs, pts) == multiscalar_mul(scs, pts)


def test_msm_daa_numpy():
    eng = MsmEngine(C, use_jax=False)
    n = 16
    pts = [mul_base(i + 3) for i in range(n)]
    scs = [secrets.randbelow(L) for _ in range(n)]
    bits = decompose_bits(scs)
    batch = C.from_points(pts)
    res = eng.msm_daa(batch, bits)
    got = C.to_points(tuple(c[None] for c in res))[0]
    assert got == multiscalar_mul(scs, pts)


def test_decompositions():
    s = secrets.randbelow(L)
    bits = decompose_bits([s])
    assert sum(int(bits[i, 0]) << i for i in range(bits.shape[0])) == s
    digits = decompose_digits([s], 13)
    assert sum(int(digits[w, 0]) << (13 * w) for w in range(digits.shape[0])) == s


def test_accelerator_numpy_backend():
    from xelis_he_tpu.ops.accel import Accelerator

    acc = Accelerator("numpy", min_size=4)
    n = 8
    pts = [mul_base(i + 1) for i in range(n)]
    scs = [secrets.randbelow(L) for _ in range(n)]
    assert acc.msm(scs, pts) == multiscalar_mul(scs, pts)
    encs = [p.compress() for p in pts] + [b"\x03" + b"\x00" * 31]
    dpts, valid = acc.decompress_many(encs)
    assert valid[:-1] == [True] * n and valid[-1] is False
    assert all(dpts[i] == pts[i] for i in range(n))
    assert acc.compress_many(pts) == [p.compress() for p in pts]


def test_limb_slack_invariant():
    """Deep op chains must keep limbs within the documented slack bound
    (uint32 product-overflow safety)."""
    import numpy as np
    from xelis_he_tpu.ops.fe import SLACK_BOUND

    ints = _rand_ints(8)
    a = F.from_ints(ints)
    m = a
    vals = list(ints)
    for i in range(30):
        m = F.square(m)
        vals = [x * x % P for x in vals]
        m = F.sub(F.add(m, m), m)
        vals = [(x + x - x) % P for x in vals]
        assert int(np.asarray(m).max()) < SLACK_BOUND
    assert Field.to_ints(F.canon(m)) == vals
