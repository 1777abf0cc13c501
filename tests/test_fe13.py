"""20x13-bit no-split field tier correctness (ops/pallas_msm.py fe13).

Tier 1 (any backend): the 13-bit transposed algebra — repack roundtrip,
mul/sqr/add/sub/neg, point add/double — against the pyref ground truth,
including edge values and deliberately relaxed (non-canonical-limb)
operands that exercise the carry-bound discipline.

Tier 2 (TPU only): the quad windowed kernel in fe13 mode must produce
bit-identical slot sums to the 15-bit kernel over a stress batch with
edge scalars (0, 1, L-1, 2^252+...) — the round-4 probabilistic-
corruption class regression test.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from xelis_he_tpu.ops import pallas_msm as pm
from xelis_he_tpu.ops.curve import jax_curve
from xelis_he_tpu.pyref import field as pf
from xelis_he_tpu.pyref.ristretto import IDENTITY, mul_base

ON_TPU = jax.default_backend() == "tpu"

P = pf.P
VALS = [0, 1, 2, P - 1, P - 19, 3**100 % P, pf.SQRT_M1, 2**252 + 1,
        (1 << 255) % P, 0x1234567890ABCDEF * 7 % P]


def _to13(vals):
    """python ints -> (20, N) 13-bit transposed limbs (exact)."""
    out = np.zeros((pm.NL13, len(vals)), dtype=np.uint32)
    for i, v in enumerate(vals):
        for k in range(pm.NL13):
            out[k, i] = (v >> (pm.B13 * k)) & pm.M13
    return jnp.asarray(out)


def _from13(a):
    """(20, N) relaxed 13-bit limbs -> canonical python ints."""
    a = np.asarray(a, dtype=np.uint64)
    n = a.shape[1]
    return [
        sum(int(a[k, i]) << (pm.B13 * k) for k in range(pm.NL13)) % P
        for i in range(n)
    ]


def _consts13():
    c = np.asarray(pm._consts13_array())
    d2 = jnp.asarray(np.broadcast_to(c[: pm.NL13], (pm.NL13, len(VALS))))
    pad = jnp.asarray(
        np.broadcast_to(c[pm.NL13 : 2 * pm.NL13], (pm.NL13, len(VALS)))
    )
    bump = jnp.asarray(
        np.broadcast_to(c[2 * pm.NL13 : 3 * pm.NL13], (pm.NL13, len(VALS)))
    )
    return d2, pad, bump


def test_fe13_repack_roundtrip():
    from xelis_he_tpu.ops.fe import jax_field

    a15 = jnp.transpose(jax_field().from_ints(VALS), (1, 0))
    a13 = pm._to13_t(a15, jnp)
    assert _from13(a13) == [v % P for v in VALS]
    back = pm._from13_t(a13, jnp)
    from xelis_he_tpu.ops.fe import Field

    assert Field.to_ints(np.transpose(np.asarray(back), (1, 0))) == [
        v % P for v in VALS
    ]


def test_fe13_mul_sqr():
    a = _to13(VALS)
    b = _to13(list(reversed(VALS)))
    got_mul = _from13(pm._mul13(a, b, jnp))
    got_sqr = _from13(pm._sqr13(a, jnp))
    for i, (x, y) in enumerate(zip(VALS, reversed(VALS))):
        assert got_mul[i] == x * y % P, f"mul slot {i}"
        assert got_sqr[i] == x * x % P, f"sqr slot {i}"


def test_fe13_mul_relaxed_operands():
    """Operands at the relaxed bound (limbs up to 2^13 + eps, the carry
    output bound) must still multiply exactly — the no-split u32 budget."""
    rng = np.random.default_rng(13)
    n = 64
    a = rng.integers(0, (1 << 13) + (1 << 9), (pm.NL13, n), dtype=np.uint32)
    b = rng.integers(0, (1 << 13) + (1 << 9), (pm.NL13, n), dtype=np.uint32)
    ai = [
        sum(int(a[k, i]) << (pm.B13 * k) for k in range(pm.NL13)) % P
        for i in range(n)
    ]
    bi = [
        sum(int(b[k, i]) << (pm.B13 * k) for k in range(pm.NL13)) % P
        for i in range(n)
    ]
    got = _from13(pm._mul13(jnp.asarray(a), jnp.asarray(b), jnp))
    for i in range(n):
        assert got[i] == ai[i] * bi[i] % P, f"slot {i}"
    got2 = _from13(pm._sqr13(jnp.asarray(a), jnp))
    for i in range(n):
        assert got2[i] == ai[i] * ai[i] % P, f"sqr slot {i}"


def test_fe13_add_sub_neg():
    d2, pad, bump = _consts13()
    a = _to13(VALS)
    b = _to13(list(reversed(VALS)))
    consts = (d2, pad, bump)
    got_add = _from13(pm._add13(a, b, jnp))
    got_sub = _from13(pm._sub13(a, b, jnp, pad, bump))
    got_neg = _from13(pm._neg13(a, jnp, consts))
    for i, (x, y) in enumerate(zip(VALS, reversed(VALS))):
        assert got_add[i] == (x + y) % P
        assert got_sub[i] == (x - y) % P
        assert got_neg[i] == (-x) % P


def test_fe13_point_ops():
    d2, pad, bump = _consts13()
    consts = (d2, pad, bump)
    pts = [mul_base(i + 1) for i in range(len(VALS))]
    qts = [mul_base(3 * i + 7) for i in range(len(VALS))]

    def pack(points):
        coords = []
        for c in range(4):
            vals = [
                (p.X, p.Y, p.Z, p.T)[c] % P for p in points
            ]
            coords.append(_to13(vals))
        return tuple(coords)

    ppack, qpack = pack(pts), pack(qts)
    s = pm._point_add13(ppack, qpack, jnp, consts)
    d = pm._point_double13(ppack, jnp, consts)
    sx, sy, sz, st = (_from13(c) for c in s)
    dx, dy, dz, dt = (_from13(c) for c in d)
    from xelis_he_tpu.pyref.ristretto import RistrettoPoint

    for i in range(len(VALS)):
        want = pts[i] + qts[i]
        got = RistrettoPoint(sx[i], sy[i], sz[i], st[i])
        assert got == want, f"add slot {i}"
        want2 = pts[i] + pts[i]
        got2 = RistrettoPoint(dx[i], dy[i], dz[i], dt[i])
        assert got2 == want2, f"dbl slot {i}"


@pytest.mark.skipif(not ON_TPU, reason="compiled Mosaic kernels need a TPU")
def test_fe13_quad_kernel_matches_fe15():
    """Stress: 256 slots x 4 lanes with edge scalars; the fe13 kernel's
    slot sums must decode to the same points as the fe15 kernel's."""
    import os

    from xelis_he_tpu import scalars as sc

    curve = jax_curve()
    S = 256
    K = pm.K_PACK
    n = K * S
    pts = [mul_base(i + 3) for i in range(n)]
    scs = [(0xDEADBEEFCAFE1234567 * (i + 1)) % sc.L for i in range(n)]
    # edge scalars in the first slots (every lane of slot 0, slot 1...)
    edges = [0, 1, sc.L - 1, 2**252 + 27742317777372353535851937790883648493 - 1,
             (1 << 253) - 1, 2, sc.L - 2, 1 << 128]
    for i, e in enumerate(edges):
        scs[i] = e % sc.L
    b = curve.from_points(pts)
    batch4 = tuple(
        jnp.asarray(np.asarray(c).reshape(K, S, pm.NLIMBS)) for c in b
    )
    dig = np.asarray(pm.recode_signed4(scs))  # (64, n)
    digits = jnp.asarray(
        np.stack([dig[:, k * S : (k + 1) * S] for k in range(K)], axis=0)
    )  # (K, 64, S)

    old = os.environ.get("XELIS_FE13")
    try:
        os.environ["XELIS_FE13"] = "0"
        acc15 = pm.msm_windowed_lanes_pallas_k4(batch4, digits)
        os.environ["XELIS_FE13"] = "1"
        acc13 = pm.msm_windowed_lanes_pallas_k4(batch4, digits)
    finally:
        if old is None:
            os.environ.pop("XELIS_FE13", None)
        else:
            os.environ["XELIS_FE13"] = old

    got15 = curve.to_points(acc15)
    got13 = curve.to_points(acc13)
    assert got13 == got15
    # spot-check true values
    from xelis_he_tpu.pyref.ristretto import multiscalar_mul

    for s in (0, 1, 2, 100, S - 1):
        idx = [k * S + s for k in range(K)]
        want = multiscalar_mul([scs[i] for i in idx], [pts[i] for i in idx])
        assert got13[s] == want, f"slot {s}"
