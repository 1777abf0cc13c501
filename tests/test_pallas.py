"""Pallas TPU kernel correctness.

Two tiers:

1. The transposed field/point algebra the kernels are built from
   (_mul_t/_sqr_t/_point_add_t/_canon_t/_sqrt_ratio_m1_t) is pure jnp — it
   is tested against the pyref ground truth on any backend.
2. The full pallas_call kernels compile only for real TPUs; when this test
   session has a TPU backend they are compiled and checked end-to-end
   (Mosaic interpret mode is not exercised here: on tunneled-TPU hosts it
   eagerly round-trips every op through the device and takes minutes).
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


def _to_t(vals):
    """python ints -> (18, N) transposed limb array."""
    from xelis_he_tpu.ops.fe import jax_field

    return jnp.transpose(jax_field().from_ints(vals), (1, 0))


def _from_t(a):
    """(18, N) transposed limbs -> python ints (canonical input)."""
    from xelis_he_tpu.ops.fe import Field

    return Field.to_ints(np.transpose(np.asarray(a), (1, 0)))


@pytest.fixture(scope="module")
def curve():
    return jax_curve()


VALS = [0, 1, 2, pf.P - 1, pf.P - 19, 3**100 % pf.P, pf.SQRT_M1, 2**252 + 1]


def test_transposed_mul_sqr_canon():
    a = _to_t(VALS)
    b = _to_t(list(reversed(VALS)))

    @jax.jit
    def f(a, b):
        return (
            pm._canon_t(pm._mul_t(a, b, jnp), jnp),
            pm._canon_t(pm._sqr_t(a, jnp), jnp),
        )

    prod, sq = f(a, b)
    exp = [x * y % pf.P for x, y in zip(VALS, reversed(VALS))]
    assert _from_t(prod) == exp
    assert _from_t(sq) == [x * x % pf.P for x in VALS]


def test_transposed_sub_neg_abs():
    pad = jnp.broadcast_to(jnp.asarray(pm._PAD_COL), (18, len(VALS)))
    bump = jnp.broadcast_to(jnp.asarray(pm._BUMP_COL), (18, len(VALS)))
    a = _to_t(VALS)
    b = _to_t(list(reversed(VALS)))
    diff = jax.jit(
        lambda a, b: pm._canon_t(pm._sub_t(a, b, jnp, pad, bump), jnp)
    )(a, b)
    assert _from_t(diff) == [(x - y) % pf.P for x, y in zip(VALS, reversed(VALS))]


def test_signed_recode_roundtrip():
    from xelis_he_tpu import scalars as sc

    scs = [0, 1, sc.L - 1, 2**252, 0xDEADBEEF, (sc.L * 7) // 11]
    digits = pm.recode_signed4(scs).astype(np.int64) - 8
    for i, s in enumerate(scs):
        val = sum(int(digits[w, i]) * 16**w for w in range(pm.N_WINDOWS))
        assert val == s
        assert digits[:, i].max() <= 8 and digits[:, i].min() >= -7


@pytest.mark.skipif(not ON_TPU, reason="compiled Mosaic kernels need a TPU")
class TestCompiledKernels:
    N = 128

    def test_windowed_msm_lanes(self, curve):
        from xelis_he_tpu import scalars as sc

        n = self.N
        pts = [mul_base(i + 3) for i in range(n)]
        scs = [(0xDEADBEEFCAFE1234567 * (i + 1)) % sc.L for i in range(n)]
        scs[0], scs[1], scs[2] = 0, 1, sc.L - 1
        batch = tuple(jnp.asarray(c) for c in curve.from_points(pts))
        digits = jnp.asarray(pm.recode_signed4(scs))
        acc = pm.msm_windowed_lanes_pallas(batch, digits)
        got = curve.to_points(acc)
        for i in (0, 1, 2, 77, 127):
            assert got[i] == scs[i] * pts[i]

    def test_tile_sums(self, curve):
        n = self.N
        pts = [mul_base(i + 1) for i in range(100)] + [IDENTITY] * (n - 100)
        batch = tuple(jnp.asarray(c) for c in curve.from_points(pts))
        out = pm.tile_sums_pallas(batch)
        assert curve.to_points(out)[0] == mul_base(sum(range(1, 101)))

    def test_compress_decompress(self, curve):
        n = self.N
        pts = [mul_base(i + 1) for i in range(n - 2)] + [IDENTITY, mul_base(7)]
        batch = tuple(jnp.asarray(c) for c in curve.from_points(pts))
        enc = np.asarray(pm.compress_pallas(batch))
        for i in (0, 5, n - 2, n - 1):
            assert bytes(enc[i]) == pts[i].compress()

        data = np.stack([np.frombuffer(p.compress(), dtype=np.uint8) for p in pts])
        data[3] = 255  # non-canonical (>= p, top bit set)
        dec, valid = pm.decompress_pallas(jnp.asarray(data))
        valid = np.asarray(valid)
        assert valid[0] and valid[n - 1] and not valid[3]
        got = curve.to_points(tuple(c[:2] for c in dec))
        assert got[0] == pts[0] and got[1] == pts[1]
