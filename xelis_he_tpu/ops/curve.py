"""Batched Ristretto/extended-Edwards point operations (TPU-native).

Points are structure-of-arrays tuples ``(X, Y, Z, T)`` of (..., 18)-limb
uint32 tensors (see ops.fe).  All operations are branch-free and vectorized
over the leading batch axes; under jax they trace into fused XLA kernels.

Capabilities (SURVEY.md D3): unified add, dedicated double, negate, select,
batched Ristretto compress, batched validating decompress (returns a mask —
invalid encodings must be rejected by the caller), and Elligator2
``from_uniform_bytes`` for generator derivation on device.

Ground truth: xelis_he_tpu.pyref.ristretto (cross-checked in tests).
"""

from __future__ import annotations

import numpy as _np

from ..pyref.ristretto import RistrettoPoint
from .fe import Field, NLIMBS

# A point batch is a tuple (X, Y, Z, T); helpers below keep it a plain tuple
# so jax treats it as a pytree.


class Curve:
    def __init__(self, fe: Field):
        self.fe = fe
        self.xp = fe.xp

    # -- constructors -------------------------------------------------------

    def identity(self, shape=()):
        fe = self.fe
        xp = self.xp
        zero = xp.broadcast_to(fe.ZERO, (*shape, NLIMBS))
        one = xp.broadcast_to(fe.ONE, (*shape, NLIMBS))
        return (zero, one, one, zero)

    def from_points(self, points: list[RistrettoPoint]):
        fe = self.fe
        return (
            fe.from_ints([p.X for p in points]),
            fe.from_ints([p.Y for p in points]),
            fe.from_ints([p.Z for p in points]),
            fe.from_ints([p.T for p in points]),
        )

    def to_points(self, batch) -> list[RistrettoPoint]:
        X, Y, Z, T = batch
        fe = self.fe
        xs = Field.to_ints(fe.canon(X))
        ys = Field.to_ints(fe.canon(Y))
        zs = Field.to_ints(fe.canon(Z))
        ts = Field.to_ints(fe.canon(T))
        return [RistrettoPoint(x, y, z, t) for x, y, z, t in zip(xs, ys, zs, ts)]

    # -- group ops ----------------------------------------------------------

    def add(self, p, q):
        """Unified extended addition (add-2008-hwcd-3, a=-1, complete)."""
        fe = self.fe
        X1, Y1, Z1, T1 = p
        X2, Y2, Z2, T2 = q
        A = fe.mul(fe.sub(Y1, X1), fe.sub(Y2, X2))
        B = fe.mul(fe.add(Y1, X1), fe.add(Y2, X2))
        C = fe.mul(fe.mul(T1, fe.D2), T2)
        D = fe.mul(fe.add(Z1, Z1), Z2)
        E = fe.sub(B, A)
        F = fe.sub(D, C)
        G = fe.add(D, C)
        H = fe.add(B, A)
        return (fe.mul(E, F), fe.mul(G, H), fe.mul(F, G), fe.mul(E, H))

    def double(self, p):
        """Dedicated doubling (dbl-2008-hwcd, a=-1)."""
        fe = self.fe
        X1, Y1, Z1, _ = p
        A = fe.square(X1)
        B = fe.square(Y1)
        Zsq = fe.square(Z1)
        C = fe.add(Zsq, Zsq)
        H = fe.add(A, B)
        xy = fe.add(X1, Y1)
        E = fe.sub(H, fe.square(xy))
        G = fe.sub(A, B)
        F = fe.add(C, G)
        return (fe.mul(E, F), fe.mul(G, H), fe.mul(F, G), fe.mul(E, H))

    def neg(self, p):
        fe = self.fe
        X, Y, Z, T = p
        return (fe.neg(X), Y, Z, fe.neg(T))

    def select(self, cond, p, q):
        """cond ? p : q  elementwise over the batch."""
        fe = self.fe
        return tuple(fe.select(cond, a, b) for a, b in zip(p, q))

    def cneg(self, cond, p):
        return self.select(cond, self.neg(p), p)

    def eq(self, p, q):
        """Ristretto equality: X1*Y2 == Y1*X2 or X1*X2 == Y1*Y2."""
        fe = self.fe
        X1, Y1, _, _ = p
        X2, Y2, _, _ = q
        a = fe.eq(fe.mul(X1, Y2), fe.mul(Y1, X2))
        b = fe.eq(fe.mul(X1, X2), fe.mul(Y1, Y2))
        return a | b

    def is_identity(self, p):
        fe = self.fe
        X, Y, _, _ = p
        return fe.is_zero(X) | fe.is_zero(Y)

    # -- Ristretto encoding (RFC 9496), batched -----------------------------

    def compress(self, p):
        """Batched ENCODE -> (..., 32) uint8."""
        fe = self.fe
        X, Y, Z, T = p
        u1 = fe.mul(fe.add(Z, Y), fe.sub(Z, Y))
        u2 = fe.mul(X, Y)
        _, invsqrt = fe.inv_sqrt(fe.mul(u1, fe.square(u2)))
        den1 = fe.mul(invsqrt, u1)
        den2 = fe.mul(invsqrt, u2)
        z_inv = fe.mul(fe.mul(den1, den2), T)
        ix0 = fe.mul(X, fe.SQRT_M1)
        iy0 = fe.mul(Y, fe.SQRT_M1)
        enchanted = fe.mul(den1, fe.INVSQRT_A_MINUS_D)
        rotate = fe.is_negative(fe.mul(T, z_inv))
        x = fe.select(rotate, iy0, X)
        y = fe.select(rotate, ix0, Y)
        den_inv = fe.select(rotate, enchanted, den2)
        y = fe.cneg(fe.is_negative(fe.mul(x, z_inv)), y)
        s = fe.abs(fe.mul(den_inv, fe.sub(Z, y)))
        return fe.to_bytes_le(s)

    def decompress(self, data):
        """Batched validating DECODE.

        ``data``: (..., 32) uint8.  Returns (point, valid_mask); invalid
        lanes hold the identity.
        """
        fe = self.fe
        xp = self.xp
        s = fe.from_bytes_le(data)
        # canonical: round-trip the bytes; also catches the masked top bit
        canonical = xp.all(fe.to_bytes_le(s) == data, axis=-1)
        nonneg = ~fe.is_negative(s)

        ss = fe.square(s)
        one = xp.broadcast_to(fe.ONE, ss.shape)
        u1 = fe.sub(one, ss)
        u2 = fe.add(one, ss)
        u2_sqr = fe.square(u2)
        v = fe.sub(fe.neg(fe.mul(fe.mul(fe.D, u1), u1)), u2_sqr)
        was_square, invsqrt = fe.inv_sqrt(fe.mul(v, u2_sqr))
        den_x = fe.mul(invsqrt, u2)
        den_y = fe.mul(fe.mul(invsqrt, den_x), v)
        x = fe.abs(fe.mul(fe.add(s, s), den_x))
        y = fe.mul(u1, den_y)
        t = fe.mul(x, y)

        valid = canonical & nonneg & was_square & ~fe.is_negative(t) & ~fe.is_zero(y)
        ident = self.identity(valid.shape)
        pt = self.select(valid, (x, y, one, t), ident)
        return pt, valid

    def from_uniform_bytes(self, data):
        """Batched Elligator2 hash-to-group: (..., 64) uint8 -> points."""
        r1 = self.fe.from_bytes_le(data[..., :32])
        r2 = self.fe.from_bytes_le(data[..., 32:])
        return self.add(self.elligator_map(r1), self.elligator_map(r2))

    def elligator_map(self, r0):
        fe = self.fe
        xp = self.xp
        one = xp.broadcast_to(fe.ONE, r0.shape)
        r = fe.mul(fe.mul(fe.SQRT_M1, r0), r0)
        u = fe.mul(fe.add(r, one), fe.ONE_MINUS_D_SQ)
        v = fe.mul(fe.sub(fe.neg(one), fe.mul(r, fe.D)), fe.add(r, fe.D))
        was_square, s = fe.sqrt_ratio_m1(u, v)
        s_prime = fe.neg(fe.abs(fe.mul(s, r0)))
        s = fe.select(was_square, s, s_prime)
        c = fe.select(was_square, xp.broadcast_to(fe.NEG_ONE, r.shape), r)
        n = fe.sub(fe.mul(fe.mul(c, fe.sub(r, one)), fe.D_MINUS_ONE_SQ), v)
        w0 = fe.mul(fe.add(s, s), v)
        w1 = fe.mul(n, fe.SQRT_AD_MINUS_ONE)
        w2 = fe.sub(one, fe.square(s))
        w3 = fe.add(one, fe.square(s))
        return (fe.mul(w0, w3), fe.mul(w2, w1), fe.mul(w1, w3), fe.mul(w0, w2))


_np_curve: Curve | None = None
_jax_curve: Curve | None = None


def numpy_curve() -> Curve:
    global _np_curve
    if _np_curve is None:
        from .fe import numpy_field

        _np_curve = Curve(numpy_field())
    return _np_curve


def jax_curve() -> Curve:
    global _jax_curve
    if _jax_curve is None:
        from .fe import jax_field

        _jax_curve = Curve(jax_field())
    return _jax_curve
