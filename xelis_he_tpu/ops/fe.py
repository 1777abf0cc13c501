"""Batched fe25519 arithmetic in 16x16-bit limbs (TPU-native core).

This is the hot layer of the framework (SURVEY.md D1): field elements are
structure-of-arrays uint32 tensors of shape (..., 16), sixteen 16-bit limbs,
little-endian.  The same code runs under numpy (host) and jax.numpy (traced
into XLA for TPU):

- limb products of 16-bit values are EXACT in uint32 (max (2^16-1)^2 < 2^32);
- partial-product column sums after a hi/lo split stay < 2^21, far from
  overflow, so no intermediate needs more than 32 bits — this maps directly
  onto the TPU VPU's native int32 lanes with no emulated wide arithmetic;
- reduction folds limb k >= 16 with weight 2^256 = 38 (mod p) and runs two
  fixed 16-step carry chains — branch-free, fully unrolled at trace time.

Invariant: all public functions accept and return "carried" elements (every
limb < 2^16, value < 2^256, possibly not fully reduced below p).  Use
``canon`` before bit-exact comparisons or serialization.

Ground truth: xelis_he_tpu.pyref.field (cross-checked in tests/test_ops.py).
"""

from __future__ import annotations

import numpy as _np

from ..pyref import field as _pf

NLIMBS = 16
LIMB_BITS = 16
MASK = (1 << LIMB_BITS) - 1

P_INT = _pf.P


def _int_to_limbs_list(v: int, n: int = NLIMBS) -> list[int]:
    return [(v >> (LIMB_BITS * k)) & MASK for k in range(n)]


# 4p decomposed so that every limb is >= 2^16 (for borrow-free subtraction):
# greedily borrow from the limb above.
def _pad_limbs(mult: int) -> list[int]:
    v = mult * P_INT
    limbs = [(v >> (LIMB_BITS * k)) & MASK for k in range(NLIMBS + 1)]
    for k in range(NLIMBS):
        if limbs[k] < (1 << LIMB_BITS):
            limbs[k] += 1 << LIMB_BITS
            limbs[k + 1] -= 1
    assert all(l >= (1 << LIMB_BITS) for l in limbs[:NLIMBS]) and limbs[NLIMBS] >= 0
    assert sum(l << (LIMB_BITS * k) for k, l in enumerate(limbs)) == mult * P_INT
    return limbs


_PAD4P = _pad_limbs(4)


class Field:
    """fe25519 vector engine over a numpy-like module ``xp``."""

    def __init__(self, xp):
        self.xp = xp
        self.dtype = xp.uint32
        self.P_LIMBS = xp.asarray(_int_to_limbs_list(P_INT), dtype=xp.uint32)
        self.PAD4P = xp.asarray(_PAD4P[:NLIMBS], dtype=xp.uint32)
        self.PAD4P_TOP = _PAD4P[NLIMBS]  # python int (compile-time constant)
        self.ZERO = xp.zeros((NLIMBS,), dtype=xp.uint32)
        self.ONE = xp.asarray(_int_to_limbs_list(1), dtype=xp.uint32)
        self.SQRT_M1 = self.from_int(_pf.SQRT_M1)
        self.D = self.from_int(_pf.D)
        self.D2 = self.from_int(2 * _pf.D % P_INT)
        self.ONE_MINUS_D_SQ = self.from_int(_pf.ONE_MINUS_D_SQ)
        self.D_MINUS_ONE_SQ = self.from_int(_pf.D_MINUS_ONE_SQ)
        self.SQRT_AD_MINUS_ONE = self.from_int(_pf.SQRT_AD_MINUS_ONE)
        self.INVSQRT_A_MINUS_D = self.from_int(_pf.INVSQRT_A_MINUS_D)
        self.NEG_ONE = self.from_int(P_INT - 1)

    # -- conversions --------------------------------------------------------

    def from_int(self, v: int):
        return self.xp.asarray(_int_to_limbs_list(v % P_INT), dtype=self.dtype)

    def from_ints(self, vs):
        raw = b"".join((v % P_INT).to_bytes(32, "little") for v in vs)
        arr = _np.frombuffer(raw, dtype="<u2").reshape(len(vs), NLIMBS)
        return self.xp.asarray(arr.astype(_np.uint32))

    @staticmethod
    def to_ints(a) -> list[int]:
        arr = _np.asarray(a, dtype=_np.uint64)
        flat = arr.reshape(-1, NLIMBS)
        out = []
        for row in flat:
            v = 0
            for k in range(NLIMBS - 1, -1, -1):
                v = (v << LIMB_BITS) | int(row[k])
            out.append(v)
        return out

    def from_bytes_le(self, b):
        """(..., 32) uint8 array -> limbs, masking bit 255 (dalek
        FieldElement::from_bytes)."""
        xp = self.xp
        b = b.astype(self.dtype)
        lo = b[..., 0::2]
        hi = b[..., 1::2]
        limbs = lo + (hi << 8)
        # mask top bit of limb 15
        top_mask = xp.asarray([MASK] * (NLIMBS - 1) + [0x7FFF], dtype=self.dtype)
        return limbs & top_mask

    def to_bytes_le(self, a):
        """Canonical limbs -> (..., 32) uint8."""
        xp = self.xp
        a = self.canon(a)
        lo = (a & 0xFF).astype(xp.uint8)
        hi = ((a >> 8) & 0xFF).astype(xp.uint8)
        return xp.stack([lo, hi], axis=-1).reshape(*a.shape[:-1], 32)

    # -- carry machinery ----------------------------------------------------

    def _carry(self, t):
        """Propagate carries on (..., 16) uint32 limbs (each < 2^27 or so),
        folding the top carry with weight 2^256 = 38 mod p.  Output limbs
        < 2^16."""
        xp = self.xp
        outs = []
        carry = xp.zeros_like(t[..., 0])
        for k in range(NLIMBS):
            v = t[..., k] + carry
            outs.append(v & MASK)
            carry = v >> LIMB_BITS
        # top carry: weight 2^256 == 38 (mod p)
        outs[0] = outs[0] + carry * xp.asarray(38, dtype=self.dtype)
        result = []
        carry = xp.zeros_like(t[..., 0])
        for k in range(NLIMBS):
            v = outs[k] + carry
            result.append(v & MASK)
            carry = v >> LIMB_BITS
        # If the second pass still carries out (value wrapped past 2^256),
        # the wrapped value is provably tiny (< 2*38), so folding 38*carry
        # into limb 0 cannot ripple further.
        result[0] = result[0] + carry * xp.asarray(38, dtype=self.dtype)
        return xp.stack(result, axis=-1)

    # -- ring ops -----------------------------------------------------------

    def add(self, a, b):
        return self._carry(a + b)

    def sub(self, a, b):
        xp = self.xp
        t = (a + self.PAD4P - b).astype(self.dtype)  # PAD4P limbs >= 2^16: no underflow
        # fold the implicit 17th limb of 4p (constant) with weight 2^256 = 38
        bump = xp.asarray(
            [self.PAD4P_TOP * 38] + [0] * (NLIMBS - 1), dtype=self.dtype
        )
        return self._carry(t + bump)


    def neg(self, a):
        return self.sub(self.xp.broadcast_to(self.ZERO, a.shape), a)

    def mul(self, a, b):
        xp = self.xp
        # outer products: (..., 16, 16), exact in uint32
        prods = a[..., :, None] * b[..., None, :]
        lo = prods & MASK
        hi = prods >> LIMB_BITS
        # Column sums via shift-and-pad: row i of ``lo`` lands at columns
        # i..i+15, row i of ``hi`` at i+1..i+16.  One stacked pad + one
        # reduction instead of ~250 scalar adds keeps the traced graph small
        # (compile time) and maps onto wide VPU reductions.
        zeros = xp.zeros_like(lo)
        wide = xp.concatenate([lo, zeros], axis=-1)  # (..., 16, 32)
        rolled_lo = xp.stack(
            [xp.roll(wide[..., i, :], i, axis=-1) for i in range(NLIMBS)], axis=-2
        )
        wide_h = xp.concatenate([hi, zeros], axis=-1)
        rolled_hi = xp.stack(
            [xp.roll(wide_h[..., i, :], i + 1, axis=-1) for i in range(NLIMBS)], axis=-2
        )
        # dtype= keeps numpy from promoting the accumulator to uint64
        cols = rolled_lo.sum(axis=-2, dtype=self.dtype) + rolled_hi.sum(
            axis=-2, dtype=self.dtype
        )  # (..., 32)
        # fold k >= 16 with weight 2^256 = 38 mod p
        t38 = xp.asarray(38, dtype=self.dtype)
        folded = cols[..., :NLIMBS] + cols[..., NLIMBS:] * t38
        return self._carry(folded)

    def square(self, a):
        return self.mul(a, a)

    # -- canonical form & predicates ----------------------------------------

    def canon(self, a):
        """Reduce to [0, p): subtract p up to twice with borrow-select."""
        for _ in range(2):
            a = self._cond_sub_p(a)
        return a

    def _cond_sub_p(self, a):
        xp = self.xp
        # compute a - p with borrow; select a if it underflows
        borrow = xp.zeros_like(a[..., 0])
        diffs = []
        for k in range(NLIMBS):
            need = self.P_LIMBS[k] + borrow  # <= 2^16, no overflow
            under = (a[..., k] < need).astype(self.dtype)
            diffs.append((a[..., k] - need) & MASK)
            borrow = under
        diff = xp.stack(diffs, axis=-1)
        ge_p = (borrow == 0)
        return xp.where(ge_p[..., None], diff, a)

    def eq(self, a, b):
        return self.xp.all(self.canon(a) == self.canon(b), axis=-1)

    def is_zero(self, a):
        return self.xp.all(self.canon(a) == 0, axis=-1)

    def is_negative(self, a):
        """Ristretto negativity: LSB of canonical form."""
        return (self.canon(a)[..., 0] & 1).astype(bool)

    def select(self, cond, a, b):
        """cond ? a : b, broadcasting cond over the limb axis."""
        return self.xp.where(cond[..., None], a, b)

    def abs(self, a):
        return self.select(self.is_negative(a), self.neg(a), a)

    def cneg(self, cond, a):
        return self.select(cond, self.neg(a), a)

    # -- exponentiation chains ----------------------------------------------

    def _sqn(self, a, n: int):
        for _ in range(n):
            a = self.square(a)
        return a

    def _pow22501(self, x):
        """Returns (x^(2^250 - 1), x^11) — shared prefix of invert/pow_p58
        (standard curve25519 chain)."""
        t0 = self.square(x)                     # 2
        t1 = self._sqn(t0, 2)                   # 8
        t1 = self.mul(x, t1)                    # 9
        t0 = self.mul(t0, t1)                   # 11
        t2 = self.square(t0)                    # 22
        t2 = self.mul(t1, t2)                   # 31 = 2^5 - 1
        t3 = self._sqn(t2, 5)
        t3 = self.mul(t3, t2)                   # 2^10 - 1
        t4 = self._sqn(t3, 10)
        t4 = self.mul(t4, t3)                   # 2^20 - 1
        t5 = self._sqn(t4, 20)
        t5 = self.mul(t5, t4)                   # 2^40 - 1
        t5 = self._sqn(t5, 10)
        t5 = self.mul(t5, t3)                   # 2^50 - 1
        t6 = self._sqn(t5, 50)
        t6 = self.mul(t6, t5)                   # 2^100 - 1
        t7 = self._sqn(t6, 100)
        t7 = self.mul(t7, t6)                   # 2^200 - 1
        t7 = self._sqn(t7, 50)
        t7 = self.mul(t7, t5)                   # 2^250 - 1
        return t7, t0

    def invert(self, x):
        """x^(p-2); 0 -> 0."""
        t7, t0 = self._pow22501(x)
        t = self._sqn(t7, 5)
        return self.mul(t, t0)  # 2^255 - 21

    def pow_p58(self, x):
        """x^((p-5)/8) = x^(2^252 - 3)."""
        t7, _ = self._pow22501(x)
        t = self._sqn(t7, 2)
        return self.mul(t, x)

    # -- sqrt ratio (RFC 9496 SQRT_RATIO_M1), batched -----------------------

    def sqrt_ratio_m1(self, u, v):
        """Returns (was_square bool mask, r)."""
        v3 = self.mul(self.square(v), v)
        v7 = self.mul(self.square(v3), v)
        r = self.mul(self.mul(u, v3), self.pow_p58(self.mul(u, v7)))
        check = self.mul(v, self.square(r))

        neg_u = self.neg(u)
        correct = self.eq(check, u)
        flipped = self.eq(check, neg_u)
        flipped_i = self.eq(check, self.mul(neg_u, self.SQRT_M1))

        r_prime = self.mul(r, self.SQRT_M1)
        r = self.select(flipped | flipped_i, r_prime, r)
        r = self.abs(r)
        return (correct | flipped), r

    def inv_sqrt(self, v):
        one = self.xp.broadcast_to(self.ONE, v.shape)
        return self.sqrt_ratio_m1(one, v)


_np_field: Field | None = None


def numpy_field() -> Field:
    global _np_field
    if _np_field is None:
        _np_field = Field(_np)
    return _np_field


_jax_field: Field | None = None


def jax_field() -> Field:
    global _jax_field
    if _jax_field is None:
        import jax.numpy as jnp

        _jax_field = Field(jnp)
    return _jax_field
