"""Batched fe25519 arithmetic in 18x15-bit relaxed limbs (TPU-native core).

This is the hot layer of the framework (SURVEY.md D1): field elements are
structure-of-arrays uint32 tensors of shape (..., 18), eighteen 15-bit limbs
little-endian, with SLACK: limbs are allowed up to 2^15 + 2^11.  The slack is
what makes the design TPU-shaped:

- after every op a single VECTORIZED partial-carry (3-4 ops over the limb
  axis) replaces a 16-step sequential carry chain: each limb absorbs only its
  immediate neighbor's high bits, and the residue stays within the slack;
- relaxed limbs still multiply safely in uint32: (2^15 + 2^11)^2 < 2^31, and
  hi/lo-split column sums stay < 2^26;
- 15*17 = 255, so limb 17 sits exactly at bit 255: the wrap 2^255 = 19 (mod
  p) folds limb-17 carries into limb 1 with a single multiply by 19*2^15 ==
  "19 into the next limb";
- the whole field-mul graph is ~60 XLA ops (vs ~500 for a chained-carry
  design), which keeps compile times of scan-of-point-ops kernels low and
  feeds the VPU wide uniform vector ops.

Exact normalization (``canon``) only happens at comparisons/serialization.

The same code runs under numpy (host) and jax.numpy (jit/TPU).  Ground
truth: xelis_he_tpu.pyref.field (cross-checked in tests/test_ops.py).
"""

from __future__ import annotations

import numpy as _np

from ..pyref import field as _pf

NLIMBS = 18
LIMB_BITS = 15
MASK = (1 << LIMB_BITS) - 1
SLACK_BOUND = (1 << LIMB_BITS) + (1 << 11)  # documented invariant

P_INT = _pf.P


def _int_to_limbs_list(v: int, n: int = NLIMBS) -> list[int]:
    return [(v >> (LIMB_BITS * k)) & MASK for k in range(n)]


def _pad_limbs() -> list[int]:
    """A multiple of p in NLIMBS limbs, every limb in [0x8800, 2^17), for
    borrow-free subtraction of any relaxed-limb operand."""
    m = (1 << LIMB_BITS) + (1 << 11) + 2  # ensures per-limb >= any operand limb
    v = m * P_INT
    limbs = [(v >> (LIMB_BITS * k)) & MASK for k in range(NLIMBS)]
    limbs.append(v >> (LIMB_BITS * NLIMBS))
    for k in range(NLIMBS):
        while limbs[k] < SLACK_BOUND:
            limbs[k] += 1 << LIMB_BITS
            limbs[k + 1] -= 1
    assert all(SLACK_BOUND <= l < (1 << 17) + (1 << 16) for l in limbs[:NLIMBS])
    assert limbs[NLIMBS] >= 0
    total = sum(l << (LIMB_BITS * k) for k, l in enumerate(limbs))
    assert total == m * P_INT
    return limbs


_PAD = _pad_limbs()


class Field:
    """fe25519 vector engine over a numpy-like module ``xp``."""

    def __init__(self, xp):
        self.xp = xp
        self.dtype = xp.uint32
        self.P_LIMBS = xp.asarray(_int_to_limbs_list(P_INT), dtype=xp.uint32)
        self.PAD = xp.asarray(_PAD[:NLIMBS], dtype=xp.uint32)
        self.PAD_TOP = _PAD[NLIMBS]  # python int (compile-time constant)
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
        raw = b"".join((v % P_INT).to_bytes(34, "little") for v in vs)
        b16 = _np.frombuffer(raw, dtype="<u2").reshape(len(vs), 17).astype(_np.uint32)
        return self.xp.asarray(self._b16_to_limbs_np(b16))

    @staticmethod
    def _b16_to_limbs_np(b16: _np.ndarray) -> _np.ndarray:
        """(N, 17) 16-bit words -> (N, 18) 15-bit limbs (numpy)."""
        out = _np.zeros((b16.shape[0], NLIMBS), dtype=_np.uint32)
        for k in range(NLIMBS):
            bit = 15 * k
            a, s = bit // 16, bit % 16
            v = b16[:, a] >> s
            if s > 1 and a + 1 < b16.shape[1]:
                v = v | (b16[:, a + 1] << (16 - s))
            out[:, k] = v & MASK
        return out

    @staticmethod
    def to_ints(a) -> list[int]:
        """Canonical limbs -> python ints, vectorized: widen 18x15-bit limbs
        into a (N, 40)-byte little-endian buffer in numpy, then one
        ``int.from_bytes`` per element (no per-limb python loop)."""
        arr = _np.asarray(a, dtype=_np.uint64).reshape(-1, NLIMBS)
        # limb k contributes at bit 15k = 8*(15k//8) + (15k%8): shift within
        # a 32-bit window starting at byte offset floor(15k/8)
        acc = _np.zeros((arr.shape[0], 40), dtype=_np.uint8)
        buf = _np.zeros((arr.shape[0], 40), dtype=_np.uint64)
        for k in range(NLIMBS):
            bit = LIMB_BITS * k
            byte, sh = bit // 8, bit % 8
            v = arr[:, k] << sh  # < 2^23
            buf[:, byte] += v & 0xFF
            buf[:, byte + 1] += (v >> 8) & 0xFF
            buf[:, byte + 2] += (v >> 16) & 0xFF
        # resolve inter-byte carries (values per byte < 2^9 before carry)
        carry = _np.zeros(arr.shape[0], dtype=_np.uint64)
        for j in range(40):
            t = buf[:, j] + carry
            acc[:, j] = t & 0xFF
            carry = t >> 8
        data = acc.tobytes()
        return [
            int.from_bytes(data[i * 40 : i * 40 + 40], "little")
            for i in range(arr.shape[0])
        ]

    def from_bytes_le(self, b):
        """(..., 32) uint8 -> limbs, masking bit 255 (dalek from_bytes)."""
        xp = self.xp
        b = b.astype(self.dtype)
        w16 = b[..., 0::2] + (b[..., 1::2] << 8)  # (..., 16) 16-bit words
        top_mask = xp.asarray([0xFFFF] * 15 + [0x7FFF], dtype=self.dtype)
        w16 = w16 & top_mask
        limbs = []
        for k in range(NLIMBS):
            bit = 15 * k
            a, s = bit // 16, bit % 16
            if bit >= 256:
                limbs.append(xp.zeros_like(w16[..., 0]))
                continue
            v = w16[..., a] >> s
            if a + 1 < 16:
                v = v | (w16[..., a + 1] << (16 - s))
            limbs.append(v & MASK)
        return xp.stack(limbs, axis=-1)

    def to_bytes_le(self, a):
        """Canonical limbs -> (..., 32) uint8."""
        xp = self.xp
        a = self.canon(a)
        words = []
        for j in range(16):
            bit = 16 * j
            k, s = bit // 15, bit % 15
            v = a[..., k] >> s
            if k + 1 < NLIMBS:
                v = v | (a[..., k + 1] << (15 - s))
            if k + 2 < NLIMBS and (15 - s) + 15 < 16:
                v = v | (a[..., k + 2] << (30 - s))
            words.append(v & 0xFFFF)
        w = xp.stack(words, axis=-1)
        lo = (w & 0xFF).astype(xp.uint8)
        hi = ((w >> 8) & 0xFF).astype(xp.uint8)
        return xp.stack([lo, hi], axis=-1).reshape(*a.shape[:-1], 32)

    # -- carry machinery ----------------------------------------------------

    def _partial_carry(self, t):
        """One vectorized carry step: each limb keeps its low 15 bits and
        absorbs the neighbor's high bits; limb-17 carries wrap into limb 1
        with weight 19 (2^270 = 19 * 2^15 mod p).  No sequential chain: the
        residue (< 2^11 per limb) lives inside the slack invariant."""
        xp = self.xp
        lo = t & MASK
        hi = t >> LIMB_BITS
        shifted = xp.concatenate([xp.zeros_like(hi[..., :1]), hi[..., :-1]], axis=-1)
        wrap = hi[..., NLIMBS - 1:] * xp.asarray(19, dtype=self.dtype)
        wrap_vec = xp.concatenate(
            [xp.zeros_like(wrap), wrap] + [xp.zeros_like(t[..., :NLIMBS - 2])],
            axis=-1,
        )
        return lo + shifted + wrap_vec

    def _exact_carry(self, t):
        """Full sequential normalization to limbs < 2^15 (canon only)."""
        xp = self.xp
        for _ in range(2):
            outs = []
            carry = xp.zeros_like(t[..., 0])
            for k in range(NLIMBS):
                v = t[..., k] + carry
                outs.append(v & MASK)
                carry = v >> LIMB_BITS
            outs[1] = outs[1] + carry * xp.asarray(19, dtype=self.dtype)
            t = xp.stack(outs, axis=-1)
        return t

    # -- ring ops -----------------------------------------------------------

    def add(self, a, b):
        return self._partial_carry(a + b)

    def sub(self, a, b):
        xp = self.xp
        t = (a + self.PAD - b).astype(self.dtype)
        # implicit top limb of PAD (weight 2^270 == 19*2^15): into limb 1
        bump = xp.asarray(
            [0, self.PAD_TOP * 19] + [0] * (NLIMBS - 2), dtype=self.dtype
        )
        return self._partial_carry(t + bump)

    def neg(self, a):
        return self.sub(self.xp.broadcast_to(self.ZERO, a.shape), a)

    def mul(self, a, b):
        xp = self.xp
        # outer products (..., 18, 18); relaxed limbs <= 2^15+2^11 so the
        # products stay < 2^31 — exact in uint32
        prods = a[..., :, None] * b[..., None, :]
        lo = prods & MASK
        hi = prods >> LIMB_BITS
        # column sums via shift-and-pad: row i of lo lands at columns
        # i..i+17, row i of hi at i+1..i+18 (36-wide accumulator)
        zeros = xp.zeros_like(lo)
        wide_l = xp.concatenate([lo, zeros], axis=-1)  # (..., 18, 36)
        rolled_lo = xp.stack(
            [xp.roll(wide_l[..., i, :], i, axis=-1) for i in range(NLIMBS)], axis=-2
        )
        wide_h = xp.concatenate([hi, zeros], axis=-1)
        rolled_hi = xp.stack(
            [xp.roll(wide_h[..., i, :], i + 1, axis=-1) for i in range(NLIMBS)], axis=-2
        )
        cols = rolled_lo.sum(axis=-2, dtype=self.dtype) + rolled_hi.sum(
            axis=-2, dtype=self.dtype
        )  # (..., 36); each < 2^26
        # fold: columns k >= 18 have weight 2^270 * 2^15(k-18) == 19 * 2^15 *
        # 2^15(k-18) (mod p) -> add 19*c_k into column k-17.
        t19 = xp.asarray(19, dtype=self.dtype)
        high = cols[..., NLIMBS:2 * NLIMBS - 1]  # columns 18..34 (17 of them)
        bump = xp.concatenate([xp.zeros_like(cols[..., :1]), high * t19], axis=-1)
        # column 35 (hi of limb17*limb17) wraps twice: 2^(15*35) == 19^2 *
        # 2^15 (mod p) -> 361 into column 1
        c35 = cols[..., 2 * NLIMBS - 1:] * xp.asarray(361, dtype=self.dtype)
        bump2 = xp.concatenate(
            [xp.zeros_like(c35), c35] + [xp.zeros_like(cols[..., : NLIMBS - 2])],
            axis=-1,
        )
        folded = cols[..., :NLIMBS] + bump + bump2
        # two passes: the first leaves up to ~2^14 of wrap residue in limb 1,
        # the second settles all limbs back under the ~2^15+64 invariant
        return self._partial_carry(self._partial_carry(folded))

    def square(self, a):
        return self.mul(a, a)

    # -- canonical form & predicates ----------------------------------------

    def canon(self, a):
        """Reduce to [0, p): normalize digits exactly, fold bit 255+, then
        conditionally subtract p (twice)."""
        xp = self.xp
        t = self._exact_carry(self._partial_carry(a))
        # limbs now < 2^15; value < 2^270.  limb 17 holds bits 255..269:
        # value = A + 2^255*B with B = limb17 -> A + 19*B.
        b_top = t[..., NLIMBS - 1:]
        bump = xp.concatenate(
            [b_top * xp.asarray(19, dtype=self.dtype)]
            + [xp.zeros_like(t[..., : NLIMBS - 1])],
            axis=-1,
        )
        t = self._exact_carry(
            xp.concatenate([t[..., : NLIMBS - 1], xp.zeros_like(b_top)], axis=-1)
            + bump
        )
        for _ in range(2):
            t = self._cond_sub_p(t)
        return t

    def _cond_sub_p(self, a):
        xp = self.xp
        borrow = xp.zeros_like(a[..., 0])
        diffs = []
        for k in range(NLIMBS):
            need = self.P_LIMBS[k] + borrow  # <= 2^15, no overflow
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
        """Ristretto negativity: LSB of the canonical encoding."""
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
        if n >= 8 and self.xp is not _np:
            # long squaring runs as a fori_loop: keeps the traced graph (and
            # compile time) small — the unrolled pow chains in invert/pow_p58
            # otherwise dominate whole-program XLA compile time
            from jax import lax

            return lax.fori_loop(0, n, lambda _, x: self.square(x), a)
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
