"""Pallas TPU kernels for the MSM hot path (SURVEY.md D4).

The jnp engine in ops.msm expresses the double-and-add scan as an XLA
``lax.scan``; every step's field-mul materializes (N, 18, 36) partial-product
tensors in HBM, so the scan is HBM-bandwidth-bound and compiles slowly.
This module implements the same per-lane scan as ONE Pallas kernel:

- point state (acc, base) lives in VMEM/registers for the entire 253-step
  loop: HBM traffic is one read of the points + one write of the result;
- limbs ride the SUBLANE axis and lanes ride the 128-wide LANE axis —
  field ops are (18, TILE) full-tile VPU ops (the jnp engine's (N, 18)
  layout puts only 18 elements on the 128-lane axis);
- scalar bits are packed 32/word into a (8, TILE) u32 block (the jnp
  engine streams a (253, N) bit tensor from HBM).

The kernel computes per-lane acc_i = s_i * P_i; callers tree-reduce the
lanes (cheap, done in the enclosing jit with the jnp engine's reducer).

Field element layout here: (18, T) uint32, eighteen 15-bit relaxed limbs
(same invariants as ops.fe, transposed).  Points: tuples (X, Y, Z, T) of
(18, T) tensors.
"""

from __future__ import annotations

import functools
import os

import numpy as _np


def _want_interpret(flag: bool) -> bool:
    """Interpreter-mode override for non-TPU validation runs (the sharded
    lanes equivalence tests execute these kernels on the emulated CPU
    mesh, where Mosaic can't compile)."""
    return flag or os.environ.get("XELIS_PALLAS_INTERPRET") == "1"


NLIMBS = 18
LIMB_BITS = 15
MASK = (1 << LIMB_BITS) - 1
N_BITS = 253  # ristretto scalars are < 2^253
N_WORDS = 8  # ceil(253 / 32)

# lane tile: lanes per kernel program (must be a multiple of 128)
TILE = 512


# ---------------------------------------------------------------------------
# transposed field ops (jnp code, traced inside the kernel)
# ---------------------------------------------------------------------------


def _carry_t(t, jnp):
    """Relaxed partial carry on (18, T): each limb keeps its low 15 bits and
    absorbs its lower neighbor's high bits; limb-17 overflow wraps into limb
    1 with weight 19 (2^270 = 19 * 2^15 mod p).  Mirrors fe._partial_carry."""
    lo = t & MASK
    hi = t >> LIMB_BITS
    shifted = jnp.concatenate([jnp.zeros_like(hi[:1]), hi[:-1]], axis=0)
    wrap = hi[NLIMBS - 1 : NLIMBS] * jnp.uint32(19)
    zeros = jnp.zeros_like(t[: NLIMBS - 2])
    wrap_vec = jnp.concatenate([jnp.zeros_like(wrap), wrap, zeros], axis=0)
    return lo + shifted + wrap_vec


def _mul_t(a, b, jnp):
    """(18, T) x (18, T) field mul; same algebra as fe.mul, transposed.

    36 column sums accumulated with static row-slices (hi/lo split keeps
    every partial < 2^21, folded columns < 2^26 — exact in uint32)."""
    T = a.shape[1]
    acc = jnp.zeros((2 * NLIMBS, T), dtype=jnp.uint32)

    def _shift_rows(x, j, total):
        """Place the 18 rows of x at row offset j of a `total`-row block
        (concat-based; Mosaic has no scatter)."""
        parts = []
        if j:
            parts.append(jnp.zeros((j, T), dtype=jnp.uint32))
        parts.append(x)
        tail = total - j - NLIMBS
        if tail:
            parts.append(jnp.zeros((tail, T), dtype=jnp.uint32))
        return jnp.concatenate(parts, axis=0)

    for j in range(NLIMBS):
        p = a * b[j : j + 1]  # (18, T), products < 2^31
        lo = p & MASK
        hi = p >> LIMB_BITS
        acc = acc + _shift_rows(lo, j, 2 * NLIMBS)
        acc = acc + _shift_rows(hi, j + 1, 2 * NLIMBS + 1)[: 2 * NLIMBS]
    # fold: column k >= 18 has weight 19 * 2^(15(k-17)) (mod p)
    high = acc[NLIMBS : 2 * NLIMBS - 1] * jnp.uint32(19)  # -> columns 1..17
    folded = acc[:NLIMBS] + jnp.concatenate(
        [jnp.zeros((1, T), dtype=jnp.uint32), high], axis=0
    )
    # column 35 wraps twice: 19^2 into column 1
    c35 = acc[2 * NLIMBS - 1 : 2 * NLIMBS] * jnp.uint32(361)
    folded = folded + jnp.concatenate(
        [
            jnp.zeros((1, T), dtype=jnp.uint32),
            c35,
            jnp.zeros((NLIMBS - 2, T), dtype=jnp.uint32),
        ],
        axis=0,
    )
    return _carry_t(_carry_t(folded, jnp), jnp)


def _sqr_t(a, jnp):
    """(18, T) field squaring: exploits product symmetry — off-diagonal
    terms a_i*a_j (i<j) are computed once and doubled, cutting the multiply
    count from 324 to 171.  Doubled products stay < 2^32 (relaxed limbs are
    <= 2^15 + 2^11, so 2*(2^15+2^11)^2 < 2^32) and the hi/lo split keeps
    column sums < 2^22 — exact in uint32."""
    T = a.shape[1]
    acc = jnp.zeros((2 * NLIMBS, T), dtype=jnp.uint32)

    def _place(x, lo_row, total):
        """rows of x at row offset lo_row of a `total`-row zero block."""
        n = x.shape[0]
        parts = []
        if lo_row:
            parts.append(jnp.zeros((lo_row, T), dtype=jnp.uint32))
        parts.append(x)
        tail = total - lo_row - n
        if tail:
            parts.append(jnp.zeros((tail, T), dtype=jnp.uint32))
        return jnp.concatenate(parts, axis=0)

    for j in range(NLIMBS):
        aj = a[j : j + 1]
        if j > 0:
            # off-diagonal: 2 * a[0:j] * a[j] lands at columns j .. 2j-1
            p = a[:j] * aj
            p2 = p + p
            lo = p2 & MASK
            hi = p2 >> LIMB_BITS
            acc = acc + _place(lo, j, 2 * NLIMBS)
            acc = acc + _place(hi, j + 1, 2 * NLIMBS)
        # diagonal a_j^2 at column 2j
        d = aj * aj
        dlo = d & MASK
        dhi = d >> LIMB_BITS
        acc = acc + _place(dlo, 2 * j, 2 * NLIMBS)
        acc = acc + _place(dhi, 2 * j + 1, 2 * NLIMBS)
    # same fold as _mul_t
    high = acc[NLIMBS : 2 * NLIMBS - 1] * jnp.uint32(19)
    folded = acc[:NLIMBS] + jnp.concatenate(
        [jnp.zeros((1, T), dtype=jnp.uint32), high], axis=0
    )
    c35 = acc[2 * NLIMBS - 1 : 2 * NLIMBS] * jnp.uint32(361)
    folded = folded + jnp.concatenate(
        [
            jnp.zeros((1, T), dtype=jnp.uint32),
            c35,
            jnp.zeros((NLIMBS - 2, T), dtype=jnp.uint32),
        ],
        axis=0,
    )
    return _carry_t(_carry_t(folded, jnp), jnp)


def _make_pad_limbs():
    from .fe import _PAD

    return _PAD


def _sub_t_consts(np_mod):
    from .fe import _PAD

    pad = np_mod.asarray(_PAD[:NLIMBS], dtype=np_mod.uint32).reshape(NLIMBS, 1)
    bump = np_mod.zeros((NLIMBS, 1), dtype=np_mod.uint32)
    bump[1, 0] = _PAD[NLIMBS] * 19
    return pad, bump


_PAD_COL, _BUMP_COL = _sub_t_consts(_np)


def _add_t(a, b, jnp):
    return _carry_t(a + b, jnp)


def _sub_t(a, b, jnp, pad, bump):
    return _carry_t(a + pad - b + bump, jnp)


def _point_add_t(p, q, jnp, consts):
    """Unified extended addition (add-2008-hwcd-3, a=-1), transposed."""
    d2_col, pad, bump = consts
    X1, Y1, Z1, T1 = p
    X2, Y2, Z2, T2 = q
    A = _mul_t(_sub_t(Y1, X1, jnp, pad, bump), _sub_t(Y2, X2, jnp, pad, bump), jnp)
    B = _mul_t(_add_t(Y1, X1, jnp), _add_t(Y2, X2, jnp), jnp)
    C = _mul_t(_mul_t(T1, d2_col, jnp), T2, jnp)
    D = _mul_t(_add_t(Z1, Z1, jnp), Z2, jnp)
    E = _sub_t(B, A, jnp, pad, bump)
    F = _sub_t(D, C, jnp, pad, bump)
    G = _add_t(D, C, jnp)
    H = _add_t(B, A, jnp)
    return (
        _mul_t(E, F, jnp),
        _mul_t(G, H, jnp),
        _mul_t(F, G, jnp),
        _mul_t(E, H, jnp),
    )


def _point_double_t(p, jnp, consts, want_t: bool = True):
    """Dedicated doubling (dbl-2008-hwcd, a=-1), transposed.  ``want_t``
    False skips the T output (one mul) — legal when the result is only
    doubled again before the next addition."""
    _, pad, bump = consts
    X1, Y1, Z1, _ = p
    A = _sqr_t(X1, jnp)
    B = _sqr_t(Y1, jnp)
    Zsq = _sqr_t(Z1, jnp)
    C = _add_t(Zsq, Zsq, jnp)
    H = _add_t(A, B, jnp)
    xy = _add_t(X1, Y1, jnp)
    E = _sub_t(H, _sqr_t(xy, jnp), jnp, pad, bump)
    G = _sub_t(A, B, jnp, pad, bump)
    F = _add_t(C, G, jnp)
    return (
        _mul_t(E, F, jnp),
        _mul_t(G, H, jnp),
        _mul_t(F, G, jnp),
        _mul_t(E, H, jnp) if want_t else E,
    )


def _point_select_t(mask_row, p, q, jnp):
    """mask_row: (1, T) bool-ish — mask ? p : q, per coordinate."""
    return tuple(jnp.where(mask_row != 0, a, b) for a, b in zip(p, q))


# ---------------------------------------------------------------------------
# transposed canonicalization / predicates (for compress/decompress kernels)
# ---------------------------------------------------------------------------

_P_LIMBS_INTS = None


def _p_limbs():
    global _P_LIMBS_INTS
    if _P_LIMBS_INTS is None:
        from ..pyref import field as _pf

        _P_LIMBS_INTS = [(_pf.P >> (LIMB_BITS * k)) & MASK for k in range(NLIMBS)]
    return _P_LIMBS_INTS


def _exact_carry_t(t, jnp):
    """Sequential normalization to limbs < 2^15 (mirrors fe._exact_carry)."""
    T = t.shape[1]
    for _ in range(2):
        rows = []
        carry = jnp.zeros((1, T), dtype=jnp.uint32)
        for k in range(NLIMBS):
            v = t[k : k + 1] + carry
            rows.append(v & MASK)
            carry = v >> LIMB_BITS
        rows[1] = rows[1] + carry * jnp.uint32(19)
        t = jnp.concatenate(rows, axis=0)
    return t


def _cond_sub_p_t(a, jnp):
    """Subtract p where a >= p (mirrors fe._cond_sub_p); limbs < 2^15 in."""
    T = a.shape[1]
    p_limbs = _p_limbs()
    borrow = jnp.zeros((1, T), dtype=jnp.uint32)
    diffs = []
    for k in range(NLIMBS):
        need = jnp.uint32(p_limbs[k]) + borrow
        row = a[k : k + 1]
        under = (row < need).astype(jnp.uint32)
        diffs.append((row - need) & MASK)
        borrow = under
    diff = jnp.concatenate(diffs, axis=0)
    ge_p = borrow == 0  # (1, T)
    return jnp.where(ge_p, diff, a)


def _canon_t(a, jnp):
    """Reduce to [0, p) (mirrors fe.canon)."""
    T = a.shape[1]
    t = _exact_carry_t(_carry_t(a, jnp), jnp)
    # limb 17 holds bits 255..269: fold 19 * top into limb 0
    b_top = t[NLIMBS - 1 : NLIMBS] * jnp.uint32(19)
    t = jnp.concatenate(
        [t[: NLIMBS - 1], jnp.zeros((1, T), dtype=jnp.uint32)], axis=0
    ) + jnp.concatenate([b_top, jnp.zeros((NLIMBS - 1, T), dtype=jnp.uint32)], axis=0)
    t = _exact_carry_t(t, jnp)
    t = _cond_sub_p_t(t, jnp)
    t = _cond_sub_p_t(t, jnp)
    return t


def _eq_canon_t(a_canon, b_canon, jnp):
    """(1, T) uint32 equality mask of two canonical elements.  (Mosaic has
    no unsigned reductions — reduce in int32.)"""
    eq = (a_canon == b_canon).astype(jnp.int32)
    return jnp.min(eq, axis=0, keepdims=True).astype(jnp.uint32)


def _is_zero_canon_t(a_canon, jnp):
    eq = (a_canon == 0).astype(jnp.int32)
    return jnp.min(eq, axis=0, keepdims=True).astype(jnp.uint32)


def _is_negative_t(a, jnp):
    """Ristretto negativity: LSB of the canonical encoding — (1, T) u32."""
    return _canon_t(a, jnp)[0:1] & jnp.uint32(1)


def _select_t(mask_row, a, b, jnp):
    return jnp.where(mask_row != 0, a, b)


def _neg_t(a, jnp, consts):
    _, pad, bump = consts
    return _carry_t(pad - a + bump, jnp)


def _abs_t(a, jnp, consts):
    return _select_t(_is_negative_t(a, jnp), _neg_t(a, jnp, consts), a, jnp)


def _pow22501_t(x, jnp):
    """(x^(2^250 - 1), x^11) — shared prefix of invert/pow_p58."""
    import jax

    def sqn(a, n):
        if n >= 8:
            # long squaring runs as fori_loop: the unrolled ~250-squaring
            # chain otherwise dominates kernel trace + Mosaic compile time
            return jax.lax.fori_loop(0, n, lambda _, v: _sqr_t(v, jnp), a)
        for _ in range(n):
            a = _sqr_t(a, jnp)
        return a

    t0 = _sqr_t(x, jnp)
    t1 = sqn(t0, 2)
    t1 = _mul_t(x, t1, jnp)
    t0 = _mul_t(t0, t1, jnp)
    t2 = _sqr_t(t0, jnp)
    t2 = _mul_t(t1, t2, jnp)
    t3 = sqn(t2, 5)
    t3 = _mul_t(t3, t2, jnp)
    t4 = sqn(t3, 10)
    t4 = _mul_t(t4, t3, jnp)
    t5 = sqn(t4, 20)
    t5 = _mul_t(t5, t4, jnp)
    t5 = sqn(t5, 10)
    t5 = _mul_t(t5, t3, jnp)
    t6 = sqn(t5, 50)
    t6 = _mul_t(t6, t5, jnp)
    t7 = sqn(t6, 100)
    t7 = _mul_t(t7, t6, jnp)
    t7 = sqn(t7, 50)
    t7 = _mul_t(t7, t5, jnp)
    return t7, t0


def _pow_p58_t(x, jnp):
    """x^((p-5)/8) = x^(2^252 - 3) (mirrors fe.pow_p58)."""
    t7, _ = _pow22501_t(x, jnp)
    t = _sqr_t(_sqr_t(t7, jnp), jnp)
    return _mul_t(t, x, jnp)


def _sqrt_ratio_m1_t(u, v, jnp, consts, sqrt_m1):
    """RFC 9496 SQRT_RATIO_M1, transposed (mirrors fe.sqrt_ratio_m1).
    Returns ((1, T) was_square mask, r)."""
    v3 = _mul_t(_sqr_t(v, jnp), v, jnp)
    v7 = _mul_t(_sqr_t(v3, jnp), v, jnp)
    r = _mul_t(_mul_t(u, v3, jnp), _pow_p58_t(_mul_t(u, v7, jnp), jnp), jnp)
    check = _mul_t(v, _sqr_t(r, jnp), jnp)

    neg_u = _neg_t(u, jnp, consts)
    check_c = _canon_t(check, jnp)
    correct = _eq_canon_t(check_c, _canon_t(u, jnp), jnp)
    flipped = _eq_canon_t(check_c, _canon_t(neg_u, jnp), jnp)
    flipped_i = _eq_canon_t(
        check_c, _canon_t(_mul_t(neg_u, sqrt_m1, jnp), jnp), jnp
    )

    r_prime = _mul_t(r, sqrt_m1, jnp)
    r = _select_t(flipped | flipped_i, r_prime, r, jnp)
    r = _abs_t(r, jnp, consts)
    return (correct | flipped), r


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------


def _identity_cols(T, jnp):
    zero = jnp.zeros((NLIMBS, T), dtype=jnp.uint32)
    one = jnp.concatenate(
        [jnp.ones((1, T), dtype=jnp.uint32), zero[1:]], axis=0
    )
    return (zero, one, one, zero)


def _daa_kernel(consts_ref, bits_ref, pts_ref, out_ref):
    """Per-lane binary double-and-add: out[lane] = s[lane] * P[lane].

    consts_ref: (64, 128) u32 — rows 0-17 D2 limbs, 18-35 PAD limbs,
                36-53 the subtraction bump (fe.sub's implicit top limb).
    bits_ref:   (8, TILE) u32 — scalar bits packed 32/word, LSB-first.
    pts_ref:    (72, TILE) u32 — [X; Y; Z; T] limbs.
    out_ref:    (72, TILE) u32.
    """
    import jax
    import jax.numpy as jnp

    T = pts_ref.shape[1]
    # constants arrive pre-broadcast to full lane width (Mosaic cannot fuse
    # a sublane+lane broadcast in one op)
    d2_col = consts_ref[0:NLIMBS, :]
    pad = consts_ref[NLIMBS : 2 * NLIMBS, :]
    bump = consts_ref[2 * NLIMBS : 3 * NLIMBS, :]
    consts = (d2_col, pad, bump)

    base = tuple(pts_ref[c * NLIMBS : (c + 1) * NLIMBS, :] for c in range(4))
    acc = _identity_cols(T, jnp)

    state = (acc, base)
    for word in range(N_WORDS):
        row = bits_ref[word : word + 1, :]  # (1, T) — static sublane index
        nbits = min(32, N_BITS - 32 * word)

        def step(k, state, row=row):
            acc, base = state
            bit = (row >> k.astype(jnp.uint32)) & jnp.uint32(1)  # (1, T)
            added = _point_add_t(acc, base, jnp, consts)
            acc = _point_select_t(bit, added, acc, jnp)
            base = _point_double_t(base, jnp, consts)
            return (acc, base)

        state = jax.lax.fori_loop(0, nbits, step, state)

    acc, _ = state
    out_ref[:] = jnp.concatenate(list(acc), axis=0)


def _tile_reduce_kernel(consts_ref, acc_ref, out_ref):
    """Reduce each TILE of lanes to its point sum (left in lane 0).

    Shifted-add reduction: after adds with shifts h = 1, 2, ..., TILE/2,
    lane 0 holds the group sum of its tile (identity-padded lanes are
    neutral).  Rolls wrap within the tile, so only lane 0 is meaningful.
    """
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    T = acc_ref.shape[1]
    d2_col = consts_ref[0:NLIMBS, :]
    pad = consts_ref[NLIMBS : 2 * NLIMBS, :]
    bump = consts_ref[2 * NLIMBS : 3 * NLIMBS, :]
    consts = (d2_col, pad, bump)

    acc = tuple(acc_ref[c * NLIMBS : (c + 1) * NLIMBS, :] for c in range(4))
    h = 1
    while h < T:
        # left-roll by h == right-roll by T - h (pltpu.roll wants shift >= 0)
        rolled = tuple(pltpu.roll(c, T - h, 1) for c in acc)
        acc = _point_add_t(acc, rolled, jnp, consts)
        h *= 2
    out_ref[:] = jnp.concatenate(list(acc), axis=0)


@functools.lru_cache(maxsize=8)
def _tile_reduce_call(n_lanes: int, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    tile = min(TILE, n_lanes)
    assert n_lanes % tile == 0
    grid = (n_lanes // tile,)

    return pl.pallas_call(
        _tile_reduce_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((CONSTS_ROWS, tile), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * NLIMBS, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (4 * NLIMBS, tile), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((4 * NLIMBS, n_lanes), jnp.uint32),
        interpret=interpret,
    )


def tile_sums_pallas(points, interpret: bool = False):
    """Per-tile point sums: reduces each TILE-lane block of the batch to one
    point.  Input/output: tuple (X, Y, Z, T) of (N, 18); output has
    N // min(TILE, N) lanes (lane j = sum of input tile j)."""
    import jax.numpy as jnp

    n = points[0].shape[0]
    tile = min(TILE, n)
    stacked = jnp.concatenate([jnp.transpose(c, (1, 0)) for c in points], axis=0)
    consts = jnp.broadcast_to(jnp.asarray(_consts_array()), (CONSTS_ROWS, tile))
    consts = jnp.asarray(consts)
    out = _tile_reduce_call(n, _want_interpret(interpret))(consts, stacked)
    out = out[:, ::tile]  # lane 0 of each tile
    return tuple(
        jnp.transpose(out[c * NLIMBS : (c + 1) * NLIMBS, :], (1, 0)) for c in range(4)
    )


_CONSTS_NP: _np.ndarray | None = None
CONSTS_ROWS = 128


def _consts_array() -> _np.ndarray:
    """(128, 1) u32 constant column; callers broadcast to (128, n_lanes)
    before the pallas_call.  Row blocks of 18:
    0: D2, 1: PAD, 2: BUMP (fe.sub's implicit top limb), 3: SQRT_M1,
    4: INVSQRT_A_MINUS_D, 5: D, 6: ONE."""
    global _CONSTS_NP
    if _CONSTS_NP is None:
        from ..pyref import field as _pf

        def limbs(v):
            return [(v >> (LIMB_BITS * k)) & MASK for k in range(NLIMBS)]

        out = _np.zeros((CONSTS_ROWS, 1), dtype=_np.uint32)
        out[0:NLIMBS, 0] = limbs(2 * _pf.D % _pf.P)
        out[NLIMBS : 2 * NLIMBS, 0] = _PAD_COL[:, 0]
        out[2 * NLIMBS : 3 * NLIMBS, 0] = _BUMP_COL[:, 0]
        out[3 * NLIMBS : 4 * NLIMBS, 0] = limbs(_pf.SQRT_M1)
        out[4 * NLIMBS : 5 * NLIMBS, 0] = limbs(_pf.INVSQRT_A_MINUS_D)
        out[5 * NLIMBS : 6 * NLIMBS, 0] = limbs(_pf.D)
        out[6 * NLIMBS, 0] = 1
        _CONSTS_NP = out
    return _CONSTS_NP


def _kernel_consts(consts_ref, want=3):
    """Slice the broadcast consts block into (18, T) field elements."""
    blocks = [
        consts_ref[i * NLIMBS : (i + 1) * NLIMBS, :] for i in range(want)
    ]
    return blocks


def _compress_kernel(consts_ref, pts_ref, out_ref):
    """Batched Ristretto ENCODE: (72, T) extended points -> (18, T)
    canonical s limbs (mirrors curve.compress; RFC 9496)."""
    import jax.numpy as jnp

    d2_col, pad, bump, sqrt_m1, invsqrt_a_minus_d = _kernel_consts(consts_ref, 5)
    consts = (d2_col, pad, bump)

    X, Y, Z, Tc = tuple(pts_ref[c * NLIMBS : (c + 1) * NLIMBS, :] for c in range(4))
    T = X.shape[1]

    u1 = _mul_t(_add_t(Z, Y, jnp), _sub_t(Z, Y, jnp, pad, bump), jnp)
    u2 = _mul_t(X, Y, jnp)
    one = jnp.concatenate(
        [jnp.ones((1, T), dtype=jnp.uint32), jnp.zeros((NLIMBS - 1, T), dtype=jnp.uint32)],
        axis=0,
    )
    _, invsqrt = _sqrt_ratio_m1_t(
        one, _mul_t(u1, _sqr_t(u2, jnp), jnp), jnp, consts, sqrt_m1
    )
    den1 = _mul_t(invsqrt, u1, jnp)
    den2 = _mul_t(invsqrt, u2, jnp)
    z_inv = _mul_t(_mul_t(den1, den2, jnp), Tc, jnp)
    ix0 = _mul_t(X, sqrt_m1, jnp)
    iy0 = _mul_t(Y, sqrt_m1, jnp)
    enchanted = _mul_t(den1, invsqrt_a_minus_d, jnp)
    rotate = _is_negative_t(_mul_t(Tc, z_inv, jnp), jnp)
    x = _select_t(rotate, iy0, X, jnp)
    y = _select_t(rotate, ix0, Y, jnp)
    den_inv = _select_t(rotate, enchanted, den2, jnp)
    y = _select_t(
        _is_negative_t(_mul_t(x, z_inv, jnp), jnp), _neg_t(y, jnp, consts), y, jnp
    )
    s = _abs_t(_mul_t(den_inv, _sub_t(Z, y, jnp, pad, bump), jnp), jnp, consts)
    out_ref[:] = _canon_t(s, jnp)


def _decompress_kernel(consts_ref, s_ref, pts_ref, valid_ref):
    """Batched validating Ristretto DECODE (mirrors curve.decompress).

    s_ref: (18, T) limbs of the encoding (top bit already masked by
    from_bytes_le).  Outputs: pts (72, T) CANONICAL extended coords
    (identity on invalid lanes), valid (8, T) u32 (row 0 meaningful).
    Validity here covers s < p, nonnegativity, square-ness, t sign and
    y != 0; the caller must additionally reject encodings with bit 255 set.
    """
    import jax.numpy as jnp

    d2_col, pad, bump, sqrt_m1, _, d_const = _kernel_consts(consts_ref, 6)
    consts = (d2_col, pad, bump)

    s_raw = s_ref[:]
    T = s_raw.shape[1]
    s = _canon_t(s_raw, jnp)
    canonical = _eq_canon_t(s, s_raw, jnp)  # s_raw already < 2^255
    nonneg = (s[0:1] & jnp.uint32(1)) ^ jnp.uint32(1)

    one = jnp.concatenate(
        [jnp.ones((1, T), dtype=jnp.uint32), jnp.zeros((NLIMBS - 1, T), dtype=jnp.uint32)],
        axis=0,
    )
    ss = _sqr_t(s, jnp)
    u1 = _sub_t(one, ss, jnp, pad, bump)
    u2 = _add_t(one, ss, jnp)
    u2_sqr = _sqr_t(u2, jnp)
    du1 = _mul_t(_mul_t(d_const, u1, jnp), u1, jnp)
    v = _sub_t(_neg_t(du1, jnp, consts), u2_sqr, jnp, pad, bump)
    was_square, invsqrt = _sqrt_ratio_m1_t(
        one, _mul_t(v, u2_sqr, jnp), jnp, consts, sqrt_m1
    )
    den_x = _mul_t(invsqrt, u2, jnp)
    den_y = _mul_t(_mul_t(invsqrt, den_x, jnp), v, jnp)
    x = _abs_t(_mul_t(_add_t(s, s, jnp), den_x, jnp), jnp, consts)
    y = _mul_t(u1, den_y, jnp)
    t = _mul_t(x, y, jnp)

    y_c = _canon_t(y, jnp)
    valid = (
        canonical
        & nonneg
        & was_square
        & (_is_negative_t(t, jnp) ^ jnp.uint32(1))
        & (_is_zero_canon_t(y_c, jnp) ^ jnp.uint32(1))
    )

    zero = jnp.zeros((NLIMBS, T), dtype=jnp.uint32)
    x_out = _select_t(valid, _canon_t(x, jnp), zero, jnp)
    y_out = _select_t(valid, y_c, one, jnp)
    t_out = _select_t(valid, _canon_t(t, jnp), zero, jnp)
    pts_ref[:] = jnp.concatenate([x_out, y_out, one, t_out], axis=0)
    valid_ref[:] = jnp.broadcast_to(valid, (8, T))


# ---------------------------------------------------------------------------
# host-facing API
# ---------------------------------------------------------------------------


def pack_bits(scalars) -> _np.ndarray:
    """list[int] or (N, 32) uint8 canonical little-endian scalars ->
    (8, N) uint32, bit k of scalar i at word k//32, bit k%32."""
    if not isinstance(scalars, _np.ndarray):
        raw = b"".join(s.to_bytes(32, "little") for s in scalars)
        scalars = _np.frombuffer(raw, dtype=_np.uint8).reshape(-1, 32)
    words = scalars.reshape(-1, 8, 4).astype(_np.uint32)
    packed = (
        words[:, :, 0]
        | (words[:, :, 1] << 8)
        | (words[:, :, 2] << 16)
        | (words[:, :, 3] << 24)
    )  # (N, 8)
    return _np.ascontiguousarray(packed.T)  # (8, N)


@functools.lru_cache(maxsize=8)
def _daa_call(n_lanes: int, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    tile = min(TILE, n_lanes)
    assert n_lanes % tile == 0
    grid = (n_lanes // tile,)

    fn = pl.pallas_call(
        _daa_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((CONSTS_ROWS, tile), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N_WORDS, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * NLIMBS, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (4 * NLIMBS, tile), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((4 * NLIMBS, n_lanes), jnp.uint32),
        interpret=interpret,
    )
    return fn


def msm_daa_lanes_pallas(points, bits_packed, interpret: bool = False):
    """Per-lane s_i * P_i via the Pallas kernel.

    points: tuple (X, Y, Z, T) of (N, 18) uint32 (ops.fe layout).
    bits_packed: (8, N) uint32 (pack_bits).
    Returns the same tuple-of-(N, 18) layout.  Traceable under jit.
    """
    import jax.numpy as jnp

    n = points[0].shape[0]
    stacked = jnp.concatenate(
        [jnp.transpose(c, (1, 0)) for c in points], axis=0
    )  # (72, N)
    tile = min(TILE, n)
    consts = jnp.broadcast_to(jnp.asarray(_consts_array()), (CONSTS_ROWS, tile))
    consts = jnp.asarray(consts)  # materialize: in-kernel slices must be real
    out = _daa_call(n, _want_interpret(interpret))(consts, bits_packed, stacked)
    return tuple(
        jnp.transpose(out[c * NLIMBS : (c + 1) * NLIMBS, :], (1, 0)) for c in range(4)
    )


@functools.lru_cache(maxsize=8)
def _compress_call(n_lanes: int, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    tile = min(TILE, n_lanes)
    assert n_lanes % tile == 0
    grid = (n_lanes // tile,)

    return pl.pallas_call(
        _compress_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((CONSTS_ROWS, tile), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * NLIMBS, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((NLIMBS, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NLIMBS, n_lanes), jnp.uint32),
        interpret=interpret,
    )


def compress_pallas(points, interpret: bool = False):
    """Batched Ristretto encode via the Pallas kernel.

    points: tuple (X, Y, Z, T) of (N, 18) uint32.  Returns (N, 32) uint8
    encodings (byte conversion is a cheap jnp shuffle on the canonical
    limbs the kernel emits).  Traceable under jit.
    """
    import jax.numpy as jnp

    n = points[0].shape[0]
    stacked = jnp.concatenate([jnp.transpose(c, (1, 0)) for c in points], axis=0)
    tile = min(TILE, n)
    consts = jnp.asarray(
        jnp.broadcast_to(jnp.asarray(_consts_array()), (CONSTS_ROWS, tile))
    )
    s = _compress_call(n, _want_interpret(interpret))(consts, stacked)  # (18, N) canonical
    return _limbs_to_bytes(jnp.transpose(s, (1, 0)), jnp)


@functools.lru_cache(maxsize=8)
def _decompress_call(n_lanes: int, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    tile = min(TILE, n_lanes)
    assert n_lanes % tile == 0
    grid = (n_lanes // tile,)

    return pl.pallas_call(
        _decompress_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((CONSTS_ROWS, tile), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NLIMBS, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((4 * NLIMBS, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((4 * NLIMBS, n_lanes), jnp.uint32),
            jax.ShapeDtypeStruct((8, n_lanes), jnp.uint32),
        ),
        interpret=interpret,
    )


def decompress_pallas(data, interpret: bool = False):
    """Batched validating Ristretto decode via the Pallas kernel.

    data: (N, 32) uint8 encodings.  Returns (points, valid) where points is
    the tuple-of-(N, 18) CANONICAL extended coords (identity on invalid
    lanes) and valid is an (N,) bool mask.  Traceable under jit.
    """
    import jax.numpy as jnp

    from .fe import jax_field

    n = data.shape[0]
    fe = jax_field()
    s = fe.from_bytes_le(data)  # (N, 18), top bit masked
    top_clear = (data[:, 31] >> 7) == 0
    tile = min(TILE, n)
    consts = jnp.asarray(
        jnp.broadcast_to(jnp.asarray(_consts_array()), (CONSTS_ROWS, tile))
    )
    pts, valid = _decompress_call(n, _want_interpret(interpret))(consts, jnp.transpose(s, (1, 0)))
    points = tuple(
        jnp.transpose(pts[c * NLIMBS : (c + 1) * NLIMBS, :], (1, 0)) for c in range(4)
    )
    return points, (valid[0, :] != 0) & top_clear


def _limbs_to_bytes(a, jnp):
    """CANONICAL (N, 18) limbs -> (N, 32) uint8 little-endian (the shuffle
    from fe.to_bytes_le without the canon pass)."""
    words = []
    for j in range(16):
        bit = 16 * j
        k, sh = bit // 15, bit % 15
        v = a[..., k] >> sh
        if k + 1 < NLIMBS:
            v = v | (a[..., k + 1] << (15 - sh))
        if k + 2 < NLIMBS and (15 - sh) + 15 < 16:
            v = v | (a[..., k + 2] << (30 - sh))
        words.append(v & 0xFFFF)
    w = jnp.stack(words, axis=-1)
    lo = (w & 0xFF).astype(jnp.uint8)
    hi = ((w >> 8) & 0xFF).astype(jnp.uint8)
    return jnp.stack([lo, hi], axis=-1).reshape(*a.shape[:-1], 32)


# ---------------------------------------------------------------------------
# 4-bit signed-window DAA (the production MSM kernel)
# ---------------------------------------------------------------------------

N_WINDOWS = 64  # 256 bits / 4


def recode_signed4(scalars) -> _np.ndarray:
    """Canonical scalars -> (64, N) uint32 signed base-16 digits, stored as
    e_w + 8 with e_w in [-7, 8]:  s = sum_w e_w * 16^w.

    Signed digits halve the per-lane table (8 entries + negation) versus
    unsigned 4-bit windows.  Scalars are < 2^253 so the top digit never
    overflows under carry propagation.
    """
    if not isinstance(scalars, _np.ndarray):
        raw = b"".join(s.to_bytes(32, "little") for s in scalars)
        scalars = _np.frombuffer(raw, dtype=_np.uint8).reshape(-1, 32)
    n = scalars.shape[0]
    nibs = _np.zeros((n, N_WINDOWS), dtype=_np.int32)
    nibs[:, 0::2] = scalars & 0xF
    nibs[:, 1::2] = scalars >> 4
    out = _np.zeros((N_WINDOWS, n), dtype=_np.uint32)
    carry = _np.zeros(n, dtype=_np.int32)
    for w in range(N_WINDOWS):
        t = nibs[:, w] + carry
        over = (t > 8).astype(_np.int32)
        out[w] = (t - 16 * over + 8).astype(_np.uint32)
        carry = over
    assert not carry.any(), "scalar exceeded 2^255 - 8 in signed recoding"
    return out


def recode_signed4_xp(scalars_u8, xp):
    """Device-traceable recode_signed4: (N, 32) uint8 canonical scalars ->
    (64, N) uint32 signed digits stored as e_w + 8.  Same algebra as the
    host recode; runs inside the phase-A/B jits so only the raw 32-byte
    scalars ride the (slow) host->device link instead of 256-byte digit
    rows."""
    s = scalars_u8.astype(xp.int32)  # (N, 32)
    lo = s & 0xF
    hi = s >> 4
    nibs = xp.stack([lo, hi], axis=2).reshape(s.shape[0], 64)
    carry = xp.zeros((s.shape[0],), dtype=xp.int32)
    outs = []
    for w in range(64):
        t = nibs[:, w] + carry
        over = (t > 8).astype(xp.int32)
        outs.append((t - 16 * over + 8).astype(xp.uint32))
        carry = over
    return xp.stack(outs, axis=0)


def _windowed_kernel(consts_ref, digits_ref, pts_ref, out_ref):
    """Per-lane windowed double-and-add: out[lane] = s[lane] * P[lane].

    digits_ref: (64, TILE) u32 — signed base-16 digits (e_w + 8).
    pts_ref/out_ref: (72, TILE) u32.

    Per lane: a 3-double/4-add table build (1P..8P), then 64 Horner steps of
    4 doublings (T output skipped on the first three) + an 8-way one-hot
    table select with conditional negation + one unified add.
    """
    import jax
    import jax.numpy as jnp

    T = pts_ref.shape[1]
    d2_col = consts_ref[0:NLIMBS, :]
    pad = consts_ref[NLIMBS : 2 * NLIMBS, :]
    bump = consts_ref[2 * NLIMBS : 3 * NLIMBS, :]
    consts = (d2_col, pad, bump)

    base = tuple(pts_ref[c * NLIMBS : (c + 1) * NLIMBS, :] for c in range(4))
    t1 = base
    t2 = _point_double_t(t1, jnp, consts)
    t3 = _point_add_t(t2, t1, jnp, consts)
    t4 = _point_double_t(t2, jnp, consts)
    t5 = _point_add_t(t4, t1, jnp, consts)
    t6 = _point_double_t(t3, jnp, consts)
    t7 = _point_add_t(t6, t1, jnp, consts)
    t8 = _point_double_t(t4, jnp, consts)
    table = (t1, t2, t3, t4, t5, t6, t7, t8)

    ident = _identity_cols(T, jnp)

    def step(k, acc):
        w = N_WINDOWS - 1 - k
        e = digits_ref[pl_ds(w), :]  # (1, T) u32: e_w + 8
        val = e.astype(jnp.int32) - 8
        neg = (val < 0).astype(jnp.uint32)
        k_abs = jnp.where(val < 0, -val, val).astype(jnp.uint32)

        acc = _point_double_t(acc, jnp, consts, want_t=False)
        acc = _point_double_t(acc, jnp, consts, want_t=False)
        acc = _point_double_t(acc, jnp, consts, want_t=False)
        acc = _point_double_t(acc, jnp, consts, want_t=True)

        sel = ident
        for idx, entry in enumerate(table):
            sel = _point_select_t(k_abs == jnp.uint32(idx + 1), entry, sel, jnp)
        # negate: -(X, Y, Z, T) = (-X, Y, Z, -T)
        sx, sy, sz, st = sel
        sel = (
            _select_t(neg, _neg_t(sx, jnp, consts), sx, jnp),
            sy,
            sz,
            _select_t(neg, _neg_t(st, jnp, consts), st, jnp),
        )
        return _point_add_t(acc, sel, jnp, consts)

    acc = jax.lax.fori_loop(0, N_WINDOWS, step, ident)
    out_ref[:] = jnp.concatenate(list(acc), axis=0)


def pl_ds(idx):
    from jax.experimental import pallas as pl

    return pl.ds(idx, 1)


@functools.lru_cache(maxsize=8)
def _windowed_call(n_lanes: int, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    tile = min(TILE, n_lanes)
    assert n_lanes % tile == 0
    grid = (n_lanes // tile,)

    return pl.pallas_call(
        _windowed_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((CONSTS_ROWS, tile), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N_WINDOWS, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * NLIMBS, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (4 * NLIMBS, tile), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((4 * NLIMBS, n_lanes), jnp.uint32),
        interpret=interpret,
    )


def msm_windowed_lanes_pallas(points, digits, interpret: bool = False):
    """Per-lane s_i * P_i via the windowed Pallas kernel.

    points: tuple (X, Y, Z, T) of (N, 18) uint32; digits: (64, N) uint32
    (recode_signed4).  Returns tuple-of-(N, 18).  Traceable under jit.
    """
    import jax.numpy as jnp

    n = points[0].shape[0]
    stacked = jnp.concatenate([jnp.transpose(c, (1, 0)) for c in points], axis=0)
    tile = min(TILE, n)
    consts = jnp.asarray(
        jnp.broadcast_to(jnp.asarray(_consts_array()), (CONSTS_ROWS, tile))
    )
    out = _windowed_call(n, _want_interpret(interpret))(consts, digits, stacked)
    return tuple(
        jnp.transpose(out[c * NLIMBS : (c + 1) * NLIMBS, :], (1, 0)) for c in range(4)
    )


# ---------------------------------------------------------------------------
# 20x13-bit "no-split" field tier (experimental, XELIS_FE13=1)
# ---------------------------------------------------------------------------
#
# The 18x15-bit schoolbook must split every 30-bit partial product into
# lo/hi 15-bit pieces before accumulating (sums of 18 raw products
# overflow u32), costing a mask + shift + two shifted adds per product
# row.  With 13-bit limbs the raw products (<= 2^26.9 for relaxed
# operands <= 2^13.45) accumulate DIRECTLY in u32 (20 terms < 2^31.1),
# so a field mul is 20 shifted multiply-adds + fold + two carry passes —
# measured 1.49x faster per mul in isolation (PERF_NOTES round 4).
# Bounds discipline: _carry13 leaves limbs <= 2^13 + eps; _sub13's
# pad/bump keep per-limb subtraction borrow-free exactly like the 15-bit
# tier; the 2^260 overflow folds with factor 2^5 * 19 = 608.

NL13 = 20
B13 = 13
M13 = (1 << B13) - 1
FOLD13 = 608  # 2^(13*20 - 255) * 19


def _cat(parts, jnp):
    parts = [p for p in parts if p.shape[0]]
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)


def _carry13(t, jnp):
    """Relaxed carry for SMALL slack (add/sub results, limbs <= ~2^15):
    the top wrap cy[19]*608 must stay < 2^13-ish."""
    T = t.shape[1]
    lo = t & jnp.uint32(M13)
    cy = t >> B13
    z1 = jnp.zeros((1, T), dtype=jnp.uint32)
    out = lo + _cat([z1, cy[: NL13 - 1]], jnp)
    wrap = cy[NL13 - 1 : NL13] * jnp.uint32(FOLD13)
    return out + _cat([wrap, jnp.zeros((NL13 - 1, T), jnp.uint32)], jnp)


def _carry13_wide(t, jnp):
    """Carry for WIDE rows (mul/sqr accumulators, <= 2^31): the top carry
    cy[19] is up to ~2^18, so its x608 wrap must itself split into
    row 0 (low 13 bits) and row 1 (high bits) or it overflows the next
    operation's column sums — the round-4 fe13 probabilistic-corruption
    bug.  Two applications bring limbs to <= 2^13 + eps."""
    T = t.shape[1]
    lo = t & jnp.uint32(M13)
    cy = t >> B13
    z1 = jnp.zeros((1, T), dtype=jnp.uint32)
    out = lo + _cat([z1, cy[: NL13 - 1]], jnp)
    top = cy[NL13 - 1 : NL13]
    w_lo = (top & jnp.uint32(M13)) * jnp.uint32(FOLD13)
    w_hi = (top >> B13) * jnp.uint32(FOLD13)
    return out + _cat(
        [w_lo, w_hi, jnp.zeros((NL13 - 2, T), jnp.uint32)], jnp
    )


def _carry13_mul_out(low, jnp):
    """Normalize a mul/sqr accumulator (rows <= ~2^31.2) to limbs
    <= 2^13 + eps.  The x608 fold shrinks carries only ~2^3.75 per naive
    pass, so instead: one wide pass (split wrap), one simple pass (after
    which only row 0 is big, <= ~2^18.6), then a row-0-only fixup."""
    T = low.shape[1]
    t = _carry13(_carry13_wide(low, jnp), jnp)
    r0cy = t[0:1] >> B13
    return jnp.concatenate(
        [t[0:1] & jnp.uint32(M13), t[1:2] + r0cy, t[2:]], axis=0
    )


def _mul13(a, b, jnp):
    T = a.shape[1]
    z = lambda r: jnp.zeros((r, T), jnp.uint32)
    acc = jnp.zeros((2 * NL13 - 1, T), dtype=jnp.uint32)
    for j in range(NL13):
        p = a * b[j : j + 1]
        acc = acc + _cat([z(j), p, z(NL13 - 1 - j)], jnp)
    hi = acc[NL13:]  # columns 20..38
    hi_lo = (hi & jnp.uint32(M13)) * jnp.uint32(FOLD13)
    hi_hi = (hi >> B13) * jnp.uint32(FOLD13)
    low = acc[:NL13]
    low = low + _cat([hi_lo, z(1)], jnp)
    low = low + _cat([z(1), hi_hi], jnp)
    return _carry13_mul_out(low, jnp)


def _sqr13(a, jnp):
    T = a.shape[1]
    z = lambda r: jnp.zeros((r, T), jnp.uint32)
    acc = jnp.zeros((2 * NL13 - 1, T), dtype=jnp.uint32)
    for j in range(NL13):
        # diagonal + doubled cross terms with i > j (each product pair
        # appears once, doubled) — ~half the multiplies of _mul13
        tail = a[j:] * a[j : j + 1]
        dbl = jnp.concatenate(
            [tail[:1], tail[1:] + tail[1:]], axis=0
        ) if tail.shape[0] > 1 else tail
        acc = acc + _cat([z(2 * j), dbl, z(2 * NL13 - 1 - 2 * j - dbl.shape[0])], jnp)
    hi = acc[NL13:]
    hi_lo = (hi & jnp.uint32(M13)) * jnp.uint32(FOLD13)
    hi_hi = (hi >> B13) * jnp.uint32(FOLD13)
    low = acc[:NL13]
    low = low + _cat([hi_lo, z(1)], jnp)
    low = low + _cat([z(1), hi_hi], jnp)
    return _carry13_mul_out(low, jnp)


def _pad13_limbs():
    """Multiple of p in 20 relaxed 13-bit limbs + top, per-limb >= any
    relaxed operand limb (borrow-free subtraction; mirrors fe._pad_limbs)."""
    from ..pyref import field as _pf

    m = (1 << B13) + (1 << 9) + 2
    v = m * _pf.P
    limbs = [(v >> (B13 * k)) & M13 for k in range(NL13)]
    limbs.append(v >> (B13 * NL13))
    slack = (1 << B13) + (1 << 9)
    for k in range(NL13):
        while limbs[k] < slack:
            limbs[k] += 1 << B13
            limbs[k + 1] -= 1
    assert all(slack <= l < (1 << 15) for l in limbs[:NL13])
    assert limbs[NL13] >= 0
    total = sum(l << (B13 * k) for k, l in enumerate(limbs))
    assert total == m * _pf.P
    return limbs


def _add13(a, b, jnp):
    return _carry13(a + b, jnp)


def _sub13(a, b, jnp, pad, bump):
    return _carry13(a + pad - b + bump, jnp)


def _to13_t(a15, jnp):
    """(18, T) 15-bit EXACT limbs -> (20, T) 13-bit limbs (bit repack)."""
    rows = []
    for j in range(NL13):
        bit = B13 * j
        f, r = bit // LIMB_BITS, bit % LIMB_BITS
        v = a15[f : f + 1] >> jnp.uint32(r)
        if r > B13 * 0 and f + 1 < NLIMBS and LIMB_BITS - r < B13:
            v = v | (a15[f + 1 : f + 2] << jnp.uint32(LIMB_BITS - r))
        rows.append(v & jnp.uint32(M13))
    return jnp.concatenate(rows, axis=0)


def _exact13_t(t, jnp):
    """Normalize to limbs < 2^13.  THREE sequential passes: the top-limb
    wrap (x608 into row 0) lands after a pass's normalization, so row 0
    can still exceed 2^13 after two — the bit repack in _from13_t needs
    strict 13-bit limbs."""
    T = t.shape[1]
    for _ in range(3):
        rows = []
        carry = jnp.zeros((1, T), dtype=jnp.uint32)
        for k in range(NL13):
            v = t[k : k + 1] + carry
            rows.append(v & jnp.uint32(M13))
            carry = v >> B13
        rows[0] = rows[0] + carry * jnp.uint32(FOLD13)
        t = jnp.concatenate(rows, axis=0)
    return t


def _from13_t(a13, jnp):
    """(20, T) relaxed 13-bit limbs -> (18, T) 15-bit limbs (repack; runs
    an exact carry first so the bit extraction is sound)."""
    e = _exact13_t(a13, jnp)
    rows = []
    for j in range(NLIMBS):
        bit = LIMB_BITS * j
        f, r = bit // B13, bit % B13
        v = e[f : f + 1] >> jnp.uint32(r)
        take = B13 - r
        if take < LIMB_BITS and f + 1 < NL13:
            v = v | (e[f + 1 : f + 2] << jnp.uint32(take))
            take += B13
        if take < LIMB_BITS and f + 2 < NL13:
            v = v | (e[f + 2 : f + 3] << jnp.uint32(take))
        rows.append(v & jnp.uint32(MASK))
    return jnp.concatenate(rows, axis=0)


def _point_add13(p, q, jnp, consts):
    d2, pad, bump = consts
    X1, Y1, Z1, T1 = p
    X2, Y2, Z2, T2 = q
    A = _mul13(_sub13(Y1, X1, jnp, pad, bump), _sub13(Y2, X2, jnp, pad, bump), jnp)
    B = _mul13(_add13(Y1, X1, jnp), _add13(Y2, X2, jnp), jnp)
    C = _mul13(_mul13(T1, d2, jnp), T2, jnp)
    D = _mul13(_add13(Z1, Z1, jnp), Z2, jnp)
    E = _sub13(B, A, jnp, pad, bump)
    F = _sub13(D, C, jnp, pad, bump)
    G = _add13(D, C, jnp)
    H = _add13(B, A, jnp)
    return (
        _mul13(E, F, jnp),
        _mul13(G, H, jnp),
        _mul13(F, G, jnp),
        _mul13(E, H, jnp),
    )


def _point_double13(p, jnp, consts, want_t: bool = True):
    _, pad, bump = consts
    X1, Y1, Z1, _ = p
    A = _sqr13(X1, jnp)
    B = _sqr13(Y1, jnp)
    Zsq = _sqr13(Z1, jnp)
    C = _add13(Zsq, Zsq, jnp)
    H = _add13(A, B, jnp)
    xy = _add13(X1, Y1, jnp)
    E = _sub13(H, _sqr13(xy, jnp), jnp, pad, bump)
    G = _sub13(A, B, jnp, pad, bump)
    F = _add13(C, G, jnp)
    return (
        _mul13(E, F, jnp),
        _mul13(G, H, jnp),
        _mul13(F, G, jnp),
        _mul13(E, H, jnp) if want_t else E,
    )


def _neg13(a, jnp, consts):
    _, pad, bump = consts
    return _carry13(pad - a + bump, jnp)


CONSTS13_ROWS = 64


def _consts13_array() -> _np.ndarray:
    """(64, 1) u32 columns for the 13-bit tier: rows 0-19 D2, 20-39 PAD,
    40-59 BUMP (top pad limb folded by 608 into row 0)."""
    from ..pyref import field as _pf

    out = _np.zeros((CONSTS13_ROWS, 1), dtype=_np.uint32)
    d2 = 2 * _pf.D % _pf.P
    for k in range(NL13):
        out[k, 0] = (d2 >> (B13 * k)) & M13
    pad = _pad13_limbs()
    out[NL13 : 2 * NL13, 0] = pad[:NL13]
    out[2 * NL13, 0] = pad[NL13] * FOLD13  # bump rides at row 0
    return out


# niels-form table entries (dalek ProjectiveNielsPoint): precomputing
# (Y+X, Y-X, 2d*T, 2Z) per table entry moves one mul (d2*T) and two
# add/subs out of every window-add and into the once-per-tile table build
# — the window add drops from 9 muls + 4 pre-add/subs to 8 muls + 2.


def _to_niels_t(p, jnp, consts):
    d2, pad, bump = consts
    X, Y, Z, T = p
    return (
        _add_t(Y, X, jnp),
        _sub_t(Y, X, jnp, pad, bump),
        _mul_t(T, d2, jnp),
        _add_t(Z, Z, jnp),
    )


def _point_add_niels_t(p, q, jnp, consts):
    """acc (extended) + niels entry -> extended (add-2008-hwcd-3, a=-1)."""
    _, pad, bump = consts
    X1, Y1, Z1, T1 = p
    YpX, YmX, T2d, Z2 = q
    A = _mul_t(_sub_t(Y1, X1, jnp, pad, bump), YmX, jnp)
    B = _mul_t(_add_t(Y1, X1, jnp), YpX, jnp)
    C = _mul_t(T1, T2d, jnp)
    D = _mul_t(Z1, Z2, jnp)
    E = _sub_t(B, A, jnp, pad, bump)
    F = _sub_t(D, C, jnp, pad, bump)
    G = _add_t(D, C, jnp)
    H = _add_t(B, A, jnp)
    return (
        _mul_t(E, F, jnp),
        _mul_t(G, H, jnp),
        _mul_t(F, G, jnp),
        _mul_t(E, H, jnp),
    )


def _identity_niels_cols(T, jnp):
    """Niels encoding of the identity: (1, 1, 0, 2) — adding it to the
    accumulator yields the same point (coordinates scaled by 2Z)."""
    zero = jnp.zeros((NLIMBS, T), dtype=jnp.uint32)
    one = jnp.concatenate([jnp.ones((1, T), dtype=jnp.uint32), zero[1:]], axis=0)
    two = jnp.concatenate(
        [jnp.full((1, T), 2, dtype=jnp.uint32), zero[1:]], axis=0
    )
    return (one, one, zero, two)


def _to_niels13(p, jnp, consts):
    d2, pad, bump = consts
    X, Y, Z, T = p
    return (
        _add13(Y, X, jnp),
        _sub13(Y, X, jnp, pad, bump),
        _mul13(T, d2, jnp),
        _add13(Z, Z, jnp),
    )


def _point_add_niels13(p, q, jnp, consts):
    _, pad, bump = consts
    X1, Y1, Z1, T1 = p
    YpX, YmX, T2d, Z2 = q
    A = _mul13(_sub13(Y1, X1, jnp, pad, bump), YmX, jnp)
    B = _mul13(_add13(Y1, X1, jnp), YpX, jnp)
    C = _mul13(T1, T2d, jnp)
    D = _mul13(Z1, Z2, jnp)
    E = _sub13(B, A, jnp, pad, bump)
    F = _sub13(D, C, jnp, pad, bump)
    G = _add13(D, C, jnp)
    H = _add13(B, A, jnp)
    return (
        _mul13(E, F, jnp),
        _mul13(G, H, jnp),
        _mul13(F, G, jnp),
        _mul13(E, H, jnp),
    )


def _identity_niels13_cols(T, jnp):
    zero = jnp.zeros((NL13, T), dtype=jnp.uint32)
    one = jnp.concatenate([jnp.ones((1, T), dtype=jnp.uint32), zero[1:]], axis=0)
    two = jnp.concatenate(
        [jnp.full((1, T), 2, dtype=jnp.uint32), zero[1:]], axis=0
    )
    return (one, one, zero, two)


# ---------------------------------------------------------------------------
# quad-lane windowed kernel: 4 scalar-muls share one accumulator
# ---------------------------------------------------------------------------
#
# The per-lane windowed kernel pays ~253 accumulator doublings per scalar
# regardless of window width — the doubling chain dominates (4 dbl + 1 add
# per window).  Packing FOUR (scalar, point) pairs into one slot shares
# the chain: each window costs 4 doubles + 4 table-adds for 4 points,
# i.e. ~16 vs ~35 field-mul-equivalents per point per window (~2x less
# VPU work).  The slot output is the SUM of its 4 muls — exactly what the
# verification mega-MSMs reduce to anyway, and a Schnorr lane pair
# (s*H, -e*P) packed into one slot yields its R point directly.

K_PACK = int(__import__("os").environ.get("XELIS_K_PACK", "8"))
QTILE = 256  # narrower tile: K_PACK tables (8 entries x 4 coords x 18/20
             # rows) plus live point temporaries must stay inside VMEM


def _windowed_kernel_k4(consts_ref, digits_ref, pts_ref, out_ref):
    """out[slot] = sum_k s[k][slot] * P[k][slot] for k in 0..3.

    digits_ref: (4*64, T) u32 — sub k's signed digits at rows 64k..64k+63.
    pts_ref: (4*72, T) u32 — sub k's [X; Y; Z; T] limbs at rows 72k...
    out_ref: (72, T) u32.
    """
    import jax
    import jax.numpy as jnp

    T = pts_ref.shape[1]
    d2_col = consts_ref[0:NLIMBS, :]
    pad = consts_ref[NLIMBS : 2 * NLIMBS, :]
    bump = consts_ref[2 * NLIMBS : 3 * NLIMBS, :]
    consts = (d2_col, pad, bump)

    tables = []
    for k in range(K_PACK):
        base = tuple(
            pts_ref[4 * NLIMBS * k + c * NLIMBS : 4 * NLIMBS * k + (c + 1) * NLIMBS, :]
            for c in range(4)
        )
        t1 = base
        t2 = _point_double_t(t1, jnp, consts)
        t3 = _point_add_t(t2, t1, jnp, consts)
        t4 = _point_double_t(t2, jnp, consts)
        t5 = _point_add_t(t4, t1, jnp, consts)
        t6 = _point_double_t(t3, jnp, consts)
        t7 = _point_add_t(t6, t1, jnp, consts)
        t8 = _point_double_t(t4, jnp, consts)
        tables.append(tuple(
            _to_niels_t(t, jnp, consts)
            for t in (t1, t2, t3, t4, t5, t6, t7, t8)
        ))

    ident = _identity_cols(T, jnp)
    ident_n = _identity_niels_cols(T, jnp)

    def step(kk, acc):
        w = N_WINDOWS - 1 - kk
        acc = _point_double_t(acc, jnp, consts, want_t=False)
        acc = _point_double_t(acc, jnp, consts, want_t=False)
        acc = _point_double_t(acc, jnp, consts, want_t=False)
        acc = _point_double_t(acc, jnp, consts, want_t=True)
        for k in range(K_PACK):
            e = digits_ref[pl_ds(N_WINDOWS * k + w), :]
            val = e.astype(jnp.int32) - 8
            neg = (val < 0).astype(jnp.uint32)
            k_abs = jnp.where(val < 0, -val, val).astype(jnp.uint32)
            sel = ident_n
            for idx, entry in enumerate(tables[k]):
                sel = _point_select_t(k_abs == jnp.uint32(idx + 1), entry, sel, jnp)
            ypx, ymx, t2d, z2 = sel
            # -Q in niels form: swap YpX/YmX, negate 2d*T, keep 2Z
            sel = (
                _select_t(neg, ymx, ypx, jnp),
                _select_t(neg, ypx, ymx, jnp),
                _select_t(neg, _neg_t(t2d, jnp, consts), t2d, jnp),
                z2,
            )
            acc = _point_add_niels_t(acc, sel, jnp, consts)
        return acc

    acc = jax.lax.fori_loop(0, N_WINDOWS, step, ident)
    out_ref[:] = jnp.concatenate(list(acc), axis=0)


@functools.lru_cache(maxsize=8)
def _windowed_call_k4(n_slots: int, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    tile = min(QTILE, n_slots)
    assert n_slots % tile == 0
    grid = (n_slots // tile,)

    return pl.pallas_call(
        _windowed_kernel_k4,
        grid=grid,
        in_specs=[
            pl.BlockSpec((CONSTS_ROWS, tile), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (K_PACK * N_WINDOWS, tile), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (K_PACK * 4 * NLIMBS, tile), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (4 * NLIMBS, tile), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((4 * NLIMBS, n_slots), jnp.uint32),
        interpret=interpret,
    )


def _identity13_cols(T, jnp):
    zero = jnp.zeros((NL13, T), dtype=jnp.uint32)
    one = jnp.concatenate([jnp.ones((1, T), dtype=jnp.uint32), zero[1:]], axis=0)
    return (zero, one, one, zero)


def _windowed_kernel_k4_fe13(c13_ref, digits_ref, pts_ref, out_ref):
    """Quad kernel on the 20x13-bit tier: inputs/outputs stay in the
    engine's 18x15-bit row format (repacked at the kernel boundary, ~1%
    of the window work); all point arithmetic runs no-split 13-bit."""
    import jax
    import jax.numpy as jnp

    T = pts_ref.shape[1]
    d2 = c13_ref[0:NL13, :]
    pad = c13_ref[NL13 : 2 * NL13, :]
    bump = c13_ref[2 * NL13 : 3 * NL13, :]
    consts = (d2, pad, bump)

    tables = []
    for k in range(K_PACK):
        base15 = tuple(
            pts_ref[4 * NLIMBS * k + c * NLIMBS : 4 * NLIMBS * k + (c + 1) * NLIMBS, :]
            for c in range(4)
        )
        t1 = tuple(_to13_t(c, jnp) for c in base15)
        t2 = _point_double13(t1, jnp, consts)
        t3 = _point_add13(t2, t1, jnp, consts)
        t4 = _point_double13(t2, jnp, consts)
        t5 = _point_add13(t4, t1, jnp, consts)
        t6 = _point_double13(t3, jnp, consts)
        t7 = _point_add13(t6, t1, jnp, consts)
        t8 = _point_double13(t4, jnp, consts)
        tables.append(tuple(
            _to_niels13(t, jnp, consts)
            for t in (t1, t2, t3, t4, t5, t6, t7, t8)
        ))

    ident = _identity13_cols(T, jnp)
    ident_n = _identity_niels13_cols(T, jnp)

    def step(kk, acc):
        w = N_WINDOWS - 1 - kk
        acc = _point_double13(acc, jnp, consts, want_t=False)
        acc = _point_double13(acc, jnp, consts, want_t=False)
        acc = _point_double13(acc, jnp, consts, want_t=False)
        acc = _point_double13(acc, jnp, consts, want_t=True)
        for k in range(K_PACK):
            e = digits_ref[pl_ds(N_WINDOWS * k + w), :]
            val = e.astype(jnp.int32) - 8
            neg = (val < 0).astype(jnp.uint32)
            k_abs = jnp.where(val < 0, -val, val).astype(jnp.uint32)
            sel = ident_n
            for idx, entry in enumerate(tables[k]):
                sel = _point_select_t(k_abs == jnp.uint32(idx + 1), entry, sel, jnp)
            ypx, ymx, t2d, z2 = sel
            sel = (
                _select_t(neg, ymx, ypx, jnp),
                _select_t(neg, ypx, ymx, jnp),
                _select_t(neg, _neg13(t2d, jnp, consts), t2d, jnp),
                z2,
            )
            acc = _point_add_niels13(acc, sel, jnp, consts)
        return acc

    acc = jax.lax.fori_loop(0, N_WINDOWS, step, ident)
    out_ref[:] = jnp.concatenate([_from13_t(c, jnp) for c in acc], axis=0)


@functools.lru_cache(maxsize=8)
def _windowed_call_k4_fe13(n_slots: int, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    tile = min(QTILE, n_slots)
    assert n_slots % tile == 0
    grid = (n_slots // tile,)

    return pl.pallas_call(
        _windowed_kernel_k4_fe13,
        grid=grid,
        in_specs=[
            pl.BlockSpec((CONSTS13_ROWS, tile), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (K_PACK * N_WINDOWS, tile), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (K_PACK * 4 * NLIMBS, tile), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (4 * NLIMBS, tile), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((4 * NLIMBS, n_slots), jnp.uint32),
        interpret=interpret,
    )


def use_fe13() -> bool:
    """20x13-bit no-split quad kernel — DEFAULT ON since round 5
    (XELIS_FE13=0 reverts to the 18x15-bit tier).

    Promoted after tests/test_fe13.py verified the tier bit-exact on
    hardware: transposed algebra vs pyref (edge values + relaxed-bound
    operands) and quad-kernel slot sums identical to the 15-bit kernel
    over an edge-scalar stress batch.  Isolated field mul measures
    2148 vs 1328 Mmul/s (1.62x, scripts/bench_fe13.py); end-kernel
    ~650-690 vs ~550-600 kpts/s."""
    import os

    return os.environ.get("XELIS_FE13", "1") == "1"


def msm_windowed_lanes_pallas_k4(points4, digits4, interpret: bool = False):
    """Quad-packed windowed lanes: out[slot] = sum of 4 scalar-muls.

    points4: tuple (X, Y, Z, T) each (4, S, 18) uint32 — sub k's points in
    row k; digits4: (4, 64, S) uint32.  Returns tuple-of-(S, 18) slot sums.
    """
    import jax.numpy as jnp

    s = points4[0].shape[1]
    # (4, S, 18) -> rows [72k + 18c] x S
    stacked = jnp.concatenate(
        [
            jnp.transpose(points4[c][k], (1, 0))
            for k in range(K_PACK)
            for c in range(4)
        ],
        axis=0,
    )
    dig = jnp.concatenate([digits4[k] for k in range(K_PACK)], axis=0)
    tile = min(QTILE, s)
    consts = jnp.asarray(
        jnp.broadcast_to(jnp.asarray(_consts_array()), (CONSTS_ROWS, tile))
    )
    if use_fe13():
        c13 = jnp.asarray(
            jnp.broadcast_to(jnp.asarray(_consts13_array()), (CONSTS13_ROWS, tile))
        )
        out = _windowed_call_k4_fe13(s, _want_interpret(interpret))(
            c13, dig, stacked
        )
    else:
        out = _windowed_call_k4(s, _want_interpret(interpret))(consts, dig, stacked)
    return tuple(
        jnp.transpose(out[c * NLIMBS : (c + 1) * NLIMBS, :], (1, 0)) for c in range(4)
    )


# ---------------------------------------------------------------------------
# multi-chip: lanes shard_mapped over a 1-D mesh (SURVEY.md §2.4 — MSM
# sharding is this domain's tensor parallelism)
# ---------------------------------------------------------------------------


def make_sharded_lanes_fn(mesh, interpret: bool = False):
    """Windowed lanes kernel shard_mapped over ``mesh``'s first axis.

    Each device runs the Pallas kernel on its contiguous lane shard (the
    per-lane scalar-muls are ~99% of the device work); the tiny per-lane
    accumulator outputs are all_gathered over ICI so every chip holds the
    full (N, 18) result and the downstream tile-sum/tree reductions are
    IDENTICAL to the single-chip path.  Callers must pad lane counts so
    each shard is TILE-aligned (Accelerator uses mesh_size*TILE granules).
    """
    import jax
    from jax import lax
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]

    def _local(points, digits):
        acc = msm_windowed_lanes_pallas(points, digits, interpret=interpret)
        return tuple(lax.all_gather(c, axis, axis=0, tiled=True) for c in acc)

    return jax.shard_map(
        _local,
        mesh=mesh,
        in_specs=(
            (P(axis, None), P(axis, None), P(axis, None), P(axis, None)),
            P(None, axis),
        ),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )


def make_sharded_lanes_fn_k4(mesh, interpret: bool = False):
    """Quad-packed lanes kernel shard_mapped over ``mesh``'s first axis:
    SLOTS shard across devices (points4 (4, S, 18) on axis 1, digits4
    (4, 64, S) on axis 2); per-slot sums all_gathered as in the
    single-lane variant.  Callers pad so S divides by mesh_size*TILE."""
    import jax
    from jax import lax
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]

    def _local(points4, digits4):
        acc = msm_windowed_lanes_pallas_k4(points4, digits4, interpret=interpret)
        return tuple(lax.all_gather(c, axis, axis=0, tiled=True) for c in acc)

    return jax.shard_map(
        _local,
        mesh=mesh,
        in_specs=(
            (
                P(None, axis, None),
                P(None, axis, None),
                P(None, axis, None),
                P(None, axis, None),
            ),
            P(None, None, axis),
        ),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )
