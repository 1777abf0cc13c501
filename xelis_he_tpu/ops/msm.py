"""Multiscalar multiplication (Pippenger) on batched limb points.

THE hot primitive of the framework (SURVEY.md D4): batched sigma
verification and range-proof batch verification each reduce to one giant
MSM.  TPU-native design:

- host decomposes scalars into W unsigned c-bit window digits (numpy);
- per window, points are sorted by digit (one XLA sort), bucket sums are
  built with a SEGMENTED SCAN over the sorted points (O(N) point-adds in
  O(log N) parallel steps via lax.associative_scan), bucket totals are
  scattered into a 2^c bucket array, and the weighted bucket reduction
  sum_b b*S_b is two more scans;
- windows combine MSB->LSB with c doublings (Horner).

Everything is static-shape and jit-compatible; the same code runs under
numpy for small host MSMs (using a Hillis-Steele scan fallback).

Scalar digits are PUBLIC data only (verification scalars); secrets never
take this path.
"""

from __future__ import annotations

import numpy as _np

from ..pyref.ristretto import RistrettoPoint
from .curve import Curve

DEFAULT_WINDOW = 13
SCALAR_BITS = 256


def _scalar_bytes(scalars) -> _np.ndarray:
    """list[int] or (N, 32) uint8 array -> (N, 32) uint8 array."""
    if isinstance(scalars, _np.ndarray):
        return _np.ascontiguousarray(scalars, dtype=_np.uint8)
    raw = b"".join(s.to_bytes(32, "little") for s in scalars)
    return _np.frombuffer(raw, dtype=_np.uint8).reshape(len(scalars), 32)


def decompose_bits(scalars, n_bits: int = 253) -> _np.ndarray:
    """(n_bits, N) uint32 bit rows, LSB first (vectorized via unpackbits).
    ``scalars``: list[int] or (N, 32)-byte canonical array."""
    bits = _np.unpackbits(_scalar_bytes(scalars), axis=1, bitorder="little")
    return _np.ascontiguousarray(bits[:, :n_bits].T).astype(_np.uint32)


def decompose_bits_xp(scal, xp, n_bits: int = 253):
    """Device-traceable decompose_bits: (N, 32) uint8 canonical scalars ->
    (n_bits, N) uint32 bit rows, LSB first.

    Used inside the fused-verification jits so only the raw 32-byte scalars
    ride the host->device link (32x less upload than the bit tensor) and the
    lane axis stays axis 0 of the transferred payload — which is what mesh
    sharding partitions (lane-major on both the jnp and Pallas paths)."""
    shifts = xp.arange(8, dtype=xp.uint32)
    b = (scal[:, :, None].astype(xp.uint32) >> shifts[None, None, :]) & xp.uint32(1)
    bits = b.reshape(scal.shape[0], 256)[:, :n_bits]
    return xp.transpose(bits, (1, 0))


def decompose_digits(scalars: list[int], c: int = DEFAULT_WINDOW) -> _np.ndarray:
    """(W, N) int32 unsigned c-bit digits, least-significant window first."""
    n_windows = (SCALAR_BITS + c - 1) // c
    bits = _np.unpackbits(_scalar_bytes(scalars), axis=1, bitorder="little")
    pad = n_windows * c - SCALAR_BITS
    if pad:
        bits = _np.concatenate(
            [bits, _np.zeros((bits.shape[0], pad), dtype=bits.dtype)], axis=1
        )
    weights = (1 << _np.arange(c, dtype=_np.int64)).astype(_np.int64)
    digits = bits.reshape(len(scalars), n_windows, c).astype(_np.int64) @ weights
    return _np.ascontiguousarray(digits.T).astype(_np.int32)


def _combine_seg(curve: Curve, a, b):
    """Segmented-scan combine: (flag, point) pairs, flag marks segment head."""
    f1, p1 = a
    f2, p2 = b
    return (f1 | f2, curve.select(f2, p2, curve.add(p1, p2)))


def _inclusive_scan(curve: Curve, flags, pts, use_jax: bool):
    if use_jax:
        from jax import lax

        return lax.associative_scan(
            lambda x, y: _combine_seg(curve, x, y), (flags, pts), axis=0
        )
    # Hillis-Steele fallback for numpy (host; small N): standard prefix scan
    # with the associative segmented combine.
    n = int(flags.shape[0])
    shift = 1
    while shift < n:
        tail = _combine_seg(
            curve,
            (flags[:-shift], tuple(c[:-shift] for c in pts)),
            (flags[shift:], tuple(c[shift:] for c in pts)),
        )
        flags = _np.concatenate([flags[:shift], tail[0]])
        pts = tuple(
            _np.concatenate([c[:shift], t], axis=0) for c, t in zip(pts, tail[1])
        )
        shift *= 2
    return flags, pts


def _tree_reduce(curve: Curve, pts, n: int, use_jax: bool = False):
    """Pairwise-add reduction of the leading axis (identity-padded).

    On the jax path large reductions are expressed with loop primitives so
    the traced graph stays SMALL (a point add is ~1k limb primitives; an
    unrolled log2(n)-level tree made the fused-verification jits take
    minutes to trace + compile):

    - stage 1: reshape (W,) -> (G, R) and ``lax.scan`` rows into an R-lane
      accumulator (work-efficient, ONE traced add body);
    - stage 2: halving tree over the R lanes as a ``fori_loop`` whose body
      gathers lane i+half onto lane i (full-width adds; lanes beyond the
      current half are never read again, so no masking is needed).
    """
    xp = curve.xp
    size = 1
    while size < n:
        size *= 2
    if size != n:
        pad = curve.identity((size - n,))
        pts = tuple(xp.concatenate([c, p], axis=0) for c, p in zip(pts, pad))

    if use_jax and size > 32:
        from jax import lax

        R = min(size, 128)
        G = size // R
        if G > 1:
            rows = tuple(c.reshape(G, R, *c.shape[1:]) for c in pts)

            def _row(acc, row):
                return curve.add(acc, row), None

            pts, _ = lax.scan(_row, curve.identity((R,)), rows)
        idx = xp.arange(R)

        def _level(k, p):
            half = R >> (k + 1)
            hi = tuple(c[(idx + half) % R] for c in p)
            return curve.add(p, hi)

        levels = R.bit_length() - 1
        pts = lax.fori_loop(0, levels, _level, pts, unroll=False)
        return tuple(c[0] for c in pts)

    while size > 1:
        half = size // 2
        lo = tuple(c[:half] for c in pts)
        hi = tuple(c[half:] for c in pts)
        pts = curve.add(lo, hi)
        size = half
    return tuple(c[0] for c in pts)


class MsmEngine:
    """Pippenger MSM bound to a Curve backend."""

    def __init__(self, curve: Curve, window: int = DEFAULT_WINDOW, use_jax: bool = False):
        self.curve = curve
        self.window = window
        self.use_jax = use_jax

    def _window_sum(self, points, d):
        """Bucket-accumulate one window's digits ``d`` (N,) over ``points``
        and return sum_b b*S_b as a single point."""
        curve = self.curve
        xp = curve.xp
        n_buckets = 1 << self.window

        order = xp.argsort(d)
        ds = xp.take(d, order)
        pts = tuple(xp.take(coord, order, axis=0) for coord in points)
        # segment heads: first lane or digit change
        prev = xp.concatenate([ds[:1] - 1, ds[:-1]])
        flags = ds != prev
        _, scanned = _inclusive_scan(curve, flags, pts, self.use_jax)
        # last element of each segment carries the bucket total
        nxt = xp.concatenate([ds[1:], ds[-1:] + 1])
        is_last = ds != nxt
        # scatter totals; non-last lanes and digit-0 lanes go to a dump slot
        target = xp.where(is_last & (ds > 0), ds, n_buckets)
        buckets = curve.identity((n_buckets + 1,))
        if self.use_jax:
            buckets = tuple(b.at[target].set(s) for b, s in zip(buckets, scanned))
        else:
            buckets = tuple(_np.array(b) for b in buckets)
            for b, s in zip(buckets, scanned):
                b[target] = s
        buckets = tuple(b[1:n_buckets] for b in buckets)  # drop 0 and dump

        # suffix sums R_b = sum_{j>=b} S_j (reversed scan), then
        # sum_b b*S_b = sum_b R_b (tree reduction)
        rev = tuple(b[::-1] for b in buckets)
        no_flags = xp.zeros((n_buckets - 1,), dtype=bool)
        _, suffix = _inclusive_scan(curve, no_flags, rev, self.use_jax)
        return _tree_reduce(curve, suffix, n_buckets - 1, self.use_jax)

    def msm(self, points, digits):
        """points: batched point tuple (N lanes); digits: (W, N) int32.
        Returns a single (unbatched) point tuple."""
        curve = self.curve
        c = self.window

        if self.use_jax:
            from jax import lax

            def body(acc, d_row):
                for _ in range(c):
                    acc = curve.double(acc)
                return curve.add(acc, self._window_sum(points, d_row)), None

            acc, _ = lax.scan(body, curve.identity(()), digits[::-1])
            return acc

        acc = curve.identity(())
        for w in range(digits.shape[0] - 1, -1, -1):
            for _ in range(c):
                acc = curve.double(acc)
            acc = curve.add(acc, self._window_sum(points, digits[w]))
        return acc

    # -- bit-serial double-and-add MSM (small graph, scan over 253 bits) ----

    def msm_daa_lanes(self, points, bits):
        """Per-lane double-and-add WITHOUT the final reduction: returns the
        (N,)-batch acc_i = s_i * P_i.  ``bits``: (n_bits, N), LSB first."""
        curve = self.curve
        N = bits.shape[1]

        if self.use_jax:
            from jax import lax

            def body(state, bit_row):
                acc, base = state
                acc = curve.select(bit_row.astype(bool), curve.add(acc, base), acc)
                base = curve.double(base)
                return (acc, base), None

            (acc, _), _ = lax.scan(body, (curve.identity((N,)), points), bits)
            return acc

        acc, base = curve.identity((N,)), points
        for row in bits:
            acc = curve.select(row.astype(bool), curve.add(acc, base), acc)
            base = curve.double(base)
        return acc

    def msm_daa(self, points, bits):
        """MSM via per-lane double-and-add + pairwise tree reduction.

        Compared to Pippenger this does more arithmetic but compiles to a
        tiny lax.scan graph and vectorizes perfectly over lanes — the robust
        default on TPU."""
        acc = self.msm_daa_lanes(points, bits)
        return _tree_reduce(self.curve, acc, bits.shape[1], self.use_jax)

    def batch_dual_mul(self, P_batch, bits_a, bits_b, q_table):
        """Per-lane r_i = a_i*Q + b_i*P_i with a SHARED base Q.

        Used for batched Schnorr verification (r = s*H - e*P): Q's doubles
        are precomputed host-side (``q_table``: point-tuple of (n_bits, 18)
        arrays), so each scan step costs 2 masked adds + 1 double.
        Returns an (N,)-batch of points.
        """
        curve = self.curve
        N = bits_a.shape[1]

        if self.use_jax:
            from jax import lax

            def body(state, xs):
                acc, base = state
                bit_a, bit_b, q_row = xs
                acc = curve.select(bit_a.astype(bool), curve.add(acc, q_row), acc)
                acc = curve.select(bit_b.astype(bool), curve.add(acc, base), acc)
                base = curve.double(base)
                return (acc, base), None

            (acc, _), _ = lax.scan(
                body, (curve.identity((N,)), P_batch), (bits_a, bits_b, q_table)
            )
            return acc

        acc, base = curve.identity((N,)), P_batch
        for k in range(bits_a.shape[0]):
            q_row = tuple(c[k] for c in q_table)
            acc = curve.select(bits_a[k].astype(bool), curve.add(acc, q_row), acc)
            acc = curve.select(bits_b[k].astype(bool), curve.add(acc, base), acc)
            base = curve.double(base)
        return acc

    # -- convenience host API ----------------------------------------------

    def msm_points(self, scalars: list[int], points: list[RistrettoPoint]) -> RistrettoPoint:
        if not scalars:
            from ..pyref.ristretto import IDENTITY

            return IDENTITY
        digits = decompose_digits(scalars, self.window)
        batch = self.curve.from_points(points)
        if self.use_jax:
            import jax.numpy as jnp

            digits = jnp.asarray(digits)
        result = self.msm(batch, digits)
        return self.curve.to_points(tuple(c[None] for c in result))[0]
