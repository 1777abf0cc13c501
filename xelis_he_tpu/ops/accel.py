"""Accelerator facade: routes the framework's MSM hooks onto the batched
limb engine (jax/TPU or numpy).

The verification layers (sigma BatchCollector, RangeProof.verify_batch, the
tx verifier, and the prover) all take an ``msm`` callable; passing
``Accelerator.msm`` executes every multiscalar multiplication as one fused
device kernel.  Shapes are padded to the next power of two so the jit cache
stays small across batch sizes.

Usage:
    accel = Accelerator()            # jax backend, TPU if available
    verify_batch(txs, state, msm=accel.msm)
"""

from __future__ import annotations

import os

import numpy as _np

from ..pyref.ristretto import IDENTITY, RistrettoPoint
from .curve import Curve, jax_curve, numpy_curve
from .fe import NLIMBS
from .msm import MsmEngine, decompose_bits


def _enable_jax_compile_cache():
    try:
        import jax

        cache_dir = os.environ.get(
            "XELIS_HE_TPU_JAXCACHE",
            os.path.expanduser("~/.cache/xelis_he_tpu/jaxcache"),
        )
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:  # pragma: no cover
        pass


def _next_pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


def _tree_reduce_group(curve: Curve, acc, start: int, count: int):
    """Tree-reduce lanes [start, start+count) of a point batch."""
    from .msm import _tree_reduce

    group = tuple(c[start : start + count] for c in acc)
    return _tree_reduce(curve, group, count)


class Accelerator:
    """Fused-MSM executor on the batched limb engine."""

    def __init__(self, backend: str = "jax", min_size: int = 16):
        self.backend = backend
        # below this size the pure-Python Pippenger beats kernel dispatch
        self.min_size = min_size
        if backend == "jax":
            _enable_jax_compile_cache()
            import jax

            self._jax = jax
            self.curve: Curve = jax_curve()
            self.engine = MsmEngine(self.curve, use_jax=True)
            self._msm_daa_jit = jax.jit(self.engine.msm_daa)
            self._compress_jit = jax.jit(self.curve.compress)
            self._dual_mul_jit = jax.jit(self.engine.batch_dual_mul)

            curve = self.curve

            def _decompress_packed(data):
                # decompress + canonicalize + pack coords into ONE array so a
                # single host pull moves the whole result (device->host
                # transfers are expensive on tunneled TPUs)
                pts, valid = curve.decompress(data)
                packed = curve.xp.stack(
                    [curve.fe.canon(c) for c in pts], axis=1
                )  # (N, 4, NLIMBS)
                return packed, valid

            self._decompress_packed_jit = jax.jit(_decompress_packed)
        else:
            self.curve = numpy_curve()
            self.engine = MsmEngine(self.curve, use_jax=False)
            self._msm_daa_jit = self.engine.msm_daa
            self._compress_jit = self.curve.compress
            self._dual_mul_jit = self.engine.batch_dual_mul

            def _decompress_packed_np(data):
                pts, valid = self.curve.decompress(data)
                packed = _np.stack([self.curve.fe.canon(c) for c in pts], axis=1)
                return packed, valid

            self._decompress_packed_jit = _decompress_packed_np

    # -- conversions --------------------------------------------------------

    def _to_device_points(self, points: list[RistrettoPoint]):
        batch = self.curve.from_points(points)
        if self.backend == "jax":
            import jax.numpy as jnp

            batch = tuple(jnp.asarray(c) for c in batch)
        return batch

    # -- the msm hook --------------------------------------------------------

    @staticmethod
    def _pad_scalars(scalars, padded: int):
        """Canonicalize + zero-pad; accepts list[int] or (N,32) uint8."""
        if isinstance(scalars, _np.ndarray):
            n = scalars.shape[0]
            if padded > n:
                pad = _np.zeros((padded - n, 32), dtype=_np.uint8)
                scalars = _np.concatenate([scalars, pad])
            return scalars
        from .. import scalars as sc

        return [s % sc.L for s in scalars] + [0] * (padded - len(scalars))

    def msm(self, scalars, points: list[RistrettoPoint]) -> RistrettoPoint:
        """Drop-in for pyref.multiscalar_mul, executed on the device."""
        n = len(scalars)
        assert n == len(points)
        if n == 0:
            return IDENTITY
        if n < self.min_size:
            from ..pyref.ristretto import multiscalar_mul

            from .. import scalarops

            if isinstance(scalars, _np.ndarray):
                scalars = scalarops.array_to_ints(scalars)
            return multiscalar_mul(scalars, points)

        padded = _next_pow2(n)
        scalars = self._pad_scalars(scalars, padded)
        points = list(points) + [IDENTITY] * (padded - n)

        bits = decompose_bits(scalars)
        batch = self._to_device_points(points)
        if self.backend == "jax":
            import jax.numpy as jnp

            bits = jnp.asarray(bits)
        res = self._msm_daa_jit(batch, bits)
        return self._point_from_device(res)

    def msm_check(self, scalars, points: list[RistrettoPoint]):
        """MSM + identity predicate fully on device.  Returns a 0-d device
        bool (jax) or python bool (numpy) WITHOUT blocking, so several checks
        can be dispatched before any host pull."""
        from ..pyref.ristretto import multiscalar_mul

        n = len(scalars)
        if n == 0:
            return True
        if n < self.min_size:
            from .. import scalarops

            if isinstance(scalars, _np.ndarray):
                scalars = scalarops.array_to_ints(scalars)
            return multiscalar_mul(scalars, points).is_identity()

        padded = _next_pow2(n)
        scalars = self._pad_scalars(scalars, padded)
        points = list(points) + [IDENTITY] * (padded - n)
        bits = decompose_bits(scalars)
        batch = self._to_device_points(points)
        if self.backend == "jax":
            import jax.numpy as jnp

            bits = jnp.asarray(bits)
        if getattr(self, "_msm_check_jit", None) is None:
            curve = self.curve
            engine = self.engine

            def _check(pts, bits):
                res = engine.msm_daa(pts, bits)
                return curve.is_identity(tuple(c[None] for c in res))[0]

            if self.backend == "jax":
                import jax

                self._msm_check_jit = jax.jit(_check)
            else:
                self._msm_check_jit = _check
        return self._msm_check_jit(batch, bits)

    def _point_from_device(self, res) -> RistrettoPoint:
        """Single point: canonicalize on device, ONE host pull."""
        from .fe import Field

        if getattr(self, "_normalize_jit", None) is None:
            curve = self.curve

            def _norm(pts):
                return curve.xp.stack([curve.fe.canon(c) for c in pts], axis=0)

            if self.backend == "jax":
                import jax

                self._normalize_jit = jax.jit(_norm)
            else:
                self._normalize_jit = _norm
        packed = _np.asarray(self._normalize_jit(res))  # (4, NLIMBS)
        coords = Field.to_ints(packed)
        return RistrettoPoint(*coords)

    # -- batched Schnorr verification ----------------------------------------

    def _h_table(self):
        """Doubles table 2^k * H for the shared signature base (cached)."""
        if getattr(self, "_h_table_cache", None) is None:
            from ..elgamal import H

            doubles = [H]
            for _ in range(252):
                doubles.append(doubles[-1].double())
            table = self.curve.from_points(doubles)
            if self.backend == "jax":
                import jax.numpy as jnp

                table = tuple(jnp.asarray(c) for c in table)
            self._h_table_cache = table
        return self._h_table_cache

    def verify_signatures(self, entries) -> list[bool]:
        """Batch-verify Schnorr signatures (elgamal.rs:38-42 semantics).

        entries: list of (signature, pubkey_point, pubkey_compressed,
        message_bytes).  Computes r_i = s_i*H - e_i*P_i for the whole batch
        on the device (2 masked adds + 1 double per bit), compresses in
        batch, then recomputes the challenge hashes on host.
        """
        import hashlib

        from .. import scalars as sc
        from ..pyref.ristretto import IDENTITY

        if not entries:
            return []
        n = len(entries)
        padded = max(_next_pow2(n), self.min_size)
        s_list = [e[0].s for e in entries] + [0] * (padded - n)
        e_neg = [(-e[0].e) % sc.L for e in entries] + [0] * (padded - n)
        pts = [e[1].point if hasattr(e[1], "point") else e[1] for e in entries]
        pts = pts + [IDENTITY] * (padded - n)

        bits_s = decompose_bits(s_list)
        bits_e = decompose_bits(e_neg)
        batch = self._to_device_points(pts)
        if self.backend == "jax":
            import jax.numpy as jnp

            bits_s, bits_e = jnp.asarray(bits_s), jnp.asarray(bits_e)
        r_batch = self._dual_mul_jit(batch, bits_s, bits_e, self._h_table())
        r_bytes = _np.asarray(self._compress_jit(r_batch))

        results = []
        for i, (sig, _pt, pk_compressed, message) in enumerate(entries):
            h = hashlib.sha3_512()
            h.update(pk_compressed.data)
            h.update(message)
            h.update(bytes(r_bytes[i]))
            results.append(sc.from_bytes_mod_order_wide(h.digest()) == sig.e)
        return results

    # -- fused whole-block verification --------------------------------------

    @staticmethod
    def _round_up(n: int, granule: int = 256) -> int:
        return max(granule, ((n + granule - 1) // granule) * granule)

    def _fused_check_fn(self, ns: int, nr: int, nk: int):
        """Build (and cache) the single-dispatch block-check kernel for the
        padded group sizes (ns, nr, nk): one DAA scan over ALL lanes
        [sigma | range | sig_s | sig_e], then per-group reduction:

        - sigma group  -> tree-reduce -> is_identity
        - range group  -> tree-reduce -> is_identity
        - signatures   -> r_k = acc[s_k] + acc[e_k] -> batched compress

        ONE device call replaces the previous three (sigma MSM, range MSM,
        signature dual-mul); on tunneled TPUs dispatch overhead dominates
        small-batch latency, so call count is the first-order cost."""
        key = (ns, nr, nk)
        cache = getattr(self, "_fused_cache", None)
        if cache is None:
            cache = self._fused_cache = {}
        fn = cache.get(key)
        if fn is not None:
            return fn

        curve = self.curve
        engine = self.engine

        def _check(points, bits):
            acc = engine.msm_daa_lanes(points, bits)  # per-lane accumulators
            sigma = _tree_reduce_group(curve, acc, 0, ns)
            rng = _tree_reduce_group(curve, acc, ns, nr)
            sigma_ok = curve.is_identity(tuple(c[None] for c in sigma))[0]
            range_ok = curve.is_identity(tuple(c[None] for c in rng))[0]
            if nk:
                s_lanes = tuple(c[ns + nr : ns + nr + nk] for c in acc)
                e_lanes = tuple(c[ns + nr + nk : ns + nr + 2 * nk] for c in acc)
                r = curve.add(s_lanes, e_lanes)
                r_bytes = curve.compress(r)
            else:
                r_bytes = curve.xp.zeros((0, 32), dtype=curve.xp.uint8)
            return sigma_ok, range_ok, r_bytes

        if self.backend == "jax":
            import jax

            fn = jax.jit(_check)
        else:
            fn = _check
        cache[key] = fn
        return fn

    def fused_block_check(self, sigma, range_, sig_entries):
        """sigma/range_: (scalars, points) pairs; sig_entries: list of
        (signature, pubkey_point, pubkey_compressed, message).

        Returns (sigma_ok, range_ok, sig_ok) with ONE device dispatch and
        ONE host sync."""
        import hashlib

        from .. import scalars as sc
        from ..elgamal import H as _H

        sigma_sc, sigma_pts = sigma
        range_sc, range_pts = range_

        ns = self._round_up(len(sigma_sc))
        nr = self._round_up(len(range_sc))
        nk = self._round_up(len(sig_entries), 64) if sig_entries else 0

        def pad_ints(vals, n):
            if isinstance(vals, _np.ndarray):
                out = _np.zeros((n, 32), dtype=_np.uint8)
                out[: vals.shape[0]] = vals
                return out
            from .. import scalarops

            out = _np.zeros((n, 32), dtype=_np.uint8)
            arr = scalarops.ints_to_array([v % sc.L for v in vals])
            out[: arr.shape[0]] = arr
            return out

        sig_s = [e[0].s for e in sig_entries]
        sig_e = [(-e[0].e) % sc.L for e in sig_entries]
        sig_pts = [e[1].point if hasattr(e[1], "point") else e[1] for e in sig_entries]

        all_scalars = _np.concatenate(
            [
                pad_ints(sigma_sc, ns),
                pad_ints(range_sc, nr),
                pad_ints(sig_s, nk),
                pad_ints(sig_e, nk),
            ]
        )
        pts = list(sigma_pts) + [IDENTITY] * (ns - len(sigma_pts))
        pts += list(range_pts) + [IDENTITY] * (nr - len(range_pts))
        pts += [_H] * len(sig_entries) + [IDENTITY] * (nk - len(sig_entries))
        pts += list(sig_pts) + [IDENTITY] * (nk - len(sig_pts))

        bits = decompose_bits(all_scalars)
        batch = self._to_device_points(pts)
        if self.backend == "jax":
            import jax.numpy as jnp

            bits = jnp.asarray(bits)

        fn = self._fused_check_fn(ns, nr, nk)
        sigma_ok, range_ok, r_bytes = fn(batch, bits)

        r_bytes = _np.asarray(r_bytes)  # host sync happens here, once
        sig_ok = True
        for i, (sig, _pt, pk_compressed, message) in enumerate(sig_entries):
            h = hashlib.sha3_512()
            h.update(pk_compressed.data)
            h.update(message)
            h.update(bytes(r_bytes[i]))
            if sc.from_bytes_mod_order_wide(h.digest()) != sig.e:
                sig_ok = False
                break
        return bool(sigma_ok), bool(range_ok), sig_ok

    # -- batched point utilities (device) ------------------------------------

    def decompress_many(self, encodings: list[bytes]):
        """Batched validating decompression.  Returns (points, valid_flags).
        Shapes are padded to powers of two to bound the jit cache."""
        if not encodings:
            return [], []
        n = len(encodings)
        padded = _next_pow2(n)
        data = _np.zeros((padded, 32), dtype=_np.uint8)
        data[:n] = _np.frombuffer(b"".join(encodings), dtype=_np.uint8).reshape(n, 32)
        if self.backend == "jax":
            import jax.numpy as jnp

            data = jnp.asarray(data)
        packed, valid = self._decompress_packed_jit(data)
        packed = _np.asarray(packed)[:n]  # one pull: (n, 4, NLIMBS)
        from .fe import Field

        coords = Field.to_ints(packed)  # n*4 ints, row-major X,Y,Z,T
        points = [
            RistrettoPoint(*coords[4 * i: 4 * i + 4]) for i in range(n)
        ]
        return points, [bool(v) for v in _np.asarray(valid)[:n]]

    def decompress_many_lazy(self, encodings: list[bytes]):
        """Batched validating decompression WITHOUT host point
        materialization: returns ((n, 4, NLIMBS) canonical limb rows,
        valid flags).  Callers seed the lazy decompress cache; point
        objects are built on first host access only."""
        if not encodings:
            return _np.zeros((0, 4, NLIMBS), dtype=_np.uint32), []
        n = len(encodings)
        padded = _next_pow2(n)
        data = _np.zeros((padded, 32), dtype=_np.uint8)
        data[:n] = _np.frombuffer(b"".join(encodings), dtype=_np.uint8).reshape(n, 32)
        if self.backend == "jax":
            import jax.numpy as jnp

            data = jnp.asarray(data)
        packed, valid = self._decompress_packed_jit(data)
        packed = _np.asarray(packed)[:n]
        return packed, [bool(v) for v in _np.asarray(valid)[:n]]

    def compress_many(self, points: list[RistrettoPoint]) -> list[bytes]:
        if not points:
            return []
        n = len(points)
        padded = _next_pow2(n)
        batch = self._to_device_points(list(points) + [IDENTITY] * (padded - n))
        enc = _np.asarray(self._compress_jit(batch))
        return [bytes(enc[i]) for i in range(n)]


_default: Accelerator | None = None


def default_accelerator() -> Accelerator:
    """Process-wide accelerator: jax if importable, else numpy."""
    global _default
    if _default is None:
        try:
            import jax  # noqa: F401

            _default = Accelerator("jax")
        except Exception:  # pragma: no cover
            _default = Accelerator("numpy")
    return _default
