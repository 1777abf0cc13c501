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

    def msm(self, scalars: list[int], points: list[RistrettoPoint]) -> RistrettoPoint:
        """Drop-in for pyref.multiscalar_mul, executed on the device."""
        n = len(scalars)
        assert n == len(points)
        if n == 0:
            return IDENTITY
        if n < self.min_size:
            from ..pyref.ristretto import multiscalar_mul

            return multiscalar_mul(scalars, points)

        from .. import scalars as sc

        padded = _next_pow2(n)
        scalars = [s % sc.L for s in scalars] + [0] * (padded - n)
        points = list(points) + [IDENTITY] * (padded - n)

        bits = decompose_bits(scalars)
        batch = self._to_device_points(points)
        if self.backend == "jax":
            import jax.numpy as jnp

            bits = jnp.asarray(bits)
        res = self._msm_daa_jit(batch, bits)
        return self._point_from_device(res)

    def msm_check(self, scalars: list[int], points: list[RistrettoPoint]):
        """MSM + identity predicate fully on device.  Returns a 0-d device
        bool (jax) or python bool (numpy) WITHOUT blocking, so several checks
        can be dispatched before any host pull."""
        from .. import scalars as sc
        from ..pyref.ristretto import multiscalar_mul

        n = len(scalars)
        if n == 0:
            return True
        if n < self.min_size:
            return multiscalar_mul(scalars, points).is_identity()

        padded = _next_pow2(n)
        scalars = [s % sc.L for s in scalars] + [0] * (padded - n)
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
