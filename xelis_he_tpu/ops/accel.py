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
            self._decompress_jit = jax.jit(self.curve.decompress)
            self._compress_jit = jax.jit(self.curve.compress)
        else:
            self.curve = numpy_curve()
            self.engine = MsmEngine(self.curve, use_jax=False)
            self._msm_daa_jit = self.engine.msm_daa
            self._decompress_jit = self.curve.decompress
            self._compress_jit = self.curve.compress

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
        return self.curve.to_points(tuple(c[None] for c in res))[0]

    # -- batched point utilities (device) ------------------------------------

    def decompress_many(self, encodings: list[bytes]):
        """Batched validating decompression.  Returns (points, valid_flags)."""
        if not encodings:
            return [], []
        data = _np.frombuffer(b"".join(encodings), dtype=_np.uint8).reshape(-1, 32)
        if self.backend == "jax":
            import jax.numpy as jnp

            data = jnp.asarray(data)
        pts, valid = self._decompress_jit(data)
        return self.curve.to_points(pts), [bool(v) for v in _np.asarray(valid)]

    def compress_many(self, points: list[RistrettoPoint]) -> list[bytes]:
        if not points:
            return []
        batch = self._to_device_points(points)
        enc = _np.asarray(self._compress_jit(batch))
        return [bytes(enc[i]) for i in range(len(points))]


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
