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

        from ..utils.cachedir import cache_root

        # per-backend subdir: TPU entries are portable across processes on
        # the same runtime and ship with the repo; XLA:CPU AOT entries bake
        # in host CPU features and are kept out of the committed cache
        # (loading them on a different host logs feature-mismatch errors
        # and risks SIGILL)
        cache_dir = os.environ.get("XELIS_HE_TPU_JAXCACHE")
        if cache_dir is None:
            import jax

            cache_dir = str(cache_root() / "jaxcache" / jax.default_backend())
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:  # pragma: no cover
        pass


def _next_pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


_CODE_SALT: str | None = None


def _code_salt() -> str:
    """Content hash of the compute-path modules: a code edit must not let a
    stale exported module (keyed only by shapes) serve the OLD program."""
    global _CODE_SALT
    if _CODE_SALT is None:
        import hashlib
        import pathlib

        h = hashlib.sha256()
        here = pathlib.Path(__file__).parent
        for name in ("accel.py", "pallas_msm.py", "curve.py", "fe.py",
                     "msm.py"):
            try:
                h.update((here / name).read_bytes())
            except OSError:
                h.update(name.encode())
        _CODE_SALT = h.hexdigest()[:16]
    return _CODE_SALT


def _gather_rows(xp, tables, idx):
    """Gather (n, 4, NLIMBS) point rows addressed by ``idx`` from the
    logical concatenation of ``tables`` WITHOUT materializing the concat —
    the block decompression table is O(block encodings) (hundreds of MB at
    10k txs) and a device concat per chunk dispatch copies all of it.
    Instead: one clipped gather per table + a select by index range."""
    tables = [t for t in tables if t.shape[0]]
    if not tables:
        return xp.zeros((idx.shape[0], 4, NLIMBS), dtype=xp.uint32)
    base = 0
    out = None
    for t in tables:
        n_t = t.shape[0]
        local = xp.clip(idx - base, 0, n_t - 1)
        rows = t[local]
        if out is None:
            out = rows
        else:
            here = (idx >= base)[:, None, None]
            out = xp.where(here, rows, out)
        base += n_t
    return out


class _LazyEncodings:
    """len()-able stand-in for the block encoding list on the native path
    (the (n, 32) array is kept; per-encoding bytes objects are never
    materialized unless a fallback consumer iterates)."""

    __slots__ = ("rows",)

    def __init__(self, rows):
        self.rows = rows

    def __len__(self):
        return int(self.rows.shape[0])

    def __iter__(self):
        return (r.tobytes() for r in self.rows)


def _tree_reduce_group(curve: Curve, acc, start: int, count: int):
    """Tree-reduce lanes [start, start+count) of a point batch."""
    from .msm import _tree_reduce

    group = tuple(c[start : start + count] for c in acc)
    return _tree_reduce(curve, group, count, use_jax=curve.xp.__name__ != "numpy")


class Accelerator:
    """Fused-MSM executor on the batched limb engine."""

    def __init__(
        self,
        backend: str = "jax",
        min_size: int = 16,
        use_pallas: bool | None = None,
        mesh=None,
    ):
        import threading

        self.backend = backend
        # below this size the pure-Python Pippenger beats kernel dispatch
        self.min_size = min_size
        # per-thread block context (device-resident decompression rows +
        # valid flags + encoding->row map): concurrent verify_batch calls
        # in different threads share this Accelerator's jit caches but not
        # each other's in-flight block state
        self._blk = threading.local()
        # multi-chip: a jax.sharding.Mesh with a 1-D "shards" axis shards the
        # fused-check LANE dimension across devices (GSPMD inserts the
        # cross-shard collectives for the reductions).  The Pallas windowed
        # kernel runs shard_mapped over the same axis (_lanes_fn /
        # pallas_msm.make_sharded_lanes_fn).
        self.mesh = mesh
        if backend == "jax":
            _enable_jax_compile_cache()
            import jax

            self._jax = jax
            if use_pallas is None:
                env = os.environ.get("XELIS_HE_TPU_PALLAS")
                if env is not None:
                    use_pallas = env not in ("0", "false", "")
                else:
                    # the Mosaic kernel targets real TPUs; CPU tests keep the
                    # jnp engine (interpret mode is too slow for real sizes).
                    # With a mesh, the engine follows the MESH's devices —
                    # an emulated CPU mesh must not pick the TPU kernel just
                    # because a TPU is the process default backend.
                    if mesh is not None:
                        plat = next(iter(mesh.devices.flat)).platform
                    else:
                        plat = jax.default_backend()
                    use_pallas = plat == "tpu"
            self.use_pallas = bool(use_pallas)
            self.curve: Curve = jax_curve()
            self.engine = MsmEngine(self.curve, use_jax=True)
            self._msm_daa_jit = jax.jit(self._msm_daa_fn())
            self._dual_mul_jit = jax.jit(self.engine.batch_dual_mul)

            curve = self.curve

            if self.use_pallas:
                from .pallas_msm import compress_pallas, decompress_pallas

                self._compress_jit = jax.jit(compress_pallas)

                def _decompress_packed_pl(data):
                    # kernel emits canonical coords already; valid flag rides
                    # as a 73rd column so ONE host pull moves everything
                    pts, valid = decompress_pallas(data)
                    packed = curve.xp.stack(pts, axis=1)  # (N, 4, NLIMBS)
                    flat = packed.reshape(packed.shape[0], 4 * NLIMBS)
                    return curve.xp.concatenate(
                        [flat, valid[:, None].astype(flat.dtype)], axis=1
                    )

                self._decompress_packed_jit = self._export_dispatch(
                    "decomp_pl", jax.jit(_decompress_packed_pl)
                )
            else:
                self._compress_jit = jax.jit(self.curve.compress)

                def _decompress_packed(data):
                    # decompress + canonicalize + pack coords AND the valid
                    # flag into ONE array so a single host pull moves the
                    # whole result (each sync on a tunneled TPU costs ~24ms)
                    pts, valid = curve.decompress(data)
                    packed = curve.xp.stack(
                        [curve.fe.canon(c) for c in pts], axis=1
                    )  # (N, 4, NLIMBS)
                    flat = packed.reshape(packed.shape[0], 4 * NLIMBS)
                    return curve.xp.concatenate(
                        [flat, valid[:, None].astype(flat.dtype)], axis=1
                    )

                self._decompress_packed_jit = self._export_dispatch(
                    "decomp_jnp", jax.jit(_decompress_packed)
                )
        else:
            self.use_pallas = False
            self.curve = numpy_curve()
            self.engine = MsmEngine(self.curve, use_jax=False)
            self._msm_daa_jit = self.engine.msm_daa
            self._compress_jit = self.curve.compress
            self._dual_mul_jit = self.engine.batch_dual_mul

            def _decompress_packed_np(data):
                pts, valid = self.curve.decompress(data)
                packed = _np.stack([self.curve.fe.canon(c) for c in pts], axis=1)
                flat = packed.reshape(packed.shape[0], 4 * NLIMBS)
                return _np.concatenate(
                    [flat, valid[:, None].astype(flat.dtype)], axis=1
                )

            self._decompress_packed_jit = _decompress_packed_np

    # -- kernel plumbing -----------------------------------------------------

    def _lanes_fn(self):
        """Per-lane s_i*P_i: the windowed Pallas kernel on TPU (4-bit signed
        digits, ~1.6x the binary kernel), jnp scan elsewhere.  With a mesh,
        the Pallas kernel runs shard_mapped over the lane axis (per-lane
        outputs all_gathered; reductions unchanged)."""
        if self.use_pallas:
            if self.mesh is not None:
                from .pallas_msm import make_sharded_lanes_fn

                fn = getattr(self, "_sharded_lanes", None)
                if fn is None:
                    fn = self._sharded_lanes = make_sharded_lanes_fn(self.mesh)
                return fn
            from .pallas_msm import msm_windowed_lanes_pallas

            return msm_windowed_lanes_pallas
        return self.engine.msm_daa_lanes

    def _lanes_fn_k4(self):
        """Quad-packed lanes kernel (or its shard_mapped form)."""
        if self.mesh is not None:
            from .pallas_msm import make_sharded_lanes_fn_k4

            fn = getattr(self, "_sharded_lanes_k4", None)
            if fn is None:
                fn = self._sharded_lanes_k4 = make_sharded_lanes_fn_k4(self.mesh)
            return fn
        from .pallas_msm import msm_windowed_lanes_pallas_k4

        return msm_windowed_lanes_pallas_k4

    @property
    def use_quad(self) -> bool:
        """Packed lanes kernel (K_PACK=8 scalar-muls share one
        accumulator's doubling chain — ~880 vs ~250 kpts/s single-lane,
        round 5 with fe13 + niels tables): on by default on the Pallas
        path, XELIS_QUAD_LANES=0 reverts to single-lane."""
        if not self.use_pallas:
            return False
        return os.environ.get("XELIS_QUAD_LANES", "1") != "0"

    def _pallas_lane_granules(self):
        """(group granule, signature granule): each lane GROUP must split
        into TILE-aligned shards across the mesh.  Quad packing needs lane
        groups of 4*TILE (4 lanes per slot, TILE-aligned slot groups for
        the tile-sum reduction) and QTILE-aligned signature slot counts."""
        from .pallas_msm import K_PACK, QTILE, TILE

        d = self.mesh.devices.size if self.mesh is not None else 1
        if self.use_quad:
            return d * K_PACK * TILE, d * QTILE
        return d * TILE, d * TILE // 2

    def _bits_for(self, scalars):
        """Scalar digit/bit tensor in the layout the lanes fn expects."""
        if self.use_pallas:
            from .pallas_msm import recode_signed4

            return recode_signed4(scalars)
        return decompose_bits(scalars)

    def _msm_daa_fn(self):
        """(points, bits) -> single reduced point (jit-able)."""
        from .msm import _tree_reduce

        curve = self.curve
        lanes = self._lanes_fn()
        use_pallas = self.use_pallas

        use_quad = self.use_quad

        def _msm_daa(points, bits):
            xp = curve.xp
            from .pallas_msm import K_PACK as KP

            if use_quad and points[0].shape[0] % (KP * 512) == 0:
                from .pallas_msm import tile_sums_pallas

                lanes_k4 = self._lanes_fn_k4()
                p4 = tuple(
                    xp.stack([c[k::KP] for k in range(KP)], axis=0)
                    for c in points
                )
                d4 = xp.stack([bits[:, k::KP] for k in range(KP)], axis=0)
                acc = tile_sums_pallas(lanes_k4(p4, d4))
                return _tree_reduce(curve, acc, acc[0].shape[0], True)
            acc = lanes(points, bits)
            if use_pallas:
                from .pallas_msm import tile_sums_pallas

                acc = tile_sums_pallas(acc)  # one lane per tile
            return _tree_reduce(curve, acc, acc[0].shape[0], True)

        return _msm_daa

    def _lane_granule(self, n: int) -> int:
        """Pad lane counts so the Pallas grid divides evenly (TILE lanes per
        program) AND the jit-key space stays in power-of-two buckets — a
        block-size-proportional count (e.g. the decompression lane dim)
        must not mint a fresh multi-10s kernel compile per block size."""
        if self.use_pallas:
            from .pallas_msm import TILE

            if n <= 128:
                return 128
            p2 = max(TILE, _next_pow2(n))
            # 3/4-pow2 intermediate bucket: caps padding waste at 33%
            # (the decompression runs over every padded lane; at 10k txs a
            # pure-pow2 pad costs 1.8x the real work) while keeping the
            # jit-key space to two buckets per octave
            p34 = (p2 // 4) * 3
            if n <= p34 and p34 % TILE == 0:
                return p34
            return p2
        return _next_pow2(n)

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

        padded = self._lane_granule(n)
        scalars = self._pad_scalars(scalars, padded)
        points = list(points) + [IDENTITY] * (padded - n)

        bits = self._bits_for(scalars)
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

        padded = self._lane_granule(n)
        scalars = self._pad_scalars(scalars, padded)
        points = list(points) + [IDENTITY] * (padded - n)
        bits = self._bits_for(scalars)
        batch = self._to_device_points(points)
        if self.backend == "jax":
            import jax.numpy as jnp

            bits = jnp.asarray(bits)
        if getattr(self, "_msm_check_jit", None) is None:
            curve = self.curve
            msm_daa = self._msm_daa_fn()

            def _check(pts, bits):
                res = msm_daa(pts, bits)
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
        from ..types import _decompress_point

        def as_point(p):
            if isinstance(p, (bytes, bytearray)):
                return _decompress_point(bytes(p))
            return p.point if hasattr(p, "point") else p

        s_list = [e[0].s for e in entries] + [0] * (padded - n)
        e_neg = [(-e[0].e) % sc.L for e in entries] + [0] * (padded - n)
        pts = [as_point(e[1]) for e in entries]
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

    # -- block context: device-resident decompressed rows ---------------------

    def _block_state(self):
        """Per-thread block context (rows/valid/pending/encodings/index)."""
        blk = self._blk
        if not hasattr(blk, "rows"):
            blk.rows = None
            blk.valid = None
            blk.pending = None
            blk.encodings = []
            blk.index = {}
        return blk

    def begin_block_async_rows(self, enc_rows: _np.ndarray) -> None:
        """begin_block_async for a ready (n, 32) uint8 encoding array (the
        native collect pass emits one).  Skips the per-encoding join and
        the eager index dict — the native path resolves lanes to row
        indices in C++, so the Python-side map is built lazily only if a
        fallback consumer asks for it."""
        blk = self._block_state()
        n = int(enc_rows.shape[0])
        if n == 0:
            self.begin_block_async([])
            return
        padded = self._lane_granule(n)
        data = _np.zeros((padded, 32), dtype=_np.uint8)
        data[:n] = enc_rows
        if self.backend == "jax":
            import jax.numpy as jnp

            data = jnp.asarray(data)
        rows73 = self._decompress_packed_jit(data)
        blk.rows = rows73[:, : 4 * NLIMBS].reshape(padded, 4, NLIMBS)
        blk.valid = rows73[:, 4 * NLIMBS]
        blk.pending = rows73
        blk.encodings = _LazyEncodings(enc_rows)
        blk.index = None  # lazy; the native path never consults it

    def block_row_base(self) -> int:
        """Device row count of the block decompression table (the row index
        where caller-supplied extra rows begin)."""
        blk = self._block_state()
        return int(blk.rows.shape[0]) if blk.rows is not None else 0

    def begin_block_async(self, encodings: list[bytes]) -> None:
        """Upload + dispatch the block's fused decompression WITHOUT waiting.
        The device computes while the caller does host-side work (tx
        serialization, transcript prep); ``begin_block_wait`` then costs one
        pull.  Uploads and kernels overlap host work on tunneled TPUs — only
        the result pull pays the ~24ms round trip."""
        blk = self._block_state()
        if not encodings:
            blk.rows = None
            blk.valid = None
            blk.pending = None
            blk.encodings = []
            blk.index = {}
            return
        n = len(encodings)
        padded = self._lane_granule(n)
        data = _np.zeros((padded, 32), dtype=_np.uint8)
        data[:n] = _np.frombuffer(b"".join(encodings), dtype=_np.uint8).reshape(n, 32)
        if self.backend == "jax":
            import jax.numpy as jnp

            data = jnp.asarray(data)
        rows73 = self._decompress_packed_jit(data)
        # device-resident coords for the fused MSM gather
        blk.rows = rows73[:, : 4 * NLIMBS].reshape(padded, 4, NLIMBS)
        # device-resident valid flags: folded into the fused accept
        # predicate, so the single-sync path never pulls them (padding rows
        # are the identity encoding, which is valid)
        blk.valid = rows73[:, 4 * NLIMBS]
        blk.pending = rows73
        blk.encodings = encodings
        # the encoding -> row map is known at dispatch time; garbage rows
        # from invalid encodings are harmless because the valid AND rejects
        blk.index = {e: i for i, e in enumerate(encodings)}

    def begin_block_wait(self):
        """Pull the async decompression (ONE host sync) and build the
        encoding -> row index map.  Returns (rows, valid) for host-side
        cache seeding."""
        blk = self._block_state()
        if blk.pending is None:
            return _np.zeros((0, 4, NLIMBS), dtype=_np.uint32), []
        encodings = blk.encodings
        n = len(encodings)
        out = _np.asarray(blk.pending)  # ONE host pull: coords + valid flags
        blk.pending = None
        rows_np = out[:n, : 4 * NLIMBS].reshape(n, 4, NLIMBS)
        valid_np = [bool(v) for v in out[:n, 4 * NLIMBS]]
        blk.index = {
            e: i for i, (e, ok) in enumerate(zip(encodings, valid_np)) if ok
        }
        return rows_np, valid_np

    def begin_block(self, encodings: list[bytes]):
        """Decompress every encoding of a block in one fused device call and
        keep the canonical limb rows ON DEVICE; MSM point inputs are later
        gathered from this array by index (no host point construction, no
        re-upload).  Returns (rows, valid) like decompress_many_lazy for
        host-side cache seeding."""
        self.begin_block_async(encodings)
        return self.begin_block_wait()

    def block_valid_flags(self) -> list[bool]:
        """Pull the block's decompression valid flags (failure diagnostics
        only — the happy path never syncs on them).  Returns one bool per
        encoding passed to begin_block_async."""
        blk = self._block_state()
        if blk.valid is None:
            return []
        n = len(blk.encodings)
        return [bool(v) for v in _np.asarray(blk.valid)[:n]]

    def end_block(self):
        blk = self._block_state()
        blk.rows = None
        blk.valid = None
        blk.pending = None
        blk.encodings = []
        blk.index = {}

    def _gens_rows(self, n_bits: int, m: int):
        """Device-resident (2*n*m, 4, NLIMBS) rows of the shared Bulletproof
        generators G_vec || H_vec (built once per aggregation size)."""
        cache = getattr(self, "_gens_cache", None)
        if cache is None:
            cache = self._gens_cache = {}
        key = (n_bits, m)
        rows = cache.get(key)
        if rows is None:
            from ..bulletproofs.generators import BP_GENS

            pts = BP_GENS.G(n_bits, m) + BP_GENS.H(n_bits, m)
            rows = self._points_to_rows(pts)
            if self.backend == "jax":
                import jax.numpy as jnp

                rows = jnp.asarray(rows)
            cache[key] = rows
        return rows

    def _points_to_rows(self, points: list[RistrettoPoint]) -> _np.ndarray:
        """(len, 4, NLIMBS) uint32 limb rows from host point objects."""
        from .fe import numpy_field

        fe = numpy_field()
        coords = []
        for p in points:
            coords.extend((p.X, p.Y, p.Z, p.T))
        rows = fe.from_ints(coords)  # (4*len, NLIMBS), vectorized
        return rows.reshape(len(points), 4, NLIMBS)

    def _resolve_lane_points(
        self, pts, lane_total: int, m_block: int, k_gens: int, extras,
        extra_ids: dict | None = None,
    ) -> _np.ndarray:
        """Mixed point list -> (lane_total,) int32 row-index array.

        Entries: int block-row indices (pre-resolved by the deferred
        collector at push time — the common case, resolved here with ONE
        vectorized ``np.fromiter``), 32-byte encodings (looked up in the
        block index, host-decompressed as extras otherwise — raising on
        invalid data preserves reference error behavior), ("__bp_gens__",
        n, m) markers (expand to the generator cache rows), or host
        RistrettoPoint objects (uploaded as extra rows, deduplicated via
        ``extra_ids`` so e.g. the shared signature base H costs one row per
        dispatch instead of one per lane).  ``extras`` must start with the
        identity point (used for lane padding)."""
        from ..types import _decompress_point

        extra_base = m_block + k_gens
        n = len(pts)
        out = _np.empty(lane_total, dtype=_np.int32)
        if n:
            try:
                out[:n] = _np.fromiter(pts, dtype=_np.int32, count=n)
                out[n:] = extra_base  # identity padding (extras[0])
                return out
            except (TypeError, ValueError):
                pass
        block_index = self._block_state().index or {}
        w = 0
        for p in pts:
            if type(p) is int:
                out[w] = p
                w += 1
            elif isinstance(p, (bytes, bytearray)):
                i = block_index.get(bytes(p))
                if i is not None:
                    out[w] = i
                elif bytes(p) == b"\x00" * 32:
                    out[w] = extra_base  # extras[0] is the identity
                else:
                    extras.append(_decompress_point(bytes(p)))
                    out[w] = extra_base + len(extras) - 1
                w += 1
            elif isinstance(p, tuple) and p and p[0] == "__bp_gens__":
                _, nb, m = p
                k = 2 * nb * m
                out[w : w + k] = _np.arange(m_block, m_block + k, dtype=_np.int32)
                w += k
            else:
                row = extra_ids.get(id(p)) if extra_ids is not None else None
                if row is None:
                    extras.append(p)
                    row = extra_base + len(extras) - 1
                    if extra_ids is not None:
                        extra_ids[id(p)] = row
                out[w] = row
                w += 1
        assert w <= lane_total, f"{w} lanes > {lane_total}"
        out[w:] = extra_base  # identity padding
        return out

    # -- split-dispatch fused check -------------------------------------------
    #
    # Phase A (sigma + signature lanes) is dispatched right after pre_verify,
    # so the device crunches it while the host does the range-proof fold;
    # phase B (range lanes) consumes A's accumulators and packs everything
    # into one output — the block still costs a single host sync.

    def _phase_a_fn(self, ns: int, nk: int, m_block: int, e_pad: int):
        key = ("A", ns, nk, m_block, e_pad)
        cache = getattr(self, "_fused_cache", None)
        if cache is None:
            cache = self._fused_cache = {}
        fn = cache.get(key)
        if fn is not None:
            return fn

        curve = self.curve
        lanes_fn = self._lanes_fn()
        use_pallas = self.use_pallas

        def _run_a(block_rows, extra_rows, idx, scal):
            # ``scal`` is ALWAYS the raw (N, 32) uint8 scalar payload —
            # lane-major, so mesh sharding partitions axis 0 on both engines
            # — and the digit/bit expansion happens on device (32x less
            # upload on the tunneled TPU).
            xp = curve.xp
            if use_pallas:
                from .pallas_msm import recode_signed4_xp

                bits = recode_signed4_xp(scal, xp)
            else:
                from .msm import decompose_bits_xp

                bits = decompose_bits_xp(scal, xp)
            rows = _gather_rows(xp, (block_rows, extra_rows), idx)
            points = tuple(rows[:, c, :] for c in range(4))
            acc = lanes_fn(points, bits)  # (ns + 2nk, 18) x4
            return xp.stack(acc, axis=1)  # (ns+2nk, 4, 18)

        if self.backend == "jax":
            import jax

            fn = jax.jit(_run_a, in_shardings=self._phase_shardings(4))
        else:
            fn = _run_a
        cache[key] = fn
        return fn

    def _phase_b_fn(self, ns: int, nr: int, nk: int, m_block: int, k_gens: int, e_pad: int):
        key = ("B", ns, nr, nk, m_block, k_gens, e_pad)
        cache = getattr(self, "_fused_cache", None)
        if cache is None:
            cache = self._fused_cache = {}
        fn = cache.get(key)
        if fn is not None:
            return fn

        curve = self.curve
        lanes_fn = self._lanes_fn()
        use_pallas = self.use_pallas

        def _run_b(acc_a, block_rows, gens_rows, extra_rows, idx, scal, valid):
            xp = curve.xp
            if use_pallas:
                from .pallas_msm import recode_signed4_xp

                bits = recode_signed4_xp(scal, xp)
            else:
                from .msm import decompose_bits_xp

                bits = decompose_bits_xp(scal, xp)
            all_valid = (
                valid.astype(xp.uint8).min()
                if valid.shape[0]
                else xp.ones((), dtype=xp.uint8)
            )
            rows = _gather_rows(xp, (block_rows, gens_rows, extra_rows), idx)
            points = tuple(rows[:, c, :] for c in range(4))
            acc_r = lanes_fn(points, bits)  # range lanes
            acc_s = tuple(acc_a[: ns, c, :] for c in range(4))
            if use_pallas:
                from .pallas_msm import TILE, tile_sums_pallas

                sums_s = tile_sums_pallas(acc_s)
                sigma = _tree_reduce_group(curve, sums_s, 0, ns // TILE)
                sums_r = tile_sums_pallas(acc_r)
                rng = _tree_reduce_group(curve, sums_r, 0, nr // TILE)
            else:
                sigma = _tree_reduce_group(curve, acc_s, 0, ns)
                rng = _tree_reduce_group(curve, acc_r, 0, nr)
            sigma_ok = curve.is_identity(tuple(c[None] for c in sigma))[0]
            range_ok = curve.is_identity(tuple(c[None] for c in rng))[0]
            if nk:
                s_lanes = tuple(acc_a[ns : ns + nk, c, :] for c in range(4))
                e_lanes = tuple(acc_a[ns + nk : ns + 2 * nk, c, :] for c in range(4))
                r = curve.add(s_lanes, e_lanes)
                if use_pallas:
                    from .pallas_msm import compress_pallas

                    r_bytes = compress_pallas(r)
                else:
                    r_bytes = curve.compress(r)
            else:
                r_bytes = xp.zeros((0, 32), dtype=xp.uint8)
            flags = xp.concatenate(
                [
                    xp.reshape(sigma_ok, (1,)).astype(xp.uint8),
                    xp.reshape(range_ok, (1,)).astype(xp.uint8),
                    xp.reshape(all_valid, (1,)).astype(xp.uint8),
                    xp.zeros((29,), dtype=xp.uint8),
                ]
            )[None, :]
            return xp.concatenate([flags, r_bytes], axis=0)

        if self.backend == "jax":
            import jax

            fn = jax.jit(_run_b, in_shardings=self._phase_shardings(7))
        else:
            fn = _run_b
        cache[key] = fn
        return fn

    # -- chunked pipeline: per-chunk lane dispatch + one final combine --------
    #
    # verify_batch splits the block into tx chunks; each chunk's dynamic
    # lanes (sigma + range + signatures) dispatch to the device as soon as
    # that chunk's host folds finish, with the group reduction fused in, so
    # the device crunches chunk k while the host pre_verifies chunk k+1.
    # The final combine folds the C partial sums with the SHARED lanes
    # (G/H collector slots, Pedersen bases, BP generators) and packs flags +
    # signature R bytes — the whole block still costs ONE host sync.

    def _export_cached(self, key, jit_fn):
        """Wrap a jit with a DISK-cached jax.export module.

        Cold warmup pays ~10-20 s of Python trace + StableHLO lowering per
        fused program even when the persistent XLA compile cache hits
        (PERF_NOTES: the r1 '<60 s cold' ask).  jax.export serializes the
        traced module; later processes deserialize (~0.1 s) and go
        straight to XLA, which hits the compile cache.  First call with no
        cache file exports (same cost as before) and persists.  Mesh paths
        keep plain jit (exported shardings would pin a mesh identity);
        XELIS_EXPORT_CACHE=0 disables."""
        import jax

        if (
            self.mesh is not None
            or self.backend != "jax"
            or os.environ.get("XELIS_EXPORT_CACHE", "1") == "0"
        ):
            return jit_fn
        import hashlib
        import pathlib

        from ..utils.cachedir import cache_root

        root = pathlib.Path(
            os.environ.get("XELIS_CACHE_DIR", str(cache_root()))
        ) / "export"
        tag = hashlib.sha256(
            repr(
                (key, jax.__version__, jax.default_backend(), _code_salt())
            ).encode()
        ).hexdigest()[:32]
        path = root / f"{tag}.jaxexp"
        holder: dict = {}

        def call(*args):
            fn = holder.get("fn")
            if fn is None:
                if path.exists():
                    try:
                        fn = jax.export.deserialize(path.read_bytes()).call
                    except Exception:  # stale/corrupt: re-export
                        fn = None
                if fn is None:
                    exp = jax.export.export(jit_fn)(*args)
                    try:
                        root.mkdir(parents=True, exist_ok=True)
                        tmp = path.with_suffix(".tmp%d" % os.getpid())
                        tmp.write_bytes(exp.serialize())
                        os.replace(tmp, path)
                    except Exception:  # cache write is best-effort
                        pass
                    fn = exp.call
                holder["fn"] = fn
            return fn(*args)

        return call

    def _export_dispatch(self, tag: str, jit_fn):
        """Per-input-shape export-cache dispatcher for shape-polymorphic
        jits (the decompress program compiles per pow2 bucket)."""
        cache: dict = {}

        def call(data):
            k = (tag, tuple(data.shape))
            fn = cache.get(k)
            if fn is None:
                fn = cache[k] = self._export_cached(k, jit_fn)
            return fn(data)

        return call

    def _chunk_fn(self, ns: int, nr: int, nk: int, m_block: int, e_pad: int):
        from .pallas_msm import use_fe13 as _fe13

        key = ("chunk", ns, nr, nk, m_block, e_pad, self.use_quad, _fe13())
        cache = getattr(self, "_fused_cache", None)
        if cache is None:
            cache = self._fused_cache = {}
        fn = cache.get(key)
        if fn is not None:
            return fn

        curve = self.curve
        use_quad = self.use_quad
        lanes_fn = self._lanes_fn_k4() if use_quad else self._lanes_fn()
        use_pallas = self.use_pallas

        def _run_chunk(block_rows, extra_rows, idx, scal):
            from .msm import _tree_reduce

            xp = curve.xp
            if use_pallas:
                from .pallas_msm import recode_signed4_xp

                bits = recode_signed4_xp(scal, xp)
            else:
                from .msm import decompose_bits_xp

                bits = decompose_bits_xp(scal, xp)
            rows = _gather_rows(xp, (block_rows, extra_rows), idx)
            points = tuple(rows[:, c, :] for c in range(4))
            if use_quad:
                from .pallas_msm import TILE, tile_sums_pallas

                # quad packing (device-side reshape): slot s of the
                # sigma/range groups sums lanes 4s..4s+3; each signature's
                # (s*H, -e*P) pair packs into ONE slot whose output is its
                # R point directly (subs 2/3 carry zero digits)
                from .pallas_msm import K_PACK as KP

                gr = ns + nr
                p4 = tuple(
                    xp.stack([c[k:gr:KP] for k in range(KP)], axis=0)
                    for c in points
                )
                d4 = xp.stack([bits[:, k:gr:KP] for k in range(KP)], axis=0)
                if nk:
                    zero_d = xp.full((64, nk), 8, dtype=bits.dtype)
                    p4 = tuple(
                        xp.concatenate(
                            [
                                a,
                                xp.stack(
                                    [
                                        c[gr : gr + nk],
                                        c[gr + nk : gr + 2 * nk],
                                    ]
                                    + [c[gr : gr + nk]] * (KP - 2),
                                    axis=0,
                                ),
                            ],
                            axis=1,
                        )
                        for a, c in zip(p4, points)
                    )
                    d4 = xp.concatenate(
                        [
                            d4,
                            xp.stack(
                                [
                                    bits[:, gr : gr + nk],
                                    bits[:, gr + nk : gr + 2 * nk],
                                ]
                                + [zero_d] * (KP - 2),
                                axis=0,
                            ),
                        ],
                        axis=2,
                    )
                acc = lanes_fn(p4, d4)  # (S1+S2+nk slots, 18) x4
                s1, s2 = ns // KP, nr // KP
                sums = tile_sums_pallas(tuple(c[: s1 + s2] for c in acc))
                sigma = _tree_reduce_group(curve, sums, 0, s1 // TILE)
                rng = _tree_reduce_group(curve, sums, s1 // TILE, s2 // TILE)
                out_sigma = xp.stack(sigma, axis=0)
                out_rng = xp.stack(rng, axis=0)
                if nk:
                    r = tuple(c[s1 + s2 :] for c in acc)
                    r_acc = xp.stack(r, axis=1)  # (nk, 4, 18)
                else:
                    r_acc = xp.zeros((0, 4, NLIMBS), dtype=xp.uint32)
                return out_sigma, out_rng, r_acc
            acc = lanes_fn(points, bits)  # [sigma | range | sig_s | sig_e]
            if use_pallas:
                from .pallas_msm import TILE, tile_sums_pallas

                sums = tile_sums_pallas(tuple(c[: ns + nr] for c in acc))
                sigma = _tree_reduce_group(curve, sums, 0, ns // TILE)
                rng = _tree_reduce_group(curve, sums, ns // TILE, nr // TILE)
            else:
                sigma = _tree_reduce_group(curve, acc, 0, ns)
                rng = _tree_reduce_group(curve, acc, ns, nr)
            out_sigma = xp.stack(sigma, axis=0)  # (4, 18)
            out_rng = xp.stack(rng, axis=0)
            if nk:
                s_lanes = tuple(c[ns + nr : ns + nr + nk] for c in acc)
                e_lanes = tuple(c[ns + nr + nk : ns + nr + 2 * nk] for c in acc)
                r = curve.add(s_lanes, e_lanes)
                r_acc = xp.stack(r, axis=1)  # (nk, 4, 18); compressed at combine
            else:
                r_acc = xp.zeros((0, 4, NLIMBS), dtype=xp.uint32)
            return out_sigma, out_rng, r_acc

        if self.backend == "jax":
            import jax

            shardings = self._phase_shardings(4)
            out_sh = None
            if shardings is not None:
                # Chunk partials are tiny (4,18)/(nk,4,18) arrays consumed
                # replicated by _final_fn's in_shardings; without an explicit
                # out_shardings GSPMD picks a partial tiling on big meshes and
                # the final jit rejects the mismatch.
                repl = shardings[0]
                out_sh = (repl, repl, repl)
            fn = self._export_cached(
                key, jax.jit(_run_chunk, in_shardings=shardings,
                             out_shardings=out_sh)
            )
        else:
            fn = _run_chunk
        cache[key] = fn
        return fn

    def chunk_lanes_begin(self, sigma, range_, sig_entries, floors=None):
        """Dispatch one chunk's dynamic lanes WITHOUT waiting.  Returns an
        opaque handle for ``fused_chunks_finish``.

        sigma/range_: (scalars, points) with points as 32-byte encodings /
        host points (no generator markers — shared lanes go in the final
        combine); sig_entries: this chunk's (signature, pubkey, compressed,
        message) tuples.  ``floors``: (ns, nr, nk, e_pad) minimum lane/extra
        counts — callers pass the first chunk's shape so a smaller last
        chunk reuses the SAME compiled kernel instead of tracing a new
        shape."""
        from .. import scalars as sc
        from ..elgamal import H as _H
        from ..metrics import span

        sigma_sc, sigma_pts = sigma
        range_sc, range_pts = range_
        if self.use_pallas:
            g1, g2 = self._pallas_lane_granules()
        else:
            # small granule keeps eager-numpy/CPU work proportional for tiny
            # blocks; still divides any mesh size up to 64
            g1, g2 = 64, 64
        f_ns, f_nr, f_nk, f_ep = floors or (0, 0, 0, 0)
        ns = self._round_up(max(len(sigma_sc), f_ns), g1)
        nr = self._round_up(max(len(range_sc), f_nr), g1)
        nk = (
            self._round_up(max(len(sig_entries), f_nk), g2)
            if (sig_entries or f_nk)
            else 0
        )

        sig_s = [e[0].s for e in sig_entries]
        sig_e = [(-e[0].e) % sc.L for e in sig_entries]
        sig_pts = [
            e[1] if isinstance(e[1], (bytes, bytearray)) or not hasattr(e[1], "point")
            else e[1].point
            for e in sig_entries
        ]

        with span("fused_check.prep_chunk"):
            all_scalars = _np.concatenate(
                [
                    self._pad_scalar_bytes(sigma_sc, ns),
                    self._pad_scalar_bytes(range_sc, nr),
                    self._pad_scalar_bytes(sig_s, nk),
                    self._pad_scalar_bytes(sig_e, nk),
                ]
            )
            blk = self._block_state()
            block_rows = blk.rows
            m_block = int(block_rows.shape[0]) if block_rows is not None else 0
            extras: list[RistrettoPoint] = [IDENTITY]
            extra_ids: dict = {}
            idx_arr = _np.concatenate(
                [
                    self._resolve_lane_points(
                        group_pts, group_total, m_block, 0, extras, extra_ids
                    )
                    for group_pts, group_total in (
                        (list(sigma_pts), ns),
                        (list(range_pts), nr),
                        ([_H] * len(sig_entries), nk),
                        (list(sig_pts), nk),
                    )
                ]
            )
            # coarse pow2 bucket + first-chunk floor: per-chunk wobble in
            # the extras count must not mint a fresh (30s+) kernel compile
            e_pad = max(512, _next_pow2(max(len(extras), f_ep)))
            extra_rows = _np.zeros((e_pad, 4, NLIMBS), dtype=_np.uint32)
            extra_rows[: len(extras)] = self._points_to_rows(extras)
            payload = all_scalars
            if block_rows is None:
                block_rows = _np.zeros((0, 4, NLIMBS), dtype=_np.uint32)
            if self.backend == "jax":
                import jax.numpy as jnp

                payload = jnp.asarray(payload)
                idx_arr = jnp.asarray(idx_arr)
                extra_rows = jnp.asarray(extra_rows)
                block_rows = jnp.asarray(block_rows)
            fn = self._chunk_fn(ns, nr, nk, m_block, e_pad)
            sigma_acc, rng_acc, r_acc = fn(block_rows, extra_rows, idx_arr, payload)
        return {
            "sigma": sigma_acc,
            "range": rng_acc,
            "r_acc": r_acc,
            "ns": ns,
            "nr": nr,
            "nk": nk,
            "e_pad": e_pad,
            "n_sigs": len(sig_entries),
        }

    def chunk_lanes_begin_rows(
        self, sigma, range_, sigs, extras_rows: _np.ndarray, floors=None
    ):
        """chunk_lanes_begin for the NATIVE pre-verify path: lane inputs
        arrive as ready (scalars, device-row-index) ndarray pairs (emitted
        by the C++ engine in final lane order) and extras as pre-packed
        limb rows — no per-lane Python resolution at all.

        sigma/range_: ((n, 32) uint8 scalars, (n,) int32 absolute rows);
        sigs: (s, e_neg, pk_rows, n_sigs) with s/e_neg (n_sigs, 32) and
        pk_rows int32; extras_rows: (n_e, 4, NLIMBS) uint32 where row 0 is
        the identity (lane padding) and row 1 is the Schnorr base H."""
        from ..metrics import span

        sigma_sc, sigma_rows = sigma
        range_sc, range_rows = range_
        sig_s, sig_e, sig_rows, n_sigs = sigs
        if self.use_pallas:
            g1, g2 = self._pallas_lane_granules()
        else:
            g1, g2 = 64, 64
        f_ns, f_nr, f_nk, f_ep = floors or (0, 0, 0, 0)
        ns = self._round_up(max(sigma_sc.shape[0], f_ns), g1)
        nr = self._round_up(max(range_sc.shape[0], f_nr), g1)
        nk = self._round_up(max(n_sigs, f_nk), g2) if (n_sigs or f_nk) else 0

        with span("fused_check.prep_chunk"):
            m_block = self.block_row_base()
            extra_base = m_block  # extras_rows[0] is the identity

            def _pad_rows(rows, total):
                out = _np.full(total, extra_base, dtype=_np.int32)
                out[: rows.shape[0]] = rows
                return out

            all_scalars = _np.concatenate(
                [
                    self._pad_scalar_bytes(sigma_sc, ns),
                    self._pad_scalar_bytes(range_sc, nr),
                    self._pad_scalar_bytes(sig_s, nk),
                    self._pad_scalar_bytes(sig_e, nk),
                ]
            )
            h_rows = _np.full(nk, extra_base, dtype=_np.int32)
            h_rows[:n_sigs] = extra_base + 1  # extras_rows[1] = H
            idx_arr = _np.concatenate(
                [
                    _pad_rows(sigma_rows, ns),
                    _pad_rows(range_rows, nr),
                    h_rows,
                    _pad_rows(sig_rows, nk),
                ]
            )
            if isinstance(extras_rows, _np.ndarray):
                e_floor = int(os.environ.get("XELIS_EPAD_MIN", "512"))
                e_pad = max(e_floor, _next_pow2(max(extras_rows.shape[0], f_ep)))
                extra_pack = _np.zeros((e_pad, 4, NLIMBS), dtype=_np.uint32)
                extra_pack[: extras_rows.shape[0]] = extras_rows
            else:
                # already a (pow2-padded) device array shared by every
                # chunk of the block — uploaded once, no per-chunk pack
                extra_pack = extras_rows
                e_pad = int(extras_rows.shape[0])
            blk = self._block_state()
            block_rows = blk.rows
            if block_rows is None:
                block_rows = _np.zeros((0, 4, NLIMBS), dtype=_np.uint32)
            payload = all_scalars
            if self.backend == "jax":
                import jax.numpy as jnp

                payload = jnp.asarray(payload)
                idx_arr = jnp.asarray(idx_arr)
                extra_pack = jnp.asarray(extra_pack)
                block_rows = jnp.asarray(block_rows)
            fn = self._chunk_fn(ns, nr, nk, m_block, e_pad)
            sigma_acc, rng_acc, r_acc = fn(block_rows, extra_pack, idx_arr, payload)
        return {
            "sigma": sigma_acc,
            "range": rng_acc,
            "r_acc": r_acc,
            "ns": ns,
            "nr": nr,
            "nk": nk,
            "e_pad": e_pad,
            "n_sigs": n_sigs,
        }

    def _final_fn(self, n_chunks: int, nk_tuple: tuple, ns_s: int, nr_s: int,
                  m_block: int, k_gens: int, e_pad: int):
        from .pallas_msm import use_fe13 as _fe13

        key = ("final", n_chunks, nk_tuple, ns_s, nr_s, m_block, k_gens,
               e_pad, self.use_quad, _fe13())
        cache = getattr(self, "_fused_cache", None)
        if cache is None:
            cache = self._fused_cache = {}
        fn = cache.get(key)
        if fn is not None:
            return fn

        curve = self.curve
        use_quad = self.use_quad
        lanes_fn = self._lanes_fn_k4() if use_quad else self._lanes_fn()
        use_pallas = self.use_pallas

        def _run_final(sigma_parts, range_parts, r_accs,
                       block_rows, gens_rows, extra_rows, idx, scal, valid):
            from .msm import _tree_reduce

            xp = curve.xp
            if use_pallas:
                from .pallas_msm import recode_signed4_xp

                bits = recode_signed4_xp(scal, xp)
            else:
                from .msm import decompose_bits_xp

                bits = decompose_bits_xp(scal, xp)
            all_valid = (
                valid.astype(xp.uint8).min()
                if valid.shape[0]
                else xp.ones((), dtype=xp.uint8)
            )
            rows = _gather_rows(xp, (block_rows, gens_rows, extra_rows), idx)
            points = tuple(rows[:, c, :] for c in range(4))
            if use_quad:
                from .pallas_msm import TILE, tile_sums_pallas

                from .pallas_msm import K_PACK as KP

                gr = ns_s + nr_s
                p4 = tuple(
                    xp.stack([c[k:gr:KP] for k in range(KP)], axis=0)
                    for c in points
                )
                d4 = xp.stack([bits[:, k:gr:KP] for k in range(KP)], axis=0)
                acc = lanes_fn(p4, d4)
                s1, s2 = ns_s // KP, nr_s // KP
                sums = tile_sums_pallas(acc)
                sigma_sh = _tree_reduce_group(curve, sums, 0, s1 // TILE)
                rng_sh = _tree_reduce_group(curve, sums, s1 // TILE, s2 // TILE)
            elif use_pallas:
                from .pallas_msm import TILE, tile_sums_pallas

                acc = lanes_fn(points, bits)  # shared [sigma_s | range_s]
                sums = tile_sums_pallas(acc)
                sigma_sh = _tree_reduce_group(curve, sums, 0, ns_s // TILE)
                rng_sh = _tree_reduce_group(curve, sums, ns_s // TILE, nr_s // TILE)
            else:
                acc = lanes_fn(points, bits)
                sigma_sh = _tree_reduce_group(curve, acc, 0, ns_s)
                rng_sh = _tree_reduce_group(curve, acc, ns_s, nr_s)
            # fold in the per-chunk partials: C+1 lanes per group
            sig_stack = xp.concatenate(
                [xp.stack(list(p), axis=0)[None] for p in [sigma_sh]]
                + [p[None] for p in sigma_parts],
                axis=0,
            )  # (C+1, 4, 18)
            rng_stack = xp.concatenate(
                [xp.stack(list(p), axis=0)[None] for p in [rng_sh]]
                + [p[None] for p in range_parts],
                axis=0,
            )
            sigma_tuple = tuple(sig_stack[:, c, :] for c in range(4))
            rng_tuple = tuple(rng_stack[:, c, :] for c in range(4))
            sigma = _tree_reduce(curve, sigma_tuple, sig_stack.shape[0], True)
            rng = _tree_reduce(curve, rng_tuple, rng_stack.shape[0], True)
            sigma_ok = curve.is_identity(tuple(c[None] for c in sigma))[0]
            range_ok = curve.is_identity(tuple(c[None] for c in rng))[0]
            if r_accs:
                r_all = xp.concatenate(list(r_accs), axis=0)  # (sum nk, 4, 18)
                r_tuple = tuple(r_all[:, c, :] for c in range(4))
                if use_pallas:
                    from .pallas_msm import compress_pallas

                    r_bytes = compress_pallas(r_tuple)
                else:
                    r_bytes = curve.compress(r_tuple)
            else:
                r_bytes = xp.zeros((0, 32), dtype=xp.uint8)
            flags = xp.concatenate(
                [
                    xp.reshape(sigma_ok, (1,)).astype(xp.uint8),
                    xp.reshape(range_ok, (1,)).astype(xp.uint8),
                    xp.reshape(all_valid, (1,)).astype(xp.uint8),
                    xp.zeros((29,), dtype=xp.uint8),
                ]
            )[None, :]
            return xp.concatenate([flags, r_bytes], axis=0)

        if self.backend == "jax":
            import jax

            shardings = self._final_shardings(n_chunks, len(nk_tuple))
            fn = self._export_cached(key, jax.jit(_run_final, in_shardings=shardings))
        else:
            fn = _run_final
        cache[key] = fn
        return fn

    def _final_shardings(self, n_chunks: int, n_racc: int):
        """Partials/r-accs replicated (tiny), shared idx + payload
        lane-sharded like the phase jits."""
        if self.mesh is None or self.backend != "jax":
            return None
        from jax.sharding import NamedSharding, PartitionSpec as P

        axis = self.mesh.axis_names[0]
        repl = NamedSharding(self.mesh, P())
        lane = NamedSharding(self.mesh, P(axis))
        pay = NamedSharding(self.mesh, P(axis, None))
        return (
            tuple(repl for _ in range(n_chunks)),
            tuple(repl for _ in range(n_chunks)),
            tuple(repl for _ in range(n_racc)),
            repl, repl, repl, lane, pay, repl,
        )

    def fused_chunks_finish(self, chunk_states, shared_sigma, shared_range,
                            sig_entries, sig_hash_fn=None, pre_pull_fn=None):
        """Dispatch the shared lanes, combine with every chunk's partials on
        device, and pull the packed result — the block's single host sync.

        ``sig_hash_fn``: native-path replacement for the per-entry Python
        SHA3 loop — called once with the concatenated REAL R rows
        ((total_sigs, 32) uint8, chunk padding stripped), returns bool.
        ``pre_pull_fn``: host work to overlap with the final combine's
        device execution + tunnel round trip — runs after the async
        dispatch, before the blocking pull (e.g. the bulk state
        write-back, ~10 ms at 1000 txs)."""
        import hashlib

        from .. import scalars as sc
        from ..metrics import span

        sigma_sc, sigma_pts = shared_sigma
        range_sc, range_pts = shared_range
        if self.use_pallas:
            g1, _g2 = self._pallas_lane_granules()
        else:
            g1 = 64
        ns_s = self._round_up(len(sigma_sc), g1)

        with span("fused_check.prep_final"):
            k_gens = 0
            gens_rows = None
            for p in range_pts:
                if isinstance(p, tuple) and p and p[0] == "__bp_gens__":
                    _, nb, m = p
                    gens_rows = self._gens_rows(nb, m)
                    k_gens = int(gens_rows.shape[0])
                    break
            nr_s = self._round_up(len(range_sc), g1)
            scal = _np.concatenate(
                [
                    self._pad_scalar_bytes(sigma_sc, ns_s),
                    self._pad_scalar_bytes(range_sc, nr_s),
                ]
            )
            blk = self._block_state()
            block_rows = blk.rows
            valid = blk.valid
            m_block = int(block_rows.shape[0]) if block_rows is not None else 0
            extras: list[RistrettoPoint] = [IDENTITY]
            extra_ids: dict = {}
            idx_arr = _np.concatenate(
                [
                    self._resolve_lane_points(
                        list(sigma_pts), ns_s, m_block, k_gens, extras, extra_ids
                    ),
                    self._resolve_lane_points(
                        list(range_pts), nr_s, m_block, k_gens, extras, extra_ids
                    ),
                ]
            )
            e_pad = self._round_up(len(extras), 64)
            extra_rows = _np.zeros((e_pad, 4, NLIMBS), dtype=_np.uint32)
            extra_rows[: len(extras)] = self._points_to_rows(extras)
            if block_rows is None:
                block_rows = _np.zeros((0, 4, NLIMBS), dtype=_np.uint32)
            if valid is None:
                valid = _np.ones((block_rows.shape[0],), dtype=_np.uint32)
            if gens_rows is None:
                gens_rows = _np.zeros((0, 4, NLIMBS), dtype=_np.uint32)
            if self.backend == "jax":
                import jax.numpy as jnp

                scal = jnp.asarray(scal)
                idx_arr = jnp.asarray(idx_arr)
                extra_rows = jnp.asarray(extra_rows)
                block_rows = jnp.asarray(block_rows)
                gens_rows = jnp.asarray(gens_rows)
                valid = jnp.asarray(valid)
            # pad the chunk-partial list to a power of two with identity
            # dummies: the final-combine jit key must not mint a fresh
            # compile per block size (n_chunks tracks block_txs/chunk_txs)
            n_real = len(chunk_states)
            n_pad = _next_pow2(n_real)
            if n_pad > n_real:
                ident = self._points_to_rows([IDENTITY])[0]  # (4, NLIMBS)
                dummy = {"sigma": ident, "range": ident, "r_acc": None,
                         "nk": 0, "n_sigs": 0}
                chunk_states = list(chunk_states) + [dummy] * (n_pad - n_real)
            sigma_parts = tuple(s["sigma"] for s in chunk_states)
            range_parts = tuple(s["range"] for s in chunk_states)
            r_accs = tuple(s["r_acc"] for s in chunk_states if s["nk"])
            nk_tuple = tuple(s["nk"] for s in chunk_states if s["nk"])
            fn = self._final_fn(
                len(chunk_states), nk_tuple, ns_s, nr_s, m_block, k_gens, e_pad
            )
            pending = fn(
                sigma_parts, range_parts, r_accs,
                block_rows, gens_rows, extra_rows, idx_arr, scal, valid,
            )
        if pre_pull_fn is not None:
            pre_pull_fn()
        with span("fused_check.pull"):
            out = _np.asarray(pending)  # the single host sync
        all_valid = bool(out[0, 2])
        sigma_ok = bool(out[0, 0]) and all_valid
        range_ok = bool(out[0, 1]) and all_valid
        r_bytes = out[1:]
        sig_ok = all_valid
        if sig_ok and sig_hash_fn is not None:
            real = []
            row = 0
            for st in chunk_states:
                if not st["nk"]:
                    continue
                real.append(r_bytes[row : row + st["n_sigs"]])
                row += st["nk"]
            sig_ok = bool(
                sig_hash_fn(
                    _np.concatenate(real)
                    if real
                    else _np.zeros((0, 32), dtype=_np.uint8)
                )
            )
        elif sig_ok:
            row = 0
            e_i = 0
            for st in chunk_states:
                if not st["nk"]:
                    continue
                for j in range(st["n_sigs"]):
                    sig, _pt, pk_compressed, message = sig_entries[e_i]
                    e_i += 1
                    h = hashlib.sha3_512()
                    h.update(pk_compressed.data)
                    h.update(message)
                    h.update(bytes(r_bytes[row + j]))
                    if sc.from_bytes_mod_order_wide(h.digest()) != sig.e:
                        sig_ok = False
                        break
                if not sig_ok:
                    break
                row += st["nk"]
        return sigma_ok, range_ok, sig_ok

    def _phase_shardings(self, n_args: int):
        """in_shardings for the phase jits: lane-sharded idx + scalar
        payload, replicated point rows.  None (auto) without a mesh."""
        if self.mesh is None or self.backend != "jax":
            return None
        from jax.sharding import NamedSharding, PartitionSpec as P

        axis = self.mesh.axis_names[0]
        repl = NamedSharding(self.mesh, P())
        lane = NamedSharding(self.mesh, P(axis))
        pay = NamedSharding(self.mesh, P(axis, None))
        if n_args == 4:  # _run_a(block_rows, extra_rows, idx, payload)
            return (repl, repl, lane, pay)
        # _run_b(acc_a, block_rows, gens_rows, extra_rows, idx, payload, valid)
        return (repl, repl, repl, repl, lane, pay, repl)

    def fused_block_begin(self, sigma, sig_entries):
        """Dispatch the sigma + signature lanes WITHOUT waiting; the device
        computes them while the caller folds the range proofs on host.
        Returns an opaque phase-A handle for ``fused_block_finish``."""
        from .. import scalars as sc
        from ..elgamal import H as _H
        from ..metrics import span

        sigma_sc, sigma_pts = sigma
        if self.use_pallas:
            g1, g2 = self._pallas_lane_granules()
            ns = self._round_up(len(sigma_sc), g1)
            nk = self._round_up(len(sig_entries), g2) if sig_entries else 0
        else:
            ns = self._round_up(len(sigma_sc))
            nk = self._round_up(len(sig_entries), 64) if sig_entries else 0

        sig_s = [e[0].s for e in sig_entries]
        sig_e = [(-e[0].e) % sc.L for e in sig_entries]
        sig_pts = [
            e[1] if isinstance(e[1], (bytes, bytearray)) or not hasattr(e[1], "point")
            else e[1].point
            for e in sig_entries
        ]

        with span("fused_check.prep_a"):
            all_scalars = _np.concatenate(
                [
                    self._pad_scalar_bytes(sigma_sc, ns),
                    self._pad_scalar_bytes(sig_s, nk),
                    self._pad_scalar_bytes(sig_e, nk),
                ]
            )
            block_rows = self._block_state().rows
            m_block = int(block_rows.shape[0]) if block_rows is not None else 0
            extras: list[RistrettoPoint] = [IDENTITY]
            extra_ids: dict = {}
            idx_arr = _np.concatenate(
                [
                    self._resolve_lane_points(
                        group_pts, group_total, m_block, 0, extras, extra_ids
                    )
                    for group_pts, group_total in (
                        (list(sigma_pts), ns),
                        ([_H] * len(sig_entries), nk),
                        (list(sig_pts), nk),
                    )
                ]
            )
            e_pad = self._round_up(len(extras), 64)
            extra_rows = _np.zeros((e_pad, 4, NLIMBS), dtype=_np.uint32)
            extra_rows[: len(extras)] = self._points_to_rows(extras)
            payload = all_scalars  # raw bytes; digit expansion on device
            if block_rows is None:
                block_rows = _np.zeros((0, 4, NLIMBS), dtype=_np.uint32)
            if self.backend == "jax":
                import jax.numpy as jnp

                payload = jnp.asarray(payload)
                idx_arr = jnp.asarray(idx_arr)
                extra_rows = jnp.asarray(extra_rows)
                block_rows = jnp.asarray(block_rows)
            fn = self._phase_a_fn(ns, nk, m_block, e_pad)
            acc_a = fn(block_rows, extra_rows, idx_arr, payload)  # no sync
        return {"acc_a": acc_a, "ns": ns, "nk": nk, "m_block": m_block,
                "e_pad_a": e_pad, "sig_entries": sig_entries}

    @staticmethod
    def _pad_scalar_bytes(vals, n):
        if isinstance(vals, _np.ndarray):
            out = _np.zeros((n, 32), dtype=_np.uint8)
            out[: vals.shape[0]] = vals
            return out
        from .. import scalarops
        from .. import scalars as sc

        out = _np.zeros((n, 32), dtype=_np.uint8)
        if vals:
            arr = scalarops.ints_to_array([v % sc.L for v in vals])
            out[: arr.shape[0]] = arr
        return out

    def fused_block_finish(self, state, range_):
        """Dispatch the range lanes, combine with phase A on device, and pull
        the packed result — the block's single host sync."""
        import hashlib

        from .. import scalars as sc
        from ..metrics import span

        range_sc, range_pts = range_
        sig_entries = state["sig_entries"]
        ns, nk = state["ns"], state["nk"]
        m_block = state["m_block"]
        if self.use_pallas:
            nr = self._round_up(len(range_sc), self._pallas_lane_granules()[0])
        else:
            nr = self._round_up(len(range_sc))

        with span("fused_check.prep_b"):
            scal = self._pad_scalar_bytes(range_sc, nr)
            k_gens = 0
            gens_rows = None
            for p in range_pts:
                if isinstance(p, tuple) and p and p[0] == "__bp_gens__":
                    _, nb, m = p
                    gens_rows = self._gens_rows(nb, m)
                    k_gens = int(gens_rows.shape[0])
                    break
            extras: list[RistrettoPoint] = [IDENTITY]
            idx_arr = self._resolve_lane_points(
                list(range_pts), nr, m_block, k_gens, extras, {}
            )
            e_pad = self._round_up(len(extras), 64)
            extra_rows = _np.zeros((e_pad, 4, NLIMBS), dtype=_np.uint32)
            extra_rows[: len(extras)] = self._points_to_rows(extras)
            payload = scal  # raw bytes; digit expansion on device
            blk = self._block_state()
            block_rows = blk.rows
            valid = blk.valid
            if block_rows is None:
                block_rows = _np.zeros((0, 4, NLIMBS), dtype=_np.uint32)
            if valid is None:
                valid = _np.ones((block_rows.shape[0],), dtype=_np.uint32)
            if gens_rows is None:
                gens_rows = _np.zeros((0, 4, NLIMBS), dtype=_np.uint32)
            if self.backend == "jax":
                import jax.numpy as jnp

                payload = jnp.asarray(payload)
                idx_arr = jnp.asarray(idx_arr)
                extra_rows = jnp.asarray(extra_rows)
                block_rows = jnp.asarray(block_rows)
                gens_rows = jnp.asarray(gens_rows)
                valid = jnp.asarray(valid)
            fn = self._phase_b_fn(ns, nr, nk, m_block, k_gens, e_pad)
            pending = fn(
                state["acc_a"], block_rows, gens_rows, extra_rows, idx_arr, payload, valid
            )
        with span("fused_check.pull"):
            out = _np.asarray(pending)  # the single host sync
        all_valid = bool(out[0, 2])
        sigma_ok = bool(out[0, 0]) and all_valid
        range_ok = bool(out[0, 1]) and all_valid
        r_bytes = out[1:]
        sig_ok = all_valid
        if sig_ok:
            for i, (sig, _pt, pk_compressed, message) in enumerate(sig_entries):
                h = hashlib.sha3_512()
                h.update(pk_compressed.data)
                h.update(message)
                h.update(bytes(r_bytes[i]))
                if sc.from_bytes_mod_order_wide(h.digest()) != sig.e:
                    sig_ok = False
                    break
        return sigma_ok, range_ok, sig_ok

    def _fused_check_fn(self, ns: int, nr: int, nk: int, m_block: int, k_gens: int, e_pad: int):
        """Build (and cache) the single-dispatch block-check kernel.

        Points arrive as a gather: all_rows = [block | gens | extras] is
        concatenated on device and indexed by a lane->row map, then one
        windowed MSM kernel runs over ALL lanes [sigma | range | sig_s |
        sig_e], followed by per-group reduction:

        - sigma group  -> in-VMEM tile reduce -> is_identity
        - range group  -> in-VMEM tile reduce -> is_identity
        - signatures   -> r_k = acc[s_k] + acc[e_k] -> batched compress

        Everything lands in ONE packed uint8 output so the caller costs a
        single host sync."""
        key = (ns, nr, nk, m_block, k_gens, e_pad)
        cache = getattr(self, "_fused_cache", None)
        if cache is None:
            cache = self._fused_cache = {}
        fn = cache.get(key)
        if fn is not None:
            return fn

        curve = self.curve
        lanes_fn = self._lanes_fn()
        use_pallas = self.use_pallas

        def _check(block_rows, gens_rows, extra_rows, idx, scal, valid):
            xp = curve.xp
            if use_pallas:
                from .pallas_msm import recode_signed4_xp

                bits = recode_signed4_xp(scal, xp)
            else:
                from .msm import decompose_bits_xp

                bits = decompose_bits_xp(scal, xp)
            # every block encoding must decompress validly (reference
            # parity: the verifier decompresses each one); padding rows are
            # the valid identity encoding
            all_valid = (
                valid.astype(xp.uint8).min()
                if valid.shape[0]
                else xp.ones((), dtype=xp.uint8)
            )
            rows = _gather_rows(xp, (block_rows, gens_rows, extra_rows), idx)  # (N, 4, NLIMBS) one gather
            points = tuple(rows[:, c, :] for c in range(4))
            acc = lanes_fn(points, bits)  # per-lane accumulators
            if use_pallas:
                # sigma/range group sums: in-VMEM tile reduction, then a tiny
                # cross-tile fold (n_tiles lanes)
                from .pallas_msm import TILE, tile_sums_pallas

                sums = tile_sums_pallas(tuple(c[: ns + nr] for c in acc))
                sigma = _tree_reduce_group(curve, sums, 0, ns // TILE)
                rng = _tree_reduce_group(curve, sums, ns // TILE, nr // TILE)
            else:
                sigma = _tree_reduce_group(curve, acc, 0, ns)
                rng = _tree_reduce_group(curve, acc, ns, nr)
            sigma_ok = curve.is_identity(tuple(c[None] for c in sigma))[0]
            range_ok = curve.is_identity(tuple(c[None] for c in rng))[0]
            if nk:
                s_lanes = tuple(c[ns + nr : ns + nr + nk] for c in acc)
                e_lanes = tuple(c[ns + nr + nk : ns + nr + 2 * nk] for c in acc)
                r = curve.add(s_lanes, e_lanes)
                if use_pallas:
                    from .pallas_msm import compress_pallas

                    r_bytes = compress_pallas(r)
                else:
                    r_bytes = curve.compress(r)
            else:
                r_bytes = xp.zeros((0, 32), dtype=xp.uint8)
            # pack everything into ONE array so the caller needs a single
            # device->host pull (each sync over a tunneled TPU costs ~20ms)
            flags = xp.concatenate(
                [
                    xp.reshape(sigma_ok, (1,)).astype(xp.uint8),
                    xp.reshape(range_ok, (1,)).astype(xp.uint8),
                    xp.reshape(all_valid, (1,)).astype(xp.uint8),
                    xp.zeros((29,), dtype=xp.uint8),
                ]
            )[None, :]
            return xp.concatenate([flags, r_bytes], axis=0)

        if self.backend == "jax":
            import jax

            fn = jax.jit(_check)
        else:
            fn = _check
        cache[key] = fn
        return fn

    def fused_block_check(self, sigma, range_, sig_entries):
        """sigma/range_: (scalars, points) pairs where points may be
        32-byte encodings (block-decompressed), host RistrettoPoints, or a
        ("__bp_gens__", n, m) generator marker; sig_entries: list of
        (signature, pubkey_point_or_bytes, pubkey_compressed, message).

        Returns (sigma_ok, range_ok, sig_ok) with ONE device dispatch and
        ONE host sync."""
        import hashlib

        from .. import scalars as sc
        from ..elgamal import H as _H
        from ..metrics import span

        sigma_sc, sigma_pts = sigma
        range_sc, range_pts = range_

        if self.use_pallas:
            # every lane group must divide into TILE-lane kernel programs
            # on each mesh shard
            g1, g2 = self._pallas_lane_granules()
            ns = self._round_up(len(sigma_sc), g1)
            nr = self._round_up(len(range_sc), g1)
            nk = self._round_up(len(sig_entries), g2) if sig_entries else 0
        else:
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
        sig_pts = [
            e[1] if isinstance(e[1], (bytes, bytearray)) or not hasattr(e[1], "point")
            else e[1].point
            for e in sig_entries
        ]

        with span("fused_check.scalars"):
            all_scalars = _np.concatenate(
                [
                    pad_ints(sigma_sc, ns),
                    pad_ints(range_sc, nr),
                    pad_ints(sig_s, nk),
                    pad_ints(sig_e, nk),
                ]
            )

        # gens marker bookkeeping: K rows live between block rows and extras
        k_gens = 0
        gens_rows = None
        for p in range_pts:
            if isinstance(p, tuple) and p and p[0] == "__bp_gens__":
                _, nb, m = p
                gens_rows = self._gens_rows(nb, m)
                k_gens = int(gens_rows.shape[0])
                break

        blk = self._block_state()
        block_rows = blk.rows
        m_block = int(block_rows.shape[0]) if block_rows is not None else 0

        # resolve each group separately so identity-padding lands per group
        with span("fused_check.resolve"):
            extras_all: list[RistrettoPoint] = [IDENTITY]
            extra_ids: dict = {}
            idx_arr = _np.concatenate(
                [
                    self._resolve_lane_points(
                        group_pts, group_total, m_block, k_gens, extras_all, extra_ids
                    )
                    for group_pts, group_total in (
                        (list(sigma_pts), ns),
                        (list(range_pts), nr),
                        ([_H] * len(sig_entries), nk),
                        (list(sig_pts), nk),
                    )
                ]
            )

            e_pad = self._round_up(len(extras_all), 64)
            extra_rows = _np.zeros((e_pad, 4, NLIMBS), dtype=_np.uint32)
            extra_rows[: len(extras_all)] = self._points_to_rows(extras_all)

        bits = all_scalars  # raw bytes; digit expansion on device
        valid = blk.valid
        if block_rows is None:
            block_rows = _np.zeros((0, 4, NLIMBS), dtype=_np.uint32)
        if valid is None:
            valid = _np.ones((block_rows.shape[0],), dtype=_np.uint32)
        if gens_rows is None:
            gens_rows = _np.zeros((0, 4, NLIMBS), dtype=_np.uint32)
        if self.backend == "jax":
            import jax.numpy as jnp

            bits = jnp.asarray(bits)
            idx_arr = jnp.asarray(idx_arr)
            extra_rows = jnp.asarray(extra_rows)
            block_rows = jnp.asarray(block_rows)
            gens_rows = jnp.asarray(gens_rows)
            valid = jnp.asarray(valid)

        fn = self._fused_check_fn(ns, nr, nk, m_block, k_gens, e_pad)
        with span("fused_check.dispatch"):
            pending = fn(block_rows, gens_rows, extra_rows, idx_arr, bits, valid)
        with span("fused_check.pull"):
            out = _np.asarray(pending)  # host sync happens here, once
        all_valid = bool(out[0, 2])
        sigma_ok = bool(out[0, 0]) and all_valid
        range_ok = bool(out[0, 1]) and all_valid
        r_bytes = out[1:]
        sig_ok = all_valid
        if sig_ok:
            for i, (sig, _pt, pk_compressed, message) in enumerate(sig_entries):
                h = hashlib.sha3_512()
                h.update(pk_compressed.data)
                h.update(message)
                h.update(bytes(r_bytes[i]))
                if sc.from_bytes_mod_order_wide(h.digest()) != sig.e:
                    sig_ok = False
                    break
        return sigma_ok, range_ok, sig_ok

    # -- batched point utilities (device) ------------------------------------

    def decompress_many(self, encodings: list[bytes]):
        """Batched validating decompression.  Returns (points, valid_flags).
        Shapes are padded to powers of two to bound the jit cache."""
        if not encodings:
            return [], []
        n = len(encodings)
        padded = self._lane_granule(n)
        data = _np.zeros((padded, 32), dtype=_np.uint8)
        data[:n] = _np.frombuffer(b"".join(encodings), dtype=_np.uint8).reshape(n, 32)
        if self.backend == "jax":
            import jax.numpy as jnp

            data = jnp.asarray(data)
        out = _np.asarray(self._decompress_packed_jit(data))  # one pull
        packed = out[:n, : 4 * NLIMBS].reshape(n, 4, NLIMBS)
        from .fe import Field

        coords = Field.to_ints(packed)  # n*4 ints, row-major X,Y,Z,T
        points = [
            RistrettoPoint(*coords[4 * i: 4 * i + 4]) for i in range(n)
        ]
        return points, [bool(v) for v in out[:n, 4 * NLIMBS]]

    def decompress_many_lazy(self, encodings: list[bytes]):
        """Batched validating decompression WITHOUT host point
        materialization: returns ((n, 4, NLIMBS) canonical limb rows,
        valid flags).  Callers seed the lazy decompress cache; point
        objects are built on first host access only."""
        if not encodings:
            return _np.zeros((0, 4, NLIMBS), dtype=_np.uint32), []
        n = len(encodings)
        padded = self._lane_granule(n)
        data = _np.zeros((padded, 32), dtype=_np.uint8)
        data[:n] = _np.frombuffer(b"".join(encodings), dtype=_np.uint8).reshape(n, 32)
        if self.backend == "jax":
            import jax.numpy as jnp

            data = jnp.asarray(data)
        out = _np.asarray(self._decompress_packed_jit(data))  # one pull
        packed = out[:n, : 4 * NLIMBS].reshape(n, 4, NLIMBS)
        return packed, [bool(v) for v in out[:n, 4 * NLIMBS]]

    def compress_many(self, points: list[RistrettoPoint]) -> list[bytes]:
        if not points:
            return []
        n = len(points)
        padded = self._lane_granule(n)
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
