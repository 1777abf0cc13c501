"""Multi-chip MSM sharding over a jax.sharding.Mesh.

Scaling design (SURVEY.md §2.4/§7): the verification workload is one giant
MSM; the points/scalars axis is sharded across chips ("tensor parallelism"
for this domain), each chip computes a partial MSM over its shard, and the
D partial sums are combined with an all_gather over ICI followed by a
log2(D) point-add tree executed redundantly on every chip (partials are a
few KB — bandwidth is negligible, one collective per MSM).

Works on real multi-chip slices and on the CPU host-device emulation used in
tests (XLA_FLAGS=--xla_force_host_platform_device_count=N).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.accel import _enable_jax_compile_cache
from ..ops.curve import Curve, jax_curve
from ..ops.msm import MsmEngine, _tree_reduce, decompose_bits

_enable_jax_compile_cache()

AXIS = "shards"


def make_mesh(n_devices: int | None = None, devices=None, backend: str | None = None) -> Mesh:
    """1-D mesh over ``n_devices``.

    If the default backend doesn't expose enough devices (e.g. a single TPU
    chip during development), falls back to the CPU host-device emulation
    (``--xla_force_host_platform_device_count``), which is how multi-chip
    sharding is validated without hardware.
    """
    if devices is None:
        if backend is not None:
            devices = jax.devices(backend)
        else:
            devices = jax.devices()
            if n_devices is not None and len(devices) < n_devices:
                try:
                    cpu = jax.devices("cpu")
                    if len(cpu) >= n_devices:
                        devices = cpu
                except Exception:  # pragma: no cover
                    pass
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"need {n_devices} devices, have {len(devices)}; set "
                f"XLA_FLAGS=--xla_force_host_platform_device_count={n_devices}"
            )
        devices = devices[:n_devices]
    return Mesh(devices, (AXIS,))


class ShardedMsm:
    """MSM sharded over the points axis of a 1-D device mesh."""

    def __init__(self, mesh: Mesh, curve: Curve | None = None):
        self.mesh = mesh
        self.curve = curve or jax_curve()
        self.engine = MsmEngine(self.curve, use_jax=True)
        self.n_devices = mesh.devices.size

        curve_ = self.curve
        engine = self.engine
        n_dev = self.n_devices

        def _local(points, bits):
            # per-shard partial MSM (points sharded on axis 0 of each coord,
            # bits sharded on axis 1)
            partial = engine.msm_daa(points, bits)
            # combine partials: one all_gather over ICI, then a replicated
            # log2(D) add-tree
            gathered = tuple(lax.all_gather(c, AXIS) for c in partial)
            return _tree_reduce(curve_, gathered, n_dev, use_jax=True)

        shard = jax.shard_map(
            _local,
            mesh=mesh,
            in_specs=(
                (P(AXIS), P(AXIS), P(AXIS), P(AXIS)),  # point coords
                P(None, AXIS),  # bits: (n_bits, N)
            ),
            out_specs=(P(), P(), P(), P()),
            check_vma=False,
        )
        self._sharded = jax.jit(shard)

    def msm_device(self, points, bits):
        """points: tuple of (N, 18) arrays; bits: (n_bits, N); N must be a
        multiple of the mesh size (pad with identity/zero lanes)."""
        return self._sharded(points, bits)

    def msm_points(self, scalars, points):
        """Host API mirroring MsmEngine.msm_points."""
        from ..pyref.ristretto import IDENTITY

        if not scalars:
            return IDENTITY
        n = len(scalars)
        pad = (-n) % self.n_devices
        scalars = list(scalars) + [0] * pad
        points = list(points) + [IDENTITY] * pad
        # stage inputs in host numpy: building them on the DEFAULT backend
        # (possibly a remote TPU) would force a device->device round-trip
        # just to place shards on the mesh
        from ..ops.curve import numpy_curve

        bits = decompose_bits(scalars)
        batch = numpy_curve().from_points(points)
        res = self.msm_device(batch, bits)
        return self.curve.to_points(tuple(c[None] for c in res))[0]


class MultiDeviceMsm:
    """Data-parallel MSM via explicit per-device dispatch (no SPMD
    partitioner): each device runs the SAME single-device MSM program on its
    shard of the points (XLA dispatches the launches concurrently), and the
    D tiny partial sums combine on host.

    This is the practical scaling path when collectives aren't needed (the
    partials are a few hundred bytes); ``ShardedMsm`` is the
    shard_map/collective formulation of the same computation.
    """

    def __init__(self, devices=None, curve: Curve | None = None):
        self.devices = list(devices) if devices is not None else jax.devices()
        self.curve = curve or jax_curve()
        self.engine = MsmEngine(self.curve, use_jax=True)
        self._jit = jax.jit(self.engine.msm_daa)

    def msm_points(self, scalars, points):
        from ..pyref.ristretto import IDENTITY

        n = len(scalars)
        if n == 0:
            return IDENTITY
        d = len(self.devices)
        chunk = -(-n // d)
        pad = chunk * d - n
        scalars = list(scalars) + [0] * pad
        points = list(points) + [IDENTITY] * pad
        # stage in host numpy (NOT the default backend: placing shards from a
        # remote default device would round-trip every shard through it)
        from ..ops.curve import numpy_curve

        bits = decompose_bits(scalars)
        batch = numpy_curve().from_points(points)

        futures = []
        for i, dev in enumerate(self.devices):
            sl = slice(i * chunk, (i + 1) * chunk)
            shard = tuple(jax.device_put(c[sl], dev) for c in batch)
            shard_bits = jax.device_put(bits[:, sl], dev)
            futures.append(self._jit(shard, shard_bits))

        total = IDENTITY
        for res in futures:
            total = total + self.curve.to_points(tuple(c[None] for c in res))[0]
        return total
