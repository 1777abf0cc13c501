"""Multi-device sharding tests on the emulated 8-device CPU mesh
(conftest sets --xla_force_host_platform_device_count=8)."""

import secrets

import jax
import pytest

from xelis_he_tpu.parallel.mesh import ShardedMsm, make_mesh
from xelis_he_tpu.pyref.ristretto import L, mul_base, multiscalar_mul


import os

_RUN_SHARD_MAP = os.environ.get("XELIS_MESH_TESTS") == "1"


@pytest.fixture(scope="module")
def cpu_mesh():
    try:
        devices = jax.devices("cpu")
    except Exception:
        pytest.skip("no cpu backend")
    if len(devices) < 8:
        pytest.skip("need 8 emulated cpu devices")
    return make_mesh(8, devices=devices)


def test_multi_device_msm_matches_reference():
    """Per-device data-parallel MSM across the emulated CPU devices."""
    from xelis_he_tpu.parallel.mesh import MultiDeviceMsm

    try:
        devices = jax.devices("cpu")[:2]
    except Exception:
        pytest.skip("no cpu backend")
    md = MultiDeviceMsm(devices=devices)
    n = 16
    pts = [mul_base(i + 1) for i in range(n)]
    scs = [secrets.randbelow(L) for _ in range(n)]
    assert md.msm_points(scs, pts) == multiscalar_mul(scs, pts)
    # padding path: n not a multiple of the device count (same chunk shape)
    assert md.msm_points(scs[:15], pts[:15]) == multiscalar_mul(scs[:15], pts[:15])


@pytest.mark.skipif(
    not _RUN_SHARD_MAP,
    reason="shard_map SPMD compiles take ~5-10 min on the CPU emulator; "
    "set XELIS_MESH_TESTS=1 (the driver exercises dryrun_multichip separately)",
)
def test_sharded_msm_matches_reference(cpu_mesh):
    sm = ShardedMsm(cpu_mesh)
    n = 32
    pts = [mul_base(i + 1) for i in range(n)]
    scs = [secrets.randbelow(L) for _ in range(n)]
    assert sm.msm_points(scs, pts) == multiscalar_mul(scs, pts)
    # padding path: n not a multiple of the mesh size
    assert sm.msm_points(scs[:13], pts[:13]) == multiscalar_mul(scs[:13], pts[:13])


@pytest.mark.skipif(
    not _RUN_SHARD_MAP,
    reason="covered by the driver's dryrun_multichip; set XELIS_MESH_TESTS=1",
)
def test_graft_dryrun(cpu_mesh):
    import importlib.util
    import pathlib

    spec = importlib.util.spec_from_file_location(
        "graft_entry", pathlib.Path(__file__).parent.parent / "__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(4)
