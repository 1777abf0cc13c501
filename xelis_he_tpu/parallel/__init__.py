"""Parallelism layers (SURVEY.md §2.4): ICI mesh sharding + DCN data
parallelism.

- :mod:`.mesh` — MSM lane sharding over a 1-D device mesh (shard_map +
  all_gather over ICI); the Accelerator's fused phases carry the same
  lane shardings via GSPMD when constructed with ``mesh=``.
- :mod:`.dcn` — multi-host shard-nothing batch verification with a
  boolean all-reduce accept over the jax distributed runtime.
"""

from .mesh import AXIS, MultiDeviceMsm, ShardedMsm, make_mesh  # noqa: F401

__all__ = ["AXIS", "MultiDeviceMsm", "ShardedMsm", "make_mesh"]
