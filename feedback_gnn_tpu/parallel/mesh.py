"""Mesh helpers for the framework's two parallel axes.

* ``data``  — Monte-Carlo batch sharding (pure DP over ICI; embarrassingly
  parallel, the throughput axis);
* ``edge``  — Tanner-graph CN/edge partitioning (model-parallel analog; per-VN
  reductions psum over this axis; see parallel/shard.py).

SURVEY.md §2.3: the reference has no multi-device support at all — these are
greenfield TPU-native components.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "P", "NamedSharding"]


def make_mesh(data: int | None = None, edge: int = 1, devices=None) -> Mesh:
    """Create a ('data', 'edge') mesh.  With ``data=None``, use all available
    devices divided by ``edge``."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if data is None:
        assert devices.size % edge == 0, (devices.size, edge)
        data = devices.size // edge
    assert data * edge <= devices.size, (data, edge, devices.size)
    grid = devices[: data * edge].reshape(data, edge)
    return Mesh(grid, ("data", "edge"))
