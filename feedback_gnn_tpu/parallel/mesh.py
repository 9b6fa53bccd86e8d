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

__all__ = ["make_mesh", "init_distributed", "P", "NamedSharding"]


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> int:
    """Initialise JAX's multi-host (DCN) runtime and return process_index.

    On TPU pods the three arguments are auto-detected from the metadata
    server, so a bare ``init_distributed()`` works; on other clusters pass
    them explicitly (or via the standard JAX env vars).  Idempotent: safe to
    call when the backend is already initialised or single-process.

    After this, ``jax.devices()`` spans every host; build the mesh with
    ``make_mesh`` as usual — the 'data' axis rides ICI within a slice and
    DCN across slices, which is the right layout for the embarrassingly
    parallel Monte-Carlo batch axis (only two scalar counts cross DCN per
    batch, psum-ed in ``sandwich_eval_step``).
    """
    kw = {}
    if coordinator_address is not None:
        kw["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kw["num_processes"] = num_processes
    if process_id is not None:
        kw["process_id"] = process_id
    try:
        jax.distributed.initialize(**kw)
    except (RuntimeError, ValueError):  # already initialised / single host
        pass
    return jax.process_index()


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
