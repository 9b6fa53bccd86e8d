"""Aligned slot-major graph primitives.

Message state is ``[d, node_pad, B]`` (degree slots leading, nodes 8-aligned
in sublanes, batch in lanes; see codes/graph.py).  Per-node reductions are
leading-axis sums (no reshapes, no relayouts); the VN<->CN permutation is one
flat row gather per direction (the ``[d, node_pad, B] -> [d*node_pad, B]``
merge is a bitcast thanks to the alignment).

Every cross-edge reduction takes an optional ``axis_name``: under shard_map
with CN-partitioned edges each shard holds partial VN sums and one ``psum``
completes them (SURVEY.md §2.3 Mode B).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["vn_sum", "gather_to_cn", "scatter_from_cn", "expand_vn", "pvary"]


def pvary(x, axis_name):
    """Mark a replicated value as varying over ``axis_name`` (for shard_map
    check_vma).  No-op outside shard_map."""
    if axis_name is None:
        return x
    if hasattr(jax.lax, "pvary"):
        return jax.lax.pvary(x, (axis_name,))
    return jax.lax.pcast(x, (axis_name,), to="varying")  # pragma: no cover


def vn_sum(msg, graph, axis_name=None):
    """Per-VN sum of edge messages: [dv, n_pad, B] -> [n_pad, B].

    Pad slots hold exact zeros (graph invariants I1-I3), so no mask is
    needed."""
    s = msg.sum(axis=0)
    if axis_name is not None:
        s = jax.lax.psum(s, axis_name)
    return s


def expand_vn(vals, graph):
    """Broadcast per-VN values to every slot: [n_pad, B] -> [dv, n_pad, B]."""
    return jnp.broadcast_to(vals[None], (graph.max_vn_deg,) + vals.shape)


def gather_to_cn(msg, graph):
    """Arrange VN-slot messages into CN perspective:
    [dv, n_pad, B] -> [dc, c_pad, B] via one flat row gather."""
    flat = msg.reshape(graph.max_vn_deg * graph.n_pad, -1)
    out = flat[graph.cn_gather]
    return out.reshape(graph.max_cn_deg, graph.c_pad, -1)


def scatter_from_cn(msg_cn, graph):
    """Back to VN-slot layout: [dc, c_pad, B] -> [dv, n_pad, B] via the
    inverse flat gather (no scatter needed)."""
    flat = msg_cn.reshape(graph.max_cn_deg * graph.c_pad, -1)
    out = flat[graph.vn_gather]
    return out.reshape(graph.max_vn_deg, graph.n_pad, -1)
