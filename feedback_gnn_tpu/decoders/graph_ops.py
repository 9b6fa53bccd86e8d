"""Static gather/reduce primitives over the dense Tanner-graph layout.

These replace the reference's ragged segment ops (decoding_q.py:244-273,
752-767) with fixed-shape gathers XLA lowers to efficient TPU copies.  All
message arrays are batch-last ``[num_edges, B]``; a single zero "padding row"
is appended before padded gathers so masked slots read 0 branch-free.

Every cross-edge reduction (the per-VN sums) takes an optional ``axis_name``:
under ``shard_map`` with CN-partitioned edges, each shard holds partial VN
sums and a single ``psum`` completes them — this is the whole distribution
story for edge-parallel BP (SURVEY.md §2.3 Mode B).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "pad_edge_rows",
    "vn_sum",
    "gather_to_cn",
    "scatter_from_cn",
    "expand_vn",
    "pvary",
]


def pvary(x, axis_name):
    """Mark a replicated value as varying over ``axis_name`` so shard_map's
    varying-manual-axes checker (check_vma=True) accepts scan carries that
    become shard-dependent after the first iteration.  No-op outside
    shard_map (axis_name None)."""
    if axis_name is None:
        return x
    if hasattr(jax.lax, "pvary"):
        return jax.lax.pvary(x, (axis_name,))
    return jax.lax.pcast(x, (axis_name,), to="varying")  # pragma: no cover


def pad_edge_rows(msg):
    """Append one zero row: [E, B] -> [E+1, B] so index E reads 0."""
    return jnp.concatenate([msg, jnp.zeros((1,) + msg.shape[1:], msg.dtype)], axis=0)


def vn_sum(msg, graph, axis_name=None):
    """Sum of edge messages per VN: [E, B] -> [num_vn, B].

    For uniform-degree graphs (the paper's biregular codes) this is a free
    reshape+sum; otherwise a padded gather.  With ``axis_name`` the partial
    sums are completed across the edge-sharded mesh axis.
    """
    if graph.vn_uniform and graph.num_edges == graph.num_vn * graph.max_vn_deg:
        s = msg.reshape(graph.num_vn, graph.max_vn_deg, -1).sum(axis=1)
    else:
        mp = pad_edge_rows(msg)
        s = (mp[graph.vn_edge] * graph.vn_mask[:, :, None]).sum(axis=1)
    if axis_name is not None:
        s = jax.lax.psum(s, axis_name)
    return s


def expand_vn(vals, graph):
    """Broadcast per-VN values to per-edge: [n, B] -> [E, B].

    In VN-major edge order this is a repeat by degree; for uniform graphs a
    broadcast+reshape, else a gather by edge_vn.
    """
    if graph.vn_uniform and graph.num_edges == graph.num_vn * graph.max_vn_deg:
        n, b = vals.shape
        return jnp.broadcast_to(
            vals[:, None, :], (n, graph.max_vn_deg, b)
        ).reshape(graph.num_edges, b)
    return vals[graph.edge_vn]


def gather_to_cn(msg, graph):
    """Arrange edge messages into CN perspective: [E, B] -> [C, D, B]."""
    mp = pad_edge_rows(msg)
    return mp[graph.cn_edge]


def scatter_from_cn(msg_cn, graph):
    """Back to VN-major edge order: [C, D, B] -> [E, B] via one flat gather
    (the inverse permutation is precomputed; no scatter needed)."""
    flat = msg_cn.reshape(graph.num_cn * graph.max_cn_deg, -1)
    return flat[graph.edge_cn_slot]
