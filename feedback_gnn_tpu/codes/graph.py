"""Device-facing Tanner-graph layout (static, dense, padded).

This replaces the reference's TF ragged-tensor machinery
(/root/reference/sionna/fec/ldpc/decoding_q.py:59-94, 707-711) with fixed
shape gather tables that XLA can tile onto the TPU:

* edges are stored **VN-major** (sorted by (vn, cn)); per-edge message arrays
  have shape ``[num_edges(+1), batch]`` with batch in the lane dimension and
  one trailing **padding row** that always holds 0, so padded gathers are
  branch-free;
* ``vn_edge``  : ``[num_vn, max_vn_deg]``  edge ids per VN (pad -> num_edges)
* ``cn_edge``  : ``[num_cn, max_cn_deg]``  edge ids per CN (pad -> num_edges)
* ``edge_vn``  : ``[num_edges]``           VN id of each edge
* ``edge_cn_slot``: ``[num_edges]`` flat index ``cn * max_cn_deg + slot`` so
  the CN->VN inverse permutation is a single flat gather (no scatter).

For the paper's (3,6)-biregular GHP codes every table is padding-free and the
VN-side gathers degenerate to reshapes.

RowSet is the same idea for boxplus-over-PCM-rows (the per-row check logits of
decoding_q.py:433-471): padded ``[num_rows, max_row_deg]`` VN-id tables.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

__all__ = ["TannerGraph", "RowSet", "build_graph", "build_rowset", "QuantumGraph"]


@dataclass(frozen=True)
class TannerGraph:
    """Static gather tables for one parity-check matrix."""

    num_vn: int
    num_cn: int
    num_edges: int
    max_vn_deg: int
    max_cn_deg: int
    # [num_edges] int32: endpoint ids in VN-major edge order
    edge_vn: np.ndarray
    edge_cn: np.ndarray
    # [num_vn, max_vn_deg] int32 edge ids, padded with num_edges
    vn_edge: np.ndarray
    # [num_vn, max_vn_deg] float32 {0,1}
    vn_mask: np.ndarray
    # [num_vn] float32 true degrees (for mean reductions)
    vn_deg: np.ndarray
    # [num_cn, max_cn_deg] int32 edge ids, padded with num_edges
    cn_edge: np.ndarray
    cn_mask: np.ndarray
    cn_deg: np.ndarray
    # [num_edges] int32 flat index cn*max_cn_deg+slot (inverse of cn_edge)
    edge_cn_slot: np.ndarray
    # True when every VN (resp. CN) has the same degree -> gathers are reshapes
    vn_uniform: bool
    cn_uniform: bool

    def __repr__(self):
        return (
            f"TannerGraph(vn={self.num_vn}, cn={self.num_cn}, edges={self.num_edges}, "
            f"deg=({self.max_vn_deg},{self.max_cn_deg}), "
            f"uniform=({self.vn_uniform},{self.cn_uniform}))"
        )


@dataclass(frozen=True)
class RowSet:
    """Padded per-row VN-id tables for boxplus over the rows of a PCM."""

    num_rows: int
    max_deg: int
    # [num_rows, max_deg] int32 VN ids, padded with num_vn (callers append a
    # zero row to the gathered source)
    vn_idx: np.ndarray
    # [num_rows, max_deg] float32 {0,1}
    mask: np.ndarray
    uniform: bool
    # [num_rows] float32 {0,1}: 0 marks phantom rows introduced by edge
    # sharding (parallel/shard.py); all-ones for unsharded graphs
    row_valid: np.ndarray = None


def build_graph(pcm: np.ndarray) -> TannerGraph:
    """Build the dense device layout from a 0/1 parity-check matrix."""
    pcm = np.asarray(pcm)
    num_cn, num_vn = pcm.shape
    cn_ids, vn_ids = np.nonzero(pcm)
    # canonical VN-major ordering: sort by (vn, cn)
    order = np.lexsort((cn_ids, vn_ids))
    edge_vn = vn_ids[order].astype(np.int32)
    edge_cn = cn_ids[order].astype(np.int32)
    num_edges = edge_vn.shape[0]

    vn_deg = np.bincount(edge_vn, minlength=num_vn)
    cn_deg = np.bincount(edge_cn, minlength=num_cn)
    max_vn_deg = int(vn_deg.max()) if num_edges else 0
    max_cn_deg = int(cn_deg.max()) if num_edges else 0

    # VN tables: edges are VN-major so vn_edge rows are contiguous ranges
    vn_edge = np.full((num_vn, max_vn_deg), num_edges, dtype=np.int32)
    vn_mask = np.zeros((num_vn, max_vn_deg), dtype=np.float32)
    starts = np.concatenate([[0], np.cumsum(vn_deg)])
    for v in range(num_vn):
        d = vn_deg[v]
        vn_edge[v, :d] = np.arange(starts[v], starts[v] + d, dtype=np.int32)
        vn_mask[v, :d] = 1.0

    # CN tables
    cn_edge = np.full((num_cn, max_cn_deg), num_edges, dtype=np.int32)
    cn_mask = np.zeros((num_cn, max_cn_deg), dtype=np.float32)
    slot_of_edge = np.zeros(num_edges, dtype=np.int32)
    fill = np.zeros(num_cn, dtype=np.int32)
    for e in range(num_edges):
        c = edge_cn[e]
        s = fill[c]
        cn_edge[c, s] = e
        cn_mask[c, s] = 1.0
        slot_of_edge[e] = c * max_cn_deg + s
        fill[c] = s + 1

    return TannerGraph(
        num_vn=num_vn,
        num_cn=num_cn,
        num_edges=num_edges,
        max_vn_deg=max_vn_deg,
        max_cn_deg=max_cn_deg,
        edge_vn=edge_vn,
        edge_cn=edge_cn,
        vn_edge=vn_edge,
        vn_mask=vn_mask,
        vn_deg=vn_deg.astype(np.float32),
        cn_edge=cn_edge,
        cn_mask=cn_mask,
        cn_deg=cn_deg.astype(np.float32),
        edge_cn_slot=slot_of_edge,
        vn_uniform=bool((vn_deg == max_vn_deg).all()),
        cn_uniform=bool((cn_deg == max_cn_deg).all()),
    )


def build_rowset(pcm: np.ndarray) -> RowSet:
    """Padded per-row VN-id table for a PCM (rows may have differing weight)."""
    pcm = np.asarray(pcm)
    num_rows, num_vn = pcm.shape
    deg = pcm.sum(axis=1).astype(np.int64)
    max_deg = int(deg.max()) if num_rows else 0
    vn_idx = np.full((num_rows, max_deg), num_vn, dtype=np.int32)
    mask = np.zeros((num_rows, max_deg), dtype=np.float32)
    for r in range(num_rows):
        cols = np.nonzero(pcm[r])[0]
        vn_idx[r, : len(cols)] = cols
        mask[r, : len(cols)] = 1.0
    return RowSet(
        num_rows=num_rows,
        max_deg=max_deg,
        vn_idx=vn_idx,
        mask=mask,
        uniform=bool((deg == max_deg).all()),
        row_valid=np.ones((num_rows,), dtype=np.float32),
    )


@dataclass(frozen=True)
class QuantumGraph:
    """Everything the BP4 decoder + cascade need for one CSS code, in device
    layout.  ``logit_rows_*`` follow the reference's stage-mode convention
    (decoding_q.py:33-37): in stage mode the per-row logits cover only the
    check rows (pcm_x_perp := hz, pcm_z_perp := hx); otherwise the full
    orthogonal complements.
    """

    n: int
    k: int
    gx: TannerGraph  # graph of hx
    gz: TannerGraph  # graph of hz
    hx: np.ndarray  # [mx, n] float32 (dense, for syndrome matmuls)
    hz: np.ndarray
    hx_perp: np.ndarray
    hz_perp: np.ndarray
    lx: np.ndarray
    lz: np.ndarray
    # boxplus row tables for check-satisfaction logits
    logit_rows_x: RowSet  # rows of pcm_x_perp (gathers llr_x)
    logit_rows_z: RowSet  # rows of pcm_z_perp (gathers llr_z)
    name: str = ""

    # hx/hz row counts can differ from gx/gz.num_cn under edge sharding
    # (phantom padding); static bool marks sharded instances
    is_shard: bool = False

    @staticmethod
    def from_code(code, stage_mode: bool = True) -> "QuantumGraph":
        pcm_x_perp = code.hz if stage_mode else code.hx_perp
        pcm_z_perp = code.hx if stage_mode else code.hz_perp
        return QuantumGraph(
            n=int(code.N),
            k=int(code.K),
            gx=build_graph(code.hx),
            gz=build_graph(code.hz),
            hx=np.asarray(code.hx, np.float32),
            hz=np.asarray(code.hz, np.float32),
            hx_perp=np.asarray(code.hx_perp, np.float32),
            hz_perp=np.asarray(code.hz_perp, np.float32),
            lx=np.asarray(code.lx, np.float32),
            lz=np.asarray(code.lz, np.float32),
            logit_rows_x=build_rowset(pcm_x_perp),
            logit_rows_z=build_rowset(pcm_z_perp),
            name=getattr(code, "name", ""),
        )


# ---------------------------------------------------------------------------
# Pytree registration: array fields are leaves, static metadata is aux data.
# This lets sharded graph bundles (leading shard axis on every leaf) flow
# through shard_map as ordinary arguments (parallel/shard.py).
# ---------------------------------------------------------------------------

import jax.tree_util as _jtu  # noqa: E402

_TG_LEAVES = (
    "edge_vn",
    "edge_cn",
    "vn_edge",
    "vn_mask",
    "vn_deg",
    "cn_edge",
    "cn_mask",
    "cn_deg",
    "edge_cn_slot",
)
_TG_AUX = ("num_vn", "num_cn", "num_edges", "max_vn_deg", "max_cn_deg", "vn_uniform", "cn_uniform")


def _tg_flatten(g):
    return tuple(getattr(g, f) for f in _TG_LEAVES), tuple(getattr(g, f) for f in _TG_AUX)


def _tg_unflatten(aux, leaves):
    return TannerGraph(**dict(zip(_TG_AUX, aux)), **dict(zip(_TG_LEAVES, leaves)))


_jtu.register_pytree_node(TannerGraph, _tg_flatten, _tg_unflatten)

_RS_LEAVES = ("vn_idx", "mask", "row_valid")
_RS_AUX = ("num_rows", "max_deg", "uniform")


def _rs_flatten(r):
    return tuple(getattr(r, f) for f in _RS_LEAVES), tuple(getattr(r, f) for f in _RS_AUX)


def _rs_unflatten(aux, leaves):
    return RowSet(**dict(zip(_RS_AUX, aux)), **dict(zip(_RS_LEAVES, leaves)))


_jtu.register_pytree_node(RowSet, _rs_flatten, _rs_unflatten)

_QG_LEAVES = (
    "gx",
    "gz",
    "hx",
    "hz",
    "hx_perp",
    "hz_perp",
    "lx",
    "lz",
    "logit_rows_x",
    "logit_rows_z",
)
_QG_AUX = ("n", "k", "name", "is_shard")


def _qg_flatten(g):
    return tuple(getattr(g, f) for f in _QG_LEAVES), tuple(getattr(g, f) for f in _QG_AUX)


def _qg_unflatten(aux, leaves):
    return QuantumGraph(**dict(zip(_QG_AUX, aux)), **dict(zip(_QG_LEAVES, leaves)))


_jtu.register_pytree_node(QuantumGraph, _qg_flatten, _qg_unflatten)
