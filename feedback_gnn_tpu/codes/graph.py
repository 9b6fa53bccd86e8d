"""Device-facing Tanner-graph layout (static, dense, tile-aligned).

This replaces the reference's TF ragged-tensor machinery
(/root/reference/sionna/fec/ldpc/decoding_q.py:59-94, 707-711) with a layout
engineered for the TPU's (8 sublane x 128 lane) tiling:

* per-edge message state lives in **slot-major** 3-D arrays
  ``[max_deg, node_pad, B]`` — degree slots in the leading axis, nodes padded
  to a multiple of 8 in the sublane axis, Monte-Carlo batch in lanes;
* per-node reductions are sums over the leading axis (free — no reshapes);
* the VN<->CN edge permutation is ONE flat row gather in each direction,
  made relayout-free by the alignment: ``[d, node_pad, B] -> [d*node_pad, B]``
  merges are bitcasts when ``node_pad % 8 == 0``;
* ``node_pad >= nodes + 1`` always, so a guaranteed-zero pad row exists for
  branch-free padded gathers (no appended rows, no dynamic masks on the hot
  path).

Zero-invariants relied on by the decoders (bp2/bp4/graph_ops):
  I1. channel-LLR pad rows are zero -> VN-phase messages at pad VNs are zero;
  I2. CN updates multiply their output by ``cn_mask`` -> pad CN slots are
      zero;
  I3. ``vn_gather`` pad entries point at a pad CN slot (zero by I2), and
      ``cn_gather`` pad entries point at a pad VN slot (zero by I1) — so
      unmasked per-node sums are exact.

For the paper's (3,6)-biregular GHP codes the only padding is the +8 pad
rows (<1 % memory).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

__all__ = ["TannerGraph", "RowSet", "build_graph", "build_rowset", "QuantumGraph", "pad_rows"]


def _aligned(count: int) -> int:
    """Smallest multiple of 8 that is >= count + 1 (always >= 1 pad row)."""
    return ((count + 1 + 7) // 8) * 8


def pad_rows(mat: np.ndarray, rows: int, cols: int | None = None) -> np.ndarray:
    """Zero-pad a host matrix to [rows, cols]."""
    m, n = mat.shape
    out = np.zeros((rows, cols if cols is not None else n), mat.dtype)
    out[:m, :n] = mat
    return out


@dataclass(frozen=True)
class TannerGraph:
    """Static aligned gather tables for one parity-check matrix."""

    num_vn: int
    num_cn: int
    n_pad: int  # aligned VN count (multiple of 8, > num_vn)
    c_pad: int  # aligned CN count
    num_edges: int
    max_vn_deg: int  # dv: VN slot count
    max_cn_deg: int  # dc: CN slot count
    # [dc * c_pad] int32: flat vn-slot index (into dv*n_pad) per cn slot;
    # pad entries point at a pad VN row (zero by invariant I1)
    cn_gather: np.ndarray
    # [dv * n_pad] int32: flat cn-slot index (into dc*c_pad) per vn slot;
    # pad entries point at a pad CN slot (zero by invariant I2)
    vn_gather: np.ndarray
    # [dv, n_pad] / [dc, c_pad] float32 {0,1} validity masks
    vn_mask: np.ndarray
    cn_mask: np.ndarray
    # true degrees, [n_pad] / [c_pad] float32 (pad rows: 0)
    vn_deg: np.ndarray
    cn_deg: np.ndarray
    # [dv, n_pad] int32: CN id per vn slot (pads -> num_cn) — GNN h_cn gather
    edge_cn_byslot: np.ndarray
    # [dc, c_pad] int32: VN id per cn slot (pads -> num_vn) — GNN h_vn gather
    edge_vn_byslot: np.ndarray
    # debug / host-side views (true edges, VN-major (vn, cn) sorted)
    edge_vn: np.ndarray
    edge_cn: np.ndarray

    def __repr__(self):
        return (
            f"TannerGraph(vn={self.num_vn}/{self.n_pad}, cn={self.num_cn}/{self.c_pad}, "
            f"edges={self.num_edges}, deg=({self.max_vn_deg},{self.max_cn_deg}))"
        )


@dataclass(frozen=True)
class RowSet:
    """Aligned slot-major per-row VN-id tables for boxplus over PCM rows."""

    num_rows: int
    r_pad: int
    max_deg: int
    # [max_deg, r_pad] int32 VN ids (pads -> a pad VN row of the source)
    vn_idx: np.ndarray
    # [max_deg, r_pad] float32 {0,1}
    mask: np.ndarray
    # [r_pad] float32 {0,1}: 0 marks pad rows (and edge-sharding phantoms)
    row_valid: np.ndarray
    # sentinel used in vn_idx pads (the source's pad row); callers gather
    # from arrays of at least this many rows
    vn_sentinel: int


def build_graph(pcm: np.ndarray) -> TannerGraph:
    """Build the aligned device layout from a 0/1 parity-check matrix."""
    pcm = np.asarray(pcm)
    num_cn, num_vn = pcm.shape
    cn_ids, vn_ids = np.nonzero(pcm)
    order = np.lexsort((cn_ids, vn_ids))  # VN-major canonical order
    edge_vn = vn_ids[order].astype(np.int32)
    edge_cn = cn_ids[order].astype(np.int32)
    num_edges = edge_vn.shape[0]

    vn_deg = np.bincount(edge_vn, minlength=num_vn)
    cn_deg = np.bincount(edge_cn, minlength=num_cn)
    dv = int(vn_deg.max()) if num_edges else 1
    dc = int(cn_deg.max()) if num_edges else 1
    n_pad = _aligned(num_vn)
    c_pad = _aligned(num_cn)

    # slot assignment: edge e is slot s_v at its VN (s_v = rank among the
    # VN's edges in CN order) and slot s_c at its CN (rank in VN order)
    vn_slot = np.zeros(num_edges, np.int32)
    fill = np.zeros(num_vn, np.int32)
    for e in range(num_edges):
        v = edge_vn[e]
        vn_slot[e] = fill[v]
        fill[v] += 1
    cn_slot = np.zeros(num_edges, np.int32)
    fill = np.zeros(num_cn, np.int32)
    # CN slots in VN-major order -> per-CN edges sorted by VN
    for e in range(num_edges):
        c = edge_cn[e]
        cn_slot[e] = fill[c]
        fill[c] += 1

    # pad targets (invariants I1-I3)
    pad_vn_flat = 0 * n_pad + num_vn  # slot 0 of the first pad VN row
    pad_cn_flat = 0 * c_pad + num_cn  # slot 0 of the first pad CN row

    cn_gather = np.full(dc * c_pad, pad_vn_flat, np.int32)
    vn_gather = np.full(dv * n_pad, pad_cn_flat, np.int32)
    vn_mask = np.zeros((dv, n_pad), np.float32)
    cn_mask = np.zeros((dc, c_pad), np.float32)
    edge_cn_byslot = np.full((dv, n_pad), num_cn, np.int32)
    edge_vn_byslot = np.full((dc, c_pad), num_vn, np.int32)

    vflat = vn_slot * n_pad + edge_vn
    cflat = cn_slot * c_pad + edge_cn
    cn_gather[cflat] = vflat
    vn_gather[vflat] = cflat
    vn_mask[vn_slot, edge_vn] = 1.0
    cn_mask[cn_slot, edge_cn] = 1.0
    edge_cn_byslot[vn_slot, edge_vn] = edge_cn
    edge_vn_byslot[cn_slot, edge_cn] = edge_vn

    return TannerGraph(
        num_vn=num_vn,
        num_cn=num_cn,
        n_pad=n_pad,
        c_pad=c_pad,
        num_edges=num_edges,
        max_vn_deg=dv,
        max_cn_deg=dc,
        cn_gather=cn_gather,
        vn_gather=vn_gather,
        vn_mask=vn_mask,
        cn_mask=cn_mask,
        vn_deg=np.pad(vn_deg.astype(np.float32), (0, n_pad - num_vn)),
        cn_deg=np.pad(cn_deg.astype(np.float32), (0, c_pad - num_cn)),
        edge_cn_byslot=edge_cn_byslot,
        edge_vn_byslot=edge_vn_byslot,
        edge_vn=edge_vn,
        edge_cn=edge_cn,
    )


def build_rowset(pcm: np.ndarray, vn_sentinel: int | None = None) -> RowSet:
    """Aligned slot-major per-row VN-id table for a PCM.

    ``vn_sentinel`` defaults to the aligned pad row of the PCM's column
    space (callers gather from [n_pad, B] sources whose pad rows are zero).
    """
    pcm = np.asarray(pcm)
    num_rows, num_vn = pcm.shape
    if vn_sentinel is None:
        vn_sentinel = num_vn  # first pad row of an [n_pad, B] source
    deg = pcm.sum(axis=1).astype(np.int64)
    max_deg = int(deg.max()) if num_rows else 1
    r_pad = _aligned(num_rows)

    vn_idx = np.full((max_deg, r_pad), vn_sentinel, np.int32)
    mask = np.zeros((max_deg, r_pad), np.float32)
    row_valid = np.zeros(r_pad, np.float32)
    row_valid[:num_rows] = 1.0
    for r in range(num_rows):
        cols = np.nonzero(pcm[r])[0]
        vn_idx[: len(cols), r] = cols
        mask[: len(cols), r] = 1.0
    return RowSet(
        num_rows=num_rows,
        r_pad=r_pad,
        max_deg=max_deg,
        vn_idx=vn_idx,
        mask=mask,
        row_valid=row_valid,
        vn_sentinel=vn_sentinel,
    )


@dataclass(frozen=True)
class QuantumGraph:
    """Everything the BP4 decoder + cascade need for one CSS code, in device
    layout.  ``logit_rows_*`` follow the reference's stage-mode convention
    (decoding_q.py:33-37).

    Dense matrices are stored PADDED: hx/hz are [c_pad, n_pad] (rows/cols
    beyond the true shape are zero), hx_perp etc. are [r_pad, n_pad] — so
    syndrome and accounting matmuls operate directly on padded device
    tensors.  True shapes are (gx.num_cn, n) etc.
    """

    n: int
    k: int
    gx: TannerGraph  # graph of hx
    gz: TannerGraph  # graph of hz
    hx: np.ndarray  # [gx.c_pad, n_pad] float32
    hz: np.ndarray  # [gz.c_pad, n_pad]
    hx_perp: np.ndarray  # [r_pad, n_pad]
    hz_perp: np.ndarray
    lx: np.ndarray
    lz: np.ndarray
    # true row counts of the perp/logical matrices (before padding)
    hx_perp_rows: int
    hz_perp_rows: int
    lx_rows: int
    lz_rows: int
    # boxplus row tables for check-satisfaction logits
    logit_rows_x: RowSet  # rows of pcm_x_perp (gathers llr_x)
    logit_rows_z: RowSet  # rows of pcm_z_perp (gathers llr_z)
    name: str = ""
    is_shard: bool = False

    @property
    def n_pad(self):
        return self.gx.n_pad

    @staticmethod
    def from_code(code, stage_mode: bool = True) -> "QuantumGraph":
        pcm_x_perp = code.hz if stage_mode else code.hx_perp
        pcm_z_perp = code.hx if stage_mode else code.hz_perp
        gx = build_graph(code.hx)
        gz = build_graph(code.hz)
        n_pad = gx.n_pad

        def padm(m):
            m = np.asarray(m, np.float32)
            return pad_rows(m, _aligned(m.shape[0]), n_pad)

        return QuantumGraph(
            n=int(code.N),
            k=int(code.K),
            gx=gx,
            gz=gz,
            hx=pad_rows(np.asarray(code.hx, np.float32), gx.c_pad, n_pad),
            hz=pad_rows(np.asarray(code.hz, np.float32), gz.c_pad, n_pad),
            hx_perp=padm(code.hx_perp),
            hz_perp=padm(code.hz_perp),
            lx=padm(code.lx),
            lz=padm(code.lz),
            hx_perp_rows=int(np.asarray(code.hx_perp).shape[0]),
            hz_perp_rows=int(np.asarray(code.hz_perp).shape[0]),
            lx_rows=int(np.asarray(code.lx).shape[0]),
            lz_rows=int(np.asarray(code.lz).shape[0]),
            logit_rows_x=build_rowset(pcm_x_perp),
            logit_rows_z=build_rowset(pcm_z_perp),
            name=getattr(code, "name", ""),
        )


# ---------------------------------------------------------------------------
# Pytree registration: array fields are leaves, static metadata is aux data.
# Sharded graph bundles (leading shard axis on every leaf) then flow through
# shard_map as ordinary arguments (parallel/shard.py).
# ---------------------------------------------------------------------------

import jax.tree_util as _jtu  # noqa: E402

_TG_LEAVES = (
    "cn_gather",
    "vn_gather",
    "vn_mask",
    "cn_mask",
    "vn_deg",
    "cn_deg",
    "edge_cn_byslot",
    "edge_vn_byslot",
    "edge_vn",
    "edge_cn",
)
_TG_AUX = (
    "num_vn",
    "num_cn",
    "n_pad",
    "c_pad",
    "num_edges",
    "max_vn_deg",
    "max_cn_deg",
)


def _tg_flatten(g):
    return tuple(getattr(g, f) for f in _TG_LEAVES), tuple(getattr(g, f) for f in _TG_AUX)


def _tg_unflatten(aux, leaves):
    return TannerGraph(**dict(zip(_TG_AUX, aux)), **dict(zip(_TG_LEAVES, leaves)))


_jtu.register_pytree_node(TannerGraph, _tg_flatten, _tg_unflatten)

_RS_LEAVES = ("vn_idx", "mask", "row_valid")
_RS_AUX = ("num_rows", "r_pad", "max_deg", "vn_sentinel")


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
_QG_AUX = (
    "n",
    "k",
    "hx_perp_rows",
    "hz_perp_rows",
    "lx_rows",
    "lz_rows",
    "name",
    "is_shard",
)


def _qg_flatten(g):
    return tuple(getattr(g, f) for f in _QG_LEAVES), tuple(getattr(g, f) for f in _QG_AUX)


def _qg_unflatten(aux, leaves):
    return QuantumGraph(**dict(zip(_QG_AUX, aux)), **dict(zip(_QG_LEAVES, leaves)))


_jtu.register_pytree_node(QuantumGraph, _qg_flatten, _qg_unflatten)
