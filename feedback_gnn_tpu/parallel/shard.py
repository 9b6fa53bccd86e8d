"""Edge-partitioning of the Tanner graph across a mesh axis.

Greenfield TPU-native component (no reference counterpart; SURVEY.md §2.3
Mode B): check nodes (and with them their edges, PCM rows, logit rows) are
partitioned into contiguous blocks, one per shard on the ``edge`` mesh axis.
Every shard keeps the full VN state ``[n, B_local]`` replicated; the only
cross-shard communication is a ``psum`` of the per-VN partial message sums —
one ``[n, B]`` all-reduce per BP iteration riding the ICI.

Construction invariants (consumed by decoders/* with ``axis_name=...``):

* every shard's tables are padded to identical shapes (E_max edges, C_max
  CNs per graph) so the stacked bundle has a uniform leading shard axis;
* phantom edges point their CN slot at flat index 0 — their values are
  finite garbage that no VN table or CN slot ever reads back;
* phantom CNs have all-sentinel edge slots and zero PCM rows (syndrome 0);
* RowSets carry ``row_valid`` masks so losses can exclude phantom rows;
* ``vn_deg`` stays GLOBAL so post-psum mean reductions divide correctly;
* the logit RowSets are partitioned with exactly the same CN blocks as the
  corresponding decoder graph, keeping the GNN's per-edge h_cn gathers local.
"""

from __future__ import annotations

import numpy as np

import jax

from ..codes.graph import QuantumGraph, RowSet, TannerGraph

__all__ = ["shard_quantum_graph", "unstack_shard", "shard_bounds"]


def shard_bounds(num_rows: int, num_shards: int):
    """Contiguous balanced partition: first ``num_rows % S`` shards get one
    extra row."""
    base = num_rows // num_shards
    rem = num_rows % num_shards
    bounds = []
    start = 0
    for s in range(num_shards):
        size = base + (1 if s < rem else 0)
        bounds.append((start, start + size))
        start += size
    return bounds


def _shard_tanner(graph: TannerGraph, num_shards: int):
    """Split one TannerGraph into per-shard graphs (list) with equal padded
    shapes.  CN ids are LOCAL within each shard."""
    bounds = shard_bounds(graph.num_cn, num_shards)
    c_max = max(e - s for s, e in bounds)

    shard_edges = []
    for s, e in bounds:
        sel = np.nonzero((graph.edge_cn >= s) & (graph.edge_cn < e))[0]
        shard_edges.append(sel)  # global edge ids, VN-major order preserved
    e_max = max(len(s) for s in shard_edges)

    n = graph.num_vn
    d_v = graph.max_vn_deg
    d_c = graph.max_cn_deg
    shards = []
    for (s, e), sel in zip(bounds, shard_edges):
        el = len(sel)
        edge_vn = np.zeros(e_max, np.int32)
        edge_vn[:el] = graph.edge_vn[sel]
        edge_cn = np.zeros(e_max, np.int32)
        edge_cn[:el] = graph.edge_cn[sel] - s  # local CN ids

        vn_edge = np.full((n, d_v), e_max, np.int32)
        vn_mask = np.zeros((n, d_v), np.float32)
        fill_v = np.zeros(n, np.int32)
        cn_edge = np.full((c_max, d_c), e_max, np.int32)
        cn_mask = np.zeros((c_max, d_c), np.float32)
        # phantom edges point at flat slot 0 (garbage, never read back)
        edge_cn_slot = np.zeros(e_max, np.int32)
        fill_c = np.zeros(c_max, np.int32)
        for le in range(el):
            v = edge_vn[le]
            vn_edge[v, fill_v[v]] = le
            vn_mask[v, fill_v[v]] = 1.0
            fill_v[v] += 1
            c = edge_cn[le]
            cn_edge[c, fill_c[c]] = le
            cn_mask[c, fill_c[c]] = 1.0
            edge_cn_slot[le] = c * d_c + fill_c[c]
            fill_c[c] += 1

        shards.append(
            TannerGraph(
                num_vn=n,
                num_cn=c_max,
                num_edges=e_max,
                max_vn_deg=d_v,
                max_cn_deg=d_c,
                edge_vn=edge_vn,
                edge_cn=edge_cn,
                vn_edge=vn_edge,
                vn_mask=vn_mask,
                vn_deg=graph.vn_deg,  # GLOBAL degrees (post-psum means)
                cn_edge=cn_edge,
                cn_mask=cn_mask,
                cn_deg=np.pad(graph.cn_deg[s:e], (0, c_max - (e - s))),
                edge_cn_slot=edge_cn_slot,
                vn_uniform=False,
                cn_uniform=False,
            )
        )
    return shards, bounds


def _shard_rows(mat: np.ndarray, bounds, c_max: int):
    """Partition PCM rows into equal zero-padded blocks [c_max, n]."""
    out = []
    for s, e in bounds:
        blk = np.zeros((c_max, mat.shape[1]), mat.dtype)
        blk[: e - s] = mat[s:e]
        out.append(blk)
    return out


def _shard_rowset(rs: RowSet, bounds, r_max: int):
    out = []
    for s, e in bounds:
        vn_idx = np.full((r_max, rs.max_deg), rs.vn_idx.max(initial=0), np.int32)
        # phantom rows: all-masked; sentinel index value is irrelevant
        vn_idx[: e - s] = rs.vn_idx[s:e]
        mask = np.zeros((r_max, rs.max_deg), np.float32)
        mask[: e - s] = rs.mask[s:e]
        row_valid = np.zeros((r_max,), np.float32)
        row_valid[: e - s] = rs.row_valid[s:e] if rs.row_valid is not None else 1.0
        out.append(
            RowSet(
                num_rows=r_max,
                max_deg=rs.max_deg,
                vn_idx=vn_idx,
                mask=mask,
                uniform=False,
                row_valid=row_valid,
            )
        )
    return out


def shard_quantum_graph(qg: QuantumGraph, num_shards: int) -> QuantumGraph:
    """Build the stacked sharded bundle: a QuantumGraph whose every array
    leaf has a leading ``num_shards`` axis.  Pass it through ``shard_map``
    with ``P('edge')`` on all leaves and call :func:`unstack_shard` inside.

    The stage-mode invariant logit_rows_x == rows(hz), logit_rows_z ==
    rows(hx) is preserved per shard: logit_rows_z uses gx's CN blocks and
    logit_rows_x uses gz's, so the GNN's h_cn gathers stay shard-local.
    """
    gx_shards, bx = _shard_tanner(qg.gx, num_shards)
    gz_shards, bz = _shard_tanner(qg.gz, num_shards)
    cx_max = gx_shards[0].num_cn
    cz_max = gz_shards[0].num_cn

    hx_blocks = _shard_rows(qg.hx, bx, cx_max)
    hz_blocks = _shard_rows(qg.hz, bz, cz_max)

    # logit rows: stage-mode alignment with decoder CN partitions when row
    # counts match; otherwise (plain mode: hx_perp/hz_perp) an independent
    # contiguous partition
    if qg.logit_rows_x.num_rows == qg.gz.num_cn:
        bounds_lx, rx_max = bz, cz_max
    else:
        bounds_lx = shard_bounds(qg.logit_rows_x.num_rows, num_shards)
        rx_max = max(e - s for s, e in bounds_lx)
    if qg.logit_rows_z.num_rows == qg.gx.num_cn:
        bounds_lz, rz_max = bx, cx_max
    else:
        bounds_lz = shard_bounds(qg.logit_rows_z.num_rows, num_shards)
        rz_max = max(e - s for s, e in bounds_lz)
    lrx = _shard_rowset(qg.logit_rows_x, bounds_lx, rx_max)
    lrz = _shard_rowset(qg.logit_rows_z, bounds_lz, rz_max)

    # perp/logical matrices: independent row partitions (final accounting)
    b_hxp = shard_bounds(qg.hx_perp.shape[0], num_shards)
    b_hzp = shard_bounds(qg.hz_perp.shape[0], num_shards)
    b_lxm = shard_bounds(qg.lx.shape[0], num_shards)
    b_lzm = shard_bounds(qg.lz.shape[0], num_shards)
    hxp = _shard_rows(qg.hx_perp, b_hxp, max(e - s for s, e in b_hxp))
    hzp = _shard_rows(qg.hz_perp, b_hzp, max(e - s for s, e in b_hzp))
    lxm = _shard_rows(qg.lx, b_lxm, max(1, max(e - s for s, e in b_lxm)))
    lzm = _shard_rows(qg.lz, b_lzm, max(1, max(e - s for s, e in b_lzm)))

    per_shard = [
        QuantumGraph(
            n=qg.n,
            k=qg.k,
            gx=gx_shards[i],
            gz=gz_shards[i],
            hx=hx_blocks[i].astype(np.float32),
            hz=hz_blocks[i].astype(np.float32),
            hx_perp=hxp[i].astype(np.float32),
            hz_perp=hzp[i].astype(np.float32),
            lx=lxm[i].astype(np.float32),
            lz=lzm[i].astype(np.float32),
            logit_rows_x=lrx[i],
            logit_rows_z=lrz[i],
            name=f"{qg.name}@shard",
            is_shard=True,
        )
        for i in range(num_shards)
    ]
    # stack leaves -> leading shard axis; aux (static) comes from shard 0
    return jax.tree.map(lambda *xs: np.stack(xs, axis=0), *per_shard)


def unstack_shard(stacked: QuantumGraph) -> QuantumGraph:
    """Inside shard_map: drop the leading (length-1 local) shard axis."""
    return jax.tree.map(lambda x: x[0], stacked)
