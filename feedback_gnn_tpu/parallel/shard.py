"""Edge-partitioning of the Tanner graph across a mesh axis (aligned layout).

Greenfield TPU-native component (no reference counterpart; SURVEY.md §2.3
Mode B): check nodes (and with them their edges, PCM rows, logit rows) are
partitioned into contiguous blocks, one per shard on the ``edge`` mesh axis.
Every shard keeps the full VN state ``[*, n_pad, B_local]`` replicated; the
only cross-shard communication is a ``psum`` of the per-VN partial message
sums — one ``[n_pad, B]`` all-reduce per BP iteration riding the ICI.

Per-shard graphs reuse the aligned slot-major invariants of codes/graph.py:

* every shard's tables are padded to identical aligned shapes (same
  ``c_pad_s`` / row pads across shards) so the stacked bundle has a uniform
  leading shard axis;
* each VN's local slots hold its local edges; unused slots point at a pad
  CN slot (zero by the masked-CN-update invariant), so unmasked VN sums
  remain exact per shard and psum to the global sum;
* RowSets carry ``row_valid`` masks excluding both alignment pads and
  cross-shard phantom rows;
* ``vn_deg`` stays GLOBAL so post-psum mean reductions divide correctly;
* logit RowSets are partitioned with exactly the same CN blocks as the
  corresponding decoder graph, keeping the GNN's per-slot h_cn gathers local.
"""

from __future__ import annotations

import numpy as np

import jax

from ..codes.graph import QuantumGraph, RowSet, TannerGraph, pad_rows

__all__ = ["shard_quantum_graph", "unstack_shard", "shard_bounds"]


def _aligned(count: int) -> int:
    return ((count + 1 + 7) // 8) * 8


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
    """Split one aligned TannerGraph into per-shard graphs (list) with equal
    padded shapes.  CN ids are LOCAL within each shard."""
    bounds = shard_bounds(graph.num_cn, num_shards)
    c_pad_s = _aligned(max(e - s for s, e in bounds))
    n = graph.num_vn
    n_pad = graph.n_pad
    dv, dc = graph.max_vn_deg, graph.max_cn_deg

    pad_vn_flat = n  # slot 0, pad VN row
    shards = []
    for s, e in bounds:
        c_local = e - s
        sel = (graph.edge_cn >= s) & (graph.edge_cn < e)
        evn = graph.edge_vn[sel]
        ecn = graph.edge_cn[sel] - s

        pad_cn_flat = c_local  # slot 0 of the local pad CN row
        cn_gather = np.full(dc * c_pad_s, pad_vn_flat, np.int32)
        vn_gather = np.full(dv * n_pad, pad_cn_flat, np.int32)
        vn_mask = np.zeros((dv, n_pad), np.float32)
        cn_mask = np.zeros((dc, c_pad_s), np.float32)
        edge_cn_byslot = np.full((dv, n_pad), c_local, np.int32)
        edge_vn_byslot = np.full((dc, c_pad_s), n, np.int32)

        fill_v = np.zeros(n, np.int32)
        fill_c = np.zeros(c_local, np.int32)
        for v, c in zip(evn, ecn):
            sv = fill_v[v]
            sc = fill_c[c]
            vflat = sv * n_pad + v
            cflat = sc * c_pad_s + c
            cn_gather[cflat] = vflat
            vn_gather[vflat] = cflat
            vn_mask[sv, v] = 1.0
            cn_mask[sc, c] = 1.0
            edge_cn_byslot[sv, v] = c
            edge_vn_byslot[sc, c] = v
            fill_v[v] = sv + 1
            fill_c[c] = sc + 1

        cn_deg = np.zeros(c_pad_s, np.float32)
        cn_deg[:c_local] = np.asarray(
            graph.cn_deg[s:e] if hasattr(graph.cn_deg, "__getitem__") else 0
        )
        shards.append(
            TannerGraph(
                num_vn=n,
                num_cn=c_local,
                n_pad=n_pad,
                c_pad=c_pad_s,
                num_edges=int(sel.sum()),
                max_vn_deg=dv,
                max_cn_deg=dc,
                cn_gather=cn_gather,
                vn_gather=vn_gather,
                vn_mask=vn_mask,
                cn_mask=cn_mask,
                vn_deg=graph.vn_deg,  # GLOBAL degrees (post-psum means)
                cn_deg=cn_deg,
                edge_cn_byslot=edge_cn_byslot,
                edge_vn_byslot=edge_vn_byslot,
                edge_vn=np.pad(evn, (0, graph.num_edges - len(evn))),
                edge_cn=np.pad(ecn, (0, graph.num_edges - len(ecn))),
            )
        )
    # equalise aux fields across shards (static metadata must match for
    # pytree stacking); the masks carry the true per-shard structure
    shards = [
        TannerGraph(
            **{
                **{f: getattr(g, f) for f in g.__dataclass_fields__},
                "num_cn": shards[0].num_cn,
                "num_edges": shards[0].num_edges,
            }
        )
        for g in shards
    ]
    return shards, bounds, c_pad_s


def _shard_rows(mat: np.ndarray, bounds, r_pad: int):
    """Partition PCM rows into equal zero-padded blocks [r_pad, n_cols]."""
    return [pad_rows(mat[s:e], r_pad) for s, e in bounds]


def _shard_rowset(rs: RowSet, bounds, r_pad: int):
    out = []
    for s, e in bounds:
        vn_idx = np.full((rs.max_deg, r_pad), rs.vn_sentinel, np.int32)
        mask = np.zeros((rs.max_deg, r_pad), np.float32)
        row_valid = np.zeros(r_pad, np.float32)
        vn_idx[:, : e - s] = rs.vn_idx[:, s:e]
        mask[:, : e - s] = rs.mask[:, s:e]
        row_valid[: e - s] = rs.row_valid[s:e]
        out.append(
            RowSet(
                num_rows=e - s,
                r_pad=r_pad,
                max_deg=rs.max_deg,
                vn_idx=vn_idx,
                mask=mask,
                row_valid=row_valid,
                vn_sentinel=rs.vn_sentinel,
            )
        )
    # equalise aux
    out = [
        RowSet(
            num_rows=out[0].num_rows,
            r_pad=r.r_pad,
            max_deg=r.max_deg,
            vn_idx=r.vn_idx,
            mask=r.mask,
            row_valid=r.row_valid,
            vn_sentinel=r.vn_sentinel,
        )
        for r in out
    ]
    return out


def shard_quantum_graph(qg: QuantumGraph, num_shards: int) -> QuantumGraph:
    """Build the stacked sharded bundle: a QuantumGraph whose every array
    leaf has a leading ``num_shards`` axis.  Pass it through ``shard_map``
    with ``P('edge')`` on all leaves and call :func:`unstack_shard` inside.
    """
    gx_shards, bx, cxp = _shard_tanner(qg.gx, num_shards)
    gz_shards, bz, czp = _shard_tanner(qg.gz, num_shards)

    hx_blocks = _shard_rows(np.asarray(qg.hx)[: qg.gx.num_cn], bx, cxp)
    hz_blocks = _shard_rows(np.asarray(qg.hz)[: qg.gz.num_cn], bz, czp)

    # logit rows: stage-mode alignment with decoder CN partitions when true
    # row counts match; otherwise an independent contiguous partition
    def shard_logit_rows(rs: RowSet, decoder_bounds, decoder_pad, decoder_rows):
        if rs.num_rows == decoder_rows:
            return _shard_rowset(rs, decoder_bounds, decoder_pad)
        b = shard_bounds(rs.num_rows, num_shards)
        rp = _aligned(max(e - s for s, e in b))
        return _shard_rowset(rs, b, rp)

    lrx = shard_logit_rows(qg.logit_rows_x, bz, czp, qg.gz.num_cn)
    lrz = shard_logit_rows(qg.logit_rows_z, bx, cxp, qg.gx.num_cn)

    # perp/logical matrices: independent row partitions (final accounting)
    def shard_perp(mat, true_rows):
        b = shard_bounds(true_rows, num_shards)
        rp = _aligned(max(e - s for s, e in b))
        return _shard_rows(np.asarray(mat)[:true_rows], b, rp), b

    hxp, b_hxp = shard_perp(qg.hx_perp, qg.hx_perp_rows)
    hzp, b_hzp = shard_perp(qg.hz_perp, qg.hz_perp_rows)
    lxm, b_lxm = shard_perp(qg.lx, qg.lx_rows)
    lzm, b_lzm = shard_perp(qg.lz, qg.lz_rows)

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
            hx_perp_rows=b_hxp[0][1] - b_hxp[0][0],
            hz_perp_rows=b_hzp[0][1] - b_hzp[0][0],
            lx_rows=max(1, b_lxm[0][1] - b_lxm[0][0]),
            lz_rows=max(1, b_lzm[0][1] - b_lzm[0][0]),
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
