"""Fully-learned GNN Tanner-graph decoder (GNN_BP4).

Re-design of the reference ``GNN_BP4`` (/root/reference/sionna/fec/ldpc/
gnn.py:71-423): a message-passing network over the two Tanner graphs that
takes ONLY syndromes as input and maintains learnable CN/VN embeddings.

Per iteration (gnn.py:383-423):
  h_vn   <- UpdateVNEmbeddings(h_cn_x, h_cn_z, h_vn, syn_x, syn_z)
            (per-edge MLPs, syndrome-signed messages, mean-reduce, gnn.py:714)
  logits <- cal_logit(h_vn): llr_inv_embed -> binary llrs -> boxplus over
            hx/hz AND lx/lz rows (gnn.py:289-314)
  h_cn   <- UpdateCNEmbeddings(h_vn, h_cn_x, h_cn_z, hx_logit*syn, hz_logit*syn)

Note: the reference's ``call`` unpacks 5 values from cal_logit which returns
4 (gnn.py:408 vs :314) — the shipped code would crash; we fix the arity and
keep the documented semantics (README.md:46: results not in the paper).

Layout: batch-last; embeddings are [d_e, nodes, B] with the feature axis
leading (dense layers contract the leading axis, ops/dense.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..codes.graph import QuantumGraph, RowSet, TannerGraph, build_rowset
from ..ops.dense import dense_bl, init_dense, init_mlp
from .cn_update import boxplus_rows
from .bp4 import hard_decision, quaternary_to_binary_llrs

__all__ = ["GNNBP4Config", "init_gnn_bp4", "gnn_bp4_apply", "gnn_bp4_loss"]


class GNNBP4Config(NamedTuple):
    num_embed_dims: int = 20
    num_msg_dims: int = 20
    num_hidden_units: int = 40
    num_mlp_layers: int = 2
    num_iter: int = 8
    activation: str = "relu"
    use_bias: bool = False
    reduce_op: str = "mean"  # sum | mean | max | min (gnn.py:560-571)
    # trainable zero-init node/edge attributes (gnn.py:519-531): edge
    # attributes are concatenated onto the per-edge features before the msg
    # MLP, node attributes onto the reduced messages before the embed MLP
    use_attributes: bool = False
    node_attribute_dims: int = 0
    msg_attribute_dims: int = 0
    # what the per-iteration stack contains (gnn.py:407-412):
    # "boxplus-phi" -> (x_perp_logit, z_perp_logit) check/logical logits;
    # "sine" -> (p_x, p_z) per-qubit error probabilities via cal_prob
    # (gnn.py:317-332; the reference ships no training consumer for it)
    loss_type: str = "boxplus-phi"


def _act(name):
    return {"relu": jax.nn.relu, "tanh": jnp.tanh}[name]


def _mlp(x, layers, act):
    for i, layer in enumerate(layers):
        a = act if i < len(layers) - 1 else None
        x = dense_bl(x, layer["kernel"], layer.get("bias"), a)
    return x


def init_gnn_bp4(key, cfg: GNNBP4Config, graph: QuantumGraph | None = None):
    ks = jax.random.split(key, 10)
    h, m, e = cfg.num_hidden_units, cfg.num_msg_dims, cfg.num_embed_dims
    L = cfg.num_mlp_layers
    hidden = [h] * (L - 1)
    na = cfg.node_attribute_dims if cfg.use_attributes else 0
    ma = cfg.msg_attribute_dims if cfg.use_attributes else 0
    feat = 2 * e + ma  # concat(from, to[, edge attr]) per edge
    params = {
        # CN update: X and Z sides have separate msg and embed MLPs
        "cn_msg_mlp_x": init_mlp(ks[0], feat, hidden + [m], cfg.use_bias),
        "cn_msg_mlp_z": init_mlp(ks[1], feat, hidden + [m], cfg.use_bias),
        "cn_embed_mlp_x": init_mlp(ks[2], m + na + e + 1, hidden + [e], cfg.use_bias),
        "cn_embed_mlp_z": init_mlp(ks[3], m + na + e + 1, hidden + [e], cfg.use_bias),
        # VN update
        "vn_msg_mlp_x": init_mlp(ks[4], feat, hidden + [m], cfg.use_bias),
        "vn_msg_mlp_z": init_mlp(ks[5], feat, hidden + [m], cfg.use_bias),
        # single node attribute concatenated onto m_z only (gnn.py:748-750)
        "vn_embed_mlp": init_mlp(ks[6], 2 * m + na + e, hidden + [e], cfg.use_bias),
        # embedding -> (llrx, llry, llrz)
        "llr_inv_embed": init_dense(ks[7], e, 3, use_bias=True),
    }
    if cfg.use_attributes:
        assert graph is not None, "use_attributes requires the graph (shapes)"
        gx, gz = graph.gx, graph.gz
        z = jnp.zeros
        params["attributes"] = {
            # CN update (gnn.py:519-531): edge attrs in cn-slot layout,
            # node attrs per check side
            "cn_msg_x": z((ma, gx.max_cn_deg, gx.c_pad), jnp.float32),
            "cn_msg_z": z((ma, gz.max_cn_deg, gz.c_pad), jnp.float32),
            "cn_node_x": z((na, gx.c_pad), jnp.float32),
            "cn_node_z": z((na, gz.c_pad), jnp.float32),
            # VN update (gnn.py:667-676): edge attrs in vn-slot layout,
            # one shared VN node attribute
            "vn_msg_x": z((ma, gx.max_vn_deg, gx.n_pad), jnp.float32),
            "vn_msg_z": z((ma, gz.max_vn_deg, gz.n_pad), jnp.float32),
            "vn_node": z((na, gx.n_pad), jnp.float32),
        }
    return params


def _vn_slot_features(h_cn, h_vn, graph: TannerGraph):
    """Per-vn-slot features: concat(h_cn[cn(slot)], h_vn) -> [2e, dv, n_pad, B]."""
    e = h_vn.shape[0]
    h_cn_e = h_cn[:, graph.edge_cn_byslot]  # [e, dv, n_pad, B]
    h_vn_b = jnp.broadcast_to(h_vn[:, None], (e, graph.max_vn_deg) + h_vn.shape[1:])
    return jnp.concatenate([h_cn_e, h_vn_b], axis=0)


def _cn_slot_features(h_vn, h_cn, graph: TannerGraph):
    """Per-cn-slot features: concat(h_vn[vn(slot)], h_cn) -> [2e, dc, c_pad, B]."""
    e = h_cn.shape[0]
    h_vn_e = h_vn[:, graph.edge_vn_byslot]  # [e, dc, c_pad, B]
    h_cn_b = jnp.broadcast_to(h_cn[:, None], (e, graph.max_cn_deg) + h_cn.shape[1:])
    return jnp.concatenate([h_vn_e, h_cn_b], axis=0)


def _reduce_slots(messages, mask, deg, reduce_op: str, axis_name=None):
    """Aggregate per-slot messages [m, d, N_pad, B] at nodes -> [m, N_pad, B]."""
    if reduce_op in ("max", "min"):
        big = jnp.float32(3.4e38)
        fill = -big if reduce_op == "max" else big
        masked = jnp.where(mask[None, :, :, None], messages, fill)
        red = masked.max(axis=1) if reduce_op == "max" else masked.min(axis=1)
        if axis_name is not None:
            op = jax.lax.pmax if reduce_op == "max" else jax.lax.pmin
            red = op(red, axis_name)
            deg = jax.lax.psum(deg, axis_name)  # global degree across shards
        # degree-0 (padding) nodes: no incoming messages -> 0
        return jnp.where((deg > 0)[None, :, None], red, 0.0)
    s = (messages * mask[None, :, :, None]).sum(axis=1)
    if axis_name is not None:
        s = jax.lax.psum(s, axis_name)
    if reduce_op == "sum":
        return s
    if reduce_op == "mean":
        return s / jnp.maximum(deg, 1.0)[None, :, None]
    raise ValueError(reduce_op)


def _cal_logit(params, graph: QuantumGraph, lrowsets, h_vn):
    """llr_inv_embed -> binary llrs -> boxplus over [hz; lz] / [hx; lx] rows
    (gnn.py:289-314).  Returns (hx_logit, hz_logit, x_perp_logit,
    z_perp_logit)."""
    emb = dense_bl(
        h_vn, params["llr_inv_embed"]["kernel"], params["llr_inv_embed"].get("bias")
    )  # [3, n_pad, B]
    llrx, llry, llrz = emb[0], emb[1], emb[2]
    llr_x, llr_z = quaternary_to_binary_llrs(llrx, llry, llrz)
    rows_hx, rows_hz, rows_lx, rows_lz = lrowsets

    hz_logit = boxplus_rows(llr_x, rows_hz)  # X-error checks
    lz_logit = boxplus_rows(llr_x, rows_lz)
    hx_logit = boxplus_rows(llr_z, rows_hx)  # Z-error checks
    lx_logit = boxplus_rows(llr_z, rows_lx)
    x_perp_logit = jnp.concatenate([hz_logit, lz_logit], axis=0)
    z_perp_logit = jnp.concatenate([hx_logit, lx_logit], axis=0)
    return hx_logit, hz_logit, x_perp_logit, z_perp_logit, (llrx, llry, llrz)


def _cal_prob(params, h_vn):
    """Per-qubit error probabilities p'_X, p'_Z from the embeddings — the
    "sine"-loss observable (gnn.py:317-332): sigmoid of the negated binary
    marginal LLRs."""
    emb = dense_bl(
        h_vn, params["llr_inv_embed"]["kernel"], params["llr_inv_embed"].get("bias")
    )
    llr_x, llr_z = quaternary_to_binary_llrs(emb[0], emb[1], emb[2])
    return jax.nn.sigmoid(-llr_x), jax.nn.sigmoid(-llr_z)


def make_logit_rowsets(graph: QuantumGraph):
    """RowSets for cal_logit: hx, hz, lx, lz rows (gnn.py:304-313).

    The QuantumGraph stores padded matrices; slice to true rows and point
    pad sentinels at the zero pad row ``graph.n``."""
    return (
        build_rowset(np.asarray(graph.hx)[: graph.gx.num_cn], vn_sentinel=graph.n),
        build_rowset(np.asarray(graph.hz)[: graph.gz.num_cn], vn_sentinel=graph.n),
        build_rowset(np.asarray(graph.lx)[: graph.lx_rows], vn_sentinel=graph.n),
        build_rowset(np.asarray(graph.lz)[: graph.lz_rows], vn_sentinel=graph.n),
    )


def gnn_bp4_apply(
    params,
    graph: QuantumGraph,
    lrowsets,
    syndrome_x,
    syndrome_z,
    cfg: GNNBP4Config,
    collect_logits: bool = False,
    axis_name=None,
):
    """Decode from syndromes alone.

    Returns (x_hat, z_hat, logit_stack) where logit_stack (when collected)
    is a list of (x_perp_logit, z_perp_logit) per iteration for the loss.
    """
    act = _act(cfg.activation)
    gx, gz = graph.gx, graph.gz
    b = syndrome_x.shape[-1]
    e = cfg.num_embed_dims

    def padc(x, rows):
        cur = x.shape[0]
        return x if cur == rows else jnp.pad(x, ((0, rows - cur), (0, 0)))

    syn_x_pm = 1.0 - 2.0 * padc(syndrome_x.astype(jnp.float32), gx.c_pad)
    syn_z_pm = 1.0 - 2.0 * padc(syndrome_z.astype(jnp.float32), gz.c_pad)

    h_vn = jnp.ones((e, gx.n_pad, b), jnp.float32)
    h_cn_x = jnp.zeros((e, gx.c_pad, b), jnp.float32)
    h_cn_z = jnp.zeros((e, gz.c_pad, b), jnp.float32)

    attrs = params.get("attributes") if cfg.use_attributes else None

    def cat_attr(feat, attr):
        # attributes are shared across the batch (gnn.py:585-588)
        if attrs is None:
            return feat
        a = jnp.broadcast_to(attr[..., None], attr.shape + (feat.shape[-1],))
        return jnp.concatenate([feat, a], axis=0)

    def update_cn(h_vn, h_cn_x, h_cn_z, hx_logit, hz_logit):
        # "from VN to CN": from = vn endpoint, to = cn endpoint (gnn.py:256)
        feat_x = cat_attr(_cn_slot_features(h_vn, h_cn_x, gx), attrs and attrs["cn_msg_x"])
        feat_z = cat_attr(_cn_slot_features(h_vn, h_cn_z, gz), attrs and attrs["cn_msg_z"])
        msg_x = _mlp(feat_x, params["cn_msg_mlp_x"], act)  # [m, dc, c_pad, B]
        msg_z = _mlp(feat_z, params["cn_msg_mlp_z"], act)
        m_x = _reduce_slots(msg_x, gx.cn_mask, gx.cn_deg, cfg.reduce_op)
        m_z = _reduce_slots(msg_z, gz.cn_mask, gz.cn_deg, cfg.reduce_op)
        m_x = cat_attr(m_x, attrs and attrs["cn_node_x"])  # gnn.py:597-601
        m_z = cat_attr(m_z, attrs and attrs["cn_node_z"])
        new_x = _mlp(
            jnp.concatenate([m_x, h_cn_x, hx_logit[None]], axis=0),
            params["cn_embed_mlp_x"],
            act,
        )
        new_z = _mlp(
            jnp.concatenate([m_z, h_cn_z, hz_logit[None]], axis=0),
            params["cn_embed_mlp_z"],
            act,
        )
        return new_x, new_z

    def update_vn(h_cn_x, h_cn_z, h_vn):
        feat_x = cat_attr(_vn_slot_features(h_cn_x, h_vn, gx), attrs and attrs["vn_msg_x"])
        feat_z = cat_attr(_vn_slot_features(h_cn_z, h_vn, gz), attrs and attrs["vn_msg_z"])
        msg_x = _mlp(feat_x, params["vn_msg_mlp_x"], act)  # [m, dv, n_pad, B]
        msg_z = _mlp(feat_z, params["vn_msg_mlp_z"], act)
        # syndrome-signed messages (gnn.py:733-737)
        msg_x = msg_x * syn_x_pm[gx.edge_cn_byslot][None]
        msg_z = msg_z * syn_z_pm[gz.edge_cn_byslot][None]
        m_x = _reduce_slots(msg_x, gx.vn_mask, gx.vn_deg, cfg.reduce_op, axis_name)
        m_z = _reduce_slots(msg_z, gz.vn_mask, gz.vn_deg, cfg.reduce_op, axis_name)
        # single VN node attribute, concatenated onto m_z only (gnn.py:748-750)
        m_z = cat_attr(m_z, attrs and attrs["vn_node"])
        return _mlp(
            jnp.concatenate([m_x, m_z, h_vn], axis=0), params["vn_embed_mlp"], act
        )

    # initial CN update with zero logits (gnn.py:400-401)
    h_cn_x, h_cn_z = update_cn(
        h_vn, h_cn_x, h_cn_z, jnp.zeros_like(syn_x_pm), jnp.zeros_like(syn_z_pm)
    )

    stack = [] if collect_logits else None
    llrs = None
    for i in range(cfg.num_iter):
        h_vn = update_vn(h_cn_x, h_cn_z, h_vn)
        hx_logit, hz_logit, x_perp, z_perp, llrs = _cal_logit(
            params, graph, lrowsets, h_vn
        )
        if collect_logits:
            if cfg.loss_type == "sine":
                stack.append(_cal_prob(params, h_vn))
            else:
                stack.append((x_perp, z_perp))
        if i == cfg.num_iter - 1:
            break
        h_cn_x, h_cn_z = update_cn(
            h_vn, h_cn_x, h_cn_z, hx_logit * syn_x_pm, hz_logit * syn_z_pm
        )

    x_hat, z_hat = hard_decision(*llrs)
    return x_hat, z_hat, stack


def gnn_bp4_loss(
    params,
    graph: QuantumGraph,
    lrowsets,
    cfg: GNNBP4Config,
    noise_x,
    noise_z,
    loss_from: int = 0,
):
    """Deep-supervision BCE over the per-iteration perp logits.

    Labels: x_perp rows are [hz; lz] — the hz block must reproduce
    1 - syndrome_z and the lz block 1 - (lz @ noise_x mod 2); analogously for
    z_perp (label flip as in feedback_gnn.py:431-432)."""
    from ..ops.gf2mat import mod2_matmul
    from ..train.loss import bce_with_logits

    # with loss_type='sine' the collected stack holds [n_pad, B]
    # probabilities, not perp-row logits — the BCE below would mismatch
    assert cfg.loss_type == "boxplus-phi", (
        f"gnn_bp4_loss requires loss_type='boxplus-phi' (per-iteration perp "
        f"logits); got {cfg.loss_type!r}"
    )

    # pad noise to the aligned layout
    n, n_pad = graph.n, graph.gx.n_pad
    noise_x = jnp.pad(noise_x.astype(jnp.int32), ((0, n_pad - noise_x.shape[0]), (0, 0)))
    noise_z = jnp.pad(noise_z.astype(jnp.int32), ((0, n_pad - noise_z.shape[0]), (0, 0)))

    hx = jnp.asarray(graph.hx)
    hz = jnp.asarray(graph.hz)
    syndrome_x = mod2_matmul(hx, noise_z)  # [cx_pad, B]
    syndrome_z = mod2_matmul(hz, noise_x)
    rows_hx, rows_hz, rows_lx, rows_lz = lrowsets
    # logical syndromes, padded to the rowsets' aligned row counts
    lsz = mod2_matmul(jnp.asarray(graph.lz)[: rows_lz.r_pad], noise_x)
    lsx = mod2_matmul(jnp.asarray(graph.lx)[: rows_lx.r_pad], noise_z)

    gt_x = 1.0 - jnp.concatenate(
        [syndrome_z[: rows_hz.r_pad], lsz], axis=0
    ).astype(jnp.float32)
    gt_z = 1.0 - jnp.concatenate(
        [syndrome_x[: rows_hx.r_pad], lsx], axis=0
    ).astype(jnp.float32)
    rv_x = jnp.concatenate([jnp.asarray(rows_hz.row_valid), jnp.asarray(rows_lz.row_valid)])
    rv_z = jnp.concatenate([jnp.asarray(rows_hx.row_valid), jnp.asarray(rows_lx.row_valid)])

    _, _, stack = gnn_bp4_apply(
        params, graph, lrowsets, syndrome_x, syndrome_z, cfg, collect_logits=True
    )
    loss = 0.0
    for i in range(loss_from, cfg.num_iter):
        x_perp, z_perp = stack[i]
        loss = (
            loss
            + bce_with_logits(gt_x, x_perp, rv_x)
            + bce_with_logits(gt_z, z_perp, rv_z)
        )
    return loss
