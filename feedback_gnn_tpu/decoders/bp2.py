"""Binary syndrome belief propagation, TPU-native (aligned layout).

Functional re-design of the reference ``LDPCBPDecoder`` in syndrome mode
(/root/reference/sionna/fec/ldpc/decoding.py:15-1048):

* input is a logit tensor (positive = bit 1); internally negated into "true"
  LLRs, clipped to +-20, exactly as decoding.py:918-940;
* flooding VN update (extrinsic sum, decoding.py:511-535) and CN update with
  the syndrome sign multiplied into the node product
  (decoding.py:595-596/657-659/767-768);
* output is the marginal logit (negated back, decoding.py:1031), optionally
  hard-decided via ``0 < logit`` (decoding.py:1034).

Messages are slot-major aligned ``[dv, n_pad, B]`` (codes/graph.py); the
iteration is a ``lax.scan``.  Outputs keep the padded [n_pad, B] shape
(zero/0-logit pad rows); slice [:n] for true shapes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..codes.graph import TannerGraph
from .cn_update import CN_UPDATES, LLR_MAX
from .graph_ops import expand_vn, gather_to_cn, scatter_from_cn, vn_sum

__all__ = ["BP2Result", "bp2_decode"]


class BP2Result(NamedTuple):
    logits: jnp.ndarray  # [n_pad, B] marginal logits (pad rows 0)
    hard: jnp.ndarray  # [n_pad, B] int32 hard decisions (pad rows 0)
    # EXIT trajectories [num_iter+1] (slot 0 = 0), only when track_exit=True
    ie_v: jnp.ndarray | None = None
    ie_c: jnp.ndarray | None = None


def _pad_rows_to(x, rows):
    cur = x.shape[-2]
    if cur == rows:
        return x
    pad = [(0, 0)] * x.ndim
    pad[-2] = (0, rows - cur)
    return jnp.pad(x, pad)


def bp2_decode(
    graph: TannerGraph,
    llr_ch,
    syndrome,
    num_iter: int,
    cn_type: str = "boxplus-phi",
    normalization_factor: float = 1.0,
    axis_name: str | None = None,
    edge_weights=None,
    track_exit: bool = False,
) -> BP2Result:
    """Run ``num_iter`` binary syndrome-BP iterations.

    Args:
      llr_ch: [n(,pad), B] channel logits (positive = bit 1 likely).
      syndrome: [num_cn(,pad), B] in {0, 1}, or None for classical
        (non-syndrome) decoding — the reference's ``is_syndrome=False``
        default (decoding.py:906-908 skipped, CN sign product unmodified).
      edge_weights: optional [dv, n_pad] per-edge weights multiplied onto
        outgoing VN messages — weighted BP (decoding.py:360-366, 852-858);
        initialise to ones and train through this argument.
      track_exit: record the EXIT decoding trajectory — the Hagenauer MI
        approximation of the VN- and CN-phase messages per iteration
        (decoding.py:955-1000; assumes all-zero-codeword symmetry).
    """
    from ..sim.metrics import llr2mi

    cn_update = CN_UPDATES[cn_type]
    b = llr_ch.shape[-1]

    llr = jnp.clip(llr_ch.astype(jnp.float32), -LLR_MAX, LLR_MAX)
    llr = -_pad_rows_to(llr, graph.n_pad)  # logits -> "true" llrs (decoding.py:940)
    if syndrome is None:  # classical decoding: neutral +1 sign everywhere
        syn_pm = jnp.ones((graph.c_pad, b), jnp.float32)
    else:
        syn_pm = 1.0 - 2.0 * _pad_rows_to(syndrome.astype(jnp.float32), graph.c_pad)
    cn_mask = jnp.asarray(graph.cn_mask)
    vn_mask = jnp.asarray(graph.vn_mask)
    if edge_weights is not None:
        edge_weights = jnp.asarray(edge_weights, jnp.float32)[:, :, None]

    def step(msg, _):
        # extrinsic VN update
        total = vn_sum(msg, graph, axis_name) + llr  # [n_pad, B]
        msg_v = expand_vn(total, graph) - msg  # [dv, n_pad, B]
        mi_v = llr2mi(-msg_v, weight=vn_mask[:, :, None]) if track_exit else None
        if edge_weights is not None:  # weighted BP (decoding.py:852-858)
            msg_v = msg_v * edge_weights
        # CN update with syndrome sign
        mc = gather_to_cn(msg_v, graph)
        mc = cn_update(mc, syn_pm, cn_mask) * normalization_factor
        mi_c = llr2mi(-mc, weight=cn_mask[:, :, None]) if track_exit else None
        ys = (mi_v, mi_c) if track_exit else None
        return scatter_from_cn(mc, graph), ys

    vma_seed = 0.0 * (jnp.sum(llr) + jnp.sum(syn_pm))
    msg0 = jnp.zeros((graph.max_vn_deg, graph.n_pad, b), jnp.float32) + vma_seed
    msg, traj = jax.lax.scan(step, msg0, None, length=num_iter)

    marg = llr + vn_sum(msg, graph, axis_name)
    logits = -marg  # back to logit convention (decoding.py:1031)
    hard = (logits > 0.0).astype(jnp.int32)
    ie_v = ie_c = None
    if track_exit:
        # reference stores iteration it at slot it (1-based), slot 0 stays 0
        zero = jnp.zeros((1,), jnp.float32)
        ie_v = jnp.concatenate([zero, traj[0]])
        ie_c = jnp.concatenate([zero, traj[1]])
    return BP2Result(logits, hard, ie_v, ie_c)
