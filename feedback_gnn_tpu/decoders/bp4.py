"""Quaternary (GF(4)) syndrome belief propagation, TPU-native.

Functional re-design of the reference ``QLDPCBPDecoder``
(/root/reference/sionna/fec/ldpc/decoding_q.py:14-797):

* two scalar message sets — ``msg_x`` on Hx edges (beliefs about the
  Z-component of the error) and ``msg_z`` on Hz edges (about X);
* the VN update couples the two graphs through Y in stable log-space
  (decoding_q.py:244-273);
* CN updates are boxplus / boxplus-phi / minsum with the syndrome sign
  folded into the node product (decoding_q.py:313-644);
* per-iteration check-satisfaction logits for the deep-supervision loss
  (decoding_q.py:433-471, 743-746);
* hard decision argmin over (I, X, Z, Y) marginals (decoding_q.py:786-790).

The iteration is a single ``lax.scan`` over aligned slot-major messages
``[max_deg, n_pad, B]`` (see codes/graph.py): per-node reductions are
leading-axis sums and the VN<->CN permutation is one relayout-free flat
gather each way — XLA compiles the loop body without a single layout copy.

PADDED CONVENTION: all returned tensors keep the aligned padded shapes
([n_pad, B] marginals / hard decisions with zero pad rows, [r_pad, B]
logits).  Slice ``[:graph.n]`` / ``[:rowset.num_rows]`` for true shapes.
Inputs may be padded or true-shaped; they are padded on entry.

``axis_name`` makes the same code run CN/edge-partitioned across a mesh
axis under shard_map (per-VN sums psum).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..codes.graph import QuantumGraph
from .cn_update import CN_UPDATES, boxplus_rows, cn_update_phi
from .graph_ops import expand_vn, gather_to_cn, scatter_from_cn, vn_sum

__all__ = ["BP4Result", "bp4_decode", "quaternary_to_binary_llrs", "hard_decision"]


class BP4Result(NamedTuple):
    llrx: jnp.ndarray  # [n_pad, B] marginal LLR of an X flip (pad rows 0)
    llry: jnp.ndarray
    llrz: jnp.ndarray
    x_hat: jnp.ndarray  # [n_pad, B] int32 hard decision (pad rows 0)
    z_hat: jnp.ndarray
    x_logit: jnp.ndarray  # [r_pad, B] check logits over pcm_x_perp rows
    z_logit: jnp.ndarray
    logit_stack: tuple | None  # (xs, zs) [num_iter+1, r_pad, B] each


def _logsumexp2(a, b):
    """logsumexp over two tensors, matching tf.reduce_logsumexp on a stacked
    last axis (decoding_q.py:266)."""
    mx = jnp.maximum(a, b)
    mx = jnp.where(jnp.isfinite(mx), mx, 0.0)
    return mx + jnp.log(jnp.exp(a - mx) + jnp.exp(b - mx))


def _pad_rows_to(x, rows):
    """Pad axis -2 with zeros up to ``rows`` (no-op if already padded)."""
    cur = x.shape[-2]
    if cur == rows:
        return x
    assert cur < rows, (cur, rows)
    pad = [(0, 0)] * x.ndim
    pad[-2] = (0, rows - cur)
    return jnp.pad(x, pad)


def _vn_update(msg_x, msg_z, llr_ch, graph: QuantumGraph, axis_name=None):
    """Coupled VN update (decoding_q.py:227-275).

    Returns (new_msg_x, new_msg_z, llrx, llry, llrz); llr* are [n_pad, B].
    """
    llrx_ch, llry_ch, llrz_ch = llr_ch[0], llr_ch[1], llr_ch[2]

    s_z = vn_sum(msg_z, graph.gz, axis_name)  # contributes to X belief
    s_x = vn_sum(msg_x, graph.gx, axis_name)  # contributes to Z belief
    llry = s_x + s_z + llry_ch
    llrx = s_z + llrx_ch
    llrz = s_x + llrz_ch

    # extrinsic per-edge messages, Hx side (msg about Z / Y components)
    llrz_hx = expand_vn(llrz, graph.gx) - msg_x
    llry_hx = expand_vn(llry, graph.gx) - msg_x
    num_hx = jax.nn.softplus(-llrx)  # [n_pad, B]
    new_msg_x = expand_vn(num_hx, graph.gx) - _logsumexp2(-llrz_hx, -llry_hx)

    # Hz side
    llrx_hz = expand_vn(llrx, graph.gz) - msg_z
    llry_hz = expand_vn(llry, graph.gz) - msg_z
    num_hz = jax.nn.softplus(-llrz)
    new_msg_z = expand_vn(num_hz, graph.gz) - _logsumexp2(-llrx_hz, -llry_hz)

    return new_msg_x, new_msg_z, llrx, llry, llrz


def quaternary_to_binary_llrs(llrx, llry, llrz):
    """Binary LLRs from quaternary marginals (decoding_q.py:455-464):
    llr_z = log((pI+pX)/(pZ+pY)), llr_x = log((pI+pZ)/(pX+pY)).

    NOTE: zero pad rows map to llr = log2 - log2 = 0, preserving the
    zero-pad invariant."""
    llr_z = jax.nn.softplus(-llrx) - _logsumexp2(-llrz, -llry)
    llr_x = jax.nn.softplus(-llrz) - _logsumexp2(-llrx, -llry)
    return llr_x, llr_z


def _cal_logit(llrx, llry, llrz, graph: QuantumGraph, phi_impl=None):
    """Check-satisfaction logits over pcm_x_perp / pcm_z_perp rows
    (decoding_q.py:455-471)."""
    llr_x, llr_z = quaternary_to_binary_llrs(llrx, llry, llrz)
    x_logit = boxplus_rows(llr_x, graph.logit_rows_x, phi_impl)
    z_logit = boxplus_rows(llr_z, graph.logit_rows_z, phi_impl)
    return x_logit, z_logit


def hard_decision(llrx, llry, llrz):
    """argmin over (0, llrx, llrz, llry) -> Pauli in {I,X,Z,Y}
    (decoding_q.py:786-790).  Returns int32 (x_hat, z_hat); zero rows give
    decision I -> (0, 0), preserving pad invariants."""
    stacked = jnp.stack([jnp.zeros_like(llrx), llrx, llrz, llry], axis=0)
    decision = jnp.argmin(stacked, axis=0).astype(jnp.int32)
    x_hat = decision & 1
    z_hat = decision >> 1
    return x_hat, z_hat


def bp4_decode(
    graph: QuantumGraph,
    llr_ch,
    syndrome_x,
    syndrome_z,
    num_iter: int,
    cn_type: str = "boxplus-phi",
    normalization_factor: float = 1.0,
    collect_logits: bool = False,
    axis_name: str | None = None,
    phi_impl: str | None = None,
) -> BP4Result:
    """Run ``num_iter`` BP4 iterations.

    Args:
      llr_ch: [3, n, B] or [3, n_pad, B] channel LLRs in (x, y, z) order
        (pad rows, if present, must be zero).
      syndrome_x / syndrome_z: [mx(,pad), B] / [mz(,pad), B] in {0, 1}.
      collect_logits: also return the per-iteration logit stack used by the
        deep-supervision training loss (stage_two mode of the reference).
      axis_name: mesh axis for CN/edge-partitioned execution under shard_map.
      phi_impl: explicit phi formulation for boxplus-phi CN updates and the
        check-satisfaction logits (None = cn_update module default).  Used
        by the formulation-ensemble rescue stage so the alternate
        formulation is a function argument, not trace-time global state.
    """
    if cn_type == "boxplus-phi":
        def cn_update(msg, syn_pm, mask):
            return cn_update_phi(msg, syn_pm, mask, phi_impl)
    else:
        cn_update = CN_UPDATES[cn_type]
    gx, gz = graph.gx, graph.gz
    b = llr_ch.shape[-1]

    llr_ch = _pad_rows_to(llr_ch.astype(jnp.float32), gx.n_pad)
    syndrome_x = _pad_rows_to(syndrome_x.astype(jnp.float32), gx.c_pad)
    syndrome_z = _pad_rows_to(syndrome_z.astype(jnp.float32), gz.c_pad)
    syn_x_pm = 1.0 - 2.0 * syndrome_x
    syn_z_pm = 1.0 - 2.0 * syndrome_z

    cn_mask_x = jnp.asarray(gx.cn_mask)
    cn_mask_z = jnp.asarray(gz.cn_mask)

    def step(carry, _):
        msg_x, msg_z = carry
        new_msg_x, new_msg_z, llrx, llry, llrz = _vn_update(
            msg_x, msg_z, llr_ch, graph, axis_name
        )
        ys = None
        if collect_logits:
            ys = _cal_logit(llrx, llry, llrz, graph, phi_impl)

        mcx = gather_to_cn(new_msg_x, gx)
        mcx = cn_update(mcx, syn_x_pm, cn_mask_x) * normalization_factor
        msg_x = scatter_from_cn(mcx, gx)

        mcz = gather_to_cn(new_msg_z, gz)
        mcz = cn_update(mcz, syn_z_pm, cn_mask_z) * normalization_factor
        msg_z = scatter_from_cn(mcz, gz)

        return (msg_x, msg_z), ys

    # zero initial messages carrying the joined varying-manual-axes of the
    # inputs so scan carries type-check under shard_map(check_vma=True)
    vma_seed = 0.0 * (jnp.sum(llr_ch) + jnp.sum(syn_x_pm) + jnp.sum(syn_z_pm))
    msg0 = (
        jnp.zeros((gx.max_vn_deg, gx.n_pad, b), jnp.float32) + vma_seed,
        jnp.zeros((gz.max_vn_deg, gz.n_pad, b), jnp.float32) + vma_seed,
    )
    (msg_x, msg_z), stack = jax.lax.scan(step, msg0, None, length=num_iter)

    # final marginalisation (sum_only) + final logits
    s_z = vn_sum(msg_z, gz, axis_name)
    s_x = vn_sum(msg_x, gx, axis_name)
    llrx = s_z + llr_ch[0]
    llry = s_x + s_z + llr_ch[1]
    llrz = s_x + llr_ch[2]
    x_logit, z_logit = _cal_logit(llrx, llry, llrz, graph, phi_impl)

    logit_stack = None
    if collect_logits:
        # [num_iter+1, ...]: per-iteration logits plus the final ones, in the
        # reference's TensorArray order (iteration it at slot it, final at
        # slot num_iter).
        xs, zs = stack
        logit_stack = (
            jnp.concatenate([xs, x_logit[None]], axis=0),
            jnp.concatenate([zs, z_logit[None]], axis=0),
        )

    x_hat, z_hat = hard_decision(llrx, llry, llrz)
    return BP4Result(llrx, llry, llrz, x_hat, z_hat, x_logit, z_logit, logit_stack)
