"""System models (L4 of SURVEY.md §1): end-to-end Monte-Carlo step functions
composing channels + decoders + error accounting, mirroring the reference's
tf.keras.Model classes as pure jittable functions.

All return ``(flagged_count, logical_count)`` int32 scalars (device-side
accounting; see sim.montecarlo.sim_ler) or full syndome tensors with
``return_full=True`` where noted.

Reference counterparts:
  bp2_bsc_eval_step      <- BP_BSC_Model          (feedback_gnn.py:190-229)
  bp4_plain_eval_step    <- Sandwich model, nG=0  (feedback_gnn.py:232)
  bp4_osd_eval_step      <- BP4_OSD_Model         (bp_osd.py:80-191)
  bp2_osd_eval_step      <- BP2_OSD_Model         (bp_osd.py:194-270)
  sandwich_eval_step     <- Sandwich_BP_GNN_Evaluation_Model (see
                            decoders/cascade.py)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .channels.bsc import bsc_sample
from .channels.pauli import depolarizing_probs, pauli_iid
from .codes.graph import TannerGraph
from .decoders.bp2 import bp2_decode
from .decoders.bp4 import bp4_decode
from .decoders.cascade import prior_llr, sandwich_eval_step  # noqa: F401
from .decoders.osd import bp_osd_correct, osd0_decode
from .ops.gf2mat import mod2_matmul

__all__ = [
    "bp2_bsc_eval_step",
    "bp4_plain_eval_step",
    "bp4_osd_eval_step",
    "bp2_osd_eval_step",
    "sandwich_eval_step",
    "gnn_bp4_eval_step",
]


def _counts(s_hat, ls_hat, accounting: str = "all"):
    """Per-batch error counts.

    accounting="all": a block is a logical error when any logical-syndrome
    row is nonzero — the convention of sim_ber's qldpc mode
    (misc.py:647-654), where ls_hat covers the full perp rowset so every
    non-converged sample also counts.  Used by every headline table.

    accounting="undetected": count only syndrome-consistent outputs that
    flip a logical (s_hat == 0 AND ls_hat != 0).  This is the convention
    behind the plain-BP markdown tables of OSD.ipynb cells 7-8: their
    published plain-BP4 NMS value (2.8e-4 @ p=0.10) is *below* the same
    decoder's BP+OSD result (3.70e-4), which is impossible when flagged
    (non-converged) samples count as logical errors — the tables report
    undetected logical errors over all blocks.
    """
    fl = jnp.any(s_hat != 0, axis=0)
    lg = jnp.any(ls_hat != 0, axis=0)
    if accounting == "undetected":
        lg = jnp.logical_and(jnp.logical_not(fl), lg)
    else:
        assert accounting == "all", accounting
    return jnp.sum(fl.astype(jnp.int32)), jnp.sum(lg.astype(jnp.int32))


def bp2_bsc_eval_step(
    pcm_graph: TannerGraph,
    pcm,
    logical_pcm,
    key,
    p,
    batch: int,
    num_iter: int = 100,
    cn_type: str = "minsum",
    normalization_factor: float = 0.8,
    p0=None,
    qc_spec=None,
    accounting: str = "all",
):
    """Binary syndrome BP over a BSC with logical-operator check
    (BP_BSC_Model, feedback_gnn.py:190-229).  ``pcm`` is one of hx/hz (the
    decoding graph), ``logical_pcm`` the orthogonal complement used for the
    logical check.  ``qc_spec`` (codes.qc.QCGraphSpec of ``pcm``) switches
    to the fused Pallas BP2 kernel.  ``accounting``: see ``_counts``."""
    pcm = jnp.asarray(pcm, jnp.float32)
    logical_pcm = jnp.asarray(logical_pcm, jnp.float32)
    n = pcm.shape[1]

    noise = bsc_sample(key, p, (n, batch)).astype(jnp.int32)  # [n, B]
    p_prior = p if p0 is None else p0
    llr_const = -jnp.log((1.0 - p_prior) / p_prior)
    llr_true = jnp.full((n, batch), llr_const, jnp.float32)
    syndrome = mod2_matmul(pcm, noise)

    if qc_spec is not None:
        from .decoders.bp2_qc import bp2_qc_logits

        logits = bp2_qc_logits(
            qc_spec, llr_true, syndrome[: qc_spec.mb * qc_spec.l], num_iter,
            cn_type, normalization_factor,
        )
        noise_hat = (logits > 0.0).astype(jnp.int32)
    else:
        # zero pad rows (aligned-layout invariant)
        llr = jnp.pad(llr_true, ((0, pcm_graph.n_pad - n), (0, 0)))
        res = bp2_decode(
            pcm_graph, llr, syndrome, num_iter, cn_type, normalization_factor
        )
        noise_hat = res.hard[:n]  # [n, B]

    diff = jnp.bitwise_xor(noise, noise_hat)
    s_hat = mod2_matmul(pcm, diff)
    ls_hat = mod2_matmul(logical_pcm, diff)
    return _counts(s_hat, ls_hat, accounting)


def bp4_plain_eval_step(
    graph,
    key,
    p,
    batch: int,
    num_iter: int = 64,
    cn_type: str = "boxplus-phi",
    normalization_factor: float = 1.0,
    p0=None,
    accounting: str = "all",
):
    """Plain BP4 evaluation over the depolarizing channel (the OSD.ipynb
    "plain BP4" rows; those markdown tables use accounting="undetected" —
    see ``_counts``)."""
    n = graph.n
    px, py, pz = depolarizing_probs(p)
    noise_x, noise_z = pauli_iid(key, px, py, pz, n, batch)
    noise_x = jnp.pad(noise_x.astype(jnp.int32), ((0, graph.n_pad - n), (0, 0)))
    noise_z = jnp.pad(noise_z.astype(jnp.int32), ((0, graph.n_pad - n), (0, 0)))
    hx = jnp.asarray(graph.hx)
    hz = jnp.asarray(graph.hz)
    syndrome_x = mod2_matmul(hx, noise_z)
    syndrome_z = mod2_matmul(hz, noise_x)
    p_prior = p if p0 is None else p0
    llr0 = prior_llr(p_prior, n, batch, n_pad=graph.n_pad)

    res = bp4_decode(
        graph, llr0, syndrome_x, syndrome_z, num_iter, cn_type, normalization_factor
    )
    x_diff = jnp.bitwise_xor(noise_x, res.x_hat)
    z_diff = jnp.bitwise_xor(noise_z, res.z_hat)
    s_hat = jnp.concatenate([mod2_matmul(hz, x_diff), mod2_matmul(hx, z_diff)], axis=0)
    ls_hat = jnp.concatenate(
        [
            mod2_matmul(jnp.asarray(graph.hx_perp), x_diff),
            mod2_matmul(jnp.asarray(graph.hz_perp), z_diff),
        ],
        axis=0,
    )
    return _counts(s_hat, ls_hat, accounting)


def bp4_osd_eval_step(
    graph,
    code,
    key,
    p,
    batch: int,
    num_iter: int = 100,
    cn_type: str = "minsum",
    normalization_factor: float = 0.8,
    osd_compact_cap: int | None = None,
):
    """BP4 + OSD-0 fallback over the depolarizing channel (BP4_OSD_Model,
    bp_osd.py:80-191).  Logical check uses lx/lz as the reference does
    (bp_osd.py:184-187).  Fully static shapes: OSD runs on the whole batch
    (or, with ``osd_compact_cap``, on a dense flagged-only sub-batch — the
    static-shape equivalent of the reference's host round-trip) and the
    flagged mask selects per sample."""
    n = graph.n
    px, py, pz = depolarizing_probs(p)
    noise_x, noise_z = pauli_iid(key, px, py, pz, n, batch)
    noise_x = jnp.pad(noise_x.astype(jnp.int32), ((0, graph.n_pad - n), (0, 0)))
    noise_z = jnp.pad(noise_z.astype(jnp.int32), ((0, graph.n_pad - n), (0, 0)))
    hx = jnp.asarray(graph.hx)
    hz = jnp.asarray(graph.hz)
    syndrome_x = mod2_matmul(hx, noise_z)
    syndrome_z = mod2_matmul(hz, noise_x)
    llr0 = prior_llr(p, n, batch, n_pad=graph.n_pad)

    res = bp4_decode(
        graph, llr0, syndrome_x, syndrome_z, num_iter, cn_type, normalization_factor
    )
    x_hat, z_hat, flagged, osd_overflow = bp_osd_correct(
        graph,
        res,
        noise_x,
        noise_z,
        code.pivot_hx,
        code.pivot_hz,
        code.hx_basis,
        code.hz_basis,
        compact_cap=osd_compact_cap,
    )
    x_diff = jnp.bitwise_xor(noise_x.astype(jnp.int32), x_hat)
    z_diff = jnp.bitwise_xor(noise_z.astype(jnp.int32), z_hat)
    ls_hat = jnp.concatenate(
        [
            mod2_matmul(jnp.asarray(graph.lz), x_diff),
            mod2_matmul(jnp.asarray(graph.lx), z_diff),
        ],
        axis=0,
    )
    logical = jnp.sum(jnp.any(ls_hat != 0, axis=0).astype(jnp.int32))
    # first output = count of BP-flagged samples routed to OSD (a free
    # diagnostic; the reference zeroes its s_hat — bp_osd.py:189 — so its
    # "flagged" column is always 0.  LER semantics are identical either way.)
    # With compaction, a third output reports flagged samples beyond the
    # OSD capacity (reference-inequivalent if nonzero; sim_ler warns).
    if osd_compact_cap is not None:
        return jnp.sum(flagged.astype(jnp.int32)), logical, osd_overflow
    return jnp.sum(flagged.astype(jnp.int32)), logical


def bp2_osd_eval_step(
    pcm_graph: TannerGraph,
    pcm,
    pcm_basis,
    pivot_pcm,
    logical_pcm,
    key,
    p,
    batch: int,
    num_iter: int = 100,
    cn_type: str = "minsum",
    normalization_factor: float = 0.8,
    osd_compact_cap: int | None = None,
):
    """BP2 + OSD-0 over a BSC (BP2_OSD_Model, bp_osd.py:194-270).

    ``osd_compact_cap`` gathers the BP-flagged samples into a dense
    sub-batch before the (rank-sequential, expensive) OSD solve — same
    fail-safe semantics as ``bp_osd_correct``: overflow samples keep their
    BP estimate.  The BP2 flagged rate is a few percent at the reference's
    operating points, so this is a ~20-40x OSD speedup."""
    pcm = jnp.asarray(pcm, jnp.float32)
    logical_pcm = jnp.asarray(logical_pcm, jnp.float32)
    n = pcm.shape[1]

    noise = bsc_sample(key, p, (n, batch)).astype(jnp.int32)
    llr_const = -jnp.log((1.0 - p) / p)
    llr = jnp.pad(
        jnp.full((n, batch), llr_const, jnp.float32),
        ((0, pcm_graph.n_pad - n), (0, 0)),
    )
    syndrome = mod2_matmul(pcm, noise)

    res = bp2_decode(pcm_graph, llr, syndrome, num_iter, cn_type, normalization_factor)
    noise_hat = res.hard[:n]

    diff = jnp.bitwise_xor(noise, noise_hat)
    flagged = jnp.any(mod2_matmul(pcm, diff) != 0, axis=0)

    # OSD on the soft output: llr_hat = -logits (bp_osd.py:224-236)
    osd_llr = -res.logits[:n]  # [n, B], "true llr" convention
    reduced_s = syndrome[jnp.asarray(pivot_pcm)]
    osd_overflow = jnp.int32(0)
    if osd_compact_cap is not None:
        b = flagged.shape[0]
        cap = min(b, int(osd_compact_cap))
        order = jnp.argsort(jnp.logical_not(flagged), stable=True)
        idx = order[:cap]
        valid = flagged[idx]
        osd_sub = osd0_decode(
            osd_llr.T[idx], jnp.asarray(pcm_basis), reduced_s[:, idx]
        ).T  # [n, cap]
        upd = jnp.where(valid[None, :], osd_sub, noise_hat[:, idx])
        noise_final = noise_hat.at[:, idx].set(upd)
        osd_overflow = jnp.sum(flagged.astype(jnp.int32)) - jnp.sum(
            valid.astype(jnp.int32)
        )
    else:
        noise_hat_osd = osd0_decode(osd_llr.T, jnp.asarray(pcm_basis), reduced_s).T
        noise_final = jnp.where(flagged[None, :], noise_hat_osd, noise_hat)
    diff = jnp.bitwise_xor(noise, noise_final)
    ls_hat = mod2_matmul(logical_pcm, diff)
    logical = jnp.sum(jnp.any(ls_hat != 0, axis=0).astype(jnp.int32))
    # BP-flagged count routed to OSD (diagnostic; reference zeroes it);
    # with compaction, also the beyond-capacity count (see bp4 variant)
    if osd_compact_cap is not None:
        return jnp.sum(flagged.astype(jnp.int32)), logical, osd_overflow
    return jnp.sum(flagged.astype(jnp.int32)), logical


def gnn_bp4_eval_step(
    graph,
    lrowsets,
    params,
    cfg,
    key,
    p,
    batch: int,
    wt: int | None = None,
):
    """Monte-Carlo evaluation of the fully-learned GNN decoder (GNN_BP4,
    gnn.py:71-423; results not in the paper per README.md:46 — the
    reference ships no eval entry point, so the protocol here mirrors the
    other system models: depolarizing channel -> syndromes -> decode ->
    flagged/logical counts).  ``lrowsets`` from
    decoders.gnn_full.make_logit_rowsets."""
    from .channels.pauli import pauli_fixed_weight
    from .decoders.gnn_full import gnn_bp4_apply

    n, n_pad = graph.n, graph.n_pad
    if wt is not None:
        noise_x, noise_z = pauli_fixed_weight(key, wt, n, batch)
    else:
        px, py, pz = depolarizing_probs(p)
        noise_x, noise_z = pauli_iid(key, px, py, pz, n, batch)
    noise_x = jnp.pad(noise_x.astype(jnp.int32), ((0, n_pad - n), (0, 0)))
    noise_z = jnp.pad(noise_z.astype(jnp.int32), ((0, n_pad - n), (0, 0)))
    hx = jnp.asarray(graph.hx)
    hz = jnp.asarray(graph.hz)
    syndrome_x = mod2_matmul(hx, noise_z)
    syndrome_z = mod2_matmul(hz, noise_x)

    x_hat, z_hat, _ = gnn_bp4_apply(
        params, graph, lrowsets, syndrome_x, syndrome_z, cfg
    )
    x_diff = jnp.bitwise_xor(noise_x, x_hat)
    z_diff = jnp.bitwise_xor(noise_z, z_hat)
    s_hat = jnp.concatenate(
        [mod2_matmul(hz, x_diff), mod2_matmul(hx, z_diff)], axis=0
    )
    ls_hat = jnp.concatenate(
        [
            mod2_matmul(jnp.asarray(graph.hx_perp), x_diff),
            mod2_matmul(jnp.asarray(graph.hz_perp), z_diff),
        ],
        axis=0,
    )
    return _counts(s_hat, ls_hat)
