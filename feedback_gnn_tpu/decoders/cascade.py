"""Sandwich BP -> (GNN -> BP)^nG cascade: the paper's flagship decoder.

Functional re-design of ``Sandwich_BP_GNN_Evaluation_Model``
(/root/reference/sionna/fec/ldpc/feedback_gnn.py:232-361): stage-1 BP4, then
nG rounds of {recompute syndrome of the current estimate, track still-flagged
samples, feedback-GNN, BP4-16, masked update of still-flagged samples},
then flagged + logical syndrome computation.

Everything runs in one XLA program with static shapes; the per-round masked
update replaces the reference's tensor_scatter_nd_update with a jnp.where.
Batch-last layout throughout; ``axis_name`` threads through to the VN
reductions for edge-partitioned execution.

The reference swaps logit argument names when calling the GNN
(feedback_gnn.py:335: ``feedback((h_vn, logit_hz_perp, logit_hx_perp, ...))``
where ``logit_hz_perp`` is the decoder's z_logit = per-Hx-row logits in
stage mode).  Here we keep the semantic names: the GNN's ``logit_hx`` is the
per-Hx-row logit (z_logit of bp4) and ``logit_hz`` is the per-Hz-row logit
(x_logit).
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..channels.pauli import depolarizing_probs, pauli_fixed_weight, pauli_iid
from ..codes.graph import QuantumGraph
from ..ops.gf2mat import mod2_matmul
from . import cn_update
from .bp4 import bp4_decode
from .gnn_feedback import feedback_gnn_apply

__all__ = ["CascadeConfig", "sandwich_decode", "sandwich_eval_step", "prior_llr"]


@dataclass(frozen=True)
class CascadeConfig:
    """Decoder schedule for the cascade (n882.py:56-65)."""

    num_iter1: int = 64
    num_iter2: int = 16
    factor1: float = 1.0
    factor2: float = 1.0
    cn_type: str = "boxplus-phi"
    num_rounds: int = 3  # nG
    p0: float = 0.05  # prior used for the uniform llr init
    qc_batch_tile: int = 128  # Pallas kernel batch tile (QC backend only)
    # storage dtype of the kernel's iteration-carried message state
    # ("float32" | "bfloat16"); bfloat16 is a measured VMEM/accuracy trade
    # for the perf study — the parity-validated production path is float32
    qc_msg_dtype: str = "float32"
    # Flagged-sample compaction: after stage-1 BP, gather the still-flagged
    # samples (the only ones the GNN rounds can change — the reference
    # masks updates to exactly this set, feedback_gnn.py:324-340) into a
    # dense sub-batch of size ceil(fraction * B) and run all nG rounds on
    # it.  Per-sample results are IDENTICAL to the uncompacted cascade as
    # long as the capacity covers every flagged sample (stage-1 flagged
    # rates: ~3 % at p=0.05, ~12 % at p=0.08, ~25 % at p=0.10 on n1270);
    # overflow samples keep their stage-1 estimate (counted flagged).
    # None = off.  Requires axis_name None.
    compact_fraction: float | None = None
    # Adaptive stage 1: run only ``stage1_prepass`` BP iterations on the
    # full batch, then re-run the FULL num_iter1 schedule (from the same
    # prior — BP is deterministic, so flagged samples get the exact
    # reference result) only on the samples still flagged after the
    # prepass.  Samples that converged early keep their (syndrome-
    # consistent) prepass estimate; the only behavioural deviation is a
    # sample whose estimate would drift to a DIFFERENT valid correction
    # between the prepass and iteration num_iter1 — statistically
    # negligible (validated vs the reference BLER table).  Requires
    # compact_fraction.  None = off.
    #
    # SIZING RULE: compact_fraction must exceed the flagged rate after
    # ``stage1_prepass`` iterations at the operating p (NOT the post-64
    # rate) — e.g. ~4 % at p=0.05 but >50 % at p=0.10 for n1270 with a
    # 12-iteration prepass.  Undersizing FAILS SAFE: overflow samples keep
    # their prepass estimate and are counted flagged, so the reported
    # error rate can only be pessimistic, never optimistic (measured:
    # prepass=12/compact=0.5 at p=0.10 reports LER 0.22 vs the true
    # 2.1e-4).  Use prepass only in the low-p regime it is meant for.
    stage1_prepass: int | None = None
    # Second compaction level: size of the sub-batch the nG GNN rounds run
    # on, as a fraction of the FULL batch.  Sized by the flagged rate after
    # the full stage-1 schedule (~2.8 % at p=0.05 on n1270), i.e. smaller
    # than compact_fraction (which must cover flagged@prepass).  Same
    # fail-safe overflow semantics.  None = rounds run on the first-level
    # subset.
    round_fraction: float | None = None
    # Formulation-ensemble rescue: after the full cascade, re-decode the
    # samples that are STILL flagged (syndrome-inconsistent) with a second
    # phi formulation (cn_update._PHI_IMPLS), and adopt the rescue estimate
    # only where it is syndrome-consistent.  Motivation (RESULTS.md "Error
    # floor"): at the p<=0.05 floor every logical error is a flagged
    # sample, and the failure sets of the formulations are largely
    # disjoint — re-decoding expm1 failures with 'accurate' rescues ~75 %
    # of them (runs/tpu_diag_p05.log), so the joint failure rate drops
    # well below either formulation alone.  Adopting only syndrome-
    # consistent rescues guarantees the flagged count never increases.
    # NOTE: only the FLAGGED count is monotone; the logical-error count
    # can in principle move either way (a syndrome-consistent but
    # logically wrong rescue turns a detected failure into an undetected
    # logical error) — the measured floor improvement is statistical,
    # not structural.  See sandwich_decode's docstring.
    # The rescue sub-batch is tiny (rescue_fraction of the batch,
    # tile-rounded; final-flagged rates at the floor are ~1e-6), so the
    # extra cost per MC batch is one small-batch cascade.  None = off.
    # A comma-separated list ("tf,accurate") chains rescue stages: each
    # formulation re-decodes only the remnant still flagged after the
    # previous one (monotone — each stage can only clear flags).
    # Requires axis_name None (same gather restriction as compaction).
    rescue_phi: str | None = None
    # capacity of the rescue sub-batch as a fraction of the full batch;
    # overflow samples keep the main-cascade estimate (fail-safe,
    # pessimistic) and are reported via the overflow counter
    rescue_fraction: float = 0.02


def prior_llr(p0, n, batch, n_pad=None):
    """Uniform depolarizing prior llr = log(3(1-p0)/p0) replicated over
    (x, y, z) (feedback_gnn.py:311-313).  With ``n_pad`` the result is
    [3, n_pad, batch] with ZERO pad rows (the aligned-layout invariant)."""
    val = jnp.log(3.0 * (1.0 - p0) / p0)
    if n_pad is None:
        return jnp.full((3, n, batch), val, jnp.float32)
    body = jnp.full((3, n, batch), val, jnp.float32)
    return jnp.pad(body, ((0, 0), (0, n_pad - n), (0, 0)))


def sandwich_decode(
    graph: QuantumGraph,
    gnn_params_list: Sequence[Any],
    cfg: CascadeConfig,
    llr0,
    syndrome_x,
    syndrome_z,
    gt_sx,
    gt_sz,
    axis_name: str | None = None,
    qc=None,
    with_overflow: bool = False,
    phi_impl: str | None = None,
):
    """Decode given syndromes.  ``gt_sx``/``gt_sz`` are the target syndromes
    the estimate must reproduce (for the still-flagged tracking,
    feedback_gnn.py:315-331; they equal syndrome_x/syndrome_z in evaluation).

    ``qc`` (a codes.qc.QCPair) switches the BP runs onto the fused Pallas
    kernel (decoders/bp4_qc.py) — only valid un-sharded (axis_name None).

    ``phi_impl`` selects the phi formulation of every BP run in this
    cascade explicitly (None = cn_update module default); the rescue stage
    passes its alternate formulation through this argument.

    Returns (x_hat, z_hat) int32 [n, B]; with ``with_overflow`` also an int32
    scalar counting DISTINCT flagged samples that did not fit a compaction
    capacity at any level (level-1, level-2 rounds, or rescue; a sample
    overflowing several levels counts once).  Those keep their earlier
    estimate — fail-safe but pessimistic; a nonzero count means
    compact_fraction / round_fraction / rescue_fraction is undersized for
    this operating point.

    Monotonicity note: only the FLAGGED count is monotone under the rescue
    stage (a rescue is adopted only when syndrome-consistent, so flags can
    only clear).  The LOGICAL count can in principle move either way — a
    flagged sample may have ls_hat == 0 (detected failure, not a logical
    error under the reference's accounting), and a syndrome-consistent but
    logically wrong rescue flips it to an undetected logical error.  The
    measured floor improvement (RESULTS.md) is statistical, not structural.
    """
    hz = jnp.asarray(graph.hz)
    hx = jnp.asarray(graph.hx)

    if qc is not None:
        from .bp4_qc import bp4_decode_qc, qc_supported

        if axis_name is not None:
            raise ValueError(
                "QC kernel path is shard-local: pass qc=None (XLA gather "
                "path) for edge-partitioned rows, or run with edge_shards=1"
            )
        assert qc_supported(cfg.cn_type), cfg.cn_type

        msg_dtype = jnp.dtype(cfg.qc_msg_dtype)

        def run_bp(llr, syn_x, syn_z, num_iter, factor, need_logits=True):
            return bp4_decode_qc(
                graph, qc, llr, syn_x, syn_z, num_iter, cfg.cn_type,
                factor, batch_tile=cfg.qc_batch_tile, need_logits=need_logits,
                msg_dtype=msg_dtype, phi_impl=phi_impl,
            )

    else:

        def run_bp(llr, syn_x, syn_z, num_iter, factor, need_logits=True):
            del need_logits  # the XLA path always computes logits
            return bp4_decode(
                graph,
                llr,
                syn_x,
                syn_z,
                num_iter,
                cfg.cn_type,
                factor,
                axis_name=axis_name,
                phi_impl=phi_impl,
            )

    def gnn_rounds(res, x_hat, z_hat, syn_x, syn_z, gt, errors):
        """The nG (GNN -> BP-16 -> masked update) rounds
        (feedback_gnn.py:321-340)."""
        for r in range(cfg.num_rounds):
            # syndromes of the current estimate (feedback_gnn.py:324-325)
            sx_est = mod2_matmul(hz, x_hat)  # [mz, B]
            sz_est = mod2_matmul(hx, z_hat)  # [mx, B]
            s_est = jnp.concatenate([sx_est, sz_est], axis=0)
            new_errors = jnp.any(s_est != gt, axis=0)
            if axis_name is not None:
                # rows are sharded over the edge axis: or-reduce across shards
                new_errors = (
                    jax.lax.psum(new_errors.astype(jnp.int32), axis_name) > 0
                )
            errors = jnp.logical_and(errors, new_errors)

            h_vn = jnp.stack([res.llrx, res.llry, res.llrz], axis=0)
            new_llr = feedback_gnn_apply(
                gnn_params_list[min(r, len(gnn_params_list) - 1)],
                graph,
                h_vn,
                res.z_logit,  # per-Hx-row logits (stage-mode z_logit)
                res.x_logit,  # per-Hz-row logits (stage-mode x_logit)
                syn_x,
                syn_z,
                axis_name=axis_name,
            )
            res = run_bp(new_llr, syn_x, syn_z, cfg.num_iter2, cfg.factor2)
            # masked update: only still-flagged samples adopt the new estimate
            x_hat = jnp.where(errors[None, :], res.x_hat, x_hat)
            z_hat = jnp.where(errors[None, :], res.z_hat, z_hat)
        return x_hat, z_hat

    # gt comparison tensors [mz+mx, B] (order: [Hz rows; Hx rows], matching
    # gt = [gt_x; gt_z] = [Hz.nx; Hx.nz] at feedback_gnn.py:315-319)
    gt = jnp.concatenate([gt_sx, gt_sz], axis=0)

    stage1_iters = cfg.num_iter1
    if cfg.stage1_prepass is not None:
        assert cfg.compact_fraction, "prepass requires compaction"
        stage1_iters = min(cfg.stage1_prepass, cfg.num_iter1)

    # the prepass result never feeds the GNN (the subset is re-decoded with
    # the full schedule below), so skip its check-logit computation
    prepass_active = cfg.stage1_prepass is not None and stage1_iters < cfg.num_iter1
    res = run_bp(
        llr0, syndrome_x, syndrome_z, stage1_iters, cfg.factor1,
        need_logits=not prepass_active,
    )
    x_hat, z_hat = res.x_hat, res.z_hat
    b = x_hat.shape[-1]

    def finish(x_hat, z_hat, ov_mask):
        # ov_mask [B] int32 {0,1}: per-sample "lost a compaction capacity
        # somewhere" indicator — the reported overflow counts DISTINCT
        # samples, so a sample overflowing level 1 AND the rescue (or
        # several chained rescue stages) is counted once.
        if cfg.rescue_phi is not None:
            for impl in cfg.rescue_phi.split(","):
                x_hat, z_hat, r_ov_mask = _ensemble_rescue(
                    graph, gnn_params_list, cfg, impl.strip(), llr0,
                    syndrome_x, syndrome_z, gt_sx, gt_sz, x_hat, z_hat,
                    axis_name=axis_name, qc=qc, main_phi_impl=phi_impl,
                )
                ov_mask = jnp.maximum(ov_mask, r_ov_mask)
        if with_overflow:
            return x_hat, z_hat, jnp.sum(ov_mask)
        return x_hat, z_hat

    if not cfg.compact_fraction:  # None and 0.0 both mean "off"
        assert not cfg.round_fraction, (
            "round_fraction requires compact_fraction (the second-level "
            "subset is taken from the first-level one)"
        )
        x_hat, z_hat = gnn_rounds(
            res, x_hat, z_hat, syndrome_x, syndrome_z, gt, jnp.ones(b, bool)
        )
        return finish(x_hat, z_hat, jnp.zeros(b, jnp.int32))

    # ---- flagged-sample compaction (see CascadeConfig.compact_fraction) ----
    if axis_name is not None:
        raise ValueError(
            "compact_fraction requires unsharded PCM rows (edge_shards=1): "
            "the flagged-first argsort needs each sample's FULL syndrome on one "
            "shard.  Either drop --compact/--rounds-cap or run pure data "
            "parallelism (--edge-shards 1), the production multi-chip mode "
            "(see README 'Edge partitioning')."
        )
    tile = cfg.qc_batch_tile if qc is not None else 8
    cap = min(b, -(-int(np.ceil(cfg.compact_fraction * b)) // tile) * tile)

    sx_est = mod2_matmul(hz, x_hat)
    sz_est = mod2_matmul(hx, z_hat)
    flags0 = jnp.any(jnp.concatenate([sx_est, sz_est], axis=0) != gt, axis=0)
    # stable sort: flagged samples first, original order preserved
    order = jnp.argsort(jnp.logical_not(flags0), stable=True)
    idx = order[:cap]
    valid = flags0[idx]  # filler entries (unflagged) are masked out

    def take(a):
        return jnp.take(a, idx, axis=-1)

    syn_x_s, syn_z_s, gt_s = take(syndrome_x), take(syndrome_z), take(gt)

    if prepass_active:
        # re-run the full stage-1 schedule on the flagged subset only
        # (deterministic BP from the same prior -> exact reference result)
        sub_res = run_bp(take(llr0), syn_x_s, syn_z_s, cfg.num_iter1, cfg.factor1)
        x_s = jnp.where(valid[None, :], sub_res.x_hat, take(x_hat))
        z_s = jnp.where(valid[None, :], sub_res.z_hat, take(z_hat))
    else:
        sub_res = type(res)(*[take(f) if f is not None else None for f in res])
        x_s, z_s = take(x_hat), take(z_hat)

    # samples flagged after stage 1 but beyond the level-1 capacity
    covered = jnp.zeros(b, bool).at[idx].set(valid)
    ov_mask = jnp.logical_and(flags0, jnp.logical_not(covered)).astype(jnp.int32)

    if cfg.round_fraction is not None:
        # second compaction level: the GNN rounds only act on samples still
        # flagged AFTER the full stage-1 schedule (~2.8 % at p=0.05 vs the
        # ~12.6 % flagged after the prepass), so compact again before the
        # nG rounds.  Same fail-safe overflow semantics.
        cap2 = min(cap, -(-int(np.ceil(cfg.round_fraction * b)) // tile) * tile)
        se2 = jnp.concatenate([mod2_matmul(hz, x_s), mod2_matmul(hx, z_s)], axis=0)
        flags1 = jnp.logical_and(jnp.any(se2 != gt_s, axis=0), valid)
        order2 = jnp.argsort(jnp.logical_not(flags1), stable=True)
        idx2 = order2[:cap2]
        valid2 = flags1[idx2]
        # level-2 overflow, mapped back to full-batch coordinates
        covered2 = jnp.zeros(cap, bool).at[idx2].set(valid2)
        sub_ov = jnp.logical_and(flags1, jnp.logical_not(covered2))
        ov_mask = ov_mask.at[idx].max(sub_ov.astype(jnp.int32))

        def take2(a):
            return jnp.take(a, idx2, axis=-1)

        res2 = type(sub_res)(
            *[take2(f) if f is not None else None for f in sub_res]
        )
        x2, z2 = gnn_rounds(
            res2, take2(x_s), take2(z_s), take2(syn_x_s), take2(syn_z_s),
            take2(gt_s), valid2,
        )
        x_sub = x_s.at[:, idx2].set(x2)
        z_sub = z_s.at[:, idx2].set(z2)
    else:
        x_sub, z_sub = gnn_rounds(sub_res, x_s, z_s, syn_x_s, syn_z_s, gt_s, valid)
    x_hat = x_hat.at[:, idx].set(x_sub)
    z_hat = z_hat.at[:, idx].set(z_sub)
    return finish(x_hat, z_hat, ov_mask)


def sandwich_eval_step(
    graph: QuantumGraph,
    gnn_params_list: Sequence[Any],
    cfg: CascadeConfig,
    key,
    p,
    batch: int,
    wt: int | None = None,
    axis_name: str | None = None,
    data_axis: str | None = None,
    return_full: bool = False,
    qc=None,
    return_overflow: bool = False,
):
    """Full Monte-Carlo evaluation step: sample channel, compute syndromes,
    run the cascade, return error accounting.

    Mirrors Sandwich_BP_GNN_Evaluation_Model.call (feedback_gnn.py:293-361)
    but returns device-side counts by default (one int64 pair per batch
    instead of [B, checks] tensors) to minimise host traffic.

    ``axis_name`` is the edge-sharding mesh axis (CN/row-partitioned),
    ``data_axis`` the batch-sharding axis; either or both may be None.
    ``batch`` is the per-shard local batch size.

    Returns (flagged_count, logical_count) or, with ``return_full``,
    (s_hat [mz+mx, B], ls_hat [Rx+Rz, B]) batch-first.  With
    ``return_overflow`` a third scalar counts compaction-capacity overflow
    (see ``sandwich_decode``); ``sim_ler`` accepts and reports it.
    """
    n = graph.n
    n_pad = graph.n_pad
    if data_axis is not None:
        key = jax.random.fold_in(key, jax.lax.axis_index(data_axis))
    if wt is not None:
        noise_x, noise_z = pauli_fixed_weight(key, wt, n, batch)
    else:
        px, py, pz = depolarizing_probs(p)
        noise_x, noise_z = pauli_iid(key, px, py, pz, n, batch)
    # aligned padded layout: zero pad rows
    noise_x = jnp.pad(noise_x.astype(jnp.int32), ((0, n_pad - n), (0, 0)))
    noise_z = jnp.pad(noise_z.astype(jnp.int32), ((0, n_pad - n), (0, 0)))

    hx = jnp.asarray(graph.hx)
    hz = jnp.asarray(graph.hz)
    syndrome_x = mod2_matmul(hx, noise_z)  # [mx, B]
    syndrome_z = mod2_matmul(hz, noise_x)  # [mz, B]
    # ground-truth syndromes of the true noise for flag tracking
    gt_sx = mod2_matmul(hz, noise_x)  # [mz, B] (gt_x at feedback_gnn.py:315)
    gt_sz = mod2_matmul(hx, noise_z)  # [mx, B]

    llr0 = prior_llr(cfg.p0, n, batch, n_pad=n_pad)
    dec = sandwich_decode(
        graph,
        gnn_params_list,
        cfg,
        llr0,
        syndrome_x,
        syndrome_z,
        gt_sx,
        gt_sz,
        axis_name=axis_name,
        qc=qc,
        with_overflow=return_overflow,
    )
    x_hat, z_hat = dec[0], dec[1]

    # residuals and final accounting (feedback_gnn.py:343-361)
    x_diff = jnp.bitwise_xor(noise_x.astype(jnp.int32), x_hat)
    z_diff = jnp.bitwise_xor(noise_z.astype(jnp.int32), z_hat)

    sx = mod2_matmul(hz, x_diff)
    sz = mod2_matmul(hx, z_diff)
    lsx = mod2_matmul(jnp.asarray(graph.hx_perp), x_diff)
    lsz = mod2_matmul(jnp.asarray(graph.hz_perp), z_diff)

    s_hat = jnp.concatenate([sx, sz], axis=0)
    ls_hat = jnp.concatenate([lsx, lsz], axis=0)
    if return_full:
        # batch-first, true (unpadded) rows — reference convention
        mx_true, mz_true = graph.gx.num_cn, graph.gz.num_cn
        s_hat_true = jnp.concatenate([sx[:mz_true], sz[:mx_true]], axis=0)
        ls_hat_true = jnp.concatenate(
            [lsx[: graph.hx_perp_rows], lsz[: graph.hz_perp_rows]], axis=0
        )
        return s_hat_true.T, ls_hat_true.T

    flagged = jnp.any(s_hat != 0, axis=0)
    logical = jnp.any(ls_hat != 0, axis=0)
    if axis_name is not None:
        # rows sharded over the edge axis: per-sample or-reduce first
        flagged = jax.lax.psum(flagged.astype(jnp.int32), axis_name) > 0
        logical = jax.lax.psum(logical.astype(jnp.int32), axis_name) > 0
    flagged_count = jnp.sum(flagged.astype(jnp.int32))
    logical_count = jnp.sum(logical.astype(jnp.int32))
    if data_axis is not None:
        # batch sharded over the data axis: sum counts across shards
        flagged_count = jax.lax.psum(flagged_count, data_axis)
        logical_count = jax.lax.psum(logical_count, data_axis)
    if return_overflow:
        return flagged_count, logical_count, dec[2]
    return flagged_count, logical_count


def _ensemble_rescue(
    graph, gnn_params_list, cfg, rescue_impl, llr0, syndrome_x, syndrome_z,
    gt_sx, gt_sz, x_hat, z_hat, axis_name=None, qc=None, main_phi_impl=None,
):
    """Re-decode still-flagged samples with the ``rescue_impl`` phi
    formulation and adopt the rescue estimate where it is syndrome-
    consistent (CascadeConfig.rescue_phi).

    The alternate formulation is threaded through ``sandwich_decode``'s
    ``phi_impl`` argument (functional — no module-global state is touched
    during tracing), so the main pass and the rescue pass coexist in one
    XLA program.  ``main_phi_impl`` is the main cascade's explicit
    formulation (None = module default), used only to warn when the rescue
    formulation equals it — a guaranteed no-op that still pays a full
    extra sub-batch cascade per MC batch.

    Returns (x_hat, z_hat, ov_mask [B] int32) where ov_mask marks the
    still-flagged samples beyond the rescue capacity.
    """
    assert rescue_impl in cn_update._PHI_IMPLS, rescue_impl
    effective_main = main_phi_impl if main_phi_impl is not None else cn_update._PHI_IMPL
    if rescue_impl == effective_main:
        import warnings

        warnings.warn(
            f"rescue_phi formulation {rescue_impl!r} equals the main "
            "cascade's phi formulation — the rescue stage is a guaranteed "
            "no-op but still costs a full extra sub-batch cascade per "
            "batch",
            stacklevel=2,
        )
    if axis_name is not None:
        raise ValueError(
            "rescue_phi requires unsharded PCM rows (edge_shards=1): the "
            "flagged-first gather needs each sample's full syndrome on one "
            "shard (same restriction as compact_fraction)"
        )
    hz = jnp.asarray(graph.hz)
    hx = jnp.asarray(graph.hx)
    b = x_hat.shape[-1]
    tile = cfg.qc_batch_tile if qc is not None else 8
    cap = min(b, -(-int(np.ceil(cfg.rescue_fraction * b)) // tile) * tile)

    # still-flagged after the full cascade: estimate syndromes != ground truth
    flags = jnp.logical_or(
        jnp.any(mod2_matmul(hz, x_hat) != gt_sx, axis=0),
        jnp.any(mod2_matmul(hx, z_hat) != gt_sz, axis=0),
    )
    order = jnp.argsort(jnp.logical_not(flags), stable=True)
    idx = order[:cap]
    valid = flags[idx]
    covered = jnp.zeros(b, bool).at[idx].set(valid)
    ov_mask = jnp.logical_and(flags, jnp.logical_not(covered)).astype(jnp.int32)

    def take(a):
        return jnp.take(a, idx, axis=-1)

    syn_x_s, syn_z_s = take(syndrome_x), take(syndrome_z)
    gt_sx_s, gt_sz_s = take(gt_sx), take(gt_sz)
    # the rescue sub-batch is already compacted; run the plain cascade on it
    rcfg = replace(
        cfg, compact_fraction=None, round_fraction=None, stage1_prepass=None,
        rescue_phi=None,
    )
    rx, rz = sandwich_decode(
        graph, gnn_params_list, rcfg, take(llr0), syn_x_s, syn_z_s,
        gt_sx_s, gt_sz_s, qc=qc, phi_impl=rescue_impl,
    )

    converged = jnp.logical_and(
        jnp.all(mod2_matmul(hz, rx) == gt_sx_s, axis=0),
        jnp.all(mod2_matmul(hx, rz) == gt_sz_s, axis=0),
    )
    adopt = jnp.logical_and(valid, converged)[None, :]
    x_sub = jnp.where(adopt, rx, take(x_hat))
    z_sub = jnp.where(adopt, rz, take(z_hat))
    x_hat = x_hat.at[:, idx].set(x_sub)
    z_hat = z_hat.at[:, idx].set(z_sub)
    return x_hat, z_hat, ov_mask
