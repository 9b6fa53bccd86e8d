"""Batched order-0 ordered-statistics decoding (OSD-0) on device.

Re-design of the reference ``OSD0_Decoder`` + ``BP4_OSD_Model``
(/root/reference/sionna/fec/ldpc/bp_osd.py): sort qubits by reliability,
append the syndrome column, run a rank-step batched GF(2) Gaussian
elimination with per-row argmax pivoting, scatter the solution back through
the inverse sort.

TPU-native differences:

* the elimination is a ``lax.fori_loop`` over int32 bitwise ops (the
  reference uses float adds + int_mod_2);
* the flagged-subset handling keeps static shapes: the host compacts flagged
  samples into a fixed-capacity buffer (padded with all-zero syndromes which
  decode trivially) instead of the reference's dynamic boolean-mask reshape
  that retraces per batch (bp_osd.py:149 "XLA bug of masking" comment);
* OSD batches are small (only BP failures), so this path is latency- not
  throughput-critical; batch-first layout keeps the pivot bookkeeping simple.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.gf2mat import mod2_matmul
from .bp4 import quaternary_to_binary_llrs

__all__ = ["osd0_decode", "bp_osd_correct"]


def osd0_decode(llr, pcm, syndrome):
    """OSD-0 decode.

    Args:
      llr: [B, n] float32 — reliability, most reliable = largest (sorted
        ascending like the reference: tf.argsort default ascending, so the
        LEAST reliable / most-likely-flipped columns come first).
      pcm: [rank, n] 0/1 — full-rank parity-check basis (shared).
      syndrome: [rank, B] 0/1 — pivot-reduced syndromes.

    Returns e_hat [B, n] int32.
    """
    bsz, n = llr.shape
    rank = pcm.shape[0]

    sort_order = jnp.argsort(llr, axis=-1)  # [B, n]
    inv_sort = jnp.argsort(sort_order, axis=-1)

    # permuted pcm per sample + syndrome column: [B, rank, n+1]
    pcm_b = jnp.broadcast_to(pcm.astype(jnp.int32)[None], (bsz, rank, n))
    pcm_perm = jnp.take_along_axis(pcm_b, sort_order[:, None, :], axis=2)
    tab = jnp.concatenate(
        [pcm_perm, syndrome.T.astype(jnp.int32)[:, :, None]], axis=2
    )  # [B, rank, n+1]

    def body(row, carry):
        tab, pivots = carry
        # leftmost 1 in this row per sample (bp_osd.py:30)
        idx_p = jnp.argmax(tab[:, row, :], axis=-1)  # [B]
        pivots = pivots.at[:, row].set(idx_p)
        # the pivot column across all rows
        c = jnp.take_along_axis(tab, idx_p[:, None, None], axis=2)[:, :, 0]  # [B, rank]
        c = c.at[:, row].set(0)  # don't eliminate the pivot row itself
        current = tab[:, row, :]  # [B, n+1]
        tab = jnp.bitwise_xor(tab, c[:, :, None] & current[:, None, :])
        return tab, pivots

    pivots0 = jnp.zeros((bsz, rank), jnp.int32)
    tab, pivots = jax.lax.fori_loop(0, rank, body, (tab, pivots0))

    sol = tab[:, :, -1]  # [B, rank]
    e_sorted = jnp.zeros((bsz, n), jnp.int32)
    rows = jnp.broadcast_to(jnp.arange(bsz)[:, None], (bsz, rank))
    e_sorted = e_sorted.at[rows, pivots].set(sol)
    return jnp.take_along_axis(e_sorted, inv_sort, axis=1)


def bp_osd_correct(
    graph,
    bp_result,
    noise_x,
    noise_z,
    pivot_hx,
    pivot_hz,
    hx_basis,
    hz_basis,
    compact_cap: int | None = None,
):
    """BP4 + OSD-0 correction step (BP4_OSD_Model semantics,
    bp_osd.py:104-191), entirely static-shaped.

    Without ``compact_cap``, OSD runs on every sample (cheap
    correctness-wise: OSD of an already satisfied syndrome returns a valid
    coset representative; the flagged mask selects BP or OSD output per
    sample, mirroring the reference's scatter on flagged rows).

    With ``compact_cap``, the still-flagged samples are gathered into a
    dense sub-batch of that size before the (rank-sequential, expensive)
    OSD solve — the on-device static-shape equivalent of the reference's
    host-side boolean-mask round-trip (bp_osd.py:170-175).  Overflow
    samples keep their BP estimate (counted flagged, fail-safe).

    Args:
      bp_result: BP4Result from a stage_one-style decode.
      pivot_hx / pivot_hz: row indices of the full-rank bases.
      hx_basis / hz_basis: [rank, n] full-rank PCMs.

    Returns (x_hat, z_hat) int32 [n, B] with OSD replacing BP output on
    flagged samples.
    """
    hx = jnp.asarray(graph.hx)
    hz = jnp.asarray(graph.hz)
    n = graph.n

    def padn(x):
        x = x.astype(jnp.int32)
        if x.shape[0] == graph.n_pad:
            return x
        return jnp.pad(x, ((0, graph.n_pad - n), (0, 0)))

    noise_x = padn(noise_x)
    noise_z = padn(noise_z)
    # flagged = BP failed to reproduce the syndrome (bp_osd.py:129-133)
    x_diff = jnp.bitwise_xor(noise_x, bp_result.x_hat)
    z_diff = jnp.bitwise_xor(noise_z, bp_result.z_hat)
    sx_res = mod2_matmul(hz, x_diff)
    sz_res = mod2_matmul(hx, z_diff)
    flagged = jnp.logical_or(
        jnp.any(sx_res != 0, axis=0), jnp.any(sz_res != 0, axis=0)
    )  # [B]

    # binary reliabilities from quaternary marginals (bp_osd.py:136-142);
    # slice the padded marginals to the true qubit count for the OSD solve
    osd_llrx, osd_llrz = quaternary_to_binary_llrs(
        bp_result.llrx[:n], bp_result.llry[:n], bp_result.llrz[:n]
    )

    # pivot-reduced syndromes of the true noise (bp_osd.py:150-154)
    syndrome_x = mod2_matmul(hx, noise_z)
    syndrome_z = mod2_matmul(hz, noise_x)
    red_sx = syndrome_x[jnp.asarray(pivot_hx)]
    red_sz = syndrome_z[jnp.asarray(pivot_hz)]
    pad = ((0, graph.n_pad - n), (0, 0))

    if compact_cap is not None:
        b = flagged.shape[0]
        cap = min(b, int(compact_cap))
        order = jnp.argsort(jnp.logical_not(flagged), stable=True)
        idx = order[:cap]
        valid = flagged[idx]
        z_osd = osd0_decode(
            osd_llrz.T[idx], jnp.asarray(hx_basis), red_sx[:, idx]
        ).T  # [n, cap]
        x_osd = osd0_decode(osd_llrx.T[idx], jnp.asarray(hz_basis), red_sz[:, idx]).T
        x_osd = jnp.pad(x_osd, pad)
        z_osd = jnp.pad(z_osd, pad)
        upd = valid[None, :]
        x_hat = bp_result.x_hat.at[:, idx].set(
            jnp.where(upd, x_osd, bp_result.x_hat[:, idx])
        )
        z_hat = bp_result.z_hat.at[:, idx].set(
            jnp.where(upd, z_osd, bp_result.z_hat[:, idx])
        )
        # flagged samples beyond the capacity keep their BP estimate.  That
        # is NOT reference-equivalent (and not even reliably pessimistic:
        # a flagged BP estimate can be logically luckier than an OSD
        # correction) — report the overflow so callers can verify coverage.
        overflow = jnp.sum(flagged.astype(jnp.int32)) - jnp.sum(
            valid.astype(jnp.int32)
        )
        return x_hat, z_hat, flagged, overflow

    z_hat_osd = osd0_decode(osd_llrz.T, jnp.asarray(hx_basis), red_sx).T  # [n, B]
    x_hat_osd = osd0_decode(osd_llrx.T, jnp.asarray(hz_basis), red_sz).T
    x_hat_osd = jnp.pad(x_hat_osd, pad)
    z_hat_osd = jnp.pad(z_hat_osd, pad)

    x_hat = jnp.where(flagged[None, :], x_hat_osd, bp_result.x_hat)
    z_hat = jnp.where(flagged[None, :], z_hat_osd, bp_result.z_hat)
    return x_hat, z_hat, flagged, jnp.int32(0)
