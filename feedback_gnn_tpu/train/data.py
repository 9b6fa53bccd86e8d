"""Failure-mining dataset generation (reference: examples/Generate_dataset.ipynb).

Curriculum (SURVEY.md §3.3):
 1. "easy" set: fixed-weight Pauli noise that plain BP4-64 fails to decode
    (flagged), mined per weight wt in a range, shards concatenated;
 2. "hard" set: noise that survives BP64 -> coarse GNN -> BP64;
 3. final mix: easy + hard x 50 oversampling.

Device steps keep static shapes and return (noise_x, noise_z, flagged); the
host strips to the flagged subset — same split the reference uses (its XLA
model returns noise[err] with a dynamic shape, forcing retraces; ours never
retraces).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..channels.pauli import pauli_fixed_weight, pauli_fixed_weight_traced
from ..codes.graph import QuantumGraph
from ..decoders.bp4 import bp4_decode
from ..decoders.cascade import prior_llr
from ..decoders.gnn_feedback import feedback_gnn_apply
from ..ops.gf2mat import mod2_matmul

__all__ = [
    "make_bp_failure_miner",
    "make_cascade_failure_miner",
    "mine_failures",
    "mix_easy_hard",
    "batch_iterator",
    "batch_iterator_stacked",
]


def _pad_noise(graph, noise):
    n, n_pad = graph.n, graph.n_pad
    noise = noise.astype(jnp.int32)
    if noise.shape[0] == n_pad:
        return noise
    return jnp.pad(noise, ((0, n_pad - n), (0, 0)))


def _flagged_after(graph, x_hat, z_hat, noise_x, noise_z):
    x_diff = jnp.bitwise_xor(_pad_noise(graph, noise_x), x_hat)
    z_diff = jnp.bitwise_xor(_pad_noise(graph, noise_z), z_hat)
    sx = mod2_matmul(jnp.asarray(graph.hz), x_diff)
    sz = mod2_matmul(jnp.asarray(graph.hx), z_diff)
    return jnp.logical_or(jnp.any(sx != 0, axis=0), jnp.any(sz != 0, axis=0))


def _compact_failures(graph, noise_x, noise_z, flagged, cap):
    """Device-side failure compaction: sort the flagged samples to the
    front, return the first ``cap`` columns as uint8 plus the number of
    valid ones.  Cuts the device->host transfer from [n, B] to [n, cap]
    (the mining loop over a tunneled TPU is transfer-bound otherwise)."""
    order = jnp.argsort(jnp.logical_not(flagged), stable=True)
    idx = order[:cap]
    kept = jnp.minimum(jnp.sum(flagged.astype(jnp.int32)), jnp.int32(cap))
    nx = noise_x[: graph.n].astype(jnp.uint8)[:, idx]
    nz = noise_z[: graph.n].astype(jnp.uint8)[:, idx]
    return nx, nz, kept


def _make_run_bp(graph, qc, need_logits):
    """BP backend selector for the miners: the fused Pallas QC kernel when
    ``qc`` (a codes.qc.QCPair) is given — ~4x the XLA gather path on TPU,
    which makes the big mining scans compute-bound at the kernel rate —
    else ``bp4_decode``."""
    if qc is None:
        def run_bp(llr, syn_x, syn_z, num_iter, cn_type):
            return bp4_decode(graph, llr, syn_x, syn_z, num_iter, cn_type)
    else:
        from ..decoders.bp4_qc import bp4_decode_qc

        def run_bp(llr, syn_x, syn_z, num_iter, cn_type):
            return bp4_decode_qc(graph, qc, llr, syn_x, syn_z, num_iter,
                                 cn_type, need_logits=need_logits)
    return run_bp


def make_bp_failure_miner(
    graph: QuantumGraph, num_iter=64, p0=0.05, cn_type="boxplus-phi",
    wt_max=None, compact_cap=None, qc=None,
):
    """Returns jitted (key, wt static, batch static) -> (noise_x [n,B],
    noise_z, flagged [B]) — BP4_Error_Model of Generate_dataset.ipynb cell 1.

    With ``wt_max`` the weight argument is TRACED (one compile serves the
    whole wt <= wt_max mining schedule).  With ``compact_cap`` the output
    is instead (noise_x [n,cap] uint8, noise_z [n,cap] uint8, kept int32)
    with failures densely packed at the front — see _compact_failures.
    ``qc`` switches the BP run onto the fused Pallas kernel."""

    run_bp = _make_run_bp(graph, qc, need_logits=False)

    def sample(key, wt, batch):
        if wt_max is None:
            return pauli_fixed_weight(key, wt, graph.n, batch)
        return pauli_fixed_weight_traced(key, wt, graph.n, batch, wt_max)

    @partial(jax.jit, static_argnums=(1, 2) if wt_max is None else (2,))
    def miner(key, wt, batch):
        noise_x, noise_z = sample(key, wt, batch)
        noise_x = _pad_noise(graph, noise_x)
        noise_z = _pad_noise(graph, noise_z)
        syndrome_x = mod2_matmul(jnp.asarray(graph.hx), noise_z)
        syndrome_z = mod2_matmul(jnp.asarray(graph.hz), noise_x)
        llr0 = prior_llr(p0, graph.n, batch, n_pad=graph.n_pad)
        res = run_bp(llr0, syndrome_x, syndrome_z, num_iter, cn_type)
        flagged = _flagged_after(graph, res.x_hat, res.z_hat, noise_x, noise_z)
        if compact_cap is not None:
            return _compact_failures(graph, noise_x, noise_z, flagged, compact_cap)
        return noise_x[: graph.n], noise_z[: graph.n], flagged

    return miner


def make_cascade_failure_miner(
    graph: QuantumGraph,
    gnn_params,
    num_iter1=64,
    num_iter2=64,
    p0=0.05,
    cn_type="boxplus-phi",
    wt_max=None,
    compact_cap=None,
    qc=None,
):
    """Hard-example miner: errors still flagged after BP64 -> coarse GNN ->
    BP64 (Feedback_GNN_Error_Model, Generate_dataset.ipynb cell 8).
    ``wt_max`` / ``compact_cap`` / ``qc``: see ``make_bp_failure_miner``."""

    run_bp = _make_run_bp(graph, qc, need_logits=True)

    def sample(key, wt, batch):
        if wt_max is None:
            return pauli_fixed_weight(key, wt, graph.n, batch)
        return pauli_fixed_weight_traced(key, wt, graph.n, batch, wt_max)

    @partial(jax.jit, static_argnums=(1, 2) if wt_max is None else (2,))
    def miner(key, wt, batch):
        noise_x, noise_z = sample(key, wt, batch)
        noise_x = _pad_noise(graph, noise_x)
        noise_z = _pad_noise(graph, noise_z)
        syndrome_x = mod2_matmul(jnp.asarray(graph.hx), noise_z)
        syndrome_z = mod2_matmul(jnp.asarray(graph.hz), noise_x)
        llr0 = prior_llr(p0, graph.n, batch, n_pad=graph.n_pad)
        res = run_bp(llr0, syndrome_x, syndrome_z, num_iter1, cn_type)
        h_vn = jnp.stack([res.llrx, res.llry, res.llrz], axis=0)
        new_llr = feedback_gnn_apply(
            gnn_params, graph, h_vn, res.z_logit, res.x_logit, syndrome_x, syndrome_z
        )
        res2 = run_bp(new_llr, syndrome_x, syndrome_z, num_iter2, cn_type)
        flagged = _flagged_after(graph, res2.x_hat, res2.z_hat, noise_x, noise_z)
        if compact_cap is not None:
            return _compact_failures(graph, noise_x, noise_z, flagged, compact_cap)
        return noise_x[: graph.n], noise_z[: graph.n], flagged

    return miner


def mine_failures(miner, key, weights, batches_per_weight, batch_size, out_dir=None, prefix=""):
    """Run a miner over a weight schedule; returns dict wt -> (x, z) arrays
    of failed noise in [num_failed, n] layout (batch-first on host, matching
    the reference's .npy shards)."""
    shards = {}
    for wt in weights:
        xs, zs = [], []
        for b in range(batches_per_weight):
            k = jax.random.fold_in(jax.random.fold_in(key, wt), b)
            noise_x, noise_z, flagged = miner(k, int(wt), int(batch_size))
            mask = np.asarray(flagged)
            xs.append(np.asarray(noise_x).T[mask])
            zs.append(np.asarray(noise_z).T[mask])
        x = np.vstack(xs).astype(np.uint8)
        z = np.vstack(zs).astype(np.uint8)
        shards[wt] = (x, z)
        if out_dir:
            np.save(os.path.join(out_dir, f"{prefix}_wt{wt}_x.npy"), x)
            np.save(os.path.join(out_dir, f"{prefix}_wt{wt}_z.npy"), z)
    return shards


def mix_easy_hard(easy, hard, hard_oversample=50):
    """Final training mix: easy + hard x oversample
    (Generate_dataset.ipynb cells 13/16)."""
    ex, ez = easy
    hx_, hz_ = hard
    x = np.vstack([ex] + [hx_] * hard_oversample)
    z = np.vstack([ez] + [hz_] * hard_oversample)
    return x, z


def batch_iterator(x, z, batch_size, key, drop_remainder=True):
    """Shuffled epoch iterator yielding device-layout [n, B] pairs
    (replaces the reference's tf.data pipeline)."""
    num = x.shape[0]
    perm = np.asarray(jax.random.permutation(key, num))
    stop = num - (num % batch_size) if drop_remainder else num
    for s in range(0, stop, batch_size):
        idx = perm[s : s + batch_size]
        yield jnp.asarray(x[idx].T), jnp.asarray(z[idx].T)


def batch_iterator_stacked(x, z, batch_size, key, k):
    """Like ``batch_iterator`` but yields ([j, n, B], [j, n, B]) stacks of
    j <= k consecutive minibatches as ONE host->device transfer each — the
    input pipeline of ``make_train_step_multi``.  The concatenation of the
    stacks equals the ``batch_iterator`` sequence for the same key (same
    permutation, same consecutive slicing), so fused and unfused training
    see identical minibatches."""
    num = x.shape[0]
    perm = np.asarray(jax.random.permutation(key, num))
    stop = num - (num % batch_size)
    starts = list(range(0, stop, batch_size))
    for c in range(0, len(starts), k):
        chunk = starts[c : c + k]
        idx = np.stack([perm[s : s + batch_size] for s in chunk])  # [j, B]
        yield (
            jnp.asarray(x[idx].transpose(0, 2, 1)),
            jnp.asarray(z[idx].transpose(0, 2, 1)),
        )
