"""shard_map front-ends: data-parallel and edge-partitioned execution of the
evaluation cascade and the training step over a ('data', 'edge') mesh.

Usage:
    mesh = make_mesh(data=4, edge=2)
    sharded = shard_quantum_graph(graph, mesh.shape['edge'])
    step = make_sharded_eval_step(mesh, sharded, [params], cfg, local_batch)
    flagged, logical = step(key, p)   # global counts over data axis

Total batch per call = local_batch * mesh.shape['data'].
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import jax
import jax.numpy as jnp

from ..codes.graph import QuantumGraph
from ..decoders.cascade import CascadeConfig, sandwich_eval_step
from .mesh import P
from .shard import shard_quantum_graph, unstack_shard

try:  # jax>=0.6 moved shard_map into the public namespace
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

__all__ = ["make_sharded_eval_step", "make_sharded_train_step"]


def _graph_spec(graph) -> Any:
    """P('edge') on every array leaf (leading shard axis)."""
    return jax.tree.map(lambda _: P("edge"), graph)


def make_sharded_eval_step(
    mesh,
    stacked_graph: QuantumGraph,
    gnn_params_list: Sequence[Any],
    cfg: CascadeConfig,
    local_batch: int,
    wt: int | None = None,
    qc=None,
    return_overflow: bool = False,
):
    """Jitted (key, p) -> (flagged_count, logical_count) over the mesh.
    With ``return_overflow`` a third scalar counts compaction-capacity
    overflows summed over the data shards (compaction itself requires
    edge=1, matching ``sandwich_decode``'s unsharded-rows assertion).

    ``stacked_graph`` comes from shard_quantum_graph(graph,
    mesh.shape['edge']).  Each data shard simulates ``local_batch`` samples;
    counts are psum-ed over 'data' (and or-reduced over 'edge').

    ``qc`` (codes.qc.QCPair) routes each data shard's BP runs onto the
    fused Pallas kernel — the production multi-chip mode is pure DP over
    ICI with the kernel shard-local.  Requires edge=1 (the kernel is
    unsharded in the edge dimension).
    """
    edge_axis = "edge" if mesh.shape["edge"] > 1 else None
    if qc is not None and edge_axis is not None:
        raise ValueError(
            "the fused QC Pallas kernel is shard-local and cannot run with "
            "edge-partitioned PCM rows (edge_shards>1).  Use pure data "
            "parallelism (--edge-shards 1; the production multi-chip mode — "
            "see README 'Edge partitioning') or drop --qc-kernel to use the "
            "XLA gather path, which supports edge sharding."
        )

    def inner(graph_stacked, params_list, key, p):
        graph = unstack_shard(graph_stacked)
        out = sandwich_eval_step(
            graph,
            params_list,
            cfg,
            key,
            p,
            local_batch,
            wt=wt,
            axis_name=edge_axis,
            data_axis="data",
            qc=qc,
            return_overflow=return_overflow,
        )
        flagged, logical = out[0], out[1]
        overflow = jax.lax.psum(out[2], "data") if return_overflow else None
        if edge_axis is None:
            # edge axis of size 1: the graph arrays still carry {edge}
            # variance; this identity psum declares the (trivially)
            # replicated counts invariant for check_vma
            flagged = jax.lax.psum(flagged, "edge")
            logical = jax.lax.psum(logical, "edge")
            if return_overflow:
                overflow = jax.lax.psum(overflow, "edge")
        if return_overflow:
            return flagged, logical, overflow
        return flagged, logical

    mapped = shard_map(
        inner,
        mesh=mesh,
        in_specs=(_graph_spec(stacked_graph), P(), P(), P()),
        out_specs=(P(), P(), P()) if return_overflow else (P(), P()),
        # vma inference cannot see through the Pallas kernel body: kernel-
        # local constants (e.g. the zeros message init) carry empty vma and
        # every op mixing them with varying inputs trips the check ("mul
        # requires varying manual axes to match"), and pvary has no Mosaic
        # lowering to fix them inside the kernel.  The QC backend therefore
        # runs with the check disabled; numerics are covered by the
        # sharded-vs-unsharded equivalence tests (test_sharding.py).
        check_vma=qc is None,
    )

    @jax.jit
    def step(key, p):
        return mapped(stacked_graph, gnn_params_list, key, p)

    return step


def make_sharded_train_step(
    mesh,
    stacked_graph: QuantumGraph,
    cfg,
    optimizer,
    local_batch: int,
):
    """Jitted sharded train step:
    (params, opt_state, noise_x [n, B_global], noise_z) ->
    (params, opt_state, loss, flagged_bler, bler)

    Batch is sharded over 'data' (noise arrays are [n, B] batch-last; the
    batch axis 1 is partitioned), the graph over 'edge'.  Gradients are
    psum-ed over 'data' (mean) and 'edge' (the loss's row partition).
    """
    import optax

    from ..train.trainer import stage_one_features, stage_two_loss

    edge_axis = "edge" if mesh.shape["edge"] > 1 else None

    def loss_fn(params, graph, noise_x, noise_z):
        h_vn, logit_hx, logit_hz = stage_one_features(graph, cfg, noise_x, noise_z)
        h_vn = jax.lax.stop_gradient(h_vn)
        logit_hx = jax.lax.stop_gradient(logit_hx)
        logit_hz = jax.lax.stop_gradient(logit_hz)
        return stage_two_loss(
            params, graph, cfg, noise_x, noise_z, h_vn, logit_hx, logit_hz,
            axis_name=edge_axis,
        )

    def inner(graph_stacked, params, opt_state, noise_x, noise_z):
        graph = unstack_shard(graph_stacked)
        (loss, (s_hat, ls_hat)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, graph, noise_x, noise_z
        )
        # mean over data shards; edge shards hold identical loss/grads by
        # construction (psum-ed inside), but guard against drift
        grads = jax.lax.pmean(grads, "data")
        loss = jax.lax.pmean(loss, "data")
        flagged = jnp.any(s_hat != 0, axis=0)
        logical = jnp.any(ls_hat != 0, axis=0)
        if edge_axis is not None:
            flagged = jax.lax.psum(flagged.astype(jnp.int32), edge_axis) > 0
            logical = jax.lax.psum(logical.astype(jnp.int32), edge_axis) > 0
        flagged_bler = jax.lax.pmean(jnp.mean(flagged.astype(jnp.float32)), "data")
        bler = jax.lax.pmean(jnp.mean(logical.astype(jnp.float32)), "data")
        if edge_axis is None:
            # edge axis of size 1: graph arrays carry {edge} variance —
            # identity pmeans declare the (trivially) replicated scalars
            # and grads invariant for check_vma (cf. make_sharded_eval_step)
            loss, flagged_bler, bler = jax.lax.pmean(
                (loss, flagged_bler, bler), "edge"
            )
            grads = jax.lax.pmean(grads, "edge")
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, flagged_bler, bler

    mapped = shard_map(
        inner,
        mesh=mesh,
        in_specs=(
            _graph_spec(stacked_graph),
            P(),
            P(),
            P(None, "data"),
            P(None, "data"),
        ),
        out_specs=(P(), P(), P(), P(), P()),
        check_vma=True,
    )

    @jax.jit
    def step(params, opt_state, noise_x, noise_z):
        return mapped(stacked_graph, params, opt_state, noise_x, noise_z)

    return step
