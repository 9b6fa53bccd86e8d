#!/usr/bin/env python
"""Logical-error-rate evaluation CLI.

Reproduces the reference entry points n882.py / n1270.py:

    python scripts/evaluate.py -c n882 -p 0.05          # one p point
    python scripts/evaluate.py -c n1270 -p 0.12 0.10 0.08 -nG 5 -bs 10000

Multi-device: --data-shards / --edge-shards map the run onto a
('data','edge') mesh (total devices = product).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# this environment's sitecustomize pins jax_platforms="axon,cpu" via
# jax.config at interpreter start; honor an explicit JAX_PLATFORMS request
# (e.g. cpu + --xla_force_host_platform_device_count for virtual meshes)
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import jax.numpy as jnp

from feedback_gnn_tpu.config import build_code, config_from_args, make_eval_parser
from feedback_gnn_tpu.codes.graph import QuantumGraph
from feedback_gnn_tpu.decoders import sandwich_eval_step
from feedback_gnn_tpu.decoders.gnn_feedback import load_weights
from feedback_gnn_tpu.sim import PlotLER


def run(cfg):
    if getattr(cfg, "multihost", False):
        from feedback_gnn_tpu.parallel import init_distributed

        init_distributed()
    proc0 = jax.process_index() == 0
    if proc0:
        print(f"building code {cfg.code} ...")
    code = build_code(cfg.code)
    graph = QuantumGraph.from_code(code, stage_mode=True)
    params = load_weights(cfg.resolve_weights())
    if proc0:
        print(f"{code}: cascade {cfg.cascade}")

    if cfg.data_shards * cfg.edge_shards > 1:
        from feedback_gnn_tpu.parallel import (
            make_mesh,
            make_sharded_eval_step,
            shard_quantum_graph,
        )

        mesh = make_mesh(data=cfg.data_shards, edge=cfg.edge_shards)
        stacked = shard_quantum_graph(graph, cfg.edge_shards)
        assert cfg.batch_size % cfg.data_shards == 0
        qc = None
        if cfg.qc_kernel:
            from feedback_gnn_tpu.codes.qc import qc_pair_from_code

            qc = qc_pair_from_code(code)
            assert qc is not None, "code has no block-circulant structure"
        track_overflow = bool(cfg.cascade.compact_fraction or cfg.cascade.rescue_phi)
        step = make_sharded_eval_step(
            mesh, stacked, [params], cfg.cascade,
            cfg.batch_size // cfg.data_shards, qc=qc,
            return_overflow=track_overflow,
        )
    else:
        qc = None
        if cfg.qc_kernel:
            from feedback_gnn_tpu.codes.qc import qc_pair_from_code

            qc = qc_pair_from_code(code)
            assert qc is not None, "code has no block-circulant structure"

        track_overflow = bool(cfg.cascade.compact_fraction or cfg.cascade.rescue_phi)

        @jax.jit
        def step(key, p):
            return sandwich_eval_step(
                graph, [params], cfg.cascade, key, p, cfg.batch_size, qc=qc,
                return_overflow=track_overflow,
            )

    plot = PlotLER(title=f"{code.name} feedback-GNN cascade")
    result = plot.simulate(
        step,
        cfg.ps,
        batch_size=cfg.batch_size,
        max_mc_iter=cfg.max_mc_iter,
        num_target_block_errors=cfg.num_target_block_errors,
        legend=f"nG={cfg.cascade.num_rounds} f={cfg.cascade.factor1}",
        seed=cfg.seed,
        verbose=proc0,
        # every process READS the checkpoint (state is identical everywhere:
        # counts are psum-ed inside the step, so restored iteration counts
        # and stop decisions agree — mismatched counts would deadlock the
        # per-step collectives); only process 0 WRITES it
        checkpoint_path=cfg.checkpoint,
        write_checkpoint=proc0,
        # on a global multi-host mesh the key is a replicated jit input;
        # per-shard stream diversity comes from fold_in(axis_index) inside
        # sandwich_eval_step
        fold_process_key=not getattr(cfg, "multihost", False),
    )
    if proc0:
        print()
        print(result.summary())
    return result


def main():
    run(config_from_args(make_eval_parser().parse_args()))


if __name__ == "__main__":
    main()
