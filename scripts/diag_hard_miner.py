#!/usr/bin/env python
"""Diagnose the hard-miner compile hang (round 4): build the cascade
failure miner at a given batch size and time its first call, with JAX
compile logging on.  Usage: python scripts/diag_hard_miner.py [batch]."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_LOG_COMPILES", "1")

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_log_compiles", True)
import jax.numpy as jnp


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    from feedback_gnn_tpu.codes.graph import QuantumGraph
    from feedback_gnn_tpu.config import build_code
    from feedback_gnn_tpu.io.checkpoint import load_pytree
    from feedback_gnn_tpu.decoders.gnn_feedback import init_feedback_gnn
    from feedback_gnn_tpu.train import make_bp_failure_miner, make_cascade_failure_miner

    log("building code ...")
    code = build_code("n882")
    graph = QuantumGraph.from_code(code, stage_mode=True)
    key = jax.random.PRNGKey(0)
    coarse_path = "runs/scratch2/n882_coarse_16_16.npz"
    params = init_feedback_gnn(key)
    if os.path.exists(coarse_path):
        params = load_pytree(coarse_path, like=params)
        log("loaded coarse params")

    log(f"easy miner @ {batch} (control: this compiled fine earlier) ...")
    m0 = make_bp_failure_miner(graph, num_iter=64, wt_max=60, compact_cap=256)
    t0 = time.time()
    nx, nz, k = m0(key, jnp.int32(40), batch)
    log(f"easy miner first call done in {time.time() - t0:.1f}s kept={int(k)}")

    log(f"hard miner @ {batch} ...")
    m1 = make_cascade_failure_miner(graph, params, num_iter1=64, num_iter2=64,
                                    wt_max=60, compact_cap=256)
    t0 = time.time()
    nx, nz, k = m1(key, jnp.int32(40), batch)
    log(f"hard miner first call done in {time.time() - t0:.1f}s kept={int(k)}")
    t0 = time.time()
    nx, nz, k = m1(jax.random.fold_in(key, 1), jnp.int32(40), batch)
    log(f"hard miner steady call {time.time() - t0:.2f}s kept={int(k)}")


if __name__ == "__main__":
    main()
