#!/usr/bin/env python
"""Multi-device scaling benchmark: weak-scaling efficiency of the
data-parallel (and optionally edge-partitioned) Monte-Carlo cascade.

Weak scaling: each data shard keeps a fixed LOCAL batch, so perfect
scaling doubles global syndromes/s per doubling of the 'data' axis.
Prints one JSON line per mesh shape with the measured efficiency vs the
single-device run.

On a real multi-chip TPU slice this measures ICI-scaled throughput (the
north-star metric: >=80 % efficiency at 2 hosts); on the CPU virtual mesh
(JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8)
devices share the same cores, so it validates the harness and the sharded
program, not actual speedup.

    python scripts/bench_scaling.py --code gb48 --local-batch 512 \
        --shards 1 2 4 8 [--edge-shards 2]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--code", default="gb48", choices=["gb48", "n882", "n1270"])
    ap.add_argument("--local-batch", type=int, default=512)
    ap.add_argument("--shards", type=int, nargs="+", default=[1, 2, 4, 8],
                    help="data-axis sizes to sweep")
    ap.add_argument("--edge-shards", type=int, default=1)
    ap.add_argument("--iters", type=int, default=3, help="timed steps per shape")
    ap.add_argument("--iters1", type=int, default=64)
    ap.add_argument("--iters2", type=int, default=16)
    ap.add_argument("-nG", "--num-rounds", type=int, default=3)
    ap.add_argument("-p", type=float, default=0.05)
    args = ap.parse_args()

    from feedback_gnn_tpu.codes import (
        create_generalized_bicycle_codes,
        ghp_882_24,
        ghp_1270_28,
    )
    from feedback_gnn_tpu.codes.graph import QuantumGraph
    from feedback_gnn_tpu.decoders import CascadeConfig, init_feedback_gnn
    from feedback_gnn_tpu.parallel import (
        make_mesh,
        make_sharded_eval_step,
        shard_quantum_graph,
    )

    builder = {
        "gb48": lambda: create_generalized_bicycle_codes(
            24, [0, 2, 8, 15], [0, 2, 12, 17]
        ),
        "n882": ghp_882_24,
        "n1270": ghp_1270_28,
    }[args.code]
    code = builder()
    graph = QuantumGraph.from_code(code, stage_mode=True)
    params = init_feedback_gnn(jax.random.PRNGKey(0))
    cfg = CascadeConfig(
        num_iter1=args.iters1, num_iter2=args.iters2, num_rounds=args.num_rounds
    )
    edges = int(graph.gx.num_edges + graph.gz.num_edges)

    ndev = len(jax.devices())
    base = None
    for d in args.shards:
        if d * args.edge_shards > ndev:
            print(f"# skipping data={d} (only {ndev} devices)", file=sys.stderr)
            continue
        mesh = make_mesh(data=d, edge=args.edge_shards)
        stacked = shard_quantum_graph(graph, args.edge_shards)
        step = make_sharded_eval_step(
            mesh, stacked, [params], cfg, args.local_batch
        )
        key = jax.random.PRNGKey(1)
        out = step(key, jnp.float32(args.p))  # compile + warmup
        _ = (int(out[0]), int(out[1]))
        t0 = time.perf_counter()
        for i in range(args.iters):
            out = step(jax.random.fold_in(key, i), jnp.float32(args.p))
        _ = (int(out[0]), int(out[1]))
        dt = time.perf_counter() - t0
        global_batch = args.local_batch * d
        sps = global_batch * args.iters / dt
        if base is None:
            base = sps / d  # per-device throughput at the first shape
        eff = sps / (base * d)
        print(json.dumps({
            "metric": f"{args.code}_cascade_scaling",
            "data_shards": d,
            "edge_shards": args.edge_shards,
            "syndromes_per_s": round(sps, 1),
            "edges_per_s": round(sps * edges * (args.iters1 + cfg.num_rounds * args.iters2), 1),
            "weak_scaling_efficiency": round(eff, 3),
        }))


if __name__ == "__main__":
    main()
