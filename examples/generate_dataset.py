#!/usr/bin/env python
"""Failure-mining dataset generation (counterpart of the reference
examples/Generate_dataset.ipynb).

Phase 1 ("easy"): fixed-weight Pauli errors that plain BP-64 fails to
decode, mined per weight window.  Phase 2 ("hard", with a trained coarse
GNN): errors that survive the full BP64 -> GNN -> BP16 cascade.  The final
training set mixes easy + oversampled hard examples
(Generate_dataset.ipynb cells 1-16).

    python examples/generate_dataset.py -c n882 --wt 4 20 --out datasets/
    python examples/generate_dataset.py -c n882 --hard --coarse-weights <npy>
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--code", default="n882")
    ap.add_argument("--wt", type=int, nargs=2, default=[4, 20],
                    metavar=("FROM", "TO"), help="error-weight window")
    ap.add_argument("--batches", type=int, default=4)
    ap.add_argument("-bs", "--batch-size", type=int, default=5000)
    ap.add_argument("--out", default="datasets")
    ap.add_argument("--hard", action="store_true",
                    help="mine cascade survivors (needs --coarse-weights)")
    ap.add_argument("--coarse-weights", default=None)
    ap.add_argument("--oversample", type=int, default=50)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax

    from feedback_gnn_tpu.codes.graph import QuantumGraph
    from feedback_gnn_tpu.config import build_code
    from feedback_gnn_tpu.train.data import (
        make_bp_failure_miner,
        make_cascade_failure_miner,
        mine_failures,
        mix_easy_hard,
    )

    code = build_code(args.code)
    graph = QuantumGraph.from_code(code, stage_mode=True)
    os.makedirs(args.out, exist_ok=True)

    if args.hard:
        from feedback_gnn_tpu.decoders.gnn_feedback import load_weights

        assert args.coarse_weights, "--hard requires --coarse-weights"
        params = load_weights(args.coarse_weights)
        miner = make_cascade_failure_miner(graph, params)
        prefix = f"{args.code}_hard"
    else:
        miner = make_bp_failure_miner(graph)
        prefix = f"{args.code}_easy"

    weights = list(range(args.wt[0], args.wt[1] + 1, 2))
    shards = mine_failures(
        miner,
        jax.random.PRNGKey(args.seed),
        weights,
        args.batches,
        args.batch_size,
        out_dir=args.out,
        prefix=prefix,
    )
    x = np.vstack([shards[w][0] for w in weights])
    z = np.vstack([shards[w][1] for w in weights])
    np.save(os.path.join(args.out, f"{prefix}_x_all.npy"), x)
    np.save(os.path.join(args.out, f"{prefix}_z_all.npy"), z)
    print(f"mined {x.shape[0]} failures -> {args.out}/{prefix}_*")

    easy_x = os.path.join(args.out, f"{args.code}_easy_x_all.npy")
    hard_x = os.path.join(args.out, f"{args.code}_hard_x_all.npy")
    if os.path.exists(easy_x) and os.path.exists(hard_x):
        ex = np.load(easy_x)
        ez = np.load(easy_x.replace("_x_", "_z_"))
        hx = np.load(hard_x)
        hz = np.load(hard_x.replace("_x_", "_z_"))
        mx, mz = mix_easy_hard((ex, ez), (hx, hz), hard_oversample=args.oversample)
        np.save(os.path.join(args.out, f"{args.code}_x_all.npy"), mx)
        np.save(os.path.join(args.out, f"{args.code}_z_all.npy"), mz)
        print(f"mixed dataset: {mx.shape[0]} samples (hard x{args.oversample})")


if __name__ == "__main__":
    main()
