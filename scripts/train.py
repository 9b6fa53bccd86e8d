#!/usr/bin/env python
"""Feedback-GNN training CLI (reference: examples/Feedback_GNN.ipynb).

Trains the feedback GNN on mined BP-failure datasets with the two-stage
pipeline (frozen BP-64 features -> GNN+BP-16 deep-supervision loss).

    python scripts/train.py -c n882 --data-dir datasets/ --epochs 1
    python scripts/train.py -c n882 --mine --weights-out out.npy
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax

# this environment's sitecustomize pins jax_platforms="axon,cpu" via
# jax.config at interpreter start; honor an explicit JAX_PLATFORMS request
# (e.g. cpu + --xla_force_host_platform_device_count for virtual meshes)
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--code", default="n882")
    ap.add_argument("--data-dir", default=None, help="dir with *_x_all.npy/_z_all.npy")
    ap.add_argument("--mine", action="store_true",
                    help="mine an 'easy' BP-failure dataset before training")
    ap.add_argument("--mine-weights", type=int, nargs=2, default=[4, 20],
                    metavar=("WT_FROM", "WT_TO"))
    ap.add_argument("--mine-batches", type=int, default=4)
    ap.add_argument("--mine-batch-size", type=int, default=2000)
    ap.add_argument("--batch-size", type=int, default=100)
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--iters1", type=int, default=64)
    ap.add_argument("--iters2", type=int, default=16)
    ap.add_argument("--loss-from", type=int, default=8)
    ap.add_argument("--weights-in", default=None)
    ap.add_argument("--weights-out", default="feedback_gnn_trained.npy")
    ap.add_argument("--log-every", type=int, default=100)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from feedback_gnn_tpu.config import build_code
    from feedback_gnn_tpu.codes.graph import QuantumGraph
    from feedback_gnn_tpu.decoders.gnn_feedback import (
        init_feedback_gnn,
        load_weights,
        save_reference_weights,
    )
    from feedback_gnn_tpu.train import (
        TrainConfig,
        batch_iterator,
        make_bp_failure_miner,
        make_optimizer,
        make_train_step,
        mine_failures,
    )

    print(f"building code {args.code} ...")
    code = build_code(args.code)
    graph = QuantumGraph.from_code(code, stage_mode=True)

    key = jax.random.PRNGKey(args.seed)
    if args.weights_in:
        params = load_weights(args.weights_in)
    else:
        params = init_feedback_gnn(key)

    if args.mine:
        print("mining BP-failure dataset ...")
        miner = make_bp_failure_miner(graph, num_iter=args.iters1)
        shards = mine_failures(
            miner,
            jax.random.fold_in(key, 1),
            range(args.mine_weights[0], args.mine_weights[1] + 1),
            args.mine_batches,
            args.mine_batch_size,
        )
        x = np.vstack([v[0] for v in shards.values()])
        z = np.vstack([v[1] for v in shards.values()])
        print(f"mined {x.shape[0]} failure samples")
    else:
        assert args.data_dir, "--data-dir or --mine required"
        x = np.load(os.path.join(args.data_dir, f"{args.code}_x_all.npy"))
        z = np.load(os.path.join(args.data_dir, f"{args.code}_z_all.npy"))

    tcfg = TrainConfig(
        num_iter1=args.iters1,
        num_iter2=args.iters2,
        loss_from=args.loss_from,
        learning_rate=args.lr,
    )
    opt = make_optimizer(tcfg)
    opt_state = opt.init(params)
    step = make_train_step(graph, tcfg, opt)

    it = 0
    t0 = time.time()
    for epoch in range(args.epochs):
        for nx, nz in batch_iterator(
            x, z, args.batch_size, jax.random.fold_in(key, 100 + epoch)
        ):
            params, opt_state, loss, flagged_bler, bler = step(
                params, opt_state, nx, nz
            )
            it += 1
            if it % args.log_every == 0:
                print(
                    f"it {it}: loss {float(loss):.4f} bler {float(bler):.4f} "
                    f"flagged {float(flagged_bler):.4f} "
                    f"({it * args.batch_size / (time.time() - t0):.0f} samples/s)"
                )

    save_reference_weights(params, args.weights_out)
    print(f"saved weights to {args.weights_out}")


if __name__ == "__main__":
    main()
