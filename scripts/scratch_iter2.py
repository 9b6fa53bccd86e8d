#!/usr/bin/env python
"""Curriculum self-iteration on top of a trained from-scratch model.

Round-5 finding (runs/scratch3): scaling the EASY mining scan 10x closed
the p=0.10 gap to 2.0x of the shipped weights but left p=0.09 at 5.2x —
the easy set is not the lever for the waterfall tail.  What moved the gap
every round was iterating the curriculum: each better model mines harder
failures for the next.  This script runs ONE such iteration:

  1. re-mine hard failures through the CURRENT final model's cascade
     (BP64 -> GNN -> BP64, the Feedback_GNN_Error_Model schedule of
     Generate_dataset.ipynb cell 8) — these are exactly the residual
     failure modes of the strong model;
  2. fine-tune the final model (warm start, lower LR) on
     easy + (hard_v1 + hard_v2) x oversample;
  3. evaluate against the shipped weights at the same seeds.

Artifacts land in --out-dir (default: the scratch3 directory) under
*_iter2 names; phases resume from existing artifacts like the main script.

    python scripts/scratch_iter2.py --out-dir runs/scratch3
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from train_from_scratch import evaluate, log, mine_phase, train_phase


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--code", default="n882", choices=["n882", "n1270"])
    ap.add_argument("--out-dir", default="runs/scratch3")
    ap.add_argument("--wt", type=int, nargs=2, default=[4, 60])
    ap.add_argument("--hard-mine-batches", type=int, default=120)
    ap.add_argument("--hard-mine-batch-size", type=int, default=20480)
    ap.add_argument("--mine-compact-cap", type=int, default=1024)
    ap.add_argument("--hard-cap", type=int, default=3000)
    ap.add_argument("--hard-oversample", type=int, default=50)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--batch-size", type=int, default=100)
    ap.add_argument("--steps-per-call", type=int, default=32)
    ap.add_argument("--mine-ahead", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-4,
                    help="fine-tune LR (the from-scratch stages use 2e-4)")
    ap.add_argument("--eval-p", type=float, nargs="+", default=[0.10, 0.09])
    ap.add_argument("--eval-batch", type=int, default=20480)
    ap.add_argument("--eval-target-errors", type=int, default=100)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--base-tag", default="final_64_16_mixed",
                    help="artifact tag of the model to mine through and "
                    "fine-tune from (e.g. final_64_16_iter2 for iteration 3)")
    ap.add_argument("--hard-tags", default="hard",
                    help="comma-separated artifact tags of PRIOR hard sets "
                    "to keep in the mix (e.g. hard,hard_iter2)")
    ap.add_argument("--out-tag", default="iter2",
                    help="suffix for this iteration's artifacts "
                    "(hard_<out-tag>, final_64_16_<out-tag>, <code>_<out-tag>_eval.json)")
    ap.add_argument("--mine-seed-salt", type=int, default=13,
                    help="fold_in salt for this iteration's mining keys "
                    "(use a different value per iteration)")
    ap.add_argument("--skip-shipped-eval", action="store_true",
                    help="skip re-measuring the shipped baseline (reuse the "
                    "numbers in <out-dir>/<code>_scratch_eval.json)")
    args = ap.parse_args()

    from feedback_gnn_tpu.codes.graph import QuantumGraph
    from feedback_gnn_tpu.codes.qc import qc_pair_from_code
    from feedback_gnn_tpu.config import CODE_REGISTRY, build_code
    from feedback_gnn_tpu.decoders.gnn_feedback import init_feedback_gnn, load_weights
    from feedback_gnn_tpu.io.checkpoint import load_pytree
    from feedback_gnn_tpu.train import TrainConfig, make_cascade_failure_miner, mix_easy_hard

    key = jax.random.PRNGKey(args.seed)
    log(f"building code {args.code} ...")
    code = build_code(args.code)
    graph = QuantumGraph.from_code(code, stage_mode=True)
    qc = qc_pair_from_code(code)
    weights = list(range(args.wt[0], args.wt[1] + 1, 2))

    like = init_feedback_gnn(jax.random.PRNGKey(0))
    final_v1 = load_pytree(
        os.path.join(args.out_dir, f"{args.code}_{args.base_tag}.npz"), like=like
    )
    d = np.load(os.path.join(args.out_dir, f"{args.code}_easy.npz"))
    ex, ez = d["x"], d["z"]
    hxs, hzs = [], []
    for tag in args.hard_tags.split(","):
        dh = np.load(os.path.join(args.out_dir, f"{args.code}_{tag.strip()}.npz"))
        hxs.append(dh["x"])
        hzs.append(dh["z"])
    hx1, hz1 = np.vstack(hxs), np.vstack(hzs)
    log(f"loaded: {ex.shape[0]} easy, {hx1.shape[0]} prior hard "
        f"({args.hard_tags}), base params {args.base_tag}")

    # ---- phase 1: hard set v2 through the CURRENT final model ----
    hminer = make_cascade_failure_miner(
        graph, final_v1, num_iter1=64, num_iter2=64, wt_max=args.wt[1],
        compact_cap=args.mine_compact_cap, qc=qc,
    )
    hx2, hz2 = mine_phase(
        hminer, jax.random.fold_in(key, args.mine_seed_salt), weights,
        args.hard_mine_batches, args.hard_mine_batch_size,
        args.hard_cap, f"{args.code}_hard_{args.out_tag}", args.out_dir,
        ahead=args.mine_ahead,
    )

    # ---- phase 2: fine-tune on easy + (hard_v1 + hard_v2) x oversample ----
    hx = np.vstack([hx1, hx2])
    hz = np.vstack([hz1, hz2])
    mx, mz = mix_easy_hard((ex, ez), (hx, hz), args.hard_oversample)
    log(f"{args.out_tag} mixed set: {mx.shape[0]} samples "
        f"({ex.shape[0]} easy + {hx.shape[0]} hard x{args.hard_oversample})")
    final_v2 = train_phase(
        graph, mx, mz,
        TrainConfig(num_iter1=64, num_iter2=16, loss_from=8,
                    learning_rate=args.lr),
        jax.random.fold_in(key, 14), args.batch_size,
        f"{args.code}_final_64_16_{args.out_tag}", args.out_dir,
        init_params=final_v1, epochs=args.epochs,
        steps_per_call=args.steps_per_call,
    )

    # ---- phase 3: LER vs shipped, same seeds as the v1 eval ----
    res_t = evaluate(graph, qc, [final_v2], args.eval_p, args.eval_batch,
                     args.seed, args.eval_target_errors,
                     f"{args.out_tag}-fine-tuned")
    out = {args.out_tag: {"ps": list(map(float, res_t.ps)),
                     "ler": [float(v) for v in res_t.ler],
                     "errors": [int(v) for v in res_t.logical_errors],
                     "blocks": [int(v) for v in res_t.num_blocks]}}
    if not args.skip_shipped_eval:
        shipped = load_weights(CODE_REGISTRY[args.code]["weights"])
        res_s = evaluate(graph, qc, [shipped], args.eval_p, args.eval_batch,
                         args.seed, args.eval_target_errors, "shipped")
        out["shipped"] = {"ps": list(map(float, res_s.ps)),
                          "ler": [float(v) for v in res_s.ler],
                          "errors": [int(v) for v in res_s.logical_errors],
                          "blocks": [int(v) for v in res_s.num_blocks]}
    with open(os.path.join(args.out_dir,
                           f"{args.code}_{args.out_tag}_eval.json"), "w") as f:
        json.dump(out, f, indent=1)
    log("done")


if __name__ == "__main__":
    main()
