#!/usr/bin/env python
"""Full from-scratch training curriculum -> evaluated LER (VERDICT r2 item 3).

Reproduces the reference's two-phase curriculum end-to-end at a reduced but
honest scale (reference: examples/Generate_dataset.ipynb cells 1-16 +
examples/Feedback_GNN.ipynb cell 2; shipped-weight filenames encode it:
``wt_4_40_iter_16_16`` coarse -> ``wt_4_60_iter_64_16_mixed`` final):

  1. mine "easy" BP4-64 failures at fixed weights wt = lo..hi (step 2);
  2. train a COARSE feedback GNN (16/16 iteration schedule) on the easy set
     restricted to wt <= coarse_hi;
  3. mine "hard" failures that survive BP64 -> coarse GNN -> BP64;
  4. train the FINAL model (64/16) on easy + hard x 50 oversampling;
  5. evaluate the trained cascade (nG=3) against the SHIPPED weights at the
     same p points / seeds and print both LER tables.

Every phase checkpoints its artifacts under --out-dir and is skipped when
the artifact already exists, so an interrupted run resumes.

    python scripts/train_from_scratch.py -c n882 --out-dir runs/scratch
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import jax.numpy as jnp


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def mine_phase(miner, key, weights, batches, batch_size, cap, tag, out_dir,
               ahead=8):
    """Mine failures per weight with a kept-failures cap; save one npz.

    The miner must be built with ``compact_cap`` (device-side failure
    compaction): each call returns (nx [n,K] uint8, nz, kept) and the host
    slices the valid prefix — over the tunneled TPU this is the difference
    between a transfer-bound and a compute-bound mining loop.

    ``ahead`` batches are dispatched before the first result is forced:
    JAX's async dispatch then overlaps the tunnel's per-call round-trip
    latency (~0.5 s, which dominated round 4's 15 k samples/s) with device
    compute.  The kept-cap early-break lags by up to ``ahead`` batches
    (slight over-scan, never under-collection)."""
    path = os.path.join(out_dir, f"{tag}.npz")
    if os.path.exists(path):
        d = np.load(path)
        log(f"{tag}: reusing {path} ({d['x'].shape[0]} samples)")
        return d["x"], d["z"]
    xs, zs, report = [], [], {}
    t0 = time.time()
    for wt in weights:
        kept_x, kept_z = [], []
        scanned = 0
        pending = []
        total_kept = 0

        def drain():
            nonlocal total_kept
            nx, nz, kept = pending.pop(0)
            kept = int(kept)  # forces the transfer (sync point)
            kept_x.append(np.asarray(nx).T[:kept])
            kept_z.append(np.asarray(nz).T[:kept])
            total_kept += kept

        for b in range(batches):
            k = jax.random.fold_in(jax.random.fold_in(key, wt), b)
            pending.append(miner(k, jnp.int32(wt), int(batch_size)))
            scanned += batch_size
            if len(pending) >= ahead:
                drain()
            if total_kept >= cap:
                break
        while pending:
            drain()
        x = np.vstack(kept_x)[:cap].astype(np.uint8)
        z = np.vstack(kept_z)[:cap].astype(np.uint8)
        xs.append(x)
        zs.append(z)
        report[int(wt)] = x.shape[0]
        log(f"{tag}: wt={wt} kept {x.shape[0]} failures "
            f"({scanned} scanned, {scanned / max(time.time() - t0, 1e-9):.0f}/s)")
        t0 = time.time()
    x, z = np.vstack(xs), np.vstack(zs)
    np.savez_compressed(path, x=x, z=z,
                        weights=np.asarray(list(report)),
                        kept=np.asarray(list(report.values())))
    log(f"{tag}: {x.shape[0]} samples -> {path}")
    return x, z


def train_phase(graph, x, z, tcfg, key, batch_size, tag, out_dir,
                init_params=None, log_every=200, epochs=1,
                steps_per_call=1):
    from feedback_gnn_tpu.decoders.gnn_feedback import init_feedback_gnn
    from feedback_gnn_tpu.io.checkpoint import load_pytree, save_pytree
    from feedback_gnn_tpu.train import (
        batch_iterator,
        batch_iterator_stacked,
        make_optimizer,
        make_train_step,
        make_train_step_multi,
    )

    params = init_params if init_params is not None else init_feedback_gnn(key)
    path = os.path.join(out_dir, f"{tag}.npz")
    if os.path.exists(path):
        log(f"{tag}: reusing {path}")
        return load_pytree(path, like=params)

    opt = make_optimizer(tcfg)
    opt_state = opt.init(params)
    k = max(1, int(steps_per_call))
    step = (make_train_step(graph, tcfg, opt) if k == 1
            else make_train_step_multi(graph, tcfg, opt, k))
    it, t0 = 0, time.time()
    losses = []

    def report(ls, fbs, bls, j):
        nonlocal it
        prev = it
        it += j
        losses.extend(np.asarray(ls).reshape(-1).tolist())
        if it // log_every != prev // log_every or prev == 0:
            log(f"{tag}: ep {ep + 1}/{epochs} it {it} "
                f"loss {losses[-1]:.4f} bler {float(np.asarray(bls).reshape(-1)[-1]):.3f} "
                f"flagged {float(np.asarray(fbs).reshape(-1)[-1]):.3f} "
                f"({it * batch_size / (time.time() - t0):.0f} samples/s)")

    single = None
    for ep in range(epochs):
        ekey = jax.random.fold_in(key, 7 + ep)
        if k == 1:
            for nx, nz in batch_iterator(x, z, batch_size, ekey):
                params, opt_state, loss, fb, bl = step(params, opt_state, nx, nz)
                report(loss, fb, bl, 1)
            continue
        for nx, nz in batch_iterator_stacked(x, z, batch_size, ekey, k):
            if nx.shape[0] == k:
                params, opt_state, ls, fbs, bls = step(params, opt_state, nx, nz)
                report(ls, fbs, bls, k)
            else:
                # per-epoch remainder (< k minibatches) runs unfused so no
                # shuffled sample is dropped beyond the drop_remainder tail
                if single is None:
                    single = make_train_step(graph, tcfg, opt)
                for j in range(nx.shape[0]):
                    params, opt_state, loss, fb, bl = single(
                        params, opt_state, nx[j], nz[j]
                    )
                    report(loss, fb, bl, 1)
    save_pytree(params, path)
    log(f"{tag}: trained {it} steps ({epochs} epochs), "
        f"final loss {np.mean(losses[-50:]):.4f} -> {path}")
    return params


def evaluate(graph, qc, params_list, ps, batch, seed, target, tag):
    from feedback_gnn_tpu.decoders import CascadeConfig, sandwich_eval_step
    from feedback_gnn_tpu.sim import sim_ler

    cfg = CascadeConfig(num_iter1=64, num_iter2=16, num_rounds=3, p0=0.05)

    @jax.jit
    def step(key, p):
        return sandwich_eval_step(graph, params_list, cfg, key, p, batch, qc=qc)

    log(f"eval {tag}: nG=3 at p={ps}")
    res = sim_ler(step, ps, batch_size=batch, max_mc_iter=100000,
                  num_target_block_errors=target, seed=seed, verbose=True)
    print()
    print(res.summary(), flush=True)
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--code", default="n882", choices=["n882", "n1270"])
    ap.add_argument("--out-dir", default="runs/scratch")
    ap.add_argument("--wt", type=int, nargs=2, default=[4, 60])
    ap.add_argument("--coarse-hi", type=int, default=40)
    ap.add_argument("--mine-batches", type=int, default=60,
                    help="mining batches per weight (x batch-size = samples "
                    "scanned per wt; the reference scans 50 x 50000)")
    ap.add_argument("--mine-batch-size", type=int, default=8192)
    ap.add_argument("--hard-mine-batches", type=int, default=None,
                    help="mining batches per weight for the HARD phase "
                    "(default: --mine-batches)")
    ap.add_argument("--hard-mine-batch-size", type=int, default=None,
                    help="batch size for the HARD phase (default: "
                    "--mine-batch-size).  The cascade miner's XLA program "
                    "fails to remote-compile at 8192 on the tunneled axon "
                    "backend (hangs; diagnosed round 4) — 2048/4096 compile "
                    "fine")
    ap.add_argument("--mine-compact-cap", type=int, default=2048,
                    help="device-side failure-compaction width per batch")
    ap.add_argument("--easy-cap", type=int, default=12000, help="kept failures per wt")
    ap.add_argument("--hard-cap", type=int, default=3000)
    ap.add_argument("--hard-oversample", type=int, default=50)
    ap.add_argument("--coarse-epochs", type=int, default=4,
                    help="epochs over the easy wt<=coarse-hi set for the "
                    "coarse 16/16 stage (the reference's single epoch is "
                    "over a much larger mined set)")
    ap.add_argument("--final-epochs", type=int, default=1)
    ap.add_argument("--batch-size", type=int, default=100)
    ap.add_argument("--steps-per-call", type=int, default=1,
                    help="optimizer steps fused per device call "
                    "(make_train_step_multi lax.scan); >1 amortizes the "
                    "tunneled backend's per-call dispatch latency")
    ap.add_argument("--mine-ahead", type=int, default=8,
                    help="mining batches dispatched ahead of the first "
                    "forced result (async-dispatch pipelining)")
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--eval-p", type=float, nargs="+", default=[0.10, 0.09])
    ap.add_argument("--eval-batch", type=int, default=20480)
    ap.add_argument("--eval-target-errors", type=int, default=100)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--skip-shipped-eval", action="store_true")
    ap.add_argument("--mine-qc", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="run the miners' BP on the fused Pallas QC kernel "
                    "(~4x the XLA gather path on TPU)")
    args = ap.parse_args()

    from feedback_gnn_tpu.codes.graph import QuantumGraph
    from feedback_gnn_tpu.codes.qc import qc_pair_from_code
    from feedback_gnn_tpu.config import CODE_REGISTRY, build_code
    from feedback_gnn_tpu.decoders.gnn_feedback import load_weights
    from feedback_gnn_tpu.train import (
        TrainConfig,
        make_bp_failure_miner,
        make_cascade_failure_miner,
        mix_easy_hard,
    )

    os.makedirs(args.out_dir, exist_ok=True)
    key = jax.random.PRNGKey(args.seed)
    log(f"building code {args.code} ...")
    code = build_code(args.code)
    graph = QuantumGraph.from_code(code, stage_mode=True)
    qc = qc_pair_from_code(code)
    weights = list(range(args.wt[0], args.wt[1] + 1, 2))
    wt_max = args.wt[1]

    # ---- phase 1: easy set (BP4-64 failures) ----
    mine_qc = qc if args.mine_qc else None
    miner = make_bp_failure_miner(graph, num_iter=64, wt_max=wt_max,
                                  compact_cap=args.mine_compact_cap,
                                  qc=mine_qc)
    ex, ez = mine_phase(miner, jax.random.fold_in(key, 1), weights,
                        args.mine_batches, args.mine_batch_size,
                        args.easy_cap, f"{args.code}_easy", args.out_dir,
                        ahead=args.mine_ahead)

    # easy subset for the coarse model (wt <= coarse_hi): mined per-wt in
    # order, so reload the per-wt kept counts to slice the stack
    d = np.load(os.path.join(args.out_dir, f"{args.code}_easy.npz"))
    upto = int(np.sum(d["kept"][d["weights"] <= args.coarse_hi]))
    cx, cz = ex[:upto], ez[:upto]
    log(f"coarse subset: {cx.shape[0]} samples (wt <= {args.coarse_hi})")

    # ---- phase 2: coarse GNN, 16/16 schedule ----
    coarse = train_phase(
        graph, cx, cz, TrainConfig(num_iter1=16, num_iter2=16, loss_from=8,
                                   learning_rate=args.lr),
        jax.random.fold_in(key, 2), args.batch_size,
        f"{args.code}_coarse_16_16", args.out_dir,
        epochs=args.coarse_epochs,
        steps_per_call=args.steps_per_call,
    )

    # ---- phase 3: hard set (survives BP64 -> coarse GNN -> BP64) ----
    hminer = make_cascade_failure_miner(graph, coarse, num_iter1=64,
                                        num_iter2=64, wt_max=wt_max,
                                        compact_cap=args.mine_compact_cap,
                                        qc=mine_qc)
    hard_batches = args.hard_mine_batches or args.mine_batches
    hard_bs = args.hard_mine_batch_size or args.mine_batch_size
    hx, hz = mine_phase(hminer, jax.random.fold_in(key, 3), weights,
                        hard_batches, hard_bs,
                        args.hard_cap, f"{args.code}_hard", args.out_dir,
                        ahead=args.mine_ahead)

    # ---- phase 4: final model, 64/16 on easy + hard x oversample ----
    mx, mz = mix_easy_hard((ex, ez), (hx, hz), args.hard_oversample)
    log(f"mixed set: {mx.shape[0]} samples "
        f"({ex.shape[0]} easy + {hx.shape[0]} hard x{args.hard_oversample})")
    final = train_phase(
        graph, mx, mz, TrainConfig(num_iter1=64, num_iter2=16, loss_from=8,
                                   learning_rate=args.lr),
        jax.random.fold_in(key, 4), args.batch_size,
        f"{args.code}_final_64_16_mixed", args.out_dir,
        epochs=args.final_epochs,
        steps_per_call=args.steps_per_call,
    )

    # ---- phase 5: LER of trained vs shipped weights, same seeds ----
    res_t = evaluate(graph, qc, [final], args.eval_p, args.eval_batch,
                     args.seed, args.eval_target_errors, "trained-from-scratch")
    out = {"trained": {"ps": list(map(float, res_t.ps)),
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
    with open(os.path.join(args.out_dir, f"{args.code}_scratch_eval.json"), "w") as f:
        json.dump(out, f, indent=1)
    log("done")


if __name__ == "__main__":
    main()
