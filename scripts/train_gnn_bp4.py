#!/usr/bin/env python
"""Train and evaluate the fully-learned GNN decoder (GNN_BP4) end-to-end.

The reference ships GNN_BP4 (gnn.py:71-423) but no training/eval entry
point and no published numbers (README.md:46: "results not in the paper" —
its `call` even crashes on an arity bug, gnn.py:408).  This script provides
the missing end-to-end path: train on fixed-weight BP-style noise (deep-
supervision BCE over the per-iteration perp logits, gnn_bp4_loss), then
sweep the depolarizing channel and record trained-vs-initialization LER —
the bar for a component the reference never validated is "demonstrably
decodes better than initialization after training".

    python scripts/train_gnn_bp4.py --code gb48 --steps 2000 \
        --eval-p 0.02 0.03 0.04 --out runs/gnn_bp4_gb48.json
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--code", default="gb48", choices=["gb48", "surface3", "n882"])
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch-size", type=int, default=120)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--train-p", type=float, default=0.05,
                    help="iid depolarizing rate for training noise")
    ap.add_argument("--num-iter", type=int, default=8)
    ap.add_argument("--embed-dims", type=int, default=20)
    ap.add_argument("--eval-p", type=float, nargs="+",
                    default=[0.01, 0.02, 0.03, 0.04, 0.05])
    ap.add_argument("--eval-batches", type=int, default=20)
    ap.add_argument("--eval-batch-size", type=int, default=2048)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="runs/gnn_bp4_eval.json")
    ap.add_argument("--weights-out", default=None)
    args = ap.parse_args()

    import optax

    from feedback_gnn_tpu.channels.pauli import depolarizing_probs, pauli_iid
    from feedback_gnn_tpu.codes import (
        create_generalized_bicycle_codes,
        create_surface_codes,
        ghp_882_24,
    )
    from feedback_gnn_tpu.codes.graph import QuantumGraph
    from feedback_gnn_tpu.decoders.gnn_full import (
        GNNBP4Config,
        gnn_bp4_loss,
        init_gnn_bp4,
        make_logit_rowsets,
    )
    from feedback_gnn_tpu.io.checkpoint import save_pytree
    from feedback_gnn_tpu.models import gnn_bp4_eval_step

    builder = {
        "gb48": lambda: create_generalized_bicycle_codes(
            24, [0, 2, 8, 15], [0, 2, 12, 17]
        ),
        "surface3": lambda: create_surface_codes(3),
        "n882": ghp_882_24,
    }[args.code]
    code = builder()
    graph = QuantumGraph.from_code(code, stage_mode=True)
    lrowsets = make_logit_rowsets(graph)
    cfg = GNNBP4Config(
        num_embed_dims=args.embed_dims,
        num_msg_dims=args.embed_dims,
        num_iter=args.num_iter,
    )
    key = jax.random.PRNGKey(args.seed)
    params0 = init_gnn_bp4(jax.random.fold_in(key, 0), cfg, graph)

    opt = optax.chain(optax.clip(10.0), optax.adam(args.lr))
    opt_state = opt.init(params0)
    n = graph.n

    @jax.jit
    def train_step(params, opt_state, k):
        px, py, pz = depolarizing_probs(args.train_p)
        nx, nz = pauli_iid(k, px, py, pz, n, args.batch_size)
        loss, grads = jax.value_and_grad(gnn_bp4_loss)(
            params, graph, lrowsets, cfg, nx.astype(jnp.float32),
            nz.astype(jnp.float32),
        )
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params = params0
    t0 = time.time()
    for it in range(args.steps):
        params, opt_state, loss = train_step(
            params, opt_state, jax.random.fold_in(key, 1000 + it)
        )
        if it % 200 == 0 or it == args.steps - 1:
            print(f"it {it}: loss {float(loss):.4f} "
                  f"({(it + 1) * args.batch_size / (time.time() - t0):.0f} "
                  "samples/s)", flush=True)

    @jax.jit
    def eval_step(p_, k, pa):
        return gnn_bp4_eval_step(
            graph, lrowsets, pa, cfg, k, p_, args.eval_batch_size
        )

    def sweep(pa, tag):
        out = {}
        for p in args.eval_p:
            f = l = 0
            for b in range(args.eval_batches):
                k = jax.random.fold_in(jax.random.fold_in(key, 5000 + b), int(p * 1e4))
                ff, ll = eval_step(jnp.float32(p), k, pa)
                f += int(ff)
                l += int(ll)
            blocks = args.eval_batches * args.eval_batch_size
            out[p] = {"flagged": f, "logical": l, "blocks": blocks,
                      "ler": l / blocks}
            print(f"{tag} p={p}: LER {l / blocks:.4g} "
                  f"({l}/{blocks}, flagged {f})", flush=True)
        return out

    results = {
        "code": args.code, "cfg": cfg._asdict(), "steps": args.steps,
        "train_p": args.train_p,
        "init": sweep(params0, "init   "),
        "trained": sweep(params, "trained"),
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out}")
    if args.weights_out:
        save_pytree(params, args.weights_out)
        print(f"saved weights to {args.weights_out}")


if __name__ == "__main__":
    main()
