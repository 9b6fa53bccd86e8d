#!/usr/bin/env python
"""BP + OSD-0 evaluation (counterpart of the reference examples/OSD.ipynb).

Evaluates the [[882,24]] GHP code with (a) plain BP4, (b) BP4 + OSD-0
fallback on the depolarizing channel, and (c) BP2 + OSD-0 on the BSC —
the configurations of OSD.ipynb cells 2/3/7/8.

    python examples/osd_eval.py -p 0.10 0.09 -bs 2000
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-p", type=float, nargs="+", default=[0.10])
    ap.add_argument("-bs", "--batch-size", type=int, default=2000)
    ap.add_argument("--target-errors", type=int, default=50)
    ap.add_argument("--max-mc-iter", type=int, default=50)
    ap.add_argument("--mode", choices=["bp4", "bp2", "bp4-osd", "bp2-osd"],
                    default="bp4-osd")
    ap.add_argument("--iters", type=int, default=None,
                    help="BP iterations for the plain bp4/bp2 modes "
                    "(default 64 SP / 100 NMS)")
    ap.add_argument("--cn-type", default=None,
                    choices=["boxplus-phi", "boxplus", "minsum"],
                    help="CN update for the plain bp4/bp2 modes "
                    "(default boxplus-phi; reference's NMS rows use minsum)")
    ap.add_argument("--factor", type=float, default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--accounting", choices=["all", "undetected"],
                    default="all",
                    help="logical-error convention for the plain bp4/bp2 "
                    "modes: 'all' counts any ls_hat!=0 (sim_ber qldpc "
                    "semantics); 'undetected' counts only syndrome-"
                    "consistent logical flips — the convention of the "
                    "OSD.ipynb cells 7-8 plain-BP tables")
    ap.add_argument("--checkpoint", default=None,
                    help="MC-state resume file (JSON), as in evaluate.py")
    ap.add_argument("--osd-cap", type=int, default=None,
                    help="run OSD on a dense flagged-only sub-batch of this "
                    "size (bp4-osd mode; [B, rank, n+1] elimination tables "
                    "are ~1.6 MB/sample on n882 — cap the batch's OSD cost "
                    "at flagged-rate * bs with margin)")
    args = ap.parse_args()

    import jax

    from feedback_gnn_tpu.codes import ghp_882_24
    from feedback_gnn_tpu.codes.graph import QuantumGraph, build_graph
    from feedback_gnn_tpu.sim import PlotLER

    code = ghp_882_24()
    graph = QuantumGraph.from_code(code, stage_mode=True)

    if args.mode == "bp4":
        from feedback_gnn_tpu.models import bp4_plain_eval_step

        iters = args.iters or 64
        cn = args.cn_type or "boxplus-phi"
        factor = args.factor if args.factor is not None else 1.0

        @jax.jit
        def step(key, p):
            return bp4_plain_eval_step(
                graph, key, p, args.batch_size, num_iter=iters,
                cn_type=cn, normalization_factor=factor,
                accounting=args.accounting,
            )

        legend = f"plain BP4-{iters} {cn} f={factor} [{args.accounting}]"
    elif args.mode == "bp2":
        import numpy as np

        from feedback_gnn_tpu.models import bp2_bsc_eval_step

        iters = args.iters or 100
        cn = args.cn_type or "minsum"
        factor = args.factor if args.factor is not None else 0.8
        hx = np.asarray(code.hx)
        pcm_graph = build_graph(hx)

        @jax.jit
        def step(key, p):
            return bp2_bsc_eval_step(
                pcm_graph, hx, np.asarray(code.lx), key, p,
                args.batch_size, num_iter=iters, cn_type=cn,
                normalization_factor=factor, accounting=args.accounting,
            )

        legend = f"plain BP2-{iters} {cn} f={factor} (BSC) [{args.accounting}]"
    elif args.mode == "bp4-osd":
        from feedback_gnn_tpu.models import bp4_osd_eval_step

        @jax.jit
        def step(key, p):
            return bp4_osd_eval_step(
                graph, code, key, p, args.batch_size, num_iter=100,
                cn_type="minsum", normalization_factor=0.8,
                osd_compact_cap=args.osd_cap,
            )

        legend = "BP4 minsum 0.8 x100 + OSD0"
    else:
        import numpy as np

        from feedback_gnn_tpu.codes.gf2 import row_basis, row_echelon
        from feedback_gnn_tpu.models import bp2_osd_eval_step

        hx = np.asarray(code.hx)
        basis = row_basis(hx)
        pivot = row_echelon(hx.T)[3]
        pcm_graph = build_graph(hx)

        @jax.jit
        def step(key, p):
            return bp2_osd_eval_step(
                # logical check = lx, matching the reference instantiation
                # (OSD.ipynb: BP2_OSD_Model(code.hx, ..., code.lx, ...))
                pcm_graph, hx, basis, pivot, np.asarray(code.lx), key, p,
                args.batch_size, num_iter=100, cn_type="minsum",
                normalization_factor=0.8, osd_compact_cap=args.osd_cap,
            )

        legend = "BP2 minsum 0.8 x100 + OSD0 (BSC)"

    plot = PlotLER(title=f"{code.name} {legend}")
    result = plot.simulate(
        step,
        args.p,
        batch_size=args.batch_size,
        max_mc_iter=args.max_mc_iter,
        num_target_block_errors=args.target_errors,
        legend=legend,
        seed=args.seed,
        checkpoint_path=args.checkpoint,
    )
    print()
    print(result.summary())


if __name__ == "__main__":
    main()
