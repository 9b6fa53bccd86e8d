#!/usr/bin/env python
"""Code-construction demo + plain BP2/BP4 sweeps over a family of codes.

Runnable counterpart of the reference's examples/QLDPC.ipynb (code cells
3-12): construct Steane / surface / toric / GB / GHP / bivariate codes,
print their parameters, and sweep a couple of p points with the plain BP
decoders.

    python examples/qldpc_codes.py            # construction table only
    python examples/qldpc_codes.py --sweep    # + BP sweeps (slower)
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def build_zoo():
    from feedback_gnn_tpu.codes.css import (
        CSSCode,
        create_checkerboard_toric_codes,
        create_cyclic_permuting_matrix,
        create_generalized_bicycle_codes,
        create_QC_GHP_codes,
        create_rotated_surface_codes,
        create_surface_codes,
        hamming_code,
        hypergraph_product,
        rep_code,
    )

    zoo = {}
    # Steane code = CSS(Hamming(3), Hamming(3))  (QLDPC.ipynb cell 3)
    h = hamming_code(3)
    zoo["Steane"] = CSSCode(h, h, name="Steane")
    zoo["Surface d=3"] = create_surface_codes(3)
    zoo["Rotated surface d=3"] = create_rotated_surface_codes(3)
    zoo["Toric (checkerboard) d=4"] = create_checkerboard_toric_codes(4)
    zoo["HGP(rep5, rep5)"] = hypergraph_product(rep_code(5), rep_code(5))
    # GB codes from [2] (QLDPC.ipynb cell 11)
    zoo["GB [[254,28]]"] = create_generalized_bicycle_codes(
        127, [0, 15, 20, 28, 66], [0, 58, 59, 100, 121]
    )
    # overcomplete check matrices of [2] (shipped data assets; the redundant
    # rows improve BP convergence — QLDPC.ipynb cell 11 "solid curves")
    from feedback_gnn_tpu.codes import gb_n46_k2_d9_oc, gb_n48_k6_d8_oc

    zoo["GB [[48,6,8]] overcomplete"] = gb_n48_k6_d8_oc()
    zoo["GB [[46,2,9]] overcomplete"] = gb_n46_k2_d9_oc()
    zoo["GHP [[882,24]]"] = create_QC_GHP_codes(
        63, create_cyclic_permuting_matrix(7, [27, 54, 0]), [0, 1, 6]
    )
    return zoo


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sweep", action="store_true", help="run BP sweeps too")
    ap.add_argument("-bs", "--batch-size", type=int, default=2000)
    args = ap.parse_args()

    zoo = build_zoo()
    print(f"{'code':28s} {'N':>6} {'K':>4} {'mx':>5} {'mz':>5} {'edges':>6}")
    for name, code in zoo.items():
        hx = np.asarray(code.hx)
        print(
            f"{name:28s} {code.N:6d} {code.K:4d} {hx.shape[0]:5d} "
            f"{np.asarray(code.hz).shape[0]:5d} {int(hx.sum()):6d}"
        )

    if not args.sweep:
        return

    import jax

    from feedback_gnn_tpu.codes.graph import QuantumGraph
    from feedback_gnn_tpu.models import bp4_plain_eval_step
    from feedback_gnn_tpu.sim import PlotLER

    for name in ["Surface d=3", "GHP [[882,24]]"]:
        code = zoo[name]
        graph = QuantumGraph.from_code(code, stage_mode=False)

        @jax.jit
        def step(key, p, graph=graph):
            return bp4_plain_eval_step(graph, key, p, args.batch_size)

        plot = PlotLER(title=f"{name} plain BP4")
        plot.simulate(
            step,
            [0.08, 0.06],
            batch_size=args.batch_size,
            max_mc_iter=20,
            num_target_block_errors=50,
            legend="BP4-64 phi",
        )
        print()


if __name__ == "__main__":
    main()
