#!/usr/bin/env python
"""[[1270,28]] feedback-GNN cascade evaluation — the counterpart of the
reference's top-level entry point (/root/reference/n1270.py, incl. its -nG
argument): one p point,
bs=5000, run until 100 block errors.

    python examples/n1270.py -p 0.05 -id 0

The reference's ``-id`` selected a GPU; here it folds into the PRNG seed
(device selection is JAX_PLATFORMS / mesh configuration instead).
Add --qc-kernel [--compact F --prepass K] for the fused-kernel fast path.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from feedback_gnn_tpu.config import config_from_args, make_eval_parser

# reuse the full CLI but mirror the reference defaults (n1270.py:7-15)
sys.argv[0] = "n1270.py"


def main():
    ap = make_eval_parser()
    ap.add_argument("-id", type=int, default=0, help="run id (seeds the PRNG)")
    ap.set_defaults(code="n1270", batch_size=5000, num_rounds=5)
    args = ap.parse_args()
    args.seed = args.seed or args.id
    cfg = config_from_args(args)

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import evaluate

    # evaluate.main() re-parses; run its body directly instead
    evaluate.run(cfg)


if __name__ == "__main__":
    main()
