"""Configuration layer: a real dataclass/CLI config capturing what the
reference hard-codes in scripts and notebooks (SURVEY.md §5 "Config / flag
system"): code spec, channel, decoder schedule, cascade depth, GNN dims,
batch/shard layout, p-sweep and stopping targets.
"""

from __future__ import annotations

import argparse
import os
from dataclasses import dataclass, field, asdict

from .decoders.cascade import CascadeConfig

__all__ = ["EvalConfig", "CODE_REGISTRY", "build_code", "make_eval_parser", "config_from_args"]


_PKG_WEIGHTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "weights")
_REF_WEIGHTS = "/root/reference/sionna/fec/ldpc/weights"


def _weight_path(stem: str) -> str:
    """Package-local converted checkpoint, falling back to the reference
    pickle if the local copy is missing (decoders.load_weights reads both)."""
    local = os.path.join(_PKG_WEIGHTS, stem + ".npz")
    return local if os.path.exists(local) else os.path.join(_REF_WEIGHTS, stem + ".npy")


# name -> (constructor import path description, weight file of the shipped
# trained GNN, default nG)
CODE_REGISTRY = {
    "n882": {
        "builder": "ghp_882_24",
        "weights": _weight_path("feedback_GNN_n882_k24_wt_4_60_iter_64_16_mixed"),
        "coarse_weights": _weight_path("feedback_GNN_n882_k24_wt_4_40_iter_16_16"),
        "nG": 5,
    },
    "n1270": {
        "builder": "ghp_1270_28",
        "weights": _weight_path("feedback_GNN_n1270_k28_wt_10_80_iter_64_16_mixed"),
        "coarse_weights": _weight_path("feedback_GNN_n1270_k28_wt_10_60_iter_16_16"),
        "nG": 5,
    },
}


def build_code(name: str):
    from . import codes

    return getattr(codes, CODE_REGISTRY[name]["builder"])()


@dataclass
class EvalConfig:
    code: str = "n882"
    ps: list = field(default_factory=lambda: [0.05])
    batch_size: int = 5000
    max_mc_iter: int = 100000
    num_target_block_errors: int = 100
    cascade: CascadeConfig = field(default_factory=CascadeConfig)
    weights: str | None = None  # None -> registry default
    seed: int = 0
    checkpoint: str | None = None  # MC-state resume file
    data_shards: int = 1  # mesh layout
    edge_shards: int = 1
    qc_kernel: bool = False  # fused Pallas BP backend
    multihost: bool = False  # jax.distributed across hosts (DCN)

    def resolve_weights(self) -> str:
        return self.weights or CODE_REGISTRY[self.code]["weights"]


def make_eval_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        description="Monte-Carlo logical-error-rate evaluation of the "
        "feedback-GNN cascade (TPU-native)."
    )
    ap.add_argument("-c", "--code", default="n882", choices=list(CODE_REGISTRY))
    ap.add_argument("-p", "--p", type=float, nargs="+", default=[0.05],
                    help="physical error rate(s) to simulate")
    ap.add_argument("-nG", "--num-rounds", type=int, default=None,
                    help="number of GNN+BP rounds (default per code)")
    ap.add_argument("-bs", "--batch-size", type=int, default=5000)
    ap.add_argument("--max-mc-iter", type=int, default=100000)
    ap.add_argument("--target-errors", type=int, default=100)
    ap.add_argument("--iters1", type=int, default=64)
    ap.add_argument("--iters2", type=int, default=16)
    ap.add_argument("--factor1", type=float, default=1.0)
    ap.add_argument("--factor2", type=float, default=1.0)
    ap.add_argument("--cn-type", default="boxplus-phi",
                    choices=["boxplus-phi", "boxplus", "minsum"])
    ap.add_argument("--p0", type=float, default=0.05)
    ap.add_argument("--weights", default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--checkpoint", default=None,
                    help="MC-state JSON for interrupt/resume")
    ap.add_argument("--data-shards", type=int, default=1)
    ap.add_argument("--edge-shards", type=int, default=1)
    ap.add_argument("--multihost", action="store_true",
                    help="initialise jax.distributed (multi-host DCN); the "
                    "mesh then spans all hosts' devices")
    ap.add_argument("--qc-kernel", action="store_true",
                    help="use the fused Pallas BP kernel (block-circulant "
                    "codes, single shard)")
    ap.add_argument("--compact", type=float, default=None, metavar="FRAC",
                    help="flagged-sample compaction capacity as a fraction "
                    "of the batch (see CascadeConfig.compact_fraction)")
    ap.add_argument("--prepass", type=int, default=None,
                    help="adaptive stage-1 prepass iterations "
                    "(see CascadeConfig.stage1_prepass; requires --compact)")
    ap.add_argument("--rounds-cap", type=float, default=None, metavar="FRAC",
                    help="second-level compaction for the GNN rounds "
                    "(see CascadeConfig.round_fraction)")
    ap.add_argument("--rescue-phi", default=None, metavar="IMPL[,IMPL...]",
                    help="formulation-ensemble rescue: re-decode samples "
                    "still flagged after the cascade with these phi "
                    "formulations (expm1|tf|accurate, comma-chained) and "
                    "adopt syndrome-consistent rescues "
                    "(see CascadeConfig.rescue_phi)")
    ap.add_argument("--rescue-cap", type=float, default=0.02, metavar="FRAC",
                    help="rescue sub-batch capacity as a fraction of the "
                    "batch (see CascadeConfig.rescue_fraction)")
    return ap


def config_from_args(args) -> EvalConfig:
    nG = args.num_rounds if args.num_rounds is not None else CODE_REGISTRY[args.code]["nG"]
    return EvalConfig(
        code=args.code,
        ps=list(args.p),
        batch_size=args.batch_size,
        max_mc_iter=args.max_mc_iter,
        num_target_block_errors=args.target_errors,
        cascade=CascadeConfig(
            num_iter1=args.iters1,
            num_iter2=args.iters2,
            factor1=args.factor1,
            factor2=args.factor2,
            cn_type=args.cn_type,
            num_rounds=nG,
            p0=args.p0,
            compact_fraction=args.compact,
            stage1_prepass=args.prepass,
            round_fraction=args.rounds_cap,
            rescue_phi=args.rescue_phi,
            rescue_fraction=args.rescue_cap,
        ),
        weights=args.weights,
        seed=args.seed,
        checkpoint=args.checkpoint,
        data_shards=args.data_shards,
        edge_shards=args.edge_shards,
        qc_kernel=args.qc_kernel,
        multihost=args.multihost,
    )
