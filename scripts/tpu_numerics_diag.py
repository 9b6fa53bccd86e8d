#!/usr/bin/env python
"""TPU-arithmetic error-floor diagnosis + mitigation search.

Cross-checking (`runs/cross_check_p05.log`) showed ~80 % of this
framework's p=0.05 [[882,24]] failures decode fine when the SAME decoder
runs with CPU arithmetic — the floor excess vs the reference is driven by
the TPU's approximate transcendentals on numerics-marginal samples, not by
the algorithm.  This script measures that directly on the real chip:

  part 1: ulp-level accuracy of exp/log/tanh/log1p on this backend vs f64;
  part 2: re-decode the dumped failure set with the full cascade under each
          phi formulation (default / tf-staircase / cancellation-free) and
          each BP backend, counting surviving failures — the direct
          estimate of how much of the floor excess each variant recovers.

    python scripts/tpu_numerics_diag.py --failures runs/failures_n882_p05.npz
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import jax.numpy as jnp


def part1_transcendental_accuracy():
    print(f"# backend: {jax.default_backend()} {jax.devices()[0]}")
    rng = np.random.default_rng(0)
    checks = [
        ("exp", jnp.exp, np.exp, np.float32(rng.uniform(-17, 3, 40000))),
        ("log", jnp.log, np.log,
         np.float32(np.exp(rng.uniform(np.log(1e-7), np.log(20), 40000)))),
        ("tanh", jnp.tanh, np.tanh,
         np.float32(np.exp(rng.uniform(np.log(1e-4), np.log(10), 40000)))),
        ("log1p", jnp.log1p, np.log1p,
         np.float32(np.exp(rng.uniform(np.log(1e-7), np.log(2), 40000)))),
    ]
    for name, jf, nf, x in checks:
        dev = np.asarray(jax.jit(jf)(jnp.asarray(x)), np.float64)
        truth = nf(x.astype(np.float64))
        ulp = np.abs(dev - truth) / np.maximum(np.spacing(np.abs(truth).astype(np.float32)), 1e-45)
        rel = np.abs(dev - truth) / np.maximum(np.abs(truth), 1e-30)
        print(f"part1 {name:6s}: max_ulp={np.max(ulp):9.1f} mean_ulp={np.mean(ulp):7.2f} "
              f"max_rel={np.max(rel):.3g}")


def decode_failures(code_name, x, z, nG, backend, phi_impl):
    from feedback_gnn_tpu.decoders import cn_update

    cn_update.set_phi_impl(phi_impl)
    from feedback_gnn_tpu.codes.graph import QuantumGraph
    from feedback_gnn_tpu.codes.qc import qc_pair_from_code
    from feedback_gnn_tpu.config import CODE_REGISTRY, build_code
    from feedback_gnn_tpu.decoders import CascadeConfig, sandwich_decode
    from feedback_gnn_tpu.decoders.cascade import prior_llr
    from feedback_gnn_tpu.decoders.gnn_feedback import load_weights
    from feedback_gnn_tpu.ops.gf2mat import mod2_matmul

    code = build_code(code_name)
    graph = QuantumGraph.from_code(code, stage_mode=True)
    qc = qc_pair_from_code(code) if backend == "qc" else None
    params = load_weights(CODE_REGISTRY[code_name]["weights"])
    cfg = CascadeConfig(num_iter1=64, num_iter2=16, num_rounds=nG, p0=0.05)

    n, n_pad = graph.n, graph.n_pad
    b = x.shape[0]
    # pad the batch to the kernel tile so one compile serves the set
    b_pad = -(-b // 128) * 128
    xp = np.zeros((b_pad, n), np.int32)
    zp = np.zeros((b_pad, n), np.int32)
    xp[:b], zp[:b] = x, z
    nx = jnp.pad(jnp.asarray(xp.T), ((0, n_pad - n), (0, 0)))
    nz = jnp.pad(jnp.asarray(zp.T), ((0, n_pad - n), (0, 0)))
    hx, hz = jnp.asarray(graph.hx), jnp.asarray(graph.hz)
    syndrome_x = mod2_matmul(hx, nz)
    syndrome_z = mod2_matmul(hz, nx)
    gt_sx = mod2_matmul(hz, nx)
    gt_sz = mod2_matmul(hx, nz)
    llr0 = prior_llr(0.05, n, b_pad, n_pad=n_pad)

    @jax.jit
    def run():
        x_hat, z_hat = sandwich_decode(
            graph, [params], cfg, llr0, syndrome_x, syndrome_z, gt_sx, gt_sz,
            qc=qc,
        )
        xd = jnp.bitwise_xor(nx, x_hat)
        zd = jnp.bitwise_xor(nz, z_hat)
        ls = jnp.concatenate(
            [
                mod2_matmul(jnp.asarray(graph.hx_perp), xd),
                mod2_matmul(jnp.asarray(graph.hz_perp), zd),
            ],
            0,
        )
        return jnp.any(ls != 0, axis=0)

    logical = np.asarray(run())[:b]
    cn_update.set_phi_impl("expm1")
    return logical


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--failures", default="runs/failures_n882_p05.npz")
    ap.add_argument("--backends", nargs="+", default=["qc"],
                    choices=["qc", "xla"])
    ap.add_argument("--phi-impls", nargs="+",
                    default=["expm1", "tf", "accurate"])
    ap.add_argument("--skip-part1", action="store_true")
    args = ap.parse_args()

    if not args.skip_part1:
        part1_transcendental_accuracy()

    d = np.load(args.failures)
    x, z = d["x"].astype(np.int32), d["z"].astype(np.int32)
    code_name, nG = str(d["code"]), int(d["nG"])
    print(f"part2: {x.shape[0]} dumped failures, code={code_name}, nG={nG}, "
          f"p={float(d['p'])}")
    for backend in args.backends:
        for impl in args.phi_impls:
            fail = decode_failures(code_name, x, z, nG, backend, impl)
            print(f"part2 backend={backend:3s} phi={impl:8s}: "
                  f"{int(fail.sum())}/{len(fail)} still fail", flush=True)


if __name__ == "__main__":
    main()
