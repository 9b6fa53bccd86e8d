#!/usr/bin/env python
"""Paired validation of the adaptive stage-1 prepass.

The prepass keeps the BP-``k`` estimate for samples whose syndrome is
already satisfied after k iterations and re-decodes the rest with the full
BP-``num_iter1`` schedule.  The only possible deviation from the reference
semantics is an early-converged sample whose hard decision would DRIFT to a
different correction (possibly of a different logical class) by iteration
num_iter1.

This script measures that drift directly: for each batch it decodes the
SAME noise with stage-1 BP-k and BP-64, restricted to samples unflagged
after k iterations, and counts

  * syndrome-valid @k samples whose BP-64 estimate differs in any bit,
  * ... whose estimate differs in LOGICAL class (the only kind that can
    change the reported LER),
  * ... that became flagged again at 64 (converged -> diverged).

Run on the operating point you intend to use the prepass at:

    python scripts/validate_prepass.py -c n882 -p 0.05 --prepass 12 \
        --batches 500 -bs 20480
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--code", default="n882", choices=["n882", "n1270"])
    ap.add_argument("-p", type=float, default=0.05)
    ap.add_argument("--prepass", type=int, default=12)
    ap.add_argument("--iters1", type=int, default=64)
    ap.add_argument("-bs", "--batch-size", type=int, default=20480)
    ap.add_argument("--batches", type=int, default=100)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--qc-kernel", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="use the fused Pallas BP kernel (--no-qc-kernel "
                    "falls back to the XLA BP path)")
    args = ap.parse_args()

    from feedback_gnn_tpu.channels.pauli import depolarizing_probs, pauli_iid
    from feedback_gnn_tpu.codes.graph import QuantumGraph
    from feedback_gnn_tpu.codes.qc import qc_pair_from_code
    from feedback_gnn_tpu.config import build_code
    from feedback_gnn_tpu.decoders.bp4_qc import bp4_decode_qc
    from feedback_gnn_tpu.decoders.cascade import prior_llr
    from feedback_gnn_tpu.ops.gf2mat import mod2_matmul

    code = build_code(args.code)
    graph = QuantumGraph.from_code(code, stage_mode=True)

    n, n_pad, b = graph.n, graph.n_pad, args.batch_size
    hx, hz = jnp.asarray(graph.hx), jnp.asarray(graph.hz)
    hx_perp = jnp.asarray(graph.hx_perp)
    hz_perp = jnp.asarray(graph.hz_perp)

    if args.qc_kernel:
        qc = qc_pair_from_code(code)
        assert qc is not None, "code has no block-circulant structure"

        def run_bp(llr, sx, sz, iters):
            return bp4_decode_qc(
                graph, qc, llr, sx, sz, iters, "boxplus-phi", 1.0,
                batch_tile=128, need_logits=False,
            )

    else:
        from feedback_gnn_tpu.decoders.bp4 import bp4_decode

        def run_bp(llr, sx, sz, iters):
            return bp4_decode(graph, llr, sx, sz, iters, "boxplus-phi", 1.0)

    @jax.jit
    def step(key, p):
        px, py, pz = depolarizing_probs(p)
        noise_x, noise_z = pauli_iid(key, px, py, pz, n, b)
        noise_x = jnp.pad(noise_x.astype(jnp.int32), ((0, n_pad - n), (0, 0)))
        noise_z = jnp.pad(noise_z.astype(jnp.int32), ((0, n_pad - n), (0, 0)))
        sx = mod2_matmul(hx, noise_z)
        sz = mod2_matmul(hz, noise_x)
        gt_sx = mod2_matmul(hz, noise_x)
        gt_sz = mod2_matmul(hx, noise_z)
        gt = jnp.concatenate([gt_sx, gt_sz], axis=0)
        llr0 = prior_llr(0.05, n, b, n_pad=n_pad)

        res_k = run_bp(llr0, sx, sz, args.prepass)
        res_full = run_bp(llr0, sx, sz, args.iters1)

        def flags(x_hat, z_hat):
            se = jnp.concatenate([mod2_matmul(hz, x_hat), mod2_matmul(hx, z_hat)], 0)
            return jnp.any(se != gt, axis=0)

        def logical(x_hat, z_hat):
            xd = jnp.bitwise_xor(noise_x, x_hat)
            zd = jnp.bitwise_xor(noise_z, z_hat)
            ls = jnp.concatenate(
                [mod2_matmul(hx_perp, xd), mod2_matmul(hz_perp, zd)], 0
            )
            return jnp.any(ls != 0, axis=0)

        conv_k = jnp.logical_not(flags(res_k.x_hat, res_k.z_hat))
        # among early-converged samples only:
        bits_differ = jnp.any(
            (res_k.x_hat != res_full.x_hat) | (res_k.z_hat != res_full.z_hat), axis=0
        )
        log_k = logical(res_k.x_hat, res_k.z_hat)
        log_full = logical(res_full.x_hat, res_full.z_hat)
        reflagged = flags(res_full.x_hat, res_full.z_hat)

        cnt = lambda m: jnp.sum(jnp.logical_and(conv_k, m).astype(jnp.int32))  # noqa: E731
        return (
            jnp.sum(conv_k.astype(jnp.int32)),
            cnt(bits_differ),
            cnt(log_k != log_full),
            cnt(reflagged),
            cnt(log_k),
            cnt(log_full),
        )

    key = jax.random.PRNGKey(args.seed)
    tot = [0] * 6
    for i in range(args.batches):
        out = step(jax.random.fold_in(key, i), jnp.float32(args.p))
        for j in range(6):
            tot[j] += int(out[j])
        if (i + 1) % 50 == 0:
            print(f"# batch {i+1}/{args.batches}: {tot}", file=sys.stderr)

    conv, bits, logdiff, reflag, log_k, log_full = tot
    samples = args.batches * b
    print(f"samples={samples}  converged@{args.prepass}={conv}")
    print(f"bit-level drift          : {bits}  ({bits / max(conv,1):.3g})")
    print(f"logical-class drift      : {logdiff}  ({logdiff / max(conv,1):.3g})")
    print(f"re-flagged at {args.iters1}         : {reflag}")
    print(f"logical errors @{args.prepass}/[@{args.iters1}] among converged: "
          f"{log_k} / {log_full}")
    print(f"net LER bias of the prepass: ({log_k} - {log_full}) / {samples} "
          f"= {(log_k - log_full) / samples:+.3g}")


if __name__ == "__main__":
    main()
