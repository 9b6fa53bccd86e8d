#!/usr/bin/env python
"""Collect the exact noise realisations the cascade FAILS on at a given p.

Purpose (error-floor investigation): at p=0.05 the [[882,24]] nG=3 cascade
reads ~7.1e-7 here vs the reference's 4.57e-7 — and the excess persists
WITHOUT the stage-1 prepass, so it is not prepass drift.  This script mines
the failing samples so `scripts/ref_cross_check.py` can re-decode the SAME
noise with the reference TF implementation on CPU: if the reference decodes
a sizable fraction of them, the decoder gap is real and localisable; if it
fails them too, our floor matches and the table difference is statistics.

Only a [B] bool mask is fetched per batch; the noise tensors (36 MB) are
re-generated on device from the same key and fetched only for the rare
batches that contain a failure.

    python scripts/dump_failures.py -c n882 -p 0.05 -nG 3 --target 60 \
        --out runs/failures_n882_p05.npz
"""

import argparse
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
    ap.add_argument("-c", "--code", default="n882", choices=["n882", "n1270"])
    ap.add_argument("-p", type=float, default=0.05)
    ap.add_argument("-nG", "--num-rounds", type=int, default=3)
    ap.add_argument("-bs", "--batch-size", type=int, default=20480)
    ap.add_argument("--target", type=int, default=60, help="failures to collect")
    ap.add_argument("--max-batches", type=int, default=30000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--compact", type=float, default=0.1)
    ap.add_argument("--rounds-cap", type=float, default=0.05)
    ap.add_argument("--out", default="runs/failures.npz")
    args = ap.parse_args()

    from feedback_gnn_tpu.channels.pauli import depolarizing_probs, pauli_iid
    from feedback_gnn_tpu.codes.graph import QuantumGraph
    from feedback_gnn_tpu.codes.qc import qc_pair_from_code
    from feedback_gnn_tpu.config import CODE_REGISTRY, build_code
    from feedback_gnn_tpu.decoders import CascadeConfig, sandwich_decode
    from feedback_gnn_tpu.decoders.cascade import prior_llr
    from feedback_gnn_tpu.decoders.gnn_feedback import load_weights
    from feedback_gnn_tpu.ops.gf2mat import mod2_matmul

    code = build_code(args.code)
    graph = QuantumGraph.from_code(code, stage_mode=True)
    qc = qc_pair_from_code(code)
    params = load_weights(CODE_REGISTRY[args.code]["weights"])
    cfg = CascadeConfig(
        num_iter1=64, num_iter2=16, num_rounds=args.num_rounds, p0=0.05,
        compact_fraction=args.compact, round_fraction=args.rounds_cap,
    )
    n, n_pad, b = graph.n, graph.n_pad, args.batch_size
    hx, hz = jnp.asarray(graph.hx), jnp.asarray(graph.hz)

    def sample_noise(key, p):
        px, py, pz = depolarizing_probs(p)
        noise_x, noise_z = pauli_iid(key, px, py, pz, n, b)
        noise_x = jnp.pad(noise_x.astype(jnp.int32), ((0, n_pad - n), (0, 0)))
        noise_z = jnp.pad(noise_z.astype(jnp.int32), ((0, n_pad - n), (0, 0)))
        return noise_x, noise_z

    @jax.jit
    def step(key, p):
        """-> (flagged_mask [B], logical_mask [B]) bool."""
        noise_x, noise_z = sample_noise(key, p)
        syndrome_x = mod2_matmul(hx, noise_z)
        syndrome_z = mod2_matmul(hz, noise_x)
        gt_sx = mod2_matmul(hz, noise_x)
        gt_sz = mod2_matmul(hx, noise_z)
        llr0 = prior_llr(cfg.p0, n, b, n_pad=n_pad)
        x_hat, z_hat = sandwich_decode(
            graph, [params], cfg, llr0, syndrome_x, syndrome_z, gt_sx, gt_sz,
            qc=qc,
        )
        x_diff = jnp.bitwise_xor(noise_x, x_hat)
        z_diff = jnp.bitwise_xor(noise_z, z_hat)
        s_hat = jnp.concatenate(
            [mod2_matmul(hz, x_diff), mod2_matmul(hx, z_diff)], axis=0
        )
        ls_hat = jnp.concatenate(
            [
                mod2_matmul(jnp.asarray(graph.hx_perp), x_diff),
                mod2_matmul(jnp.asarray(graph.hz_perp), z_diff),
            ],
            axis=0,
        )
        return jnp.any(s_hat != 0, axis=0), jnp.any(ls_hat != 0, axis=0)

    @jax.jit
    def fetch_noise(key, p):
        noise_x, noise_z = sample_noise(key, p)
        return noise_x[:n].astype(jnp.uint8), noise_z[:n].astype(jnp.uint8)

    base = jax.random.fold_in(jax.random.PRNGKey(args.seed), jax.process_index())
    point = jax.random.fold_in(base, 0)
    xs, zs, meta = [], [], []
    total = 0
    t0 = time.time()
    for it in range(args.max_batches):
        key = jax.random.fold_in(point, it)
        flagged, logical = step(key, jnp.float32(args.p))
        lmask = np.asarray(logical)
        if lmask.any():
            nx, nz = fetch_noise(key, jnp.float32(args.p))
            idx = np.nonzero(lmask)[0]
            xs.append(np.asarray(nx).T[idx])
            zs.append(np.asarray(nz).T[idx])
            fmask = np.asarray(flagged)
            for j in idx:
                meta.append((it, int(j), int(fmask[j])))
        total += b
        got = sum(a.shape[0] for a in xs)
        if it % 200 == 0 or lmask.any():
            rate = got / max(total, 1)
            print(f"\r# batch {it}: {got} failures / {total} blocks "
                  f"(ler~{rate:.3g}, {total / (time.time() - t0):.0f} blk/s)",
                  end="", flush=True)
        if got >= args.target:
            break
    print()
    x = np.vstack(xs) if xs else np.zeros((0, n), np.uint8)
    z = np.vstack(zs) if zs else np.zeros((0, n), np.uint8)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    np.savez_compressed(
        args.out, x=x, z=z, meta=np.asarray(meta, np.int64),
        p=args.p, nG=args.num_rounds, blocks=total, code=args.code,
        seed=args.seed,
    )
    print(f"saved {x.shape[0]} failing samples from {total} blocks "
          f"(LER {x.shape[0]/max(total,1):.3g}) -> {args.out}")


if __name__ == "__main__":
    main()
