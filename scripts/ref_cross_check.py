#!/usr/bin/env python
"""Re-decode dumped cascade failures with the reference TF implementation.

Error-floor investigation, part 2 (see scripts/dump_failures.py): loads the
noise realisations our TPU cascade failed on and decodes the SAME samples
with

  (a) the reference TF cascade (QLDPCBPDecoder + Feedback_GNN + the
      Sandwich model's round/masking semantics, feedback_gnn.py:293-361,
      injected noise instead of channel sampling),
  (b) our XLA gather-path cascade on CPU,
  (c) our fused QC-kernel cascade on CPU (Pallas interpret),

and prints the per-sample confusion.  If (a) decodes a sizable fraction of
the samples, the LER gap vs the reference table is a real decoder-quality
difference; if (a) fails them all too, the implementations agree at the
floor.

    python scripts/ref_cross_check.py --failures runs/failures_n882_p05.npz
"""

import argparse
import os
import sys

os.environ["TF_CPP_MIN_LOG_LEVEL"] = "2"
os.environ["CUDA_VISIBLE_DEVICES"] = ""
os.environ.setdefault("JAX_PLATFORMS", "cpu")

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))  # refutil

import numpy as np


_REF_CTX = {}


def _ref_context(code_name, bs, nG):
    """Build the reference TF cascade once per (code, bs, nG) and return a
    decode(noise_x, noise_z) -> (flagged, logical) closure (keeps tf.function
    traces warm across mining batches)."""
    key = (code_name, bs, nG)
    if key not in _REF_CTX:
        _REF_CTX[key] = _build_ref_cascade(code_name, bs, nG)
    return _REF_CTX[key]


def decode_reference(code_name, noise_x, noise_z, nG, p0=0.05):
    """Reference TF cascade on injected noise -> logical-error mask [B]."""
    return _ref_context(code_name, noise_x.shape[0], nG)(noise_x, noise_z, p0)


def _build_ref_cascade(code_name, bs, nG):
    from refutil import import_reference_sionna

    import_reference_sionna()
    import tensorflow as tf
    from sionna.fec.ldpc.codes_q import (
        create_cyclic_permuting_matrix,
        create_QC_GHP_codes,
    )
    from sionna.fec.ldpc.decoding_q import QLDPCBPDecoder
    from sionna.fec.ldpc.feedback_gnn import Feedback_GNN
    from sionna.fec.ldpc.gnn import load_weights
    from sionna.fec.utils import int_mod_2

    if code_name == "n882":
        code = create_QC_GHP_codes(
            63, create_cyclic_permuting_matrix(7, [27, 54, 0]), [0, 1, 6]
        )
        wfile = ("/root/reference/sionna/fec/ldpc/weights/"
                 "feedback_GNN_n882_k24_wt_4_60_iter_64_16_mixed.npy")
    else:
        code = create_QC_GHP_codes(
            127,
            np.array([[0, -1, 51, 52, -1], [-1, 0, -1, 111, 20],
                      [0, -1, 98, -1, 122], [0, 80, -1, 119, -1],
                      [-1, 0, 5, -1, 106]]),
            [0, 1, 7],
        )
        wfile = ("/root/reference/sionna/fec/ldpc/weights/"
                 "feedback_GNN_n1270_k28_wt_10_80_iter_64_16_mixed.npy")

    n = code.N
    cn_x, cn_z = code.hx.shape[0], code.hz.shape[0]
    G = Feedback_GNN(code=code, num_msg_dims=20, num_hidden_units=40,
                     num_mlp_layers=2, reduce_op="mean", activation="tanh",
                     use_bias=True)
    G((tf.zeros((bs, n, 3)), tf.zeros((cn_x, bs)), tf.zeros((cn_z, bs)),
       tf.zeros((cn_x, bs)), tf.zeros((cn_z, bs))))
    load_weights(G, wfile)
    dec1 = QLDPCBPDecoder(code=code, num_iter=64, normalization_factor=1.0,
                          cn_type="boxplus-phi", trainable=False, stage_one=True)
    dec2 = QLDPCBPDecoder(code=code, num_iter=16, normalization_factor=1.0,
                          cn_type="boxplus-phi", trainable=False, stage_one=True)
    hx = tf.constant(code.hx, tf.int64)
    hz = tf.constant(code.hz, tf.int64)
    hx_perp = tf.constant(code.hx_perp, tf.int64)
    hz_perp = tf.constant(code.hz_perp, tf.int64)

    def decode(noise_x, noise_z, p0=0.05):
        # ---- the Sandwich model's call body with injected noise ----
        noise_x_T = tf.constant(noise_x.T, tf.int64)  # [n, bs]
        noise_z_T = tf.constant(noise_z.T, tf.int64)
        syndrome_x = tf.cast(int_mod_2(tf.matmul(hx, noise_z_T)), tf.float32)
        syndrome_z = tf.cast(int_mod_2(tf.matmul(hz, noise_x_T)), tf.float32)
        llr = tf.fill((bs, 3, n), tf.math.log(3.0 * (1.0 - p0) / p0))
        gt_x = int_mod_2(tf.matmul(hz, noise_x_T))
        gt_z = int_mod_2(tf.matmul(hx, noise_z_T))
        gt = tf.transpose(tf.concat([gt_x, gt_z], axis=0), (1, 0))

        llrx, llry, llrz, x_hat, z_hat, logit_hx_perp, logit_hz_perp = dec1(
            (llr, syndrome_x, syndrome_z)
        )
        errors = tf.ones([bs], dtype=tf.bool)
        for _ in range(nG):
            sx = int_mod_2(tf.matmul(hz, tf.transpose(tf.cast(x_hat, tf.int64))))
            sz = int_mod_2(tf.matmul(hx, tf.transpose(tf.cast(z_hat, tf.int64))))
            s_hat = tf.transpose(tf.concat([sx, sz], axis=0), (1, 0))
            new_errors = tf.reduce_any(tf.not_equal(gt, s_hat), axis=-1)
            errors = tf.math.logical_and(errors, new_errors)

            h_vn = tf.stack([llrx, llry, llrz], axis=-1)
            # NOTE the reference's argument swap (feedback_gnn.py:335)
            new_llr = G((h_vn, logit_hz_perp, logit_hx_perp, syndrome_x, syndrome_z))
            (llrx, llry, llrz, x_hat_update, z_hat_update,
             logit_hx_perp, logit_hz_perp) = dec2(
                (tf.transpose(new_llr, (0, 2, 1)), syndrome_x, syndrome_z)
            )
            x_hat = tf.tensor_scatter_nd_update(
                x_hat, tf.where(errors), x_hat_update[errors]
            )
            z_hat = tf.tensor_scatter_nd_update(
                z_hat, tf.where(errors), z_hat_update[errors]
            )

        x_hat_b = tf.transpose(tf.cast(x_hat, tf.bool), (1, 0))
        z_hat_b = tf.transpose(tf.cast(z_hat, tf.bool), (1, 0))
        x_diff = tf.cast(
            tf.math.logical_xor(tf.cast(noise_x_T, tf.bool), x_hat_b), tf.int64
        )
        z_diff = tf.cast(
            tf.math.logical_xor(tf.cast(noise_z_T, tf.bool), z_hat_b), tf.int64
        )
        sx = int_mod_2(tf.matmul(hz, x_diff))
        sz = int_mod_2(tf.matmul(hx, z_diff))
        lsx = int_mod_2(tf.matmul(hx_perp, x_diff))
        lsz = int_mod_2(tf.matmul(hz_perp, z_diff))
        flagged = np.asarray(
            tf.reduce_any(tf.not_equal(tf.concat([sx, sz], 0), 0), axis=0)
        )
        logical = np.asarray(
            tf.reduce_any(tf.not_equal(tf.concat([lsx, lsz], 0), 0), axis=0)
        )
        return flagged, logical

    return decode


def decode_ours(code_name, noise_x, noise_z, nG, use_qc, p0=0.05,
                rescue_phi=None):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from feedback_gnn_tpu.codes.graph import QuantumGraph
    from feedback_gnn_tpu.codes.qc import qc_pair_from_code
    from feedback_gnn_tpu.config import CODE_REGISTRY, build_code
    from feedback_gnn_tpu.decoders import CascadeConfig, sandwich_decode
    from feedback_gnn_tpu.decoders.cascade import prior_llr
    from feedback_gnn_tpu.decoders.gnn_feedback import load_weights
    from feedback_gnn_tpu.ops.gf2mat import mod2_matmul

    code = build_code(code_name)
    graph = QuantumGraph.from_code(code, stage_mode=True)
    qc = qc_pair_from_code(code) if use_qc else None
    params = load_weights(CODE_REGISTRY[code_name]["weights"])
    cfg = CascadeConfig(num_iter1=64, num_iter2=16, num_rounds=nG, p0=p0,
                        rescue_phi=rescue_phi, rescue_fraction=1.0)

    n, n_pad = graph.n, graph.n_pad
    b = noise_x.shape[0]
    nx = jnp.pad(jnp.asarray(noise_x.T, jnp.int32), ((0, n_pad - n), (0, 0)))
    nz = jnp.pad(jnp.asarray(noise_z.T, jnp.int32), ((0, n_pad - n), (0, 0)))
    hx, hz = jnp.asarray(graph.hx), jnp.asarray(graph.hz)
    syndrome_x = mod2_matmul(hx, nz)
    syndrome_z = mod2_matmul(hz, nx)
    gt_sx = mod2_matmul(hz, nx)
    gt_sz = mod2_matmul(hx, nz)
    llr0 = prior_llr(p0, n, b, n_pad=n_pad)
    x_hat, z_hat = jax.jit(
        lambda: sandwich_decode(
            graph, [params], cfg, llr0, syndrome_x, syndrome_z, gt_sx, gt_sz,
            qc=qc,
        )
    )()
    x_diff = jnp.bitwise_xor(nx, x_hat)
    z_diff = jnp.bitwise_xor(nz, z_hat)
    s_hat = jnp.concatenate([mod2_matmul(hz, x_diff), mod2_matmul(hx, z_diff)], 0)
    ls_hat = jnp.concatenate(
        [
            mod2_matmul(jnp.asarray(graph.hx_perp), x_diff),
            mod2_matmul(jnp.asarray(graph.hz_perp), z_diff),
        ],
        0,
    )
    return (
        np.asarray(jnp.any(s_hat != 0, axis=0)),
        np.asarray(jnp.any(ls_hat != 0, axis=0)),
    )


def fresh_noise(p, bs, n, seed):
    """Common depolarizing noise for the unconditioned comparison."""
    rng = np.random.default_rng(seed)
    u = rng.random((bs, n), dtype=np.float32)
    px, py, pz = 2 * p / 3, p / 3, 2 * p / 3
    noise_x = (u < px).astype(np.uint8)
    noise_z = ((u >= px - py) & (u < px + pz - py)).astype(np.uint8)
    return noise_x, noise_z


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--failures", default=None)
    ap.add_argument("--fresh", type=float, default=None, metavar="P",
                    help="unconditioned mode: decode a fresh common batch at "
                    "p with all three decoders and report paired (McNemar) "
                    "failure counts")
    ap.add_argument("--fresh-bs", type=int, default=4096)
    ap.add_argument("--mine-ref", type=float, default=None, metavar="P",
                    help="reference-conditioned mode (the reverse of "
                    "--failures): mine failures of the TF REFERENCE cascade "
                    "on fresh noise at p, then re-decode them with ours — "
                    "'only reference fails' bounds the gap from the other "
                    "side")
    ap.add_argument("--mine-target", type=int, default=50)
    ap.add_argument("--mine-max-batches", type=int, default=40)
    ap.add_argument("--save", default=None,
                    help="npz path for the mined reference-failure set")
    ap.add_argument("--code", default="n882")
    ap.add_argument("-nG", type=int, default=3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--skip-qc", action="store_true",
                    help="skip the Pallas-interpret re-decode (slow on CPU)")
    args = ap.parse_args()

    if args.mine_ref is not None:
        import time

        code_name, nG = args.code, args.nG
        n = 882 if code_name == "n882" else 1270
        xs, zs = [], []
        blocks = 0
        t0 = time.time()
        for b in range(args.mine_max_batches):
            x, z = fresh_noise(args.mine_ref, args.fresh_bs, n,
                               args.seed * 100003 + b)
            _, ref_l = decode_reference(code_name, x, z, nG)
            xs.append(x[ref_l])
            zs.append(z[ref_l])
            blocks += args.fresh_bs
            mined = sum(a.shape[0] for a in xs)
            print(f"[{time.time()-t0:7.1f}s] batch {b+1}: reference failed "
                  f"{int(ref_l.sum())}/{args.fresh_bs} -> {mined} mined "
                  f"of {blocks} blocks", flush=True)
            if mined >= args.mine_target:
                break
        x, z = np.vstack(xs), np.vstack(zs)
        print(f"{x.shape[0]} REFERENCE-failing samples at p={args.mine_ref} "
              f"(from {blocks} blocks, ref LER {x.shape[0]/blocks:.3g})")
        if args.save:
            np.savez_compressed(args.save, x=x, z=z, code=code_name, nG=nG,
                                p=args.mine_ref, blocks=blocks)
        ours_f, ours_l = decode_ours(code_name, x, z, nG, use_qc=False)
        print(f"ours (XLA path, CPU) : {int(ours_l.sum())}/{len(ours_l)} "
              f"logical errors, {int(ours_f.sum())} flagged")
        if not args.skip_qc:
            qc_f, qc_l = decode_ours(code_name, x, z, nG, use_qc=True)
            print(f"ours (QC kernel, CPU): {int(qc_l.sum())}/{len(qc_l)} "
                  f"logical errors, {int(qc_f.sum())} flagged")
        print("interpretation: this set is conditioned on the REFERENCE "
              "failing; 'ours decodes k of them' bounds the reference's "
              "excess — pair with the --failures direction for the full "
              "two-sided confusion.")
        return

    if args.fresh is not None:
        code_name, nG = args.code, args.nG
        n = 882 if code_name == "n882" else 1270
        x, z = fresh_noise(args.fresh, args.fresh_bs, n, args.seed)
        print(f"fresh common batch: {x.shape[0]} samples, code={code_name}, "
              f"nG={nG}, p={args.fresh}")
    else:
        assert args.failures, "--failures or --fresh required"
        d = np.load(args.failures)
        x, z = d["x"], d["z"]
        code_name = str(d["code"])
        nG = int(d["nG"])
        print(f"{x.shape[0]} failing samples, code={code_name}, nG={nG}, "
              f"p={float(d['p'])}, mined from {int(d['blocks'])} blocks")

    ours_f, ours_l = decode_ours(code_name, x, z, nG, use_qc=False)
    print(f"ours (XLA path, CPU) : {int(ours_l.sum())}/{len(ours_l)} logical "
          f"errors, {int(ours_f.sum())} flagged")

    if not args.skip_qc:
        qc_f, qc_l = decode_ours(code_name, x, z, nG, use_qc=True)
        print(f"ours (QC kernel, CPU): {int(qc_l.sum())}/{len(qc_l)} logical "
              f"errors, {int(qc_f.sum())} flagged")
        if not np.array_equal(qc_l, ours_l):
            print(f"  backend disagreement on {int((qc_l != ours_l).sum())} samples")

    ref_f, ref_l = decode_reference(code_name, x, z, nG)
    print(f"reference (TF, CPU)  : {int(ref_l.sum())}/{len(ref_l)} logical "
          f"errors, {int(ref_f.sum())} flagged")

    both = int(np.logical_and(ours_l, ref_l).sum())
    only_ours = int(np.logical_and(ours_l, ~ref_l).sum())
    only_ref = int(np.logical_and(~ours_l, ref_l).sum())
    print(f"confusion (ours-XLA vs ref): both fail {both}, "
          f"only ours fails {only_ours}, only reference fails {only_ref}")
    if not args.skip_qc:
        bq = int(np.logical_and(qc_l, ref_l).sum())
        oq = int(np.logical_and(qc_l, ~ref_l).sum())
        orf = int(np.logical_and(~qc_l, ref_l).sum())
        print(f"confusion (ours-QC  vs ref): both fail {bq}, "
              f"only QC fails {oq}, only reference fails {orf}")
    if args.fresh is None:
        print("interpretation: the mined set is conditioned on OUR (TPU) "
              "failure; 'only ours fails' measures the one-directional "
              "decoder gap.")


if __name__ == "__main__":
    main()
