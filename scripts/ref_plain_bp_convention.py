#!/usr/bin/env python
"""Measure the reference's OWN plain-BP error rates under both accounting
conventions (CPU, TF) to pin down what OSD.ipynb cells 7-8 report.

The cells are markdown-only tables (no code survives), and the published
numbers — plain BP4 NMS 0.8 x100: 2.8e-4 @ p=0.10, BELOW the same
decoder's BP+OSD 3.70e-4 — are impossible under the flagged-inclusive
qldpc accounting of sim_ber (misc.py:647-654).  This script runs the
reference QLDPCBPDecoder / LDPCBPDecoder plain (no GNN, no OSD) on
injected depolarizing/BSC noise and reports, per convention:

  all        : any(ls_hat != 0)                  (sim_ber qldpc counting)
  undetected : all(s_hat == 0) and any(ls_hat != 0)

    python scripts/ref_plain_bp_convention.py --mode bp4-sp -p 0.10 \
        --batches 25 -bs 2048

Used to validate `examples/osd_eval.py --accounting undetected` against
the reference implementation rather than only against the published table.
"""

import argparse
import os
import sys
import time

os.environ["TF_CPP_MIN_LOG_LEVEL"] = "2"
os.environ["CUDA_VISIBLE_DEVICES"] = ""

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))  # refutil

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["bp4-sp", "bp4-nms", "bp2-nms"],
                    default="bp4-sp")
    ap.add_argument("-p", type=float, default=0.10)
    ap.add_argument("-bs", type=int, default=2048)
    ap.add_argument("--batches", type=int, default=25)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from refutil import import_reference_sionna

    import_reference_sionna()
    import tensorflow as tf
    from sionna.fec.ldpc.codes_q import (
        create_cyclic_permuting_matrix,
        create_QC_GHP_codes,
    )
    from sionna.fec.utils import int_mod_2

    code = create_QC_GHP_codes(
        63, create_cyclic_permuting_matrix(7, [27, 54, 0]), [0, 1, 6]
    )
    n = code.N
    rng = np.random.default_rng(args.seed)
    p = args.p

    if args.mode.startswith("bp4"):
        from sionna.fec.ldpc.decoding_q import QLDPCBPDecoder

        if args.mode == "bp4-sp":
            dec = QLDPCBPDecoder(code=code, num_iter=64,
                                 normalization_factor=1.0,
                                 cn_type="boxplus-phi", trainable=False)
        else:
            dec = QLDPCBPDecoder(code=code, num_iter=100,
                                 normalization_factor=0.8,
                                 cn_type="minsum", trainable=False)
        hx = tf.constant(code.hx, tf.int64)
        hz = tf.constant(code.hz, tf.int64)
        hx_perp = tf.constant(code.hx_perp, tf.int64)
        hz_perp = tf.constant(code.hz_perp, tf.int64)
        llr_const = float(np.log(3.0 * (1.0 - p) / p))

        tot = fl = lg_all = lg_und = 0
        t0 = time.time()
        for b in range(args.batches):
            u = rng.random((args.bs, n), dtype=np.float32)
            px, py, pz = 2 * p / 3, p / 3, 2 * p / 3
            noise_x = (u < px).astype(np.int64)
            noise_z = ((u >= px - py) & (u < px + pz - py)).astype(np.int64)
            nxT = tf.constant(noise_x.T)
            nzT = tf.constant(noise_z.T)
            sx = tf.cast(int_mod_2(tf.matmul(hx, nzT)), tf.float32)
            sz = tf.cast(int_mod_2(tf.matmul(hz, nxT)), tf.float32)
            llr = tf.fill((args.bs, 3, n), llr_const)
            x_hat, z_hat = dec((llr, sx, sz))
            xd = tf.bitwise.bitwise_xor(tf.transpose(tf.cast(x_hat, tf.int64)), nxT)
            zd = tf.bitwise.bitwise_xor(tf.transpose(tf.cast(z_hat, tf.int64)), nzT)
            s_hat = tf.concat([int_mod_2(tf.matmul(hz, xd)),
                               int_mod_2(tf.matmul(hx, zd))], 0)
            ls_hat = tf.concat([int_mod_2(tf.matmul(hx_perp, xd)),
                                int_mod_2(tf.matmul(hz_perp, zd))], 0)
            flg = np.asarray(tf.reduce_any(s_hat != 0, axis=0))
            lgc = np.asarray(tf.reduce_any(ls_hat != 0, axis=0))
            tot += args.bs
            fl += int(flg.sum())
            lg_all += int(lgc.sum())
            lg_und += int((lgc & ~flg).sum())
            print(f"[{time.time()-t0:7.1f}s] batch {b+1}/{args.batches}: "
                  f"blocks {tot}  flagged {fl} ({fl/tot:.4g})  "
                  f"logical-all {lg_all} ({lg_all/tot:.4g})  "
                  f"undetected {lg_und} ({lg_und/tot:.4g})", flush=True)
    else:
        from sionna.fec.ldpc.decoding import LDPCBPDecoder

        # exact BP2_OSD_Model decoder construction (OSD.ipynb cell 1):
        # hard_out=False; noise_hat = (-1 * logits) < 0 (bp_osd.py:225-227).
        # Must run under XLA: the ragged minsum path crashes in eager mode
        # (the reference only ever calls it inside jit_compile=True models).
        dec = LDPCBPDecoder(code.hx, is_syndrome=True, hard_out=False,
                            cn_type="minsum", num_iter=100,
                            normalization_factor=0.8)
        # The reference's BINARY decoder lacks the scipy>=1.11 edge-order
        # fix its quaternary decoder has (decoding_q.py:66-71): sp.sparse
        # .find on csr now returns row-major edges, so _vn_row_splits is
        # garbage and the decoder crashes ([2647,bs] vs [882,bs]).  Apply
        # the same fix to the instance before tracing.
        idx = np.argsort(dec._vn_con, kind="stable")
        dec._cn_con = dec._cn_con[idx]
        dec._vn_con = dec._vn_con[idx]
        dec._ind_cn = np.argsort(dec._cn_con)
        dec._ind_cn_inv = np.argsort(dec._ind_cn)
        dec._vn_row_splits = dec._gen_node_mask_row(dec._vn_con)
        dec._cn_row_splits = dec._gen_node_mask_row(dec._cn_con[dec._ind_cn])
        # graph-mode (not XLA: tf2xla fails on the ragged minsum where();
        # eager works once the edge order is fixed)
        dec_x = tf.function(lambda llr, s: dec((llr, s)),
                            reduce_retracing=True)
        hx = tf.constant(code.hx, tf.int64)
        lx = tf.constant(code.lx, tf.int64)
        # true-LLR prior of the BSC (reference BP2_OSD_Model convention)
        llr_const = float(-np.log((1.0 - p) / p))

        tot = fl = lg_all = lg_und = 0
        t0 = time.time()
        for b in range(args.batches):
            noise = (rng.random((args.bs, n)) < p).astype(np.int64)
            nT = tf.constant(noise.T)
            s = tf.cast(int_mod_2(tf.matmul(hx, nT)), tf.float32)
            llr = tf.fill((args.bs, n), llr_const)
            # reference semantics: llr_hat = -decoder_out, noise = llr_hat<0
            llr_hat = -1.0 * dec_x(llr, s)
            n_hat = tf.cast(tf.less(llr_hat, 0.0), tf.int64)
            d = tf.bitwise.bitwise_xor(tf.transpose(n_hat), nT)
            s_hat = int_mod_2(tf.matmul(hx, d))
            ls_hat = int_mod_2(tf.matmul(lx, d))
            flg = np.asarray(tf.reduce_any(s_hat != 0, axis=0))
            lgc = np.asarray(tf.reduce_any(ls_hat != 0, axis=0))
            tot += args.bs
            fl += int(flg.sum())
            lg_all += int((lgc | flg).sum())
            lg_und += int((lgc & ~flg).sum())
            print(f"[{time.time()-t0:7.1f}s] batch {b+1}/{args.batches}: "
                  f"blocks {tot}  flagged {fl} ({fl/tot:.4g})  "
                  f"logical-all {lg_all} ({lg_all/tot:.4g})  "
                  f"undetected {lg_und} ({lg_und/tot:.4g})", flush=True)

    print(f"\nFINAL mode={args.mode} p={p}: blocks={tot} flagged={fl/tot:.4g} "
          f"logical-all={lg_all/tot:.4g} undetected={lg_und/tot:.4g}")


if __name__ == "__main__":
    main()
