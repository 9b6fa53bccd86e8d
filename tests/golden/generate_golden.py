"""Generate golden parity fixtures by running the TF reference on CPU.

Run from the repo root:  python tests/golden/generate_golden.py

For each case we inject deterministic noise (RNGs can never match across
frameworks), run the reference decoder/GNN layers, and dump inputs+outputs
to an .npz consumed by tests/test_bp4_parity.py etc.  Committed to the repo
so the test suite doesn't need TF at runtime (but can regenerate any time).
"""

import os
import sys

os.environ["TF_CPP_MIN_LOG_LEVEL"] = "2"
os.environ["CUDA_VISIBLE_DEVICES"] = ""

sys.path.insert(0, os.path.dirname(__file__) + "/..")  # for refutil
from refutil import import_reference_sionna  # noqa: E402

import_reference_sionna()

import numpy as np  # noqa: E402
import tensorflow as tf  # noqa: E402

from sionna.fec.ldpc.codes_q import (  # noqa: E402
    create_generalized_bicycle_codes,
    create_surface_codes,
    create_QC_GHP_codes,
    create_cyclic_permuting_matrix,
)
from sionna.fec.ldpc.decoding_q import QLDPCBPDecoder  # noqa: E402
from sionna.fec.ldpc.decoding import LDPCBPDecoder  # noqa: E402
from sionna.fec.ldpc.feedback_gnn import Feedback_GNN  # noqa: E402
from sionna.fec.ldpc.gnn import load_weights  # noqa: E402

OUT = os.path.dirname(os.path.abspath(__file__))
RNG = np.random.default_rng(1234)


def sample_case(code, p, bs):
    """Deterministic depolarizing noise + syndromes + prior llr."""
    n = code.N
    u = RNG.random((bs, n), dtype=np.float32)
    px, py, pz = 2 * p / 3, p / 3, 2 * p / 3
    noise_x = (u < px).astype(np.int64)
    noise_z = ((u >= px - py) & (u < px + pz - py)).astype(np.int64)
    syndrome_x = code.hx @ noise_z.T % 2  # [mx, bs]
    syndrome_z = code.hz @ noise_x.T % 2
    p0 = 0.05
    llr = np.full((bs, 3, n), np.log(3 * (1 - p0) / p0), np.float32)
    return noise_x, noise_z, syndrome_x, syndrome_z, llr


def gen_bp4(code, name, num_iter, cn_type, factor, p=0.08, bs=32):
    noise_x, noise_z, sx, sz, llr = sample_case(code, p, bs)
    dec = QLDPCBPDecoder(
        code=code,
        num_iter=num_iter,
        normalization_factor=factor,
        cn_type=cn_type,
        trainable=False,
        stage_one=True,
    )
    out = dec((tf.constant(llr), tf.constant(sx, tf.float32), tf.constant(sz, tf.float32)))
    llrx, llry, llrz, x_hat, z_hat, x_logit, z_logit = [np.asarray(t) for t in out]
    np.savez_compressed(
        os.path.join(OUT, f"bp4_{name}.npz"),
        hx=code.hx,
        hz=code.hz,
        num_iter=num_iter,
        cn_type=cn_type,
        factor=factor,
        llr=llr,
        syndrome_x=sx,
        syndrome_z=sz,
        llrx=llrx,
        llry=llry,
        llrz=llrz,
        x_hat=x_hat,
        z_hat=z_hat,
        x_logit=x_logit,
        z_logit=z_logit,
    )
    print(f"bp4_{name}: llrx range [{llrx.min():.3f},{llrx.max():.3f}]")


def gen_bp4_trainable(code, name, num_iter, p=0.08, bs=16):
    """stage_two mode: per-iteration logit stack for the training loss."""
    noise_x, noise_z, sx, sz, llr = sample_case(code, p, bs)
    dec = QLDPCBPDecoder(
        code=code,
        num_iter=num_iter,
        normalization_factor=1.0,
        cn_type="boxplus-phi",
        trainable=False,
        stage_one=False,
        stage_two=True,
    )
    llr_hat, x_hat, z_hat = dec(
        (tf.constant(llr), tf.constant(sx, tf.float32), tf.constant(sz, tf.float32))
    )
    np.savez_compressed(
        os.path.join(OUT, f"bp4stack_{name}.npz"),
        hx=code.hx,
        hz=code.hz,
        num_iter=num_iter,
        llr=llr,
        syndrome_x=sx,
        syndrome_z=sz,
        llr_hat=np.asarray(llr_hat),
        x_hat=np.asarray(x_hat),
        z_hat=np.asarray(z_hat),
    )
    print(f"bp4stack_{name}: stack shape {np.asarray(llr_hat).shape}")


def gen_bp2(pcm, name, num_iter, cn_type, factor, p=0.05, bs=32):
    m, n = pcm.shape
    noise = (RNG.random((bs, n)) < p).astype(np.int64)
    syndrome = pcm @ noise.T % 2
    llr_const = -np.log((1 - p) / p)
    llr = np.full((bs, n), llr_const, np.float32)
    dec = LDPCBPDecoder(
        pcm=pcm,
        is_syndrome=True,
        hard_out=False,
        cn_type=cn_type,
        num_iter=num_iter,
        normalization_factor=factor,
    )
    # The reference binary decoder assumes scipy<=1.10 edge ordering from
    # sparse.find (VN-major); scipy>=1.11 returns CN-major, which the
    # quaternary decoder fixes (decoding_q.py:66-71) but the binary one does
    # not.  Re-sort its edge bookkeeping to the intended order.
    idx = np.argsort(dec._vn_con, kind="stable")
    dec._cn_con = dec._cn_con[idx]
    dec._vn_con = dec._vn_con[idx]
    dec._ind_cn = np.argsort(dec._cn_con)
    dec._ind_cn_inv = np.argsort(dec._ind_cn)
    dec._vn_row_splits = dec._gen_node_mask_row(dec._vn_con)
    dec._cn_row_splits = dec._gen_node_mask_row(dec._cn_con[dec._ind_cn])
    logits = np.asarray(dec((tf.constant(llr), tf.constant(syndrome, tf.float32))))
    np.savez_compressed(
        os.path.join(OUT, f"bp2_{name}.npz"),
        pcm=pcm,
        num_iter=num_iter,
        cn_type=cn_type,
        factor=factor,
        llr=llr,
        syndrome=syndrome,
        logits=logits,
    )
    print(f"bp2_{name}: logits range [{logits.min():.3f},{logits.max():.3f}]")


def gen_gnn(code, name, weight_path=None, bs=8):
    n = code.N
    cn_x = code.hx.shape[0]
    cn_z = code.hz.shape[0]
    G = Feedback_GNN(
        code=code,
        num_msg_dims=20,
        num_hidden_units=40,
        num_mlp_layers=2,
        reduce_op="mean",
        activation="tanh",
        use_bias=True,
    )
    # build
    G(
        (
            tf.zeros((bs, n, 3)),
            tf.zeros((cn_x, bs)),
            tf.zeros((cn_z, bs)),
            tf.zeros((cn_x, bs)),
            tf.zeros((cn_z, bs)),
        )
    )
    if weight_path:
        load_weights(G, weight_path)
    else:
        # randomize all weights (the default llr_inv_embed kernel is zeros,
        # which would make the output a constant bias — useless as a test)
        G.set_weights(
            [RNG.normal(size=w.shape).astype(np.float32) * 0.3 for w in G.get_weights()]
        )
    weights = G.get_weights()

    h_vn = RNG.normal(size=(bs, n, 3)).astype(np.float32) * 3
    logit_hx = RNG.normal(size=(cn_x, bs)).astype(np.float32) * 2
    logit_hz = RNG.normal(size=(cn_z, bs)).astype(np.float32) * 2
    syndrome_x = RNG.integers(0, 2, (cn_x, bs)).astype(np.float32)
    syndrome_z = RNG.integers(0, 2, (cn_z, bs)).astype(np.float32)

    out = G(
        (
            tf.constant(h_vn),
            tf.constant(logit_hx),
            tf.constant(logit_hz),
            tf.constant(syndrome_x),
            tf.constant(syndrome_z),
        )
    )
    np.savez_compressed(
        os.path.join(OUT, f"gnn_{name}.npz"),
        hx=code.hx,
        hz=code.hz,
        h_vn=h_vn,
        logit_hx=logit_hx,
        logit_hz=logit_hz,
        syndrome_x=syndrome_x,
        syndrome_z=syndrome_z,
        out=np.asarray(out),
        **{f"w{i}": w for i, w in enumerate(weights)},
    )
    print(f"gnn_{name}: out range [{np.asarray(out).min():.3f},{np.asarray(out).max():.3f}]")


def main():
    surface = create_surface_codes(3)  # n=13, irregular degrees
    gb = create_generalized_bicycle_codes(24, [0, 2, 8, 15], [0, 2, 12, 17])  # [[48,6]]

    gen_bp4(surface, "surface3_phi8", 8, "boxplus-phi", 1.0, p=0.05, bs=32)
    gen_bp4(gb, "gb48_phi8", 8, "boxplus-phi", 1.0, p=0.06, bs=32)
    gen_bp4(gb, "gb48_minsum8", 8, "minsum", 0.8, p=0.06, bs=32)
    gen_bp4(gb, "gb48_tanh4", 4, "boxplus", 1.0, p=0.06, bs=32)
    gen_bp4_trainable(gb, "gb48_phi6", 6)
    gen_bp2(surface.hx, "surface3_phi8", 8, "boxplus-phi", 1.0, p=0.05, bs=32)
    gen_bp2(gb.hx, "gb48_minsum8", 8, "minsum", 0.8, p=0.05, bs=32)
    gen_gnn(gb, "gb48_random")

    # the real [[882,24]] code with shipped trained weights (slow-ish)
    if "--full" in sys.argv:
        ghp = create_QC_GHP_codes(
            63, create_cyclic_permuting_matrix(7, [27, 54, 0]), [0, 1, 6]
        )
        gen_bp4(ghp, "ghp882_phi8", 8, "boxplus-phi", 1.0, p=0.08, bs=16)
        gen_gnn(
            ghp,
            "ghp882_trained",
            weight_path="/root/reference/sionna/fec/ldpc/weights/"
            "feedback_GNN_n882_k24_wt_4_60_iter_64_16_mixed.npy",
            bs=4,
        )


if __name__ == "__main__":
    main()
