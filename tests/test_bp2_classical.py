"""Classical (non-syndrome) binary BP — the reference ``LDPCBPDecoder``
default mode (decoding.py, is_syndrome=False): decoding a noisy codeword
from channel logits with no syndrome input."""

import numpy as np

import jax.numpy as jnp


def test_bp2_classical_corrects_single_error():
    """Length-7 repetition code: an interior bit flip on the all-zero
    codeword is corrected (two agreeing neighbour checks outweigh the
    channel prior); no syndrome input is passed."""
    from feedback_gnn_tpu.codes.css import rep_code
    from feedback_gnn_tpu.codes.graph import build_graph
    from feedback_gnn_tpu.decoders.bp2 import bp2_decode

    pcm = rep_code(7)
    graph = build_graph(pcm)
    n = pcm.shape[1]

    L = float(np.log((1 - 0.05) / 0.05))
    # batch = one flip per interior position; logit convention: positive = 1
    y = np.eye(n, dtype=np.float32)[:, 1 : n - 1]  # [n, B] batch-last
    llr_ch = (2.0 * y - 1.0) * L

    res = bp2_decode(graph, jnp.asarray(llr_ch), None, num_iter=10)
    hard = np.asarray(res.hard)[:n]
    assert (hard == 0).all(), hard


def test_bp2_classical_matches_zero_syndrome():
    """With an all-zero syndrome the sign product is unchanged, so classical
    mode must equal syndrome mode with s=0 exactly."""
    from feedback_gnn_tpu.codes.css import hamming_code
    from feedback_gnn_tpu.codes.graph import build_graph
    from feedback_gnn_tpu.decoders.bp2 import bp2_decode

    pcm = hamming_code(3)
    graph = build_graph(pcm)
    n, b = pcm.shape[1], 6
    rng = np.random.default_rng(0)
    llr_ch = jnp.asarray(rng.normal(size=(n, b)).astype(np.float32) * 3)

    res_classical = bp2_decode(graph, llr_ch, None, num_iter=8)
    res_s0 = bp2_decode(
        graph, llr_ch, jnp.zeros((pcm.shape[0], b), jnp.int32), num_iter=8
    )
    np.testing.assert_array_equal(
        np.asarray(res_classical.logits), np.asarray(res_s0.logits)
    )
