"""Fused QC BP2 kernel vs the XLA gather path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from feedback_gnn_tpu.codes.css import create_circulant_matrix
from feedback_gnn_tpu.codes.graph import build_graph
from feedback_gnn_tpu.codes.qc import detect_qc_structure
from feedback_gnn_tpu.decoders.bp2 import bp2_decode
from feedback_gnn_tpu.decoders.bp2_qc import bp2_qc_logits


@pytest.fixture(scope="module")
def qc_pcm():
    # [A | B] of 24-circulants: a (3,6)-regular binary QC code
    a = create_circulant_matrix(24, [0, 5, 11])
    b = create_circulant_matrix(24, [0, 3, 17])
    pcm = np.hstack([a, b])
    spec = detect_qc_structure(pcm, 24)
    assert spec is not None and spec.num_groups == 6
    return pcm, spec


@pytest.mark.parametrize("cn_type", ["boxplus-phi", "minsum", "boxplus"])
def test_bp2_qc_matches_xla(qc_pcm, cn_type):
    pcm, spec = qc_pcm
    graph = build_graph(pcm)
    rng = np.random.default_rng(3)
    b = 32
    llr = jnp.asarray(rng.standard_normal((pcm.shape[1], b)) * 3.0, jnp.float32)
    syn = jnp.asarray(rng.integers(0, 2, (pcm.shape[0], b)), jnp.float32)

    ref = bp2_decode(graph, llr, syn, num_iter=8, cn_type=cn_type, normalization_factor=0.9)
    logits = bp2_qc_logits(
        spec, llr, syn, num_iter=8, cn_type=cn_type, normalization_factor=0.9,
        batch_tile=32, interpret=True,
    )
    np.testing.assert_allclose(
        logits, ref.logits[: pcm.shape[1]], rtol=2e-3, atol=2e-3
    )


def test_bp2_qc_nonaligned_lift():
    a = create_circulant_matrix(7, [0, 2, 3])
    b = create_circulant_matrix(7, [0, 1, 5])
    pcm = np.hstack([a, b])
    spec = detect_qc_structure(pcm, 7)
    graph = build_graph(pcm)
    rng = np.random.default_rng(4)
    bsz = 16
    llr = jnp.asarray(rng.standard_normal((14, bsz)) * 3.0, jnp.float32)
    syn = jnp.asarray(rng.integers(0, 2, (7, bsz)), jnp.float32)
    ref = bp2_decode(graph, llr, syn, num_iter=5)
    logits = bp2_qc_logits(spec, llr, syn, num_iter=5, batch_tile=16, interpret=True)
    np.testing.assert_allclose(logits, ref.logits[:14], rtol=2e-3, atol=2e-3)


def test_bp2_bsc_eval_step_qc_backend_matches():
    """BP_BSC system model: QC-kernel backend equals the XLA backend."""
    import jax

    from feedback_gnn_tpu.codes.css import create_generalized_bicycle_codes
    from feedback_gnn_tpu.codes.qc import detect_qc_structure
    from feedback_gnn_tpu.models import bp2_bsc_eval_step

    code = create_generalized_bicycle_codes(24, [0, 2, 8, 15], [0, 2, 12, 17])
    pcm = np.asarray(code.hx)
    spec = detect_qc_structure(pcm, 24)
    graph = build_graph(pcm)
    key = jax.random.PRNGKey(11)
    f0, l0 = bp2_bsc_eval_step(graph, pcm, np.asarray(code.lz), key, 0.04, 64,
                               num_iter=8)
    f1, l1 = bp2_bsc_eval_step(graph, pcm, np.asarray(code.lz), key, 0.04, 64,
                               num_iter=8, qc_spec=spec)
    assert abs(int(f0) - int(f1)) <= 1 and abs(int(l0) - int(l1)) <= 1
