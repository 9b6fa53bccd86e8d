"""Fused QC BP4 kernel vs the XLA gather path (golden equivalence).

The Pallas kernel (decoders/bp4_qc.py, interpret mode on CPU here) must
produce the same marginals as bp4_decode for block-circulant codes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from feedback_gnn_tpu.channels import depolarizing_probs, pauli_iid
from feedback_gnn_tpu.codes.css import (
    create_generalized_bicycle_codes,
    create_QC_GHP_codes,
    create_cyclic_permuting_matrix,
)
from feedback_gnn_tpu.codes.graph import QuantumGraph
from feedback_gnn_tpu.codes.qc import detect_qc_structure, qc_pair_from_code
from feedback_gnn_tpu.decoders.bp4 import bp4_decode
from feedback_gnn_tpu.decoders.bp4_qc import bp4_qc_marginals


@pytest.fixture(scope="module")
def gb48():
    # small GB code: l=24, hx=[A,B] (codes_q.py:92)
    return create_generalized_bicycle_codes(24, [0, 2, 8, 15], [0, 2, 12, 17])


def test_detect_qc_structure_gb(gb48):
    spec = detect_qc_structure(np.asarray(gb48.hx), 24)
    assert spec is not None
    assert spec.mb == 1 and spec.nb == 2 and spec.num_groups == 8
    assert spec.num_edges == int(np.asarray(gb48.hx).sum())
    # reconstruct the pcm from groups
    recon = np.zeros((24, 48), int)
    for i, j, s in spec.groups:
        for c in range(24):
            recon[i * 24 + (c + s) % 24, j * 24 + c] = 1
    np.testing.assert_array_equal(recon, np.asarray(gb48.hx))


def test_detect_qc_structure_rejects_non_qc():
    rng = np.random.default_rng(0)
    pcm = (rng.random((24, 48)) < 0.2).astype(int)
    assert detect_qc_structure(pcm, 24) is None


def test_qc_pair_ghp_small():
    code = create_QC_GHP_codes(7, create_cyclic_permuting_matrix(3, [2, 4, 0]), [0, 1, 3])
    qc = qc_pair_from_code(code)
    assert qc is not None
    assert qc.l == 7
    assert qc.qx.num_edges == int(np.asarray(code.hx).sum())
    assert qc.qz.num_edges == int(np.asarray(code.hz).sum())


@pytest.mark.parametrize("cn_type", ["boxplus-phi", "minsum", "boxplus"])
def test_qc_kernel_matches_xla_path(gb48, cn_type):
    """Pointwise marginal agreement on non-degenerate inputs.

    NOTE: with exactly-uniform channel priors BP sits on decision-boundary
    ties where the kernel's phi = -log(tanh(x/2)) and the XLA path's
    expm1-based phi (~1e-7 apart) can chaotically diverge for rare
    samples; realistic-prior equivalence is covered statistically below."""
    code = gb48
    qc = qc_pair_from_code(code, l=24)
    assert qc is not None
    graph = QuantumGraph.from_code(code, stage_mode=True)

    b = 32
    rng = np.random.default_rng(1)
    llr_ch = jnp.asarray(rng.standard_normal((3, code.N, b)) * 2.0, jnp.float32)
    syn_x = jnp.asarray(rng.integers(0, 2, (code.hx.shape[0], b)), jnp.float32)
    syn_z = jnp.asarray(rng.integers(0, 2, (code.hz.shape[0], b)), jnp.float32)

    ref = bp4_decode(
        graph, llr_ch, syn_x, syn_z, num_iter=8, cn_type=cn_type, normalization_factor=0.9
    )
    llrx, llry, llrz = bp4_qc_marginals(
        qc,
        llr_ch,
        syn_x,
        syn_z,
        num_iter=8,
        cn_type=cn_type,
        normalization_factor=0.9,
        batch_tile=32,
        interpret=True,
    )

    n = code.N
    np.testing.assert_allclose(llrx, ref.llrx[:n], rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(llry, ref.llry[:n], rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(llrz, ref.llrz[:n], rtol=2e-3, atol=2e-3)


def test_qc_kernel_realistic_decode_statistics(gb48):
    """Realistic decode (uniform depolarizing prior): hard decisions must
    agree on essentially all qubits; the rare disagreements are tie-bound
    samples (see note above)."""
    code = gb48
    qc = qc_pair_from_code(code, l=24)
    graph = QuantumGraph.from_code(code, stage_mode=True)

    b = 256
    key = jax.random.PRNGKey(0)
    p = 0.08
    px, py, pz = depolarizing_probs(p)
    noise_x, noise_z = pauli_iid(key, px, py, pz, code.N, b)
    hx = jnp.asarray(np.asarray(code.hx, np.float32))
    hz = jnp.asarray(np.asarray(code.hz, np.float32))
    syn_x = jnp.mod(hx @ noise_z.astype(jnp.float32), 2.0)
    syn_z = jnp.mod(hz @ noise_x.astype(jnp.float32), 2.0)

    p0 = float(p)
    lx = np.log((1.0 - p0) / (p0 * 2.0 / 3.0))
    ly = np.log((1.0 - p0) / (p0 / 3.0))
    llr_ch = jnp.asarray(
        np.stack(
            [
                np.full((code.N, b), lx, np.float32),
                np.full((code.N, b), ly, np.float32),
                np.full((code.N, b), lx, np.float32),
            ]
        )
    )

    ref = bp4_decode(graph, llr_ch, syn_x, syn_z, num_iter=16)
    llrx, llry, llrz = bp4_qc_marginals(
        qc, llr_ch, syn_x, syn_z, num_iter=16, batch_tile=64, interpret=True
    )
    from feedback_gnn_tpu.decoders.bp4 import hard_decision

    xh, zh = hard_decision(llrx, llry, llrz)
    n = code.N
    agree = np.mean(
        np.logical_and(
            np.asarray(xh) == np.asarray(ref.x_hat[:n]),
            np.asarray(zh) == np.asarray(ref.z_hat[:n]),
        )
    )
    assert agree > 0.999, agree


def test_qc_kernel_batch_padding(gb48):
    """Non-multiple batch sizes are padded and sliced back."""
    code = gb48
    qc = qc_pair_from_code(code, l=24)
    b = 19
    llr_ch = jnp.ones((3, code.N, b)) * 2.0
    syn_x = jnp.zeros((code.hx.shape[0], b))
    syn_z = jnp.zeros((code.hz.shape[0], b))
    llrx, llry, llrz = bp4_qc_marginals(
        qc, llr_ch, syn_x, syn_z, num_iter=4, batch_tile=16, interpret=True
    )
    assert llrx.shape == (code.N, b)
    assert np.isfinite(np.asarray(llrx)).all()


def test_cascade_with_qc_backend_matches_xla(gb48):
    """sandwich_eval_step with the QC kernel backend agrees with the XLA
    backend (same key -> same channel; rare tie-bound samples may differ)."""
    import jax

    from feedback_gnn_tpu.decoders import CascadeConfig, init_feedback_gnn
    from feedback_gnn_tpu.decoders.cascade import sandwich_eval_step

    code = gb48
    qc = qc_pair_from_code(code, l=24)
    graph = QuantumGraph.from_code(code, stage_mode=True)
    params = init_feedback_gnn(jax.random.PRNGKey(1))
    cfg = CascadeConfig(num_iter1=8, num_iter2=4, num_rounds=2, p0=0.08)

    key = jax.random.PRNGKey(7)
    b = 128
    f_x, l_x = sandwich_eval_step(graph, [params], cfg, key, 0.08, b)
    f_q, l_q = sandwich_eval_step(graph, [params], cfg, key, 0.08, b, qc=qc)
    assert abs(int(f_x) - int(f_q)) <= 2, (int(f_x), int(f_q))
    assert abs(int(l_x) - int(l_q)) <= 2, (int(l_x), int(l_q))


def test_cascade_compaction_exact_when_capacity_covers(gb48):
    """compact_fraction=1.0 must reproduce the uncompacted cascade exactly
    (the compaction is a gather/scatter identity then)."""
    import jax

    from feedback_gnn_tpu.decoders import CascadeConfig, init_feedback_gnn
    from feedback_gnn_tpu.decoders.cascade import sandwich_eval_step

    code = gb48
    graph = QuantumGraph.from_code(code, stage_mode=True)
    params = init_feedback_gnn(jax.random.PRNGKey(1))
    key = jax.random.PRNGKey(3)
    b = 96
    base = CascadeConfig(num_iter1=8, num_iter2=4, num_rounds=2, p0=0.08)
    compact = CascadeConfig(
        num_iter1=8, num_iter2=4, num_rounds=2, p0=0.08, compact_fraction=1.0
    )
    f0, l0 = sandwich_eval_step(graph, [params], base, key, 0.08, b)
    f1, l1 = sandwich_eval_step(graph, [params], compact, key, 0.08, b)
    assert int(f0) == int(f1) and int(l0) == int(l1)


def test_cascade_compaction_partial_capacity(gb48):
    """A partial capacity still runs and can only leave extra samples at
    their stage-1 estimate (flagged count may only increase)."""
    import jax

    from feedback_gnn_tpu.decoders import CascadeConfig, init_feedback_gnn
    from feedback_gnn_tpu.decoders.cascade import sandwich_eval_step

    code = gb48
    graph = QuantumGraph.from_code(code, stage_mode=True)
    params = init_feedback_gnn(jax.random.PRNGKey(1))
    key = jax.random.PRNGKey(3)
    b = 96
    full = CascadeConfig(
        num_iter1=8, num_iter2=4, num_rounds=2, p0=0.08, compact_fraction=1.0
    )
    part = CascadeConfig(
        num_iter1=8, num_iter2=4, num_rounds=2, p0=0.08, compact_fraction=0.25
    )
    f_full, _ = sandwich_eval_step(graph, [params], full, key, 0.08, b)
    f_part, _ = sandwich_eval_step(graph, [params], part, key, 0.08, b)
    assert int(f_part) >= int(f_full)


def test_cascade_stage1_prepass(gb48):
    """Prepass stage 1: flagged samples get the exact full-schedule result;
    converged-early samples keep a syndrome-consistent estimate, so the
    final flagged count cannot exceed the plain cascade's by more than the
    rare drift cases (none expected at this scale)."""
    import jax

    from feedback_gnn_tpu.decoders import CascadeConfig, init_feedback_gnn
    from feedback_gnn_tpu.decoders.cascade import sandwich_eval_step

    code = gb48
    graph = QuantumGraph.from_code(code, stage_mode=True)
    params = init_feedback_gnn(jax.random.PRNGKey(1))
    key = jax.random.PRNGKey(9)
    b = 128
    full = CascadeConfig(
        num_iter1=16, num_iter2=4, num_rounds=2, p0=0.08, compact_fraction=1.0
    )
    pre = CascadeConfig(
        num_iter1=16, num_iter2=4, num_rounds=2, p0=0.08,
        compact_fraction=1.0, stage1_prepass=6,
    )
    f0, l0 = sandwich_eval_step(graph, [params], full, key, 0.08, b)
    f1, l1 = sandwich_eval_step(graph, [params], pre, key, 0.08, b)
    # with capacity 1.0 every flagged-after-prepass sample is re-decoded with
    # the full schedule -> flagged counts match exactly
    assert int(f0) == int(f1), (int(f0), int(f1))
    assert abs(int(l0) - int(l1)) <= 1, (int(l0), int(l1))


def test_qc_kernel_nonaligned_lift(gb48):
    """l=7 circulants (l_pad=8, gap=1) exercise the two-roll + select
    formulation of the mod-l rotation on padded planes."""
    del gb48
    code = create_QC_GHP_codes(7, create_cyclic_permuting_matrix(3, [2, 4, 0]), [0, 1, 3])
    qc = qc_pair_from_code(code, l=7)
    assert qc is not None
    graph = QuantumGraph.from_code(code, stage_mode=True)

    b = 16
    rng = np.random.default_rng(5)
    llr_ch = jnp.asarray(rng.standard_normal((3, code.N, b)) * 2.0, jnp.float32)
    syn_x = jnp.asarray(rng.integers(0, 2, (code.hx.shape[0], b)), jnp.float32)
    syn_z = jnp.asarray(rng.integers(0, 2, (code.hz.shape[0], b)), jnp.float32)

    ref = bp4_decode(graph, llr_ch, syn_x, syn_z, num_iter=6)
    llrx, llry, llrz = bp4_qc_marginals(
        qc, llr_ch, syn_x, syn_z, num_iter=6, batch_tile=16, interpret=True
    )
    np.testing.assert_allclose(llrx, ref.llrx[: code.N], rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(llry, ref.llry[: code.N], rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(llrz, ref.llrz[: code.N], rtol=2e-3, atol=2e-3)


def test_cascade_two_level_compaction_exact(gb48):
    """Full-capacity two-level compaction reproduces the plain cascade."""
    import jax

    from feedback_gnn_tpu.decoders import CascadeConfig, init_feedback_gnn
    from feedback_gnn_tpu.decoders.cascade import sandwich_eval_step

    code = gb48
    graph = QuantumGraph.from_code(code, stage_mode=True)
    params = init_feedback_gnn(jax.random.PRNGKey(1))
    key = jax.random.PRNGKey(13)
    b = 128
    base = CascadeConfig(num_iter1=16, num_iter2=4, num_rounds=2, p0=0.08,
                         compact_fraction=1.0, stage1_prepass=6)
    two = CascadeConfig(num_iter1=16, num_iter2=4, num_rounds=2, p0=0.08,
                        compact_fraction=1.0, stage1_prepass=6,
                        round_fraction=1.0)
    f0, l0 = sandwich_eval_step(graph, [params], base, key, 0.08, b)
    f1, l1 = sandwich_eval_step(graph, [params], two, key, 0.08, b)
    assert int(f0) == int(f1) and int(l0) == int(l1)
