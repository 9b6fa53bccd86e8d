"""Unit tests for the selectable phi formulations (cn_update.py).

phi(x) = log((e^x+1)/(e^x-1)) = -log(tanh(x/2)) is the Gallager involution
used by the boxplus-phi CN update (reference decoding_q.py:372-373).  Three
f32 formulations are selectable for error-floor numerics experiments
(RESULTS.md "phi-formulation A/B"); these tests pin their measured
properties so the A/B knob itself stays trustworthy:

* mid-range (1e-4 <= x <= 8): every formulation tracks the f64 truth;
* large x: softplus(x) - log(expm1(x)) cancels catastrophically (phi is
  ~1e-6 there, both softplus terms are ~x) — 'accurate' does not;
* small x: the reference's exp(x)-1 quantizes onto f32 ulp steps (its
  documented staircase), visible as collapsed distinct-output counts.
"""

import numpy as np
import pytest

from feedback_gnn_tpu.decoders import cn_update as cu


@pytest.fixture
def phi_impl():
    """Restore the module-global formulation after each test."""
    prev = cu._PHI_IMPL
    yield cu.set_phi_impl
    cu.set_phi_impl(prev)


def _true_phi(x):
    # f64 ground truth, well-conditioned over the grids below
    x = np.asarray(x, np.float64)
    return -np.log(np.tanh(x / 2.0))


MID = np.logspace(-4, np.log10(8.0), 256).astype(np.float32)
FULL = np.logspace(-6, np.log10(16.0), 512).astype(np.float32)


def test_all_match_truth_mid_range(phi_impl):
    truth = _true_phi(MID)
    for name, tol in [("expm1", 2e-3), ("accurate", 1e-4), ("tf", 2e-3)]:
        phi_impl(name)
        rel = np.abs(np.asarray(cu.phi(MID), np.float64) - truth) / truth
        assert rel.max() < tol, (name, rel.max())


def test_accurate_beats_expm1_at_large_x(phi_impl):
    truth = _true_phi(FULL)
    rels = {}
    for name in ("expm1", "accurate"):
        phi_impl(name)
        rels[name] = np.abs(np.asarray(cu.phi(FULL), np.float64) - truth) / truth
    # expm1's large-x cancellation: >10% somewhere on the tail
    assert rels["expm1"].max() > 0.1
    # the cancellation-free formulation stays under 1% everywhere
    assert rels["accurate"].max() < 1e-2
    assert np.median(rels["accurate"]) < 5e-6


def test_accurate_is_involution(phi_impl):
    phi_impl("accurate")
    x = FULL[(FULL > 1e-4) & (FULL < 16.0)]
    back = np.asarray(cu.phi(cu.phi(x)), np.float64)
    rel = np.abs(back - x) / np.abs(x)
    assert np.median(rel) < 1e-5
    assert rel.max() < 2e-2  # worst conditioning near the interval edges


def test_tf_formulation_staircases_small_x(phi_impl):
    """exp(x)-1 collapses weak messages onto f32 ulp steps; expm1 resolves
    them (measured: 34 vs 62 distinct outputs on this 64-point band)."""
    xs = np.logspace(-7, -5.2, 64).astype(np.float32)
    counts = {}
    for name in ("tf", "expm1"):
        phi_impl(name)
        counts[name] = len(np.unique(np.asarray(cu.phi(xs))))
    assert counts["tf"] <= counts["expm1"] - 10, counts


def test_all_impls_respect_clip(phi_impl):
    xs = np.array([0.0, 1e-30, 1e3, np.float32(np.inf)], np.float32)
    for name in cu._PHI_IMPLS:
        phi_impl(name)
        out = np.asarray(cu.phi(xs))
        assert np.all(np.isfinite(out))
        assert out.min() >= cu.PHI_CLIP_MIN - 1e-6
        assert out.max() <= cu.PHI_CLIP_MAX + 1e-6


def test_explicit_impl_arg_matches_global_toggle(phi_impl):
    """phi(x, impl=NAME) must equal the legacy set_phi_impl(NAME) + phi(x)
    path for every formulation (the rescue stage relies on the argument
    form; the env/global remains only a default)."""
    for name in cu._PHI_IMPLS:
        explicit = np.asarray(cu.phi(FULL, name))
        phi_impl(name)
        via_global = np.asarray(cu.phi(FULL))
        np.testing.assert_array_equal(explicit, via_global)


def test_bp4_decode_phi_impl_arg(phi_impl):
    """bp4_decode(phi_impl=NAME) == set_phi_impl(NAME) + bp4_decode()."""
    import jax
    import jax.numpy as jnp

    from feedback_gnn_tpu.codes import create_generalized_bicycle_codes
    from feedback_gnn_tpu.codes.graph import QuantumGraph
    from feedback_gnn_tpu.decoders.bp4 import bp4_decode
    from feedback_gnn_tpu.decoders.cascade import prior_llr
    from feedback_gnn_tpu.ops.gf2mat import mod2_matmul

    code = create_generalized_bicycle_codes(24, [0, 2, 8, 15], [0, 2, 12, 17])
    graph = QuantumGraph.from_code(code, stage_mode=True)
    key = jax.random.PRNGKey(3)
    b = 16
    nx = jax.random.bernoulli(key, 0.06, (graph.n_pad, b)).astype(jnp.int32)
    nz = jax.random.bernoulli(jax.random.fold_in(key, 1), 0.06,
                              (graph.n_pad, b)).astype(jnp.int32)
    nx = nx.at[graph.n:].set(0)
    nz = nz.at[graph.n:].set(0)
    sx = mod2_matmul(jnp.asarray(graph.hx), nz)
    sz = mod2_matmul(jnp.asarray(graph.hz), nx)
    llr0 = prior_llr(0.05, graph.n, b, n_pad=graph.n_pad)

    res_arg = bp4_decode(graph, llr0, sx, sz, 8, phi_impl="accurate")
    phi_impl("accurate")
    res_glob = bp4_decode(graph, llr0, sx, sz, 8)
    np.testing.assert_array_equal(np.asarray(res_arg.x_hat), np.asarray(res_glob.x_hat))
    np.testing.assert_array_equal(np.asarray(res_arg.z_hat), np.asarray(res_glob.z_hat))
    np.testing.assert_allclose(np.asarray(res_arg.x_logit),
                               np.asarray(res_glob.x_logit), rtol=1e-6)
