"""Discrete channel family (DMC/BSC/Z/BEC) and BP2 weighted/EXIT features.

Reference semantics: /root/reference/sionna/channel/discrete_channel.py and
sionna/fec/ldpc/decoding.py:852-1000 (weighted BP, EXIT tracking)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from feedback_gnn_tpu.channels import (
    binary_erasure_channel,
    binary_memoryless_channel,
    binary_symmetric_channel,
    binary_z_channel,
    binary_source,
)
from feedback_gnn_tpu.channels.discrete import xor_ste, ste_binarize


def test_bsc_flip_rate_and_binary_output():
    key = jax.random.PRNGKey(0)
    kx, kc = jax.random.split(key)
    x = binary_source(kx, (200, 500))
    y = binary_symmetric_channel(kc, x, 0.1)
    assert set(np.unique(np.asarray(y))) <= {0.0, 1.0}
    flip_rate = float(jnp.mean(jnp.abs(y - x)))
    assert abs(flip_rate - 0.1) < 0.01


def test_z_channel_only_flips_ones():
    key = jax.random.PRNGKey(1)
    kx, kc = jax.random.split(key)
    x = binary_source(kx, (100, 1000))
    y = binary_z_channel(kc, x, 0.3)
    # zeros always received correctly
    assert np.all(np.asarray(y)[np.asarray(x) == 0.0] == 0.0)
    ones = np.asarray(x) == 1.0
    rate = float(np.mean(np.asarray(y)[ones] != 1.0))
    assert abs(rate - 0.3) < 0.03


def test_dmc_asymmetric_rates():
    key = jax.random.PRNGKey(2)
    kx, kc = jax.random.split(key)
    x = binary_source(kx, (300, 1000))
    y = binary_memoryless_channel(kc, x, (0.05, 0.25))
    xa, ya = np.asarray(x), np.asarray(y)
    r0 = float(np.mean(ya[xa == 0.0] != 0.0))
    r1 = float(np.mean(ya[xa == 1.0] != 1.0))
    assert abs(r0 - 0.05) < 0.01
    assert abs(r1 - 0.25) < 0.02


def test_dmc_llr_output_values():
    """LLR magnitudes follow the Sionna logit convention
    (discrete_channel.py:283-293)."""
    key = jax.random.PRNGKey(3)
    kx, kc = jax.random.split(key)
    x = binary_source(kx, (50, 200))
    pb0, pb1 = 0.1, 0.2
    y = binary_memoryless_channel(kc, x, (pb0, pb1), return_llrs=True)
    eps = 1e-9
    y1 = np.log(1 - pb1 - eps) - np.log(pb0 + eps)  # value where y=+1
    y0 = -(np.log(pb1 + eps) - np.log(1 - pb0 - eps))  # magnitude where y=-1
    vals = np.unique(np.asarray(y))
    expected = np.array(sorted([-y0, y1]))
    np.testing.assert_allclose(vals, expected, rtol=1e-5)


def test_bsc_llr_gradient_flows_to_p():
    """Gumbel-softmax + STE keeps the channel differentiable w.r.t. pb
    (discrete_channel.py:192-221)."""

    def loss(p):
        x = jnp.zeros((64, 64))
        y = binary_symmetric_channel(jax.random.PRNGKey(4), x, p)
        return jnp.mean(y)

    g = jax.grad(loss)(0.2)
    assert np.isfinite(float(g)) and float(g) != 0.0


def test_bec_ternary_and_llr_modes():
    key = jax.random.PRNGKey(5)
    kx, kc = jax.random.split(key)
    x = binary_source(kx, (100, 500))
    y = binary_erasure_channel(kc, x, 0.25)
    ya, xa = np.asarray(y), np.asarray(x)
    assert set(np.unique(ya)) <= {-1.0, 0.0, 1.0}
    erased = ya == -1.0
    assert abs(float(np.mean(erased)) - 0.25) < 0.02
    # non-erased positions pass through
    assert np.all(ya[~erased] == xa[~erased])

    yl = binary_erasure_channel(kc, x, 0.25, return_llrs=True, llr_max=50.0)
    yla = np.asarray(yl)
    assert set(np.unique(yla)) <= {-50.0, 0.0, 50.0}
    assert np.all((yla == 0.0) == erased)  # same key -> same erasure pattern


def test_xor_ste_and_binarizer_grads():
    ga, gb = jax.grad(lambda a, b: xor_ste(a, b), argnums=(0, 1))(1.0, 1.0)
    assert ga == 1.0 and gb == 1.0  # identity backward
    assert jax.grad(ste_binarize)(0.3) == 1.0
    assert ste_binarize(0.3) == 0.0 and ste_binarize(0.7) == 1.0


# ---------------------------------------------------------------------------
# BP2 weighted BP + EXIT tracking
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def small_graph():
    from feedback_gnn_tpu.codes.css import hamming_code
    from feedback_gnn_tpu.codes.graph import build_graph

    return build_graph(hamming_code(4))  # (15,11) Hamming


def _run_bp(graph, key, **kw):
    kx, kn = jax.random.split(key)
    x = (jax.random.uniform(kx, (graph.num_vn, 64)) < 0.05).astype(jnp.float32)
    syn = jnp.zeros((graph.num_cn, 64))
    llr = 4.0 * (2.0 * x - 1.0)
    from feedback_gnn_tpu.decoders.bp2 import bp2_decode

    return bp2_decode(graph, llr, syn, num_iter=8, **kw)


def test_weighted_bp_ones_matches_unweighted(small_graph):
    key = jax.random.PRNGKey(6)
    base = _run_bp(small_graph, key)
    ones = jnp.ones((small_graph.max_vn_deg, small_graph.n_pad))
    weighted = _run_bp(small_graph, key, edge_weights=ones)
    np.testing.assert_allclose(base.logits, weighted.logits, rtol=1e-6)


def test_weighted_bp_gradient_through_weights(small_graph):
    key = jax.random.PRNGKey(7)

    def loss(w):
        out = _run_bp(small_graph, key, edge_weights=w)
        return jnp.mean(out.logits**2)

    w0 = jnp.ones((small_graph.max_vn_deg, small_graph.n_pad))
    g = jax.grad(loss)(w0)
    assert np.isfinite(np.asarray(g)).all()
    # gradient lives on true edges
    assert float(jnp.sum(jnp.abs(g) * jnp.asarray(small_graph.vn_mask))) > 0.0


def test_exit_tracking_trajectory(small_graph):
    """All-zero syndrome + confident LLRs: MI trajectory starts at 0 and the
    tracked values are finite, in [0, 1], and non-trivial."""
    key = jax.random.PRNGKey(8)
    # all-zero codeword, no errors -> messages grow confident -> MI -> 1
    llr = -6.0 * jnp.ones((small_graph.num_vn, 32))
    syn = jnp.zeros((small_graph.num_cn, 32))
    from feedback_gnn_tpu.decoders.bp2 import bp2_decode

    out = bp2_decode(small_graph, llr, syn, num_iter=8, track_exit=True)
    ie_v, ie_c = np.asarray(out.ie_v), np.asarray(out.ie_c)
    assert ie_v.shape == (9,) and ie_c.shape == (9,)
    assert ie_v[0] == 0.0 and ie_c[0] == 0.0
    assert np.all(ie_v[1:] > 0.2) and np.all(ie_c[1:] > 0.2)
    assert np.all(ie_v <= 1.0) and np.all(ie_c <= 1.0)
    del key
