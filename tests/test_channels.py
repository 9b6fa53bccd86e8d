"""Channel sampling tests: statistical checks of the threshold semantics
(reference sionna/channel/pauli.py:78-117, discrete_channel.py)."""

import numpy as np

import jax
import jax.numpy as jnp

from feedback_gnn_tpu.channels import (
    bsc_sample,
    bsc_sample_ste,
    depolarizing_probs,
    pauli_fixed_weight,
    pauli_iid,
)


def test_pauli_iid_marginals():
    key = jax.random.PRNGKey(0)
    p = 0.09
    px, py, pz = depolarizing_probs(p)
    n, b = 300, 4000
    nx, nz = pauli_iid(key, px, py, pz, n, b)
    nx, nz = np.asarray(nx), np.asarray(nz)
    # components: pure X = x & ~z, Y = x & z, pure Z = ~x & z, each p/3
    tol = 4 * np.sqrt((p / 3) / (n * b))
    assert abs((nx & ~nz).mean() - p / 3) < tol
    assert abs((nx & nz).mean() - p / 3) < tol
    assert abs((~nx & nz).mean() - p / 3) < tol


def test_pauli_fixed_weight():
    key = jax.random.PRNGKey(1)
    n, b, wt = 100, 500, 7
    nx, nz = pauli_fixed_weight(key, wt, n, b)
    nx, nz = np.asarray(nx), np.asarray(nz)
    support = nx | nz
    # exactly wt error positions per sample
    assert (support.sum(axis=0) == wt).all()
    # each position is X/Y/Z with prob 1/3 each (X-bit w.p. 2/3)
    x_frac = nx.sum() / (b * wt)
    z_frac = nz.sum() / (b * wt)
    assert abs(x_frac - 2 / 3) < 0.03
    assert abs(z_frac - 2 / 3) < 0.03


def test_bsc_sample():
    key = jax.random.PRNGKey(2)
    e = np.asarray(bsc_sample(key, 0.11, (200, 2000)))
    assert abs(e.mean() - 0.11) < 0.005


def test_bsc_ste_gradient():
    """STE sampler: forward is {0,1}, gradient w.r.t. p is nonzero."""
    key = jax.random.PRNGKey(3)

    def mean_err(p):
        return jnp.mean(bsc_sample_ste(key, p, (64, 64)))

    val = mean_err(0.2)
    assert set(np.unique(np.asarray(bsc_sample_ste(key, 0.2, (64, 64))))) <= {0.0, 1.0}
    g = jax.grad(mean_err)(0.2)
    assert np.isfinite(g) and abs(g) > 0
    assert abs(val - 0.2) < 0.05


def test_pauli_fixed_weight_traced_matches_static_distribution():
    """Traced-wt sampler: exact weight per sample, same marginals as the
    static version, and one compiled program serves every weight."""
    import jax
    import jax.numpy as jnp

    from feedback_gnn_tpu.channels.pauli import (
        pauli_fixed_weight,
        pauli_fixed_weight_traced,
    )

    n, batch, wt_max = 60, 512, 24
    traced = jax.jit(
        lambda key, wt: pauli_fixed_weight_traced(key, wt, n, batch, wt_max)
    )
    for wt in (1, 7, 24):
        nx, nz = traced(jax.random.PRNGKey(wt), jnp.int32(wt))
        support = np.asarray(nx) | np.asarray(nz)
        # exactly wt error positions per sample
        np.testing.assert_array_equal(support.sum(axis=0), wt)
        # X and Z marginals: each active position is X w.p. 2/3, Z w.p. 2/3
        assert abs(np.asarray(nx).sum() / (wt * batch) - 2 / 3) < 0.06
        assert abs(np.asarray(nz).sum() / (wt * batch) - 2 / 3) < 0.06

    # distributional agreement with the static version at matched weight
    wt = 12
    sx, sz = pauli_fixed_weight(jax.random.PRNGKey(99), wt, n, 4096)
    tx, tz = pauli_fixed_weight_traced(jax.random.PRNGKey(98), jnp.int32(wt), n, 4096, wt_max)
    # per-qubit occupancy is uniform wt/n for both
    for arr in (sx, tx, sz, tz):
        occ = np.asarray(arr).mean(axis=1)
        assert abs(occ.mean() - (2 / 3) * wt / n) < 0.01
        assert occ.std() < 0.02
