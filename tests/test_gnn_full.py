"""GNN_BP4 full decoder tests: shape/finite checks, trainability (loss
decreases), and decode improvement over random on trivial syndromes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def setup(small_code):
    from feedback_gnn_tpu.codes.graph import QuantumGraph
    from feedback_gnn_tpu.decoders.gnn_full import (
        GNNBP4Config,
        init_gnn_bp4,
        make_logit_rowsets,
    )

    graph = QuantumGraph.from_code(small_code, stage_mode=True)
    cfg = GNNBP4Config(num_iter=4, num_embed_dims=8, num_msg_dims=8, num_hidden_units=16)
    params = init_gnn_bp4(jax.random.PRNGKey(0), cfg)
    lrowsets = make_logit_rowsets(graph)
    return graph, cfg, params, lrowsets


def test_gnn_bp4_forward(setup):
    from feedback_gnn_tpu.decoders.gnn_full import gnn_bp4_apply

    graph, cfg, params, lrowsets = setup
    b = 8
    mx = graph.gx.num_cn
    mz = graph.gz.num_cn
    sx = jnp.zeros((mx, b))
    sz = jnp.zeros((mz, b))
    x_hat, z_hat, stack = jax.jit(
        lambda p, sx, sz: gnn_bp4_apply(p, graph, lrowsets, sx, sz, cfg, True)
    )(params, sx, sz)
    assert x_hat.shape == (graph.n_pad, b)
    assert len(stack) == cfg.num_iter
    xp, zp = stack[0]
    # x_perp rows = aligned(hz rows) + aligned(lz rows)
    assert xp.shape[0] == lrowsets[1].r_pad + lrowsets[3].r_pad
    assert np.isfinite(np.asarray(xp)).all()


def test_gnn_bp4_trains(setup):
    """A few SGD steps on a fixed batch must reduce the loss."""
    import optax

    from feedback_gnn_tpu.decoders.gnn_full import gnn_bp4_loss

    graph, cfg, params, lrowsets = setup
    n, b = graph.n, 16
    key = jax.random.PRNGKey(1)
    noise_x = jax.random.bernoulli(key, 0.1, (n, b)).astype(jnp.float32)
    noise_z = jax.random.bernoulli(jax.random.fold_in(key, 1), 0.1, (n, b)).astype(
        jnp.float32
    )

    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(gnn_bp4_loss)(
            params, graph, lrowsets, cfg, noise_x, noise_z
        )
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(12):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
