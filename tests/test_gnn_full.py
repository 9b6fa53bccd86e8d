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


@pytest.mark.parametrize("reduce_op", ["sum", "max", "min"])
def test_gnn_bp4_reduce_ops(setup, reduce_op):
    """All four aggregations of the reference (gnn.py:560-571) must produce
    finite outputs (mean is exercised by the other tests)."""
    from feedback_gnn_tpu.decoders.gnn_full import gnn_bp4_apply

    graph, cfg, params, lrowsets = setup
    cfg = cfg._replace(reduce_op=reduce_op)
    b = 4
    key = jax.random.PRNGKey(2)
    sx = jax.random.bernoulli(key, 0.2, (graph.gx.num_cn, b)).astype(jnp.float32)
    sz = jnp.zeros((graph.gz.num_cn, b))
    x_hat, z_hat, _ = jax.jit(
        lambda p, sx, sz: gnn_bp4_apply(p, graph, lrowsets, sx, sz, cfg, False)
    )(params, sx, sz)
    assert np.isfinite(np.asarray(x_hat)).all()
    assert x_hat.shape == (graph.n_pad, b)
    # padding rows must stay silent
    assert (np.asarray(x_hat)[graph.n :] == np.asarray(x_hat)[graph.n]).all()


def test_gnn_bp4_attributes_train(setup):
    """Trainable node/edge attributes (gnn.py:519-531): forward works and
    gradients reach every attribute tensor."""
    from feedback_gnn_tpu.decoders.gnn_full import (
        GNNBP4Config,
        gnn_bp4_loss,
        init_gnn_bp4,
    )

    graph, _, _, lrowsets = setup
    cfg = GNNBP4Config(
        num_iter=2,
        num_embed_dims=8,
        num_msg_dims=8,
        num_hidden_units=16,
        use_attributes=True,
        node_attribute_dims=3,
        msg_attribute_dims=2,
    )
    params = init_gnn_bp4(jax.random.PRNGKey(3), cfg, graph)
    assert set(params["attributes"]) == {
        "cn_msg_x", "cn_msg_z", "cn_node_x", "cn_node_z",
        "vn_msg_x", "vn_msg_z", "vn_node",
    }
    n, b = graph.n, 4
    key = jax.random.PRNGKey(4)
    noise_x = jax.random.bernoulli(key, 0.1, (n, b)).astype(jnp.float32)
    noise_z = jnp.zeros((n, b))
    loss, grads = jax.jit(
        jax.value_and_grad(
            lambda p: gnn_bp4_loss(p, graph, lrowsets, cfg, noise_x, noise_z)
        )
    )(params)
    assert np.isfinite(float(loss))
    for name, g in grads["attributes"].items():
        assert np.isfinite(np.asarray(g)).all(), name
        assert np.abs(np.asarray(g)).sum() > 0, f"no gradient reaches {name}"


def test_gnn_bp4_sine_stack(setup):
    """loss_type='sine' collects per-qubit (p_x, p_z) probabilities
    (gnn.py:317-332, 410-412) instead of the boxplus check logits."""
    from feedback_gnn_tpu.decoders.gnn_full import gnn_bp4_apply

    graph, cfg, params, lrowsets = setup
    cfg = cfg._replace(loss_type="sine", num_iter=2)
    b = 4
    sx = jnp.zeros((graph.gx.num_cn, b))
    sz = jnp.zeros((graph.gz.num_cn, b))
    _, _, stack = gnn_bp4_apply(params, graph, lrowsets, sx, sz, cfg, True)
    assert len(stack) == 2
    p_x, p_z = stack[0]
    assert p_x.shape == (graph.gx.n_pad, b)
    assert (np.asarray(p_x) >= 0).all() and (np.asarray(p_x) <= 1).all()


def test_gnn_bp4_eval_step_improves_after_training(setup):
    """End-to-end: the GNN_BP4 eval step's logical error count on a fixed
    channel drops after a short training run (the reference ships no
    numbers for GNN_BP4 — README.md:46 — so the bar is demonstrable
    improvement over initialization)."""
    import optax

    from feedback_gnn_tpu.channels.pauli import depolarizing_probs, pauli_iid
    from feedback_gnn_tpu.decoders.gnn_full import gnn_bp4_loss, init_gnn_bp4
    from feedback_gnn_tpu.models import gnn_bp4_eval_step

    graph, cfg, params0, lrowsets = setup
    key = jax.random.PRNGKey(11)
    opt = optax.chain(optax.clip(10.0), optax.adam(1e-3))
    opt_state = opt.init(params0)
    n = graph.n

    @jax.jit
    def train_step(params, opt_state, k):
        px, py, pz = depolarizing_probs(0.05)
        nx, nz = pauli_iid(k, px, py, pz, n, 64)
        loss, grads = jax.value_and_grad(gnn_bp4_loss)(
            params, graph, lrowsets, cfg, nx.astype(jnp.float32),
            nz.astype(jnp.float32),
        )
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params = params0
    for it in range(40):
        params, opt_state, _ = train_step(
            params, opt_state, jax.random.fold_in(key, it)
        )

    @jax.jit
    def ev(pa, k):
        return gnn_bp4_eval_step(graph, lrowsets, pa, cfg, k, 0.03, 512)

    k = jax.random.fold_in(key, 999)
    _, l_init = ev(params0, k)
    _, l_trained = ev(params, k)
    assert int(l_trained) < int(l_init), (int(l_trained), int(l_init))
