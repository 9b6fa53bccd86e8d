"""Multi-device equivalence tests on the 8-device virtual CPU mesh:
unsharded vs data-parallel vs edge-partitioned execution must produce
identical error counts (the computation is deterministic given the key)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def setup():
    from feedback_gnn_tpu.codes import create_generalized_bicycle_codes
    from feedback_gnn_tpu.codes.graph import QuantumGraph
    from feedback_gnn_tpu.decoders import CascadeConfig, init_feedback_gnn

    code = create_generalized_bicycle_codes(24, [0, 2, 8, 15], [0, 2, 12, 17])
    graph = QuantumGraph.from_code(code, stage_mode=True)
    params = init_feedback_gnn(jax.random.PRNGKey(3))
    cfg = CascadeConfig(num_iter1=8, num_iter2=4, num_rounds=2, p0=0.05)
    return graph, params, cfg


def test_edge_shard_graph_structure(setup):
    from feedback_gnn_tpu.parallel import shard_quantum_graph

    graph, _, _ = setup
    stacked = shard_quantum_graph(graph, 4)
    assert stacked.gx.edge_vn.shape[0] == 4
    # every real edge appears exactly once across shards
    total_edges = int(sum(stacked.gx.cn_mask[s].sum() for s in range(4)))
    assert total_edges == graph.gx.num_edges
    # PCM row blocks reassemble hx
    rows = np.concatenate(
        [stacked.hx[s][: np.any(stacked.hx[s], axis=1).sum()] for s in range(4)]
    )
    # (phantom rows are zero; just check row sums match)
    assert int(stacked.hx.sum()) == int(np.asarray(graph.hx).sum())


def test_bp4_edge_sharded_equivalence(setup):
    """Edge-partitioned BP4 inside shard_map == unsharded BP4."""
    from feedback_gnn_tpu.decoders import bp4_decode
    from feedback_gnn_tpu.parallel import make_mesh, shard_quantum_graph, unstack_shard
    from feedback_gnn_tpu.parallel.api import _graph_spec, shard_map
    from feedback_gnn_tpu.parallel.mesh import P
    from feedback_gnn_tpu.parallel.shard import shard_bounds

    graph, _, _ = setup
    n, n_pad, b = graph.n, graph.n_pad, 16
    key = jax.random.PRNGKey(0)
    noise_x = jnp.pad(
        jax.random.bernoulli(key, 0.05, (n, b)).astype(jnp.int32),
        ((0, n_pad - n), (0, 0)),
    )
    noise_z = jnp.pad(
        jax.random.bernoulli(jax.random.fold_in(key, 1), 0.05, (n, b)).astype(
            jnp.int32
        ),
        ((0, n_pad - n), (0, 0)),
    )
    from feedback_gnn_tpu.ops import mod2_matmul

    sx = mod2_matmul(jnp.asarray(graph.hx), noise_z)  # [cx_pad, B]
    sz = mod2_matmul(jnp.asarray(graph.hz), noise_x)
    llr0 = jnp.pad(
        jnp.full((3, n, b), 3.85, jnp.float32), ((0, 0), (0, n_pad - n), (0, 0))
    )

    ref = bp4_decode(graph, llr0, sx, sz, num_iter=6)

    mesh = make_mesh(data=1, edge=4, devices=jax.devices()[:4])
    stacked = shard_quantum_graph(graph, 4)
    bx = shard_bounds(graph.gx.num_cn, 4)
    bz = shard_bounds(graph.gz.num_cn, 4)
    cx_max = stacked.hx.shape[1]
    cz_max = stacked.hz.shape[1]
    # build per-shard syndromes [S, c_pad_s, B]
    sx_sh = np.zeros((4, cx_max, b), np.float32)
    sz_sh = np.zeros((4, cz_max, b), np.float32)
    for i, ((s0, e0), (s1, e1)) in enumerate(zip(bx, bz)):
        sx_sh[i, : e0 - s0] = np.asarray(sx)[s0:e0]
        sz_sh[i, : e1 - s1] = np.asarray(sz)[s1:e1]

    def inner(g, sx_l, sz_l):
        g = unstack_shard(g)
        res = bp4_decode(
            g, llr0, sx_l[0], sz_l[0], num_iter=6, axis_name="edge"
        )
        return res.llrx, res.x_hat, res.z_hat

    out = shard_map(
        inner,
        mesh=mesh,
        in_specs=(_graph_spec(stacked), P("edge"), P("edge")),
        out_specs=(P(), P(), P()),
        check_vma=True,
    )(stacked, jnp.asarray(sx_sh), jnp.asarray(sz_sh))

    # psum changes f32 summation order; saturated entries drift slightly
    np.testing.assert_allclose(out[0], ref.llrx, rtol=2e-2, atol=1e-4)
    assert np.mean(np.asarray(out[1]) == np.asarray(ref.x_hat)) > 0.999
    assert np.mean(np.asarray(out[2]) == np.asarray(ref.z_hat)) > 0.999


def test_eval_step_data_and_edge_sharded(setup):
    """Full cascade eval: (data=2, edge=2) sharded counts == unsharded counts
    computed with the same per-data-shard keys."""
    from feedback_gnn_tpu.decoders import sandwich_eval_step
    from feedback_gnn_tpu.parallel import (
        make_mesh,
        make_sharded_eval_step,
        shard_quantum_graph,
    )

    graph, params, cfg = setup
    local_batch = 32
    mesh = make_mesh(data=2, edge=2, devices=jax.devices()[:4])
    stacked = shard_quantum_graph(graph, 2)
    step = make_sharded_eval_step(mesh, stacked, [params], cfg, local_batch)

    key = jax.random.PRNGKey(42)
    p = 0.08
    flagged, logical = step(key, p)

    # unsharded reference: same key folding as the data axis performs
    tot_f = tot_l = 0
    for d in range(2):
        k = jax.random.fold_in(key, d)
        f, l = jax.jit(
            lambda k, p: sandwich_eval_step(graph, [params], cfg, k, p, local_batch)
        )(k, p)
        tot_f += int(f)
        tot_l += int(l)

    assert int(flagged) == tot_f, (int(flagged), tot_f)
    assert int(logical) == tot_l


def test_train_step_sharded_equivalence(setup):
    """Sharded train step == unsharded train step (loss and updated params)."""
    from feedback_gnn_tpu.parallel import make_mesh, make_sharded_train_step, shard_quantum_graph
    from feedback_gnn_tpu.train import TrainConfig, make_optimizer, make_train_step

    import optax

    graph, params, _ = setup
    tcfg = TrainConfig(num_iter1=8, num_iter2=8, loss_from=4)
    # SGD(1.0): the param delta IS the gradient, so this compares gradients
    # directly (Adam would amplify noise-level grads to full +-lr flips)
    opt = optax.sgd(1.0)
    opt_state = opt.init(params)

    n, b = graph.n, 32
    key = jax.random.PRNGKey(5)
    noise_x = jax.random.bernoulli(key, 0.06, (n, b)).astype(jnp.float32)
    noise_z = jax.random.bernoulli(jax.random.fold_in(key, 1), 0.06, (n, b)).astype(
        jnp.float32
    )

    step_ref = make_train_step(graph, tcfg, opt)
    p_ref, _, loss_ref, fb_ref, b_ref = step_ref(params, opt_state, noise_x, noise_z)

    mesh = make_mesh(data=2, edge=2, devices=jax.devices()[:4])
    stacked = shard_quantum_graph(graph, 2)
    step_sh = make_sharded_train_step(mesh, stacked, tcfg, opt, local_batch=b // 2)
    p_sh, _, loss_sh, fb_sh, b_sh = step_sh(params, opt_state, noise_x, noise_z)

    np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=1e-5)
    np.testing.assert_allclose(float(fb_sh), float(fb_ref), rtol=1e-6)
    # Note: end-to-end gradient equality is NOT asserted here — stage-1
    # features carry f32 psum-reordering noise that phi's ill-conditioned
    # gradient (phi' = -1/sinh -> -1e5 near 0) amplifies chaotically.  The
    # exact gradient check with controlled inputs lives in
    # test_stage_two_grad_edge_sharded_exact.
    g_ref = jax.tree.leaves(jax.tree.map(lambda a, b_: a - b_, params, p_ref))
    g_sh = jax.tree.leaves(jax.tree.map(lambda a, b_: a - b_, params, p_sh))
    ref_flat = np.concatenate([np.ravel(g) for g in g_ref])
    sh_flat = np.concatenate([np.ravel(g) for g in g_sh])
    # direction must agree strongly even if individual entries drift
    cos = np.dot(ref_flat, sh_flat) / (
        np.linalg.norm(ref_flat) * np.linalg.norm(sh_flat)
    )
    assert cos > 0.75, cos  # sanity floor; exact check is the test below


def test_stage_two_grad_edge_sharded_exact(setup):
    """With identical (fixed) stage-1 features, the edge-sharded stage-2
    gradient equals the unsharded one to f32 exactness."""
    from feedback_gnn_tpu.parallel import make_mesh, shard_quantum_graph, unstack_shard
    from feedback_gnn_tpu.parallel.api import _graph_spec, shard_map
    from feedback_gnn_tpu.parallel.mesh import P
    from feedback_gnn_tpu.parallel.shard import shard_bounds
    from feedback_gnn_tpu.train.trainer import TrainConfig, stage_two_loss

    graph, params, _ = setup
    tcfg = TrainConfig(num_iter1=2, num_iter2=8, loss_from=4)
    n, b = graph.n, 16
    key = jax.random.PRNGKey(5)
    nx = jax.random.bernoulli(key, 0.06, (n, b)).astype(jnp.float32)
    nz = jax.random.bernoulli(jax.random.fold_in(key, 1), 0.06, (n, b)).astype(
        jnp.float32
    )
    h_vn = jax.random.normal(key, (3, n, b)) * 2
    mx, mz = graph.gx.num_cn, graph.gz.num_cn
    lhx = jax.random.normal(jax.random.fold_in(key, 2), (mx, b))
    lhz = jax.random.normal(jax.random.fold_in(key, 3), (mz, b))

    def lossfn(params, g, lhx_, lhz_, ax):
        l, _ = stage_two_loss(params, g, tcfg, nx, nz, h_vn, lhx_, lhz_, axis_name=ax)
        return l

    g_ref = jax.grad(lossfn)(params, graph, lhx, lhz, None)

    S = 2
    mesh = make_mesh(data=1, edge=S, devices=jax.devices()[:S])
    stacked = shard_quantum_graph(graph, S)
    bx = shard_bounds(mx, S)
    bz = shard_bounds(mz, S)
    cxm = stacked.hx.shape[1]
    czm = stacked.hz.shape[1]

    def shard_rows(a, bounds, cmax):
        out = np.zeros((S, cmax) + a.shape[1:], np.float32)
        for i, (s, e) in enumerate(bounds):
            out[i, : e - s] = np.asarray(a)[s:e]
        return jnp.asarray(out)

    def inner(gs, params, lhx_, lhz_):
        g = unstack_shard(gs)
        return jax.grad(lossfn)(params, g, lhx_[0], lhz_[0], "edge")

    g_sh = shard_map(
        inner,
        mesh=mesh,
        in_specs=(_graph_spec(stacked), P(), P("edge"), P("edge")),
        out_specs=P(),
        check_vma=True,
    )(stacked, params, shard_rows(lhx, bx, cxm), shard_rows(lhz, bz, czm))

    jax.tree.map(
        lambda a, b_: np.testing.assert_allclose(a, b_, atol=1e-8, rtol=1e-5),
        g_ref,
        g_sh,
    )


def test_data_sharded_eval_with_qc_kernel():
    """Pure-DP mesh with the fused QC kernel per shard matches the
    unsharded QC run (same folded keys -> same channel per shard)."""
    import jax
    import jax.numpy as jnp

    from feedback_gnn_tpu.codes.css import create_generalized_bicycle_codes
    from feedback_gnn_tpu.codes.graph import QuantumGraph
    from feedback_gnn_tpu.codes.qc import qc_pair_from_code
    from feedback_gnn_tpu.decoders import CascadeConfig, init_feedback_gnn
    from feedback_gnn_tpu.parallel import (
        make_mesh,
        make_sharded_eval_step,
        shard_quantum_graph,
    )

    code = create_generalized_bicycle_codes(24, [0, 2, 8, 15], [0, 2, 12, 17])
    qc = qc_pair_from_code(code, l=24)
    graph = QuantumGraph.from_code(code, stage_mode=True)
    params = init_feedback_gnn(jax.random.PRNGKey(1))
    cfg = CascadeConfig(num_iter1=8, num_iter2=4, num_rounds=2, p0=0.08)

    mesh = make_mesh(data=4, edge=1)
    stacked = shard_quantum_graph(graph, 1)
    step = make_sharded_eval_step(mesh, stacked, [params], cfg, local_batch=32, qc=qc)
    f, lg = step(jax.random.PRNGKey(2), jnp.float32(0.08))
    assert int(f) >= 0 and int(lg) >= 0
    # compare against the same shards run unsharded with folded keys
    from feedback_gnn_tpu.decoders.cascade import sandwich_eval_step

    tot_f = tot_l = 0
    for d in range(4):
        key = jax.random.fold_in(jax.random.PRNGKey(2), d)
        ff, ll = sandwich_eval_step(graph, [params], cfg, key, 0.08, 32, qc=qc)
        tot_f += int(ff)
        tot_l += int(ll)
    assert int(f) == tot_f and int(lg) == tot_l


def test_data_sharded_eval_overflow_plumbed(setup):
    """Compaction-overflow is threaded through make_sharded_eval_step:
    an undersized capacity must report a nonzero psum-ed overflow count
    (ADVICE r2: previously silently untracked in multi-chip runs)."""
    import dataclasses

    from feedback_gnn_tpu.parallel import (
        make_mesh,
        make_sharded_eval_step,
        shard_quantum_graph,
    )

    graph, params, cfg = setup
    # tiny capacity at a high flagged-rate operating point -> overflow
    cfg_tight = dataclasses.replace(cfg, compact_fraction=0.02)
    mesh = make_mesh(data=4, edge=1, devices=jax.devices()[:4])
    stacked = shard_quantum_graph(graph, 1)
    step = make_sharded_eval_step(
        mesh, stacked, [params], cfg_tight, local_batch=64,
        return_overflow=True,
    )
    flagged, logical, overflow = step(jax.random.PRNGKey(0), jnp.float32(0.12))
    assert int(overflow) > 0
    assert int(flagged) >= int(overflow)

    # generous capacity: no overflow, counts match the unsharded run
    from feedback_gnn_tpu.decoders import sandwich_eval_step

    cfg_ok = dataclasses.replace(cfg, compact_fraction=1.0)
    step_ok = make_sharded_eval_step(
        mesh, stacked, [params], cfg_ok, local_batch=64,
        return_overflow=True,
    )
    f2, l2, ov2 = step_ok(jax.random.PRNGKey(0), jnp.float32(0.12))
    assert int(ov2) == 0
    tot_f = tot_l = 0
    for d in range(4):
        k = jax.random.fold_in(jax.random.PRNGKey(0), d)
        ff, ll = jax.jit(
            lambda k, p: sandwich_eval_step(graph, [params], cfg_ok, k, p, 64)
        )(k, jnp.float32(0.12))
        tot_f += int(ff)
        tot_l += int(ll)
    assert int(f2) == tot_f and int(l2) == tot_l


def test_data_sharded_eval_with_rescue(setup):
    """rescue_phi composes with DP sharding (edge=1): per-shard counts match
    the unsharded rescue run exactly (same per-shard folded keys)."""
    import dataclasses

    from feedback_gnn_tpu.decoders import sandwich_eval_step
    from feedback_gnn_tpu.parallel import (
        make_mesh,
        make_sharded_eval_step,
        shard_quantum_graph,
    )

    graph, params, cfg = setup
    cfg_r = dataclasses.replace(cfg, rescue_phi="accurate", rescue_fraction=1.0)
    mesh = make_mesh(data=4, edge=1, devices=jax.devices()[:4])
    stacked = shard_quantum_graph(graph, 1)
    step = make_sharded_eval_step(
        mesh, stacked, [params], cfg_r, local_batch=64, return_overflow=True
    )
    f, l, ov = step(jax.random.PRNGKey(5), jnp.float32(0.12))
    assert int(ov) == 0
    tot_f = tot_l = 0
    for d in range(4):
        k = jax.random.fold_in(jax.random.PRNGKey(5), d)
        ff, ll = jax.jit(
            lambda k, p: sandwich_eval_step(graph, [params], cfg_r, k, p, 64)
        )(k, jnp.float32(0.12))
        tot_f += int(ff)
        tot_l += int(ll)
    assert (int(f), int(l)) == (tot_f, tot_l)
