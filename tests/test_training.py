"""Training pipeline tests: loss parity slices, trainability, miner."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def setup():
    from feedback_gnn_tpu.codes import create_generalized_bicycle_codes
    from feedback_gnn_tpu.codes.graph import QuantumGraph
    from feedback_gnn_tpu.decoders import init_feedback_gnn

    code = create_generalized_bicycle_codes(24, [0, 2, 8, 15], [0, 2, 12, 17])
    graph = QuantumGraph.from_code(code, stage_mode=True)
    params = init_feedback_gnn(jax.random.PRNGKey(0))
    return code, graph, params


def test_train_step_reduces_loss(setup):
    """A few Adam steps on a fixed batch must reduce the deep-supervision
    loss."""
    from feedback_gnn_tpu.train import TrainConfig, make_optimizer, make_train_step

    code, graph, params = setup
    tcfg = TrainConfig(num_iter1=16, num_iter2=8, loss_from=4, learning_rate=1e-3)
    opt = make_optimizer(tcfg)
    opt_state = opt.init(params)
    step = make_train_step(graph, tcfg, opt)

    n, b = graph.n, 64
    key = jax.random.PRNGKey(2)
    nx = jax.random.bernoulli(key, 0.08, (n, b)).astype(jnp.float32)
    nz = jax.random.bernoulli(jax.random.fold_in(key, 1), 0.08, (n, b)).astype(
        jnp.float32
    )
    losses = []
    for _ in range(15):
        params, opt_state, loss, fb, bl = step(params, opt_state, nx, nz)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], (losses[0], losses[-1])


def test_bp_failure_miner(setup):
    """Miner returns fixed-weight noise; flagged fraction is sane and all
    flagged samples really fail BP."""
    from feedback_gnn_tpu.train import make_bp_failure_miner, mine_failures

    code, graph, params = setup
    miner = make_bp_failure_miner(graph, num_iter=12)
    key = jax.random.PRNGKey(3)
    noise_x, noise_z, flagged = miner(key, 6, 128)
    support = np.asarray(noise_x) | np.asarray(noise_z)
    assert (support.sum(axis=0) == 6).all()
    assert 0 < int(flagged.sum()) < 128  # weight-6 errors: some fail, some don't

    shards = mine_failures(miner, key, weights=[4, 6], batches_per_weight=2, batch_size=64)
    for wt, (x, z) in shards.items():
        assert x.shape == z.shape and x.shape[1] == graph.n
        assert ((x | z).sum(axis=1) == wt).all()


def test_cascade_failure_miner(setup):
    from feedback_gnn_tpu.train import make_cascade_failure_miner

    code, graph, params = setup
    miner = make_cascade_failure_miner(graph, params, num_iter1=8, num_iter2=8)
    noise_x, noise_z, flagged = miner(jax.random.PRNGKey(4), 8, 64)
    assert noise_x.shape == (graph.n, 64)
    assert 0 <= int(flagged.sum()) <= 64


def test_mix_and_iterate(setup):
    from feedback_gnn_tpu.train import batch_iterator, mix_easy_hard

    rng = np.random.default_rng(0)
    easy = (rng.integers(0, 2, (40, 10)), rng.integers(0, 2, (40, 10)))
    hard = (rng.integers(0, 2, (3, 10)), rng.integers(0, 2, (3, 10)))
    x, z = mix_easy_hard(easy, hard, hard_oversample=5)
    assert x.shape[0] == 40 + 15

    batches = list(batch_iterator(x, z, 8, jax.random.PRNGKey(0)))
    assert len(batches) == (40 + 15) // 8
    bx, bz = batches[0]
    assert bx.shape == (10, 8)  # [n, B] device layout


def test_compacted_miner_matches_uncompacted(setup):
    """compact_cap returns exactly the flagged subset (order-preserving
    front-pack, uint8) plus the kept count — the device-side compaction
    that makes mining compute-bound instead of transfer-bound over the
    tunneled TPU."""
    from feedback_gnn_tpu.train import make_bp_failure_miner

    code, graph, params = setup
    key = jax.random.PRNGKey(5)
    plain = make_bp_failure_miner(graph, num_iter=12)
    compact = make_bp_failure_miner(graph, num_iter=12, compact_cap=32)
    nx, nz, flagged = plain(key, 6, 128)
    cx, cz, kept = compact(key, 6, 128)
    mask = np.asarray(flagged)
    k = int(kept)
    assert k == min(int(mask.sum()), 32)
    assert cx.dtype == jnp.uint8 and cx.shape == (graph.n, 32)
    np.testing.assert_array_equal(
        np.asarray(cx)[:, :k], np.asarray(nx)[:, mask][:, :k]
    )
    np.testing.assert_array_equal(
        np.asarray(cz)[:, :k], np.asarray(nz)[:, mask][:, :k]
    )

    # undersized cap keeps the first `cap` flagged samples
    tiny = make_bp_failure_miner(graph, num_iter=12, compact_cap=2)
    tx, tz, tkept = tiny(key, 6, 128)
    assert int(tkept) == min(int(mask.sum()), 2)
    np.testing.assert_array_equal(
        np.asarray(tx)[:, : int(tkept)],
        np.asarray(nx)[:, mask][:, : int(tkept)],
    )


def test_train_step_multi_matches_single(setup):
    """k fused optimizer steps (make_train_step_multi, one lax.scan device
    call) must be step-for-step identical to k make_train_step calls on the
    same minibatches (the fusion is a pure dispatch-latency optimization)."""
    from feedback_gnn_tpu.train import (
        TrainConfig,
        make_optimizer,
        make_train_step,
        make_train_step_multi,
    )

    code, graph, params = setup
    tcfg = TrainConfig(num_iter1=8, num_iter2=4, loss_from=2, learning_rate=1e-3)
    opt = make_optimizer(tcfg)
    k, n, b = 3, graph.n, 32
    key = jax.random.PRNGKey(9)
    nx = jax.random.bernoulli(key, 0.08, (k, n, b)).astype(jnp.float32)
    nz = jax.random.bernoulli(jax.random.fold_in(key, 1), 0.08, (k, n, b)).astype(
        jnp.float32
    )

    p1, s1 = params, opt.init(params)
    step1 = make_train_step(graph, tcfg, opt)
    ref_losses = []
    for i in range(k):
        p1, s1, loss, _, _ = step1(p1, s1, nx[i], nz[i])
        ref_losses.append(float(loss))

    stepk = make_train_step_multi(graph, tcfg, opt, k)
    pk, sk, losses, fb, bl = stepk(params, opt.init(params), nx, nz)

    np.testing.assert_allclose(np.asarray(losses), ref_losses, rtol=1e-5)
    for a, bb in zip(jax.tree.leaves(p1), jax.tree.leaves(pk)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=1e-5)


def test_bp_failure_miner_qc_matches_xla(setup):
    """The QC-kernel-backed miner must flag the same samples as the XLA
    gather-path miner (it is a backend switch, not a semantic change)."""
    from feedback_gnn_tpu.codes.qc import qc_pair_from_code
    from feedback_gnn_tpu.train import make_bp_failure_miner

    code, graph, params = setup
    qc = qc_pair_from_code(code)
    key = jax.random.PRNGKey(11)
    m_x = make_bp_failure_miner(graph, num_iter=12, wt_max=12, compact_cap=32)
    m_q = make_bp_failure_miner(graph, num_iter=12, wt_max=12, compact_cap=32,
                                qc=qc)
    nx1, nz1, k1 = m_x(key, jnp.int32(8), 128)
    nx2, nz2, k2 = m_q(key, jnp.int32(8), 128)
    assert int(k1) == int(k2)
    np.testing.assert_array_equal(
        np.asarray(nx1)[:, : int(k1)], np.asarray(nx2)[:, : int(k2)]
    )
    np.testing.assert_array_equal(
        np.asarray(nz1)[:, : int(k1)], np.asarray(nz2)[:, : int(k2)]
    )


def test_batch_iterator_stacked_equivalence():
    """Concatenated stacked chunks == the plain batch_iterator sequence for
    the same key (the fused path sees identical minibatches)."""
    from feedback_gnn_tpu.train import batch_iterator, batch_iterator_stacked

    rng = np.random.default_rng(0)
    x = rng.integers(0, 2, (37, 10), dtype=np.uint8)
    z = rng.integers(0, 2, (37, 10), dtype=np.uint8)
    key = jax.random.PRNGKey(5)
    plain = list(batch_iterator(x, z, 4, key))
    stacked = list(batch_iterator_stacked(x, z, 4, key, 3))
    flat = [(np.asarray(nx[j]), np.asarray(nz[j]))
            for nx, nz in stacked for j in range(nx.shape[0])]
    assert len(flat) == len(plain)
    for (a, b), (c, d) in zip(flat, plain):
        np.testing.assert_array_equal(a, np.asarray(c))
        np.testing.assert_array_equal(b, np.asarray(d))
