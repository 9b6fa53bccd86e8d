"""End-to-end statistical tests of the sandwich cascade against the
reference's published operating points (BASELINE.md), plus harness tests.

The key check: [[882,24]] with the shipped trained GNN weights at p=0.12
reproduces BLER 7.92e-2 (n882.ipynb cell 2) within Monte-Carlo error.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

WEIGHTS_882 = (
    "/root/reference/sionna/fec/ldpc/weights/"
    "feedback_GNN_n882_k24_wt_4_60_iter_64_16_mixed.npy"
)


@pytest.fixture(scope="module")
def graph882(ghp882):
    from feedback_gnn_tpu.codes.graph import QuantumGraph

    return QuantumGraph.from_code(ghp882, stage_mode=True)


@pytest.mark.slow
def test_cascade_882_bler_parity(graph882):
    """BLER at p=0.12 must match the reference 7.92e-2 within ~4 sigma."""
    if not os.path.exists(WEIGHTS_882):
        pytest.skip("shipped weights unavailable")
    from feedback_gnn_tpu.decoders import CascadeConfig, sandwich_eval_step
    from feedback_gnn_tpu.decoders.gnn_feedback import load_reference_weights

    params = load_reference_weights(WEIGHTS_882)
    cfg = CascadeConfig(num_iter1=64, num_iter2=16, num_rounds=3, p0=0.05)
    batch = 1024

    @jax.jit
    def step(key, p):
        return sandwich_eval_step(graph882, [params], cfg, key, p, batch)

    total_logical = 0
    total_flagged = 0
    nb = 0
    for it in range(4):
        f, l = step(jax.random.fold_in(jax.random.PRNGKey(7), it), 0.12)
        total_flagged += int(f)
        total_logical += int(l)
        nb += batch

    bler = total_logical / nb
    ref = 7.92e-2
    sigma = np.sqrt(ref * (1 - ref) / nb)
    assert abs(bler - ref) < 4.5 * sigma, (bler, ref, sigma, nb)
    # flagged rate must be <= logical-ish scale and nonzero at this p
    assert 0 < total_flagged


@pytest.mark.slow
def test_cascade_gnn_improves_on_plain_bp(graph882):
    """The GNN cascade must strictly reduce the logical error count vs plain
    BP4-64 at the same noise (the paper's core claim)."""
    if not os.path.exists(WEIGHTS_882):
        pytest.skip("shipped weights unavailable")
    from feedback_gnn_tpu.decoders import CascadeConfig, sandwich_eval_step
    from feedback_gnn_tpu.decoders.gnn_feedback import load_reference_weights

    params = load_reference_weights(WEIGHTS_882)
    batch = 1024
    key = jax.random.PRNGKey(11)

    @jax.jit
    def step_plain(key, p):
        cfg = CascadeConfig(num_iter1=64, num_rounds=0)
        return sandwich_eval_step(graph882, [params], cfg, key, p, batch)

    @jax.jit
    def step_gnn(key, p):
        cfg = CascadeConfig(num_iter1=64, num_iter2=16, num_rounds=3)
        return sandwich_eval_step(graph882, [params], cfg, key, p, batch)

    _, l_plain = step_plain(key, 0.12)
    _, l_gnn = step_gnn(key, 0.12)
    assert int(l_gnn) < int(l_plain), (int(l_gnn), int(l_plain))


def test_sim_ler_harness():
    """Harness logic (stopping, accounting, checkpoint-resume) with a fake
    model."""
    from feedback_gnn_tpu.sim import sim_ler

    calls = []

    def fake_step(key, p):
        calls.append(p)
        # deterministic: 10 logical errors, 20 flagged per batch at p>=0.1
        if p >= 0.1:
            return jnp.int32(20), jnp.int32(10)
        return jnp.int32(0), jnp.int32(0)

    res = sim_ler(
        fake_step,
        ps=[0.2, 0.1, 0.05],
        batch_size=100,
        max_mc_iter=50,
        num_target_block_errors=30,
        verbose=False,
    )
    # p=0.2: stops after 3 batches (30 errors), status 4
    assert res.logical_errors[0] == 30 and res.num_blocks[0] == 300
    assert res.status[0] == 4
    assert res.ler[0] == 0.1 and res.flagged_rate[0] == 0.2
    # p=0.05: no errors after max_mc_iter -> early stop, status 2
    assert res.status[2] == 2
    assert res.num_blocks[2] == 50 * 100


def test_sim_ler_checkpoint_resume(tmp_path):
    from feedback_gnn_tpu.sim import sim_ler

    ckpt = str(tmp_path / "mc.json")

    def fake_step(key, p):
        return jnp.int32(5), jnp.int32(2)

    res1 = sim_ler(
        fake_step,
        ps=[0.1],
        batch_size=10,
        max_mc_iter=5,
        num_target_block_errors=None,
        verbose=False,
        checkpoint_path=ckpt,
    )
    assert os.path.exists(ckpt)
    # resume: state already complete -> nothing re-simulated
    res2 = sim_ler(
        fake_step,
        ps=[0.1],
        batch_size=10,
        max_mc_iter=5,
        num_target_block_errors=None,
        verbose=False,
        checkpoint_path=ckpt,
    )
    assert res2.num_blocks[0] == res1.num_blocks[0] == 50


def test_overflow_counter(small_code):
    """return_overflow: an undersized compaction capacity must report a
    positive overflow count, a full-capacity run zero (and fewer flags)."""
    from feedback_gnn_tpu.codes.graph import QuantumGraph
    from feedback_gnn_tpu.decoders import (
        CascadeConfig,
        init_feedback_gnn,
        sandwich_eval_step,
    )

    graph = QuantumGraph.from_code(small_code, stage_mode=True)
    params = init_feedback_gnn(jax.random.PRNGKey(0))
    key, p, b = jax.random.PRNGKey(1), jnp.float32(0.15), 256

    def run(compact):
        cfg = CascadeConfig(
            num_iter1=8, num_iter2=4, num_rounds=1, compact_fraction=compact
        )
        return jax.jit(
            lambda k, pp: sandwich_eval_step(
                graph, [params], cfg, k, pp, b, return_overflow=True
            )
        )(key, p)

    f_tiny, _, ov_tiny = run(0.02)
    f_full, _, ov_full = run(1.0)
    assert int(ov_tiny) > 0
    assert int(ov_full) == 0
    # overflowed samples keep the stage-1 estimate: pessimistic, never better
    assert int(f_full) <= int(f_tiny)


def test_ensemble_rescue(small_code):
    """CascadeConfig.rescue_phi invariants:

    * rescue with the SAME formulation is a no-op (the deterministic
      re-decode reproduces the still-flagged estimate, so nothing is
      syndrome-consistent to adopt) — counts identical;
    * rescue with a DIFFERENT formulation only adopts syndrome-consistent
      estimates — the flagged count can never increase;
    * an undersized rescue capacity reports overflow, full capacity zero.
    """
    from feedback_gnn_tpu.codes.graph import QuantumGraph
    from feedback_gnn_tpu.decoders import (
        CascadeConfig,
        init_feedback_gnn,
        sandwich_eval_step,
    )

    graph = QuantumGraph.from_code(small_code, stage_mode=True)
    params = init_feedback_gnn(jax.random.PRNGKey(0))
    key, p, b = jax.random.PRNGKey(2), jnp.float32(0.12), 256

    def run(rescue_phi, rescue_fraction=1.0):
        cfg = CascadeConfig(
            num_iter1=8, num_iter2=4, num_rounds=1,
            rescue_phi=rescue_phi, rescue_fraction=rescue_fraction,
        )
        return jax.jit(
            lambda k, pp: sandwich_eval_step(
                graph, [params], cfg, k, pp, b, return_overflow=True
            )
        )(key, p)

    f0, l0, ov0 = run(None)
    assert int(ov0) == 0
    # "same formulation" must mean the ACTIVE module default, not a literal:
    # the suite may run under FGT_PHI_IMPL=accurate (the A/B workflow)
    from feedback_gnn_tpu.decoders import cn_update

    with pytest.warns(UserWarning, match="guaranteed no-op"):
        f_same, l_same, _ = run(cn_update._PHI_IMPL)
    assert (int(f_same), int(l_same)) == (int(f0), int(l0))
    other = "accurate" if cn_update._PHI_IMPL != "accurate" else "tf"
    f_acc, l_acc, ov_acc = run(other)
    assert int(f_acc) <= int(f0)
    assert int(ov_acc) == 0
    # undersized capacity: overflow reported, fail-safe (flags >= full-cap)
    f_tiny, _, ov_tiny = run(other, rescue_fraction=1.0 / b)
    assert int(ov_tiny) > 0
    assert int(f_tiny) >= int(f_acc)
