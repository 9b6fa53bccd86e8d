"""OSD-0 decoder tests: correctness of the batched GF(2) elimination and
statistical performance of BP+OSD models."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_osd0_satisfies_syndrome(small_code):
    """OSD-0 always outputs an error pattern reproducing the syndrome
    (it solves the full-rank linear system exactly)."""
    from feedback_gnn_tpu.decoders.osd import osd0_decode

    code = small_code
    rng = np.random.default_rng(0)
    basis = np.asarray(code.hx_basis)
    rank, n = basis.shape
    bsz = 16

    noise = rng.integers(0, 2, (bsz, n))
    syndrome = (basis @ noise.T % 2).astype(np.int32)  # [rank, B]
    llr = jnp.asarray(rng.normal(size=(bsz, n)).astype(np.float32))

    e_hat = np.asarray(osd0_decode(llr, jnp.asarray(basis), jnp.asarray(syndrome)))
    # reproduces the syndrome
    assert np.array_equal(basis @ e_hat.T % 2, syndrome)


def test_osd0_prefers_likely_positions(small_code):
    """With strongly informative reliabilities, OSD-0 recovers a low-weight
    error supported on the least reliable positions."""
    from feedback_gnn_tpu.decoders.osd import osd0_decode

    code = small_code
    basis = np.asarray(code.hx_basis)
    rank, n = basis.shape
    # single-qubit error at position 3; llr marks position 3 as unreliable
    noise = np.zeros((1, n), np.int64)
    noise[0, 3] = 1
    syndrome = (basis @ noise.T % 2).astype(np.int32)
    llr = np.full((1, n), 10.0, np.float32)
    llr[0, 3] = -10.0  # most likely flipped -> sorted first
    e_hat = np.asarray(osd0_decode(jnp.asarray(llr), jnp.asarray(basis), jnp.asarray(syndrome)))
    assert np.array_equal(basis @ e_hat.T % 2, syndrome)
    assert e_hat[0, 3] == 1 and e_hat.sum() == 1


@pytest.mark.slow
def test_bp2_osd_improves_on_bp2(small_code):
    """BP2+OSD must satisfy every syndrome (flagged rate 0 by construction)
    and beat plain BP2's logical error rate at moderate p."""
    from feedback_gnn_tpu.codes.graph import build_graph
    from feedback_gnn_tpu.models import bp2_bsc_eval_step, bp2_osd_eval_step

    code = small_code
    g = build_graph(np.asarray(code.hx))
    batch = 512
    p = 0.08
    key = jax.random.PRNGKey(0)

    @jax.jit
    def plain(key):
        # reference pairing: pcm=hx detects Z-type noise, harmless residuals
        # live in rowspace(hz) -> check with hz_perp (QLDPC.ipynb cell:
        # BP_BSC_Model(pcm=code.hx, logical_pcm=code.hz_perp))
        return bp2_bsc_eval_step(
            g, code.hx, code.hz_perp, key, p, batch, num_iter=30
        )

    @jax.jit
    def osd(key):
        return bp2_osd_eval_step(
            g,
            code.hx,
            code.hx_basis,
            code.pivot_hx,
            # OSD guarantees syndrome match, so the minimal logical check is
            # lx (OSD.ipynb: BP2_OSD_Model(code.hx, ..., code.lx, ...))
            code.lx,
            key,
            p,
            batch,
            num_iter=30,
        )

    tot_plain = tot_osd = 0
    for i in range(4):
        k = jax.random.fold_in(key, i)
        tot_plain += int(plain(k)[1])
        tot_osd += int(osd(k)[1])
    assert tot_osd <= tot_plain, (tot_osd, tot_plain)


@pytest.mark.slow
def test_bp4_osd_model_runs(small_code):
    from feedback_gnn_tpu.codes.graph import QuantumGraph
    from feedback_gnn_tpu.models import bp4_osd_eval_step

    code = small_code
    graph = QuantumGraph.from_code(code, stage_mode=True)

    @jax.jit
    def step(key):
        return bp4_osd_eval_step(graph, code, key, 0.05, 256, num_iter=30)

    _, logical = step(jax.random.PRNGKey(1))
    assert 0 <= int(logical) <= 256


@pytest.mark.slow
def test_bp4_osd_compacted_matches_full(small_code):
    """Compacted OSD (flagged-only sub-batch) must reproduce the full-batch
    OSD result when the capacity covers every flagged sample."""
    from feedback_gnn_tpu.codes.graph import QuantumGraph
    from feedback_gnn_tpu.models import bp4_osd_eval_step

    code = small_code
    graph = QuantumGraph.from_code(code, stage_mode=True)
    key = jax.random.PRNGKey(5)
    batch = 256
    f0, l0 = bp4_osd_eval_step(graph, code, key, 0.08, batch, num_iter=20)
    f1, l1, ov1 = bp4_osd_eval_step(
        graph, code, key, 0.08, batch, num_iter=20, osd_compact_cap=batch
    )
    assert int(l0) == int(l1)
    assert int(ov1) == 0
    # undersized capacity leaves flagged samples at their BP estimate —
    # NOT reference-equivalent (and not reliably pessimistic for the
    # logical metric); coverage is verified via the reported overflow
    f2, l2, ov2 = bp4_osd_eval_step(
        graph, code, key, 0.08, batch, num_iter=20, osd_compact_cap=4
    )
    assert int(ov2) == int(f2) - 4  # everything beyond the cap reported


@pytest.mark.slow
def test_bp2_osd_compacted_matches_full(small_code):
    """Compacted BP2+OSD (flagged-only sub-batch) reproduces the full-batch
    result when capacity covers every flagged sample; undersizing only adds
    errors (fail-safe)."""
    from feedback_gnn_tpu.codes.graph import build_graph
    from feedback_gnn_tpu.models import bp2_osd_eval_step

    code = small_code
    g = build_graph(np.asarray(code.hx))
    key = jax.random.PRNGKey(9)
    batch = 256
    kw = dict(num_iter=30)
    args = (g, code.hx, code.hx_basis, code.pivot_hx, code.lx)
    f0, l0 = bp2_osd_eval_step(*args, key, 0.08, batch, **kw)
    f1, l1, ov1 = bp2_osd_eval_step(*args, key, 0.08, batch,
                                    osd_compact_cap=batch, **kw)
    assert int(l0) == int(l1) and int(f0) == int(f1)
    assert int(ov1) == 0
    # undersizing is reference-inequivalent; coverage is verified by the
    # reported overflow count (sim_ler warns on nonzero totals)
    _, f2andl = bp2_osd_eval_step(*args, key, 0.08, batch,
                                  osd_compact_cap=4, **kw)[:2]
    f2, _, ov2 = bp2_osd_eval_step(*args, key, 0.08, batch,
                                   osd_compact_cap=4, **kw)
    assert int(ov2) == int(f2) - 4


def test_undetected_accounting(small_code):
    """accounting='undetected' counts only syndrome-consistent logical
    flips: undetected <= all, flagged identical, and the difference is
    exactly the flagged-AND-logical overlap (OSD.ipynb cells 7-8
    convention — their plain-BP NMS p_L sits below the same decoder's
    BP+OSD p_L, impossible under flagged-inclusive counting)."""
    from feedback_gnn_tpu.codes.graph import QuantumGraph, build_graph
    from feedback_gnn_tpu.models import bp2_bsc_eval_step, bp4_plain_eval_step

    code = small_code
    qg = QuantumGraph.from_code(code, stage_mode=True)
    g2 = build_graph(np.asarray(code.hx))
    key = jax.random.PRNGKey(3)
    batch = 512
    # few iterations at high p -> plenty of flagged samples in both modes
    f_all, l_all = bp4_plain_eval_step(qg, key, 0.12, batch, num_iter=8)
    f_und, l_und = bp4_plain_eval_step(
        qg, key, 0.12, batch, num_iter=8, accounting="undetected"
    )
    assert int(f_all) == int(f_und) > 0
    assert 0 <= int(l_und) < int(l_all)

    f_all, l_all = bp2_bsc_eval_step(
        g2, code.hx, code.hz_perp, key, 0.12, batch, num_iter=8
    )
    f_und, l_und = bp2_bsc_eval_step(
        g2, code.hx, code.hz_perp, key, 0.12, batch, num_iter=8,
        accounting="undetected",
    )
    assert int(f_all) == int(f_und) > 0
    assert int(l_und) <= int(l_all)
