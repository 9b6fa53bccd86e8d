"""Two-stage feedback-GNN training (reference: feedback_gnn.py:364-463 and
examples/Feedback_GNN.ipynb cell 2).

Stage 1 (frozen): BP4-64 on the mined noise producing (h_vn, logits).
Stage 2 (trained): GNN feedback -> BP4-16 with per-iteration logits ->
deep-supervision BCE -> element-wise grad clip +-10 -> Adam(2e-4).

Unlike the reference — which must split XLA (stage 1) from graph mode
(stage 2) because TF cannot differentiate TensorArrays under XLA
(feedback_gnn.py:422) — the whole train step here is one jitted function:
the logit stack is a lax.scan output, differentiable end-to-end.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import optax

from ..codes.graph import QuantumGraph
from ..decoders.bp4 import bp4_decode
from ..decoders.cascade import prior_llr
from ..decoders.gnn_feedback import feedback_gnn_apply
from ..ops.gf2mat import mod2_matmul
from .loss import deep_supervision_loss

__all__ = ["TrainConfig", "make_train_step", "make_optimizer", "stage_one_features"]


@dataclass(frozen=True)
class TrainConfig:
    num_iter1: int = 64
    num_iter2: int = 16
    loss_from: int = 8
    cn_type: str = "boxplus-phi"
    factor1: float = 1.0
    factor2: float = 1.0
    p0: float = 0.05
    learning_rate: float = 2e-4
    grad_clip: float = 10.0


def make_optimizer(cfg: TrainConfig):
    """Element-wise value clip then Adam, as in the reference loop."""
    return optax.chain(
        optax.clip(cfg.grad_clip),
        optax.adam(cfg.learning_rate),
    )


def _pad_noise(graph, noise):
    """[n, B] -> [n_pad, B] with zero pad rows (aligned-layout invariant)."""
    n, n_pad = graph.n, graph.n_pad
    noise = noise.astype(jnp.int32)
    if noise.shape[0] == n_pad:
        return noise
    return jnp.pad(noise, ((0, n_pad - n), (0, 0)))


def _syndromes(graph, noise_x, noise_z):
    hx = jnp.asarray(graph.hx)
    hz = jnp.asarray(graph.hz)
    syndrome_x = mod2_matmul(hx, noise_z)
    syndrome_z = mod2_matmul(hz, noise_x)
    return syndrome_x, syndrome_z


def stage_one_features(
    graph: QuantumGraph, cfg: TrainConfig, noise_x, noise_z, axis_name=None
):
    """Frozen BP4-64 pass (First_Stage_BP_Model, feedback_gnn.py:364-392).

    noise_x / noise_z: [n, B] {0,1}.  Returns (h_vn [3,n,B], logit_hx,
    logit_hz) with the semantic (per-Hx-row / per-Hz-row) naming.
    """
    noise_x = _pad_noise(graph, noise_x)
    noise_z = _pad_noise(graph, noise_z)
    syndrome_x, syndrome_z = _syndromes(graph, noise_x, noise_z)
    llr0 = prior_llr(cfg.p0, graph.n, noise_x.shape[-1], n_pad=graph.n_pad)
    res = bp4_decode(
        graph,
        llr0,
        syndrome_x,
        syndrome_z,
        cfg.num_iter1,
        cfg.cn_type,
        cfg.factor1,
        axis_name=axis_name,
    )
    h_vn = jnp.stack([res.llrx, res.llry, res.llrz], axis=0)
    # z_logit = per-Hx-row logits in stage mode (see cascade.py docstring)
    return h_vn, res.z_logit, res.x_logit


def stage_two_loss(
    params,
    graph: QuantumGraph,
    cfg: TrainConfig,
    noise_x,
    noise_z,
    h_vn,
    logit_hx,
    logit_hz,
    axis_name=None,
):
    """GNN + BP4-16 + deep-supervision loss (Second_Stage_GNN_BP_Model).

    Returns (loss, (s_hat, ls_hat)) where s_hat/ls_hat are the flagged /
    logical syndome tensors for monitoring (feedback_gnn.py:444-463)."""
    noise_x = _pad_noise(graph, noise_x)
    noise_z = _pad_noise(graph, noise_z)
    syndrome_x, syndrome_z = _syndromes(graph, noise_x, noise_z)

    new_llr = feedback_gnn_apply(
        params, graph, h_vn, logit_hx, logit_hz, syndrome_x, syndrome_z,
        axis_name=axis_name,
    )
    res = bp4_decode(
        graph,
        new_llr,
        syndrome_x,
        syndrome_z,
        cfg.num_iter2,
        cfg.cn_type,
        cfg.factor2,
        collect_logits=True,
        axis_name=axis_name,
    )
    loss = deep_supervision_loss(
        res.logit_stack,
        syndrome_x,
        syndrome_z,
        cfg.num_iter2,
        cfg.loss_from,
        row_valid_x=jnp.asarray(graph.logit_rows_x.row_valid),
        row_valid_z=jnp.asarray(graph.logit_rows_z.row_valid),
        axis_name=axis_name,
    )

    x_diff = jnp.bitwise_xor(noise_x.astype(jnp.int32), res.x_hat)
    z_diff = jnp.bitwise_xor(noise_z.astype(jnp.int32), res.z_hat)
    s_hat = jnp.concatenate(
        [
            mod2_matmul(jnp.asarray(graph.hz), x_diff),
            mod2_matmul(jnp.asarray(graph.hx), z_diff),
        ],
        axis=0,
    )
    ls_hat = jnp.concatenate(
        [
            mod2_matmul(jnp.asarray(graph.hx_perp), x_diff),
            mod2_matmul(jnp.asarray(graph.hz_perp), z_diff),
        ],
        axis=0,
    )
    return loss, (s_hat, ls_hat)


def _one_update(graph, cfg, optimizer, params, opt_state, noise_x, noise_z):
    """One optimizer update: frozen stage-1 features + stage-2 grad step.
    Shared body of make_train_step / make_train_step_multi."""
    h_vn, logit_hx, logit_hz = stage_one_features(graph, cfg, noise_x, noise_z)
    h_vn = jax.lax.stop_gradient(h_vn)
    logit_hx = jax.lax.stop_gradient(logit_hx)
    logit_hz = jax.lax.stop_gradient(logit_hz)

    (loss, (s_hat, ls_hat)), grads = jax.value_and_grad(
        stage_two_loss, has_aux=True
    )(params, graph, cfg, noise_x, noise_z, h_vn, logit_hx, logit_hz)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)

    flagged_bler = jnp.mean(jnp.any(s_hat != 0, axis=0).astype(jnp.float32))
    bler = jnp.mean(jnp.any(ls_hat != 0, axis=0).astype(jnp.float32))
    return params, opt_state, loss, flagged_bler, bler


def make_train_step(graph: QuantumGraph, cfg: TrainConfig, optimizer):
    """Returns a jitted train step:
    (params, opt_state, noise_x [n,B], noise_z [n,B]) ->
    (params, opt_state, loss, flagged_bler, bler).

    The whole two-stage pipeline is one XLA program; stage-1 features are
    stop-gradiented (frozen), matching the reference where stage 1 runs
    outside the tape.
    """

    @jax.jit
    def step(params, opt_state, noise_x, noise_z):
        return _one_update(graph, cfg, optimizer, params, opt_state, noise_x, noise_z)

    return step


def make_train_step_multi(graph: QuantumGraph, cfg: TrainConfig, optimizer, k: int):
    """``k`` sequential optimizer updates fused into ONE jitted call via
    ``lax.scan`` over a stacked minibatch block.

    (params, opt_state, noise_x [k,n,B], noise_z [k,n,B]) ->
    (params, opt_state, losses [k], flagged [k], bler [k]).

    Mathematically identical to k successive ``make_train_step`` calls on
    the k minibatches; the point is host<->device round-trips: on a
    tunneled remote backend the per-call dispatch latency (~0.1-0.5 s)
    dominates the ~5 ms compute of a bs~100 step, so fusing k steps per
    call raises training throughput ~k-fold (measured round 5; see
    scripts/train_from_scratch.py --steps-per-call).
    """
    assert k >= 1, k

    @jax.jit
    def step(params, opt_state, noise_x, noise_z):
        def body(carry, nb):
            p, s = carry
            nx, nz = nb
            p, s, loss, fb, bl = _one_update(graph, cfg, optimizer, p, s, nx, nz)
            return (p, s), (loss, fb, bl)

        (params, opt_state), (losses, fb, bl) = jax.lax.scan(
            body, (params, opt_state), (noise_x, noise_z)
        )
        return params, opt_state, losses, fb, bl

    return step
