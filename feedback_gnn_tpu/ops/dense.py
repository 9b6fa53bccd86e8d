"""Batch-last dense layers.

Device tensors in this framework carry the Monte-Carlo batch in the LAST
(lane) dimension; features live in the leading axis.  A dense layer is then a
contraction over the leading axis, keeping lanes 128-aligned for the VPU/MXU.
Weights use the Keras/Flax ``[in, out]`` kernel layout so the reference's
pickled weights (gnn.py:755-791) import directly.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["dense_bl", "mlp_bl", "init_dense", "init_mlp"]


def dense_bl(x, kernel, bias=None, activation=None):
    """y = act(kernel^T @ x + b) with x of shape [F_in, ..., B]."""
    y = jnp.tensordot(kernel, x, axes=((0,), (0,)))  # [F_out, ..., B]
    if bias is not None:
        y = y + bias.reshape((-1,) + (1,) * (y.ndim - 1))
    if activation is not None:
        y = activation(y)
    return y


def mlp_bl(x, layers, activations):
    """Apply a stack of dense layers; ``layers`` is a list of dicts with
    'kernel' and optional 'bias' (mirrors the reference MLP, gnn.py:31-69)."""
    for layer, act in zip(layers, activations):
        x = dense_bl(x, layer["kernel"], layer.get("bias"), act)
    return x


def init_dense(key, fan_in, fan_out, use_bias=True, kernel_init="glorot", dtype=jnp.float32):
    """Match Keras Dense defaults: glorot_uniform kernel, ones bias (the
    reference overrides bias_initializer='ones', gnn.py:60)."""
    import jax

    if kernel_init == "zeros":
        kernel = jnp.zeros((fan_in, fan_out), dtype)
    else:
        limit = (6.0 / (fan_in + fan_out)) ** 0.5
        kernel = jax.random.uniform(key, (fan_in, fan_out), dtype, -limit, limit)
    params = {"kernel": kernel}
    if use_bias:
        params["bias"] = jnp.ones((fan_out,), dtype)
    return params


def init_mlp(key, fan_in, units, use_bias=True, dtype=jnp.float32):
    import jax

    keys = jax.random.split(key, len(units))
    layers = []
    prev = fan_in
    for k, u in zip(keys, units):
        layers.append(init_dense(k, prev, u, use_bias=use_bias, dtype=dtype))
        prev = u
    return layers
