"""Binary channels: BSC (with optional differentiable Gumbel-softmax
straight-through sampling) and helpers.

Mirrors the reference's BinaryMemorylessChannel / BinarySymmetricChannel
(/root/reference/sionna/channel/discrete_channel.py):

* hard mode: errors ~ Bernoulli(p), XORed onto the input;
* differentiable mode: Gumbel-softmax relaxation with a straight-through
  estimator (discrete_channel.py:182-221) so gradients flow to ``p``;
* optional LLR output: ``llr = y * log(p/(1-p))``-style magnitudes
  (discrete_channel.py:283-296).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["bsc_sample", "bsc_sample_ste", "binary_source"]


def bsc_sample(key, p, shape):
    """Hard BSC error pattern ~ Bernoulli(p), bool of ``shape``."""
    return jax.random.uniform(key, shape, jnp.float32) < p


def bsc_sample_ste(key, p, shape, temperature=0.1):
    """Differentiable BSC error sampling with Gumbel-softmax + straight-
    through binarisation (discrete_channel.py:182-221).

    Returns float errors in {0.,1.} in the forward pass whose gradient w.r.t.
    ``p`` follows the relaxed sigmoid.
    """
    u = jax.random.uniform(key, shape, jnp.float32, 1e-9, 1.0 - 1e-9)
    # logistic noise = difference of two Gumbels
    logistic = jnp.log(u) - jnp.log1p(-u)
    p = jnp.clip(p, 1e-9, 1.0 - 1e-9)
    logit_p = jnp.log(p) - jnp.log1p(-p)
    soft = jax.nn.sigmoid((logit_p + logistic) / temperature)
    hard = (soft > 0.5).astype(jnp.float32)
    # straight-through: forward = hard, backward = d soft
    return soft + jax.lax.stop_gradient(hard - soft)


def binary_source(key, shape):
    """Uniform i.i.d. bits (reference BinarySource, utils/misc.py:133)."""
    return jax.random.bernoulli(key, 0.5, shape).astype(jnp.float32)
