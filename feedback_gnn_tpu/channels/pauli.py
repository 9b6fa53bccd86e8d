"""Pauli channels as pure functions over JAX PRNG keys.

Reproduces the threshold semantics of the reference Keras layer
(/root/reference/sionna/channel/pauli.py:78-117):

* i.i.d. mode: one uniform draw u per qubit; ``noise_x = u < px`` and
  ``noise_z = (px - py <= u < px + pz - py)`` so X and Z overlap with
  probability ``py`` (a Y error).
* fixed-weight mode: exactly ``wt`` error positions per sample (without
  replacement); each position becomes the X-component with prob. 2/3 and the
  Z-component with prob. 2/3, overlapping in Y with prob. 1/3 (thresholds
  u < 2/3 -> X-bit, u > 1/3 -> Z-bit).

All outputs use the framework's batch-last ``[n, B]`` device layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "pauli_iid",
    "pauli_fixed_weight",
    "pauli_fixed_weight_traced",
    "depolarizing_probs",
]


def depolarizing_probs(p):
    """(px, py, pz) thresholds for depolarizing noise of strength p, in the
    reference's overlap convention (feedback_gnn.py:298): px=2p/3, py=p/3,
    pz=2p/3 so that pure X/Y/Z each occur with probability p/3."""
    return 2.0 * p / 3.0, p / 3.0, 2.0 * p / 3.0


def pauli_iid(key, px, py, pz, n, batch):
    """Sample i.i.d. Pauli noise.  Returns bool arrays (noise_x, noise_z) of
    shape [n, batch]."""
    u = jax.random.uniform(key, (n, batch), jnp.float32)
    noise_x = u < px
    noise_z = jnp.logical_and(u >= (px - py), u < (px + pz - py))
    return noise_x, noise_z


def pauli_fixed_weight(key, wt, n, batch):
    """Sample exactly-weight-``wt`` Pauli errors (training-data mining path,
    pauli.py:80-96).  Returns bool arrays (noise_x, noise_z) of shape
    [n, batch].  ``wt`` must be static."""
    kpos, kval = jax.random.split(key)
    pos_keys = jax.random.split(kpos, batch)
    # distinct positions per sample via per-sample permutation
    pos = jax.vmap(lambda k: jax.random.permutation(k, n)[:wt])(pos_keys)  # [B, wt]
    u = jax.random.uniform(kval, (batch, wt), jnp.float32)
    x_flag = u < 2.0 / 3.0
    z_flag = u > 1.0 / 3.0

    rows = jnp.broadcast_to(jnp.arange(batch)[:, None], (batch, wt))
    noise_x = jnp.zeros((batch, n), bool).at[rows, pos].set(x_flag)
    noise_z = jnp.zeros((batch, n), bool).at[rows, pos].set(z_flag)
    return noise_x.T, noise_z.T


def pauli_fixed_weight_traced(key, wt, n, batch, wt_max):
    """``pauli_fixed_weight`` with a TRACED weight: one compiled program
    serves a whole mining schedule wt <= wt_max (the static-wt version
    retraces per weight — ~30 remote compiles for a 4..60 curriculum).
    Identical distribution: the first ``wt`` entries of a uniform
    permutation are a uniform without-replacement subset, and masking the
    tail with ``arange(wt_max) < wt`` zeroes the unused slots."""
    kpos, kval = jax.random.split(key)
    pos_keys = jax.random.split(kpos, batch)
    pos = jax.vmap(lambda k: jax.random.permutation(k, n)[:wt_max])(pos_keys)
    u = jax.random.uniform(kval, (batch, wt_max), jnp.float32)
    active = jnp.arange(wt_max)[None, :] < wt
    x_flag = jnp.logical_and(u < 2.0 / 3.0, active)
    z_flag = jnp.logical_and(u > 1.0 / 3.0, active)

    rows = jnp.broadcast_to(jnp.arange(batch)[:, None], (batch, wt_max))
    noise_x = jnp.zeros((batch, n), bool).at[rows, pos].set(x_flag)
    noise_z = jnp.zeros((batch, n), bool).at[rows, pos].set(z_flag)
    return noise_x.T, noise_z.T
