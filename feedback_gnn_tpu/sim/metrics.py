"""Error-counting metrics (reference: sionna/utils/metrics.py and
utils/misc.py:90-230)."""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "count_errors",
    "count_block_errors",
    "compute_ber",
    "compute_bler",
    "hard_decisions",
]


def hard_decisions(llr):
    """Logit > 0 -> bit 1 (misc.py:90)."""
    return (llr > 0).astype(jnp.int32)


def count_errors(b, b_hat):
    """Number of differing bits (metrics.py:172)."""
    return jnp.sum((b != b_hat).astype(jnp.int64))


def count_block_errors(b, b_hat, axis=-1):
    """Number of rows differing anywhere (metrics.py:194)."""
    return jnp.sum(jnp.any(b != b_hat, axis=axis).astype(jnp.int64))


def compute_ber(b, b_hat):
    return count_errors(b, b_hat) / b.size


def compute_bler(b, b_hat, axis=-1):
    block = jnp.any(b != b_hat, axis=axis)
    return jnp.mean(block.astype(jnp.float64))
