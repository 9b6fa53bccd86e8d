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
    "llr2mi",
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


def llr2mi(llr, s=None, weight=None):
    """Hagenauer mutual-information approximation from LLRs
    (reference: sionna/fec/utils.py:151-222):

        I ~ 1 - mean(log2(1 + exp(llr_zero))),  llr_zero clipped to +-20,

    where ``llr_zero = s * llr`` scrambles signs as if the all-zero codeword
    was sent.  ``weight`` (optional, same shape, {0,1}) restricts the mean to
    valid entries — used for padded edge layouts where the reference's
    ragged flat_values only contain true edges."""
    llr = jnp.asarray(llr, jnp.float32)
    if s is not None:
        llr = llr * s
    llr = jnp.clip(llr, -20.0, 20.0)
    x = jnp.log(1.0 + jnp.exp(llr)) / jnp.log(2.0)
    if weight is None:
        return 1.0 - jnp.mean(x)
    w = jnp.broadcast_to(jnp.asarray(weight, jnp.float32), x.shape)
    return 1.0 - jnp.sum(x * w) / jnp.maximum(jnp.sum(w), 1.0)
