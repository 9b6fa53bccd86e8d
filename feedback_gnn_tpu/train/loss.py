"""Deep-supervision loss for feedback-GNN training.

Reference semantics (feedback_gnn.py:431-442): sum over BP iterations
i in [loss_from, num_iter) of BCE-with-logits between the flipped syndrome
labels and the per-iteration check logits, for both X and Z sides:

  gt_x = 1 - syndrome_z   (labels are FLIPPED: logit predicts 'check
  gt_z = 1 - syndrome_x    satisfied', feedback_gnn.py:431-432)

With our logit stack layout (bp4.BP4Result.logit_stack: xs[i] = x_logit of
iteration i, xs[num_iter] = final), the reference's ``llr_hat[2i+2]`` is
``xs[i+1]``, so the loss covers stack indices loss_from+1 .. num_iter.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["bce_with_logits", "deep_supervision_loss"]


import jax


def _bce_elem(labels, logits):
    return (
        jnp.maximum(logits, 0.0)
        - logits * labels
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def bce_with_logits(labels, logits, row_valid=None, axis_name=None):
    """Mean sigmoid cross-entropy (tf.keras BinaryCrossentropy(from_logits)).

    ``row_valid`` [R] masks phantom rows under edge sharding; ``axis_name``
    completes the mean across the edge-sharded row partition."""
    elem = _bce_elem(labels, logits)
    if row_valid is None and axis_name is None:
        return jnp.mean(elem)
    rv = jnp.ones(elem.shape[0], elem.dtype) if row_valid is None else row_valid
    num = jnp.sum(elem * rv[:, None])
    den = jnp.sum(rv) * elem.shape[1]
    if axis_name is not None:
        num = jax.lax.psum(num, axis_name)
        den = jax.lax.psum(den, axis_name)
    return num / den


def deep_supervision_loss(
    logit_stack,
    syndrome_x,
    syndrome_z,
    num_iter: int,
    loss_from: int = 8,
    row_valid_x=None,
    row_valid_z=None,
    axis_name=None,
):
    """Sum of per-iteration BCE terms.

    Args:
      logit_stack: (xs, zs) each [num_iter+1, R, B] from bp4_decode with
        collect_logits=True.
      syndrome_x / syndrome_z: [mx, B] / [mz, B] in {0,1} (shard-local rows
        under edge sharding, aligned with the logit row partitions).
    """
    xs, zs = logit_stack
    gt_x = 1.0 - syndrome_z.astype(jnp.float32)  # label flip
    gt_z = 1.0 - syndrome_x.astype(jnp.float32)
    loss = 0.0
    for i in range(loss_from + 1, num_iter + 1):
        loss = (
            loss
            + bce_with_logits(gt_x, xs[i], row_valid_x, axis_name)
            + bce_with_logits(gt_z, zs[i], row_valid_z, axis_name)
        )
    return loss
