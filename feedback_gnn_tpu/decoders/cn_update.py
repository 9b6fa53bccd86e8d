"""Check-node update rules on the dense padded layout.

Each update maps ``msg_cn [num_cn, max_deg, B]`` (+ per-CN syndrome signs
``[num_cn, B]`` and a validity mask ``[num_cn, max_deg]``) to extrinsic
outgoing messages of the same shape.  Semantics (clip constants, duplicate-min
handling, sign conventions, stop-gradients) follow the reference exactly:

* boxplus-phi : decoding_q.py:365-431 (phi(x) = softplus(x) - log(exp(x)-1),
  clip [8.5e-8, 16.635532])
* boxplus     : decoding_q.py:313-363 (tanh product, 1e-12 zero-replacement,
  1e-7 re-zeroing, atanh clip 1 - 1e-7)
* minsum      : decoding_q.py:539-644 (second-min + duplicate-min detection,
  +-20 input clip)

Padded slots (mask == 0) are arranged to behave exactly like absent ragged
entries: sign 1, phi contribution 0, excluded from min reductions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["phi", "cn_update_phi", "cn_update_tanh", "cn_update_minsum", "boxplus_rows"]

# clip constants tuned for f32 in the reference (decoding_q.py:48-51, 372)
PHI_CLIP_MIN = 8.5e-8
PHI_CLIP_MAX = 16.635532
ATANH_CLIP = 1.0 - 1e-7
LLR_MAX = 20.0
_LARGE_VAL = 10000.0  # minsum "ignore" constant (decoding_q.py:551)


def phi(x):
    """phi(x) = log((e^x + 1)/(e^x - 1)), clipped as in the reference.

    The reference computes softplus(x) - log(exp(x)-1) and relies on TF-f32
    rounding exp(8.5e-8) up to 1+eps, making phi(8.5e-8) = 16.635532 — which
    is exactly the upper clip (phi is a self-inverse on [8.5e-8, 16.635532]).
    XLA's exp is not guaranteed to round the same way (exp(8.5e-8) -> 1.0
    gives log(0) = -inf), so we use expm1 and clip the OUTPUT to the same
    interval; results agree with TF to ~1e-7.
    """
    x = jnp.clip(x, PHI_CLIP_MIN, PHI_CLIP_MAX)
    out = jax.nn.softplus(x) - jnp.log(jnp.expm1(x))
    return jnp.clip(out, PHI_CLIP_MIN, PHI_CLIP_MAX)


def _sign_no_zero(msg):
    """tf.sign with 0 -> +1 (decoding_q.py:392-396)."""
    return jnp.where(msg < 0, -1.0, 1.0)


def cn_update_phi(msg_cn, syndrome_pm, mask):
    """Extrinsic boxplus via the phi function.

    msg_cn      : [C, D, B] float32 (padded slots hold 0)
    syndrome_pm : [C, B] float32 in {+1,-1}
    mask        : [C, D] float32 in {0,1}
    """
    m = mask[:, :, None]
    sign_val = jnp.where(m > 0, _sign_no_zero(msg_cn), 1.0)
    sign_node = jnp.prod(sign_val, axis=1) * syndrome_pm  # [C, B]
    sign_out = sign_val * sign_node[:, None, :]

    p = phi(jnp.abs(msg_cn)) * m  # padded -> 0 contribution
    p_sum = jnp.sum(p, axis=1)  # [C, B]
    ext = p_sum[:, None, :] - p
    return jax.lax.stop_gradient(sign_out) * phi(ext)


def cn_update_tanh(msg_cn, syndrome_pm, mask):
    """Extrinsic boxplus via tanh products (decoding_q.py:313-363)."""
    m = mask[:, :, None]
    t = jnp.tanh(msg_cn / 2.0)
    t = jnp.where(t == 0.0, 1e-12, t)  # _where_ragged
    t = jnp.where(m > 0, t, 1.0)  # padded slots neutral in the product
    prod = jnp.prod(t, axis=1) * syndrome_pm  # [C, B]
    out = (t**-1) * prod[:, None, :]
    out = jnp.where(jnp.abs(out) < 1e-7, 0.0, out)  # _where_ragged_inv
    out = jnp.clip(out, -ATANH_CLIP, ATANH_CLIP)
    return 2.0 * jnp.arctanh(out)


def cn_update_minsum(msg_cn, syndrome_pm, mask):
    """Extrinsic normalized-min-sum with duplicate-min detection
    (decoding_q.py:539-644)."""
    m = mask[:, :, None]
    msg = jnp.clip(msg_cn, -LLR_MAX, LLR_MAX)

    sign_val = jnp.where(m > 0, _sign_no_zero(msg), 1.0)
    sign_node = jnp.prod(sign_val, axis=1) * syndrome_pm
    sign_out = jax.lax.stop_gradient(sign_val) * sign_node[:, None, :]

    amsg = jnp.abs(msg)
    # exclude padded slots from all min reductions
    amsg_valid = jnp.where(m > 0, amsg, _LARGE_VAL)
    min1 = jnp.min(amsg_valid, axis=1, keepdims=True)  # [C, 1, B]
    is_min = jnp.logical_and(amsg_valid == min1, m > 0)
    # second-smallest over non-min valid slots
    min2 = jnp.min(jnp.where(is_min, _LARGE_VAL, amsg_valid), axis=1, keepdims=True)
    double_min = jnp.sum(is_min.astype(jnp.float32), axis=1, keepdims=True) >= 2.0
    min_e = jnp.where(double_min, min1, min2)
    out_abs = jnp.where(is_min, min_e, min1)
    return sign_out * out_abs


CN_UPDATES = {
    "boxplus-phi": cn_update_phi,
    "boxplus": cn_update_tanh,
    "minsum": cn_update_minsum,
}


def boxplus_rows(vals_pad, rowset):
    """Boxplus (via phi) of per-VN LLRs over the rows of a PCM — the
    check-satisfaction logits of decoding_q.py:433-471 (_cn_update_phi_loss):
    no extrinsic split, no syndrome, gradient flows through magnitude only.

    vals_pad : [n+1, B] float32 (last row must be 0, gathered for padding)
    rowset   : codes.graph.RowSet
    Returns [num_rows, B].
    """
    v = vals_pad[rowset.vn_idx]  # [R, D, B]
    m = rowset.mask[:, :, None]
    sign_val = jnp.where(m > 0, _sign_no_zero(v), 1.0)
    sign_node = jnp.prod(sign_val, axis=1)  # [R, B]
    p = phi(jnp.abs(v)) * m
    s = jnp.sum(p, axis=1)
    return sign_node * phi(s)
