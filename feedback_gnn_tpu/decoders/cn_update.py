"""Check-node update rules on the aligned slot-major layout.

Each update maps ``msg_cn [dc, c_pad, B]`` (+ per-CN syndrome signs
``[c_pad, B]`` and validity mask ``[dc, c_pad]``) to extrinsic outgoing
messages of the same shape.  Semantics (clip constants, duplicate-min
handling, sign conventions, stop-gradients) follow the reference exactly:

* boxplus-phi : decoding_q.py:365-431 (phi(x) = softplus(x) - log(exp(x)-1),
  clip [8.5e-8, 16.635532])
* boxplus     : decoding_q.py:313-363 (tanh product, 1e-12 zero-replacement,
  1e-7 re-zeroing, atanh clip 1 - 1e-7)
* minsum      : decoding_q.py:539-644 (second-min + duplicate-min detection,
  +-20 input clip)

Outputs are multiplied by the mask — pad slots are EXACT zeros, which the
graph invariants (codes/graph.py I2) rely on.
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


# --- phi formulation switch (error-floor numerics experiments) -------------
# "expm1"    (default): softplus(x) - log(expm1(x)) — the reference's
#            formulation with the small-x staircase fixed by expm1.
# "tf"       : softplus(x) - log(exp(x) - 1) — mimics TF's exact arithmetic
#            including its f32 staircase for weak messages (x small).
# "accurate" : log1p(e) - log1p(-e) with e = exp(-x) — cancellation-free,
#            ~400x lower mean relative error than the reference formulation.
# Set via env FGT_PHI_IMPL before import, or set_phi_impl() BEFORE tracing
# any jitted decoder (a trace bakes the formulation in; already-compiled
# functions are NOT retraced).  Experimental knob: the parity-validated
# default is "expm1".
import os as _os

_PHI_IMPLS = ("expm1", "tf", "accurate")
_PHI_IMPL = _os.environ.get("FGT_PHI_IMPL", "expm1")
assert _PHI_IMPL in _PHI_IMPLS, _PHI_IMPL


def set_phi_impl(name: str):
    global _PHI_IMPL
    assert name in _PHI_IMPLS, name
    _PHI_IMPL = name


def phi(x, impl: str | None = None):
    """phi(x) = log((e^x + 1)/(e^x - 1)), clipped as in the reference.

    The reference computes softplus(x) - log(exp(x)-1) and relies on TF-f32
    rounding exp(8.5e-8) up to 1+eps, making phi(8.5e-8) = 16.635532 — which
    is exactly the upper clip (phi is a self-inverse on [8.5e-8, 16.635532]).
    XLA's exp is not guaranteed to round the same way (exp(8.5e-8) -> 1.0
    gives log(0) = -inf), so the default uses expm1 and clips the OUTPUT to
    the same interval; results agree with TF to ~1e-7 outside its own
    staircase-noise region (see tests/test_bp4_parity.py).  Alternative
    formulations above are selectable for floor-numerics experiments.

    ``impl`` selects the formulation explicitly (functional — preferred
    inside traced code, e.g. the formulation-ensemble rescue stage);
    ``None`` falls back to the module default (_PHI_IMPL, env-settable).
    """
    if impl is None:
        impl = _PHI_IMPL
    assert impl in _PHI_IMPLS, impl
    x = jnp.clip(x, PHI_CLIP_MIN, PHI_CLIP_MAX)
    if impl == "tf":
        out = jax.nn.softplus(x) - jnp.log(jnp.exp(x) - 1.0)
    elif impl == "accurate":
        e = jnp.exp(-x)
        out = jnp.log1p(e) - jnp.log1p(-e)
    else:
        out = jax.nn.softplus(x) - jnp.log(jnp.expm1(x))
    return jnp.clip(out, PHI_CLIP_MIN, PHI_CLIP_MAX)


def _sign_no_zero(msg):
    """tf.sign with 0 -> +1 (decoding_q.py:392-396)."""
    return jnp.where(msg < 0, -1.0, 1.0)


def cn_update_phi(msg_cn, syndrome_pm, mask, phi_impl: str | None = None):
    """Extrinsic boxplus via the phi function.

    msg_cn      : [dc, c_pad, B] float32 (pad slots hold 0)
    syndrome_pm : [c_pad, B] float32 in {+1,-1}
    mask        : [dc, c_pad] float32 in {0,1}
    phi_impl    : explicit phi formulation (None = module default)
    """
    m = mask[:, :, None]
    sign_val = jnp.where(m > 0, _sign_no_zero(msg_cn), 1.0)
    sign_node = jnp.prod(sign_val, axis=0) * syndrome_pm  # [c_pad, B]
    sign_out = sign_val * sign_node[None]

    p = phi(jnp.abs(msg_cn), phi_impl) * m  # pad slots -> 0 contribution
    p_sum = jnp.sum(p, axis=0)  # [c_pad, B]
    ext = p_sum[None] - p
    return jax.lax.stop_gradient(sign_out) * phi(ext, phi_impl) * m


def cn_update_tanh(msg_cn, syndrome_pm, mask):
    """Extrinsic boxplus via tanh products (decoding_q.py:313-363)."""
    m = mask[:, :, None]
    t = jnp.tanh(msg_cn / 2.0)
    t = jnp.where(t == 0.0, 1e-12, t)  # _where_ragged
    t = jnp.where(m > 0, t, 1.0)  # pad slots neutral in the product
    prod = jnp.prod(t, axis=0) * syndrome_pm  # [c_pad, B]
    out = (t**-1) * prod[None]
    out = jnp.where(jnp.abs(out) < 1e-7, 0.0, out)  # _where_ragged_inv
    out = jnp.clip(out, -ATANH_CLIP, ATANH_CLIP)
    return 2.0 * jnp.arctanh(out) * m


def cn_update_minsum(msg_cn, syndrome_pm, mask):
    """Extrinsic normalized-min-sum with duplicate-min detection
    (decoding_q.py:539-644)."""
    m = mask[:, :, None]
    msg = jnp.clip(msg_cn, -LLR_MAX, LLR_MAX)

    sign_val = jnp.where(m > 0, _sign_no_zero(msg), 1.0)
    sign_node = jnp.prod(sign_val, axis=0) * syndrome_pm
    sign_out = jax.lax.stop_gradient(sign_val) * sign_node[None]

    amsg = jnp.abs(msg)
    amsg_valid = jnp.where(m > 0, amsg, _LARGE_VAL)
    min1 = jnp.min(amsg_valid, axis=0, keepdims=True)  # [1, c_pad, B]
    is_min = jnp.logical_and(amsg_valid == min1, m > 0)
    min2 = jnp.min(jnp.where(is_min, _LARGE_VAL, amsg_valid), axis=0, keepdims=True)
    double_min = jnp.sum(is_min.astype(jnp.float32), axis=0, keepdims=True) >= 2.0
    min_e = jnp.where(double_min, min1, min2)
    out_abs = jnp.where(is_min, min_e, min1)
    return sign_out * out_abs * m


CN_UPDATES = {
    "boxplus-phi": cn_update_phi,
    "boxplus": cn_update_tanh,
    "minsum": cn_update_minsum,
}


def boxplus_rows(vals, rowset, phi_impl: str | None = None):
    """Boxplus (via phi) of per-VN LLRs over the rows of a PCM — the
    check-satisfaction logits of decoding_q.py:433-471 (_cn_update_phi_loss):
    no extrinsic split, no syndrome, gradient flows through magnitude only.

    vals   : [>= vn_sentinel+1, B] float32 with zero pad rows
    rowset : codes.graph.RowSet (slot-major aligned tables)
    phi_impl : explicit phi formulation (None = module default)
    Returns [r_pad, B].
    """
    v = vals[rowset.vn_idx]  # [max_deg, r_pad, B]
    m = rowset.mask[:, :, None]
    sign_val = jnp.where(m > 0, _sign_no_zero(v), 1.0)
    sign_node = jnp.prod(sign_val, axis=0)  # [r_pad, B]
    p = phi(jnp.abs(v), phi_impl) * m
    s = jnp.sum(p, axis=0)
    return sign_node * phi(s, phi_impl)
