"""Discrete binary memoryless channels (DMC / BSC / Z / BEC), TPU-native.

Functional re-design of the reference channel family
(/root/reference/sionna/channel/discrete_channel.py:11-632):

* asymmetric DMC core with per-position error probabilities (pb0, pb1)
  applied where x==0 / x==1 respectively (discrete_channel.py:242-276);
* differentiable error sampling via the two-class Gumbel-softmax trick with
  a straight-through binarizer (discrete_channel.py:183-221), so gradients
  flow into ``pb``;
* straight-through XOR (identity backward, discrete_channel.py:167-180);
* optional LLR outputs in the Sionna logit convention
  log[p(x=1)/p(x=0)] with clipping (discrete_channel.py:283-296);
* BSC (pb0=pb1), Z-channel (pb0=0), and BEC with ternary outputs (erasure
  marker -1 binary / 0 bipolar) or zero-LLR erasures
  (discrete_channel.py:300-632).

All functions are pure (key-passing) and jit/grad-safe with static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "xor_ste",
    "ste_binarize",
    "sample_errors_gumbel",
    "binary_memoryless_channel",
    "binary_symmetric_channel",
    "binary_z_channel",
    "binary_erasure_channel",
]

_EPS = 1e-9  # discrete_channel.py:117
DEFAULT_TEMPERATURE = 0.1  # discrete_channel.py:118


@jax.custom_vjp
def xor_ste(a, b):
    """XOR with identity (straight-through) gradient to both inputs
    (discrete_channel.py:167-180)."""
    return jnp.abs(a - b)


def _xor_fwd(a, b):
    return xor_ste(a, b), None


def _xor_bwd(_, g):
    return g, g


xor_ste.defvjp(_xor_fwd, _xor_bwd)


@jax.custom_vjp
def ste_binarize(x):
    """Hard-decide at 0.5 with identity gradient
    (discrete_channel.py:182-190)."""
    return jnp.where(x < 0.5, 0.0, 1.0)


def _steb_fwd(x):
    return ste_binarize(x), None


def _steb_bwd(_, g):
    return (g,)


ste_binarize.defvjp(_steb_fwd, _steb_bwd)


def sample_errors_gumbel(key, pb, shape, temperature=DEFAULT_TEMPERATURE):
    """Differentiable Bernoulli(pb) error sampling.

    Two-class Gumbel-softmax with classes (error, no-error) followed by the
    straight-through binarizer, exactly the construction of
    discrete_channel.py:192-221.  Returns float {0.,1.} errors whose
    gradient w.r.t. ``pb`` follows the relaxed softmax.
    """
    u = jax.random.uniform(key, shape + (2,), jnp.float32)
    q = -jnp.log(-jnp.log(u + _EPS) + _EPS)
    pb = jnp.clip(jnp.asarray(pb, jnp.float32), 0.0, 1.0)
    p = jnp.stack([jnp.broadcast_to(pb, shape), jnp.broadcast_to(1.0 - pb, shape)], axis=-1)
    a = (jnp.log(p + _EPS) + q) / temperature
    e_cat = jax.nn.softmax(a, axis=-1)
    return ste_binarize(e_cat[..., 0])


def binary_memoryless_channel(
    key,
    x,
    pb,
    *,
    bipolar_input: bool = False,
    return_llrs: bool = False,
    llr_max: float = 100.0,
    temperature: float = DEFAULT_TEMPERATURE,
):
    """Asymmetric binary DMC (discrete_channel.py:242-296).

    Args:
      x: input bits, {0,1} (or {-1,1} if ``bipolar_input``), any shape.
      pb: pair (pb0, pb1) of error probabilities — pb0 flips where x is the
        neutral element (0 / -1), pb1 where x is 1.  Scalars or tensors
        broadcastable to ``x.shape``.
    Returns the channel output (bits, or clipped LLRs in the logit
    convention log[p(x=1)/p(x=0)] when ``return_llrs``).
    """
    pb0, pb1 = pb
    pb0 = jnp.clip(jnp.asarray(pb0, jnp.float32), 0.0, 1.0)
    pb1 = jnp.clip(jnp.asarray(pb1, jnp.float32), 0.0, 1.0)
    x = jnp.asarray(x, jnp.float32)

    k0, k1 = jax.random.split(key)
    e0 = sample_errors_gumbel(k0, pb0, x.shape, temperature)
    e1 = sample_errors_gumbel(k1, pb1, x.shape, temperature)

    neutral = -1.0 if bipolar_input else 0.0
    e = jnp.where(x == neutral, e0, e1)

    if bipolar_input:
        y = x * (-2.0 * e + 1.0)
    else:
        y = xor_ste(x, e)

    if return_llrs:
        if not bipolar_input:
            y = 2.0 * y - 1.0
        # Sionna logit convention (discrete_channel.py:283-293)
        y0 = -(jnp.log(pb1 + _EPS) - jnp.log(1.0 - pb0 - _EPS))
        y1 = jnp.log(1.0 - pb1 - _EPS) - jnp.log(pb0 + _EPS)
        y = jnp.where(y == 1.0, y1, y0) * y  # multiply to keep gradient
        y = jnp.clip(y, -llr_max, llr_max)
    return y


def binary_symmetric_channel(key, x, pb, **kwargs):
    """BSC: symmetric flips w.p. pb (discrete_channel.py:300-396)."""
    return binary_memoryless_channel(key, x, (pb, pb), **kwargs)


def binary_z_channel(key, x, pb, **kwargs):
    """Z-channel: only transmitted 1s flip, p(1|0)=0
    (discrete_channel.py:398-500)."""
    return binary_memoryless_channel(key, x, (jnp.zeros_like(jnp.asarray(pb, jnp.float32)), pb), **kwargs)


def binary_erasure_channel(
    key,
    x,
    pb,
    *,
    bipolar_input: bool = False,
    return_llrs: bool = False,
    llr_max: float = 100.0,
    temperature: float = DEFAULT_TEMPERATURE,
):
    """Binary erasure channel (discrete_channel.py:502-632).

    Hard mode returns ternary outputs with the erasure marker -1 (binary
    inputs) / 0 (bipolar inputs); LLR mode returns +-llr_max with erased
    positions set to 0."""
    pb = jnp.clip(jnp.asarray(pb, jnp.float32), 0.0, 1.0)
    x = jnp.asarray(x, jnp.float32)
    e = sample_errors_gumbel(key, pb, x.shape, temperature)

    if return_llrs:
        xb = x if bipolar_input else 2.0 * x - 1.0
        xb = xb * llr_max
        return jnp.where(e == 1.0, 0.0, xb)
    erased = 0.0 if bipolar_input else -1.0
    return jnp.where(e == 0.0, x, erased)
