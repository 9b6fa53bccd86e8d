"""Device GF(2) matrix ops.

The reference keeps syndrome computation on-device as an integer matmul
followed by a bitwise-and mod-2 (`int_mod_2`, fec/utils.py:1565).  On TPU we
use an f32 matmul (values are small integer counts, exact in f32, and the MXU
runs f32 natively) followed by the same bitwise reduction.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["mod2_matmul", "int_mod_2"]


def int_mod_2(x):
    """x mod 2 for non-negative integer-valued tensors (bitwise-and trick,
    matching fec/utils.py:1565 so everything stays on-device)."""
    return jnp.bitwise_and(x.astype(jnp.int32), 1)


def mod2_matmul(h, v):
    """``(h @ v) mod 2`` with ``h`` a [m, n] 0/1 matrix and ``v`` [n, B].

    Returns int32 in {0,1}.  EXACT on the MXU with bf16 inputs: 0/1 operands
    are exactly representable, every product is 0/1, and accumulation is
    forced to f32 (``preferred_element_type``), so sums stay integer-exact
    up to 2^24 — while bf16 operand feeds run the MXU at full rate (f32
    matmuls are emulated by multi-pass bf16 on v5e).
    """
    prod = jnp.dot(
        h.astype(jnp.bfloat16),
        v.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    return int_mod_2(prod)
