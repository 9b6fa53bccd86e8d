"""Probe Mosaic/Pallas support for the ops the fused BP kernel needs.

Run on the real TPU: python scripts/probe_pallas.py
"""

import sys
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def try_case(name, fn):
    try:
        out = fn()
        jax.block_until_ready(out)
        print(f"PASS {name}: {np.asarray(out).shape}")
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:200]
        print(f"FAIL {name}: {type(e).__name__}: {msg}")
        return False


def main():
    E = 3840
    B = 128
    rng = np.random.default_rng(0)
    perm = jnp.asarray(rng.permutation(E).astype(np.int32))
    x_sub = jnp.asarray(rng.standard_normal((E, B)), jnp.float32)  # edges in sublanes
    x_lane = jnp.asarray(rng.standard_normal((8, E)), jnp.float32)  # edges in lanes

    # 1. sublane-axis gather (rows of [E, B])
    def k1(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take(x_ref[:], i_ref[:], axis=0)

    try_case(
        "take axis=0 (sublanes) [E,B]",
        lambda: pl.pallas_call(
            k1,
            out_shape=jax.ShapeDtypeStruct((E, B), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x_sub, perm),
    )

    # 2. lane-axis gather ([8, E] indexed along lanes)
    def k2(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take(x_ref[:], i_ref[:], axis=1)

    try_case(
        "take axis=1 (lanes) [8,E]",
        lambda: pl.pallas_call(
            k2,
            out_shape=jax.ShapeDtypeStruct((8, E), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x_lane, perm),
    )

    # 2b. take_along_axis lanes with 2D idx
    idx2 = jnp.broadcast_to(perm[None, :], (8, E))

    def k2b(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)

    try_case(
        "take_along_axis axis=1 [8,E]",
        lambda: pl.pallas_call(
            k2b,
            out_shape=jax.ShapeDtypeStruct((8, E), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x_lane, idx2),
    )

    # 3. static roll along sublanes
    def k3(x_ref, o_ref):
        o_ref[:] = pltpu.roll(x_ref[:], shift=13, axis=0)

    try_case(
        "pltpu.roll sublanes [E,B]",
        lambda: pl.pallas_call(
            k3,
            out_shape=jax.ShapeDtypeStruct((E, B), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x_sub),
    )

    # 4. static strided slices + concat (circulant shift building block)
    def k4(x_ref, o_ref):
        a = x_ref[13:127, :]
        b = x_ref[0:13, :]
        o_ref[0:114, :] = a
        o_ref[114:127, :] = b
        o_ref[127:128, :] = x_ref[127:128, :]

    try_case(
        "static slice copy (circulant) [128,B]",
        lambda: pl.pallas_call(
            k4,
            out_shape=jax.ShapeDtypeStruct((128, B), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x_sub[:128]),
    )

    # 5. f32 transcendentals on [E, B] (phi building block)
    def k5(x_ref, o_ref):
        a = jnp.abs(x_ref[:]) + 1e-3
        o_ref[:] = jax.nn.softplus(a) - jnp.log(jnp.expm1(a))

    try_case(
        "phi transcendentals [E,B]",
        lambda: pl.pallas_call(
            k5,
            out_shape=jax.ShapeDtypeStruct((E, B), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x_sub),
    )

    # 6. gather timing vs XLA (if case 1 passed): 64-iter loop of gathers
    def k6(x_ref, i_ref, o_ref):
        def body(_, acc):
            return jnp.take(acc, i_ref[:], axis=0) * 1.0001

        o_ref[:] = jax.lax.fori_loop(0, 64, body, x_ref[:])

    import time

    try:
        f = pl.pallas_call(
            k6,
            out_shape=jax.ShapeDtypeStruct((E, B), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        g = jax.jit(f)
        jax.block_until_ready(g(x_sub, perm))
        t0 = time.perf_counter()
        for _ in range(50):
            out = g(x_sub, perm)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 50 / 64
        print(f"TIME pallas sublane-gather [3840,128]: {dt*1e6:.1f} us/gather")
    except Exception:
        print("SKIP gather timing")
        traceback.print_exc(limit=1)

    print("done")


if __name__ == "__main__":
    sys.exit(main())
