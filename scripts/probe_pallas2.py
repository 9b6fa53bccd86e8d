"""Second Pallas probe round: gather variants + phi via tanh."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def try_case(name, fn):
    try:
        out = fn()
        jax.block_until_ready(out)
        print(f"PASS {name}")
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:160]
        print(f"FAIL {name}: {type(e).__name__}: {msg}")
        return False


def vmem_call(kernel, out_shape, n_in):
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )


def main():
    E, B = 3840, 128
    rng = np.random.default_rng(0)
    perm = rng.permutation(E).astype(np.int32)
    x_sub = jnp.asarray(rng.standard_normal((E, B)), jnp.float32)
    idx_full = jnp.asarray(np.broadcast_to(perm[:, None], (E, B)).copy())

    # A. take_along_axis axis=0 with full [E,B] int32 indices
    def ka(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=0)

    ok_a = try_case(
        "take_along_axis axis=0 [E,B] idx [E,B]",
        lambda: vmem_call(ka, jax.ShapeDtypeStruct((E, B), jnp.float32), 2)(x_sub, idx_full),
    )

    # B. fancy row indexing x[idx] (1D idx)
    def kb(x_ref, i_ref, o_ref):
        o_ref[:] = x_ref[:][i_ref[:], :]

    try_case(
        "fancy x[idx,:] rows",
        lambda: vmem_call(kb, jax.ShapeDtypeStruct((E, B), jnp.float32), 2)(
            x_sub, jnp.asarray(perm)
        ),
    )

    # C. phi via tanh: -log(tanh(x/2))
    def kc(x_ref, o_ref):
        a = jnp.abs(x_ref[:]) + 1e-3
        o_ref[:] = -jnp.log(jnp.tanh(a * 0.5))

    try_case(
        "phi via -log(tanh(x/2))",
        lambda: vmem_call(kc, jax.ShapeDtypeStruct((E, B), jnp.float32), 1)(x_sub),
    )

    # D. exp/log1p softplus fallback (exp supported?)
    def kd(x_ref, o_ref):
        a = jnp.abs(x_ref[:]) + 1e-3
        o_ref[:] = jnp.log1p(jnp.exp(-a)) - jnp.log(jnp.exp(a) - 1.0) + a

    try_case(
        "phi via exp/log1p",
        lambda: vmem_call(kd, jax.ShapeDtypeStruct((E, B), jnp.float32), 1)(x_sub),
    )

    # E. timing: take_along_axis loop if A passed
    if ok_a:

        def ke(x_ref, i_ref, o_ref):
            def body(_, acc):
                return jnp.take_along_axis(acc, i_ref[:], axis=0) * 1.0001

            o_ref[:] = jax.lax.fori_loop(0, 64, body, x_ref[:])

        try:
            g = jax.jit(vmem_call(ke, jax.ShapeDtypeStruct((E, B), jnp.float32), 2))
            jax.block_until_ready(g(x_sub, idx_full))
            t0 = time.perf_counter()
            for _ in range(20):
                out = g(x_sub, idx_full)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / 20 / 64
            bw = E * B * 4 / dt / 1e9
            print(f"TIME sublane take_along_axis [3840,128]: {dt*1e6:.1f} us/gather ({bw:.0f} GB/s eff)")
        except Exception as e:  # noqa: BLE001
            print(f"FAIL gather timing: {str(e).splitlines()[0][:160]}")

    # F. timing: roll loop (circulant building block)
    def kf(x_ref, o_ref):
        def body(i, acc):
            return pltpu.roll(acc, shift=13, axis=0) * 1.0001

        o_ref[:] = jax.lax.fori_loop(0, 64, body, x_ref[:])

    try:
        g = jax.jit(vmem_call(kf, jax.ShapeDtypeStruct((E, B), jnp.float32), 1))
        jax.block_until_ready(g(x_sub))
        t0 = time.perf_counter()
        for _ in range(20):
            out = g(x_sub)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 20 / 64
        bw = E * B * 4 / dt / 1e9
        print(f"TIME roll [3840,128]: {dt*1e6:.1f} us/roll ({bw:.0f} GB/s eff)")
    except Exception as e:  # noqa: BLE001
        print(f"FAIL roll timing: {str(e).splitlines()[0][:160]}")

    print("done")


if __name__ == "__main__":
    sys.exit(main())
