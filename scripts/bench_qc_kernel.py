"""Time the fused QC BP4 kernel vs the XLA gather path on real TPU.

    python scripts/bench_qc_kernel.py [n1270|n882] [batch] [iters]
"""

import os
import pickle
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".bench_cache")


def get_code(name):
    path = os.path.join(CACHE, f"{name}_code.pkl")
    if os.path.exists(path):
        with open(path, "rb") as f:
            return pickle.load(f)
    from feedback_gnn_tpu.codes import ghp_882_24, ghp_1270_28

    code = {"n882": ghp_882_24, "n1270": ghp_1270_28}[name]()
    os.makedirs(CACHE, exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(code, f)
    return code


def main():
    jax.config.update("jax_compilation_cache_dir", os.path.join(CACHE, "xla"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    name = sys.argv[1] if len(sys.argv) > 1 else "n1270"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    num_iter = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    tile = int(os.environ.get("QC_TILE", 128))

    code = get_code(name)
    from feedback_gnn_tpu.codes.qc import qc_pair_from_code
    from feedback_gnn_tpu.decoders.bp4_qc import bp4_qc_marginals

    qc = qc_pair_from_code(code)
    print(f"{name}: {qc.qx} / {qc.qz}", file=sys.stderr)

    n = code.N
    rng = np.random.default_rng(0)
    p0 = 0.05
    lx = np.log((1 - p0) / (p0 * 2 / 3))
    ly = np.log((1 - p0) / (p0 / 3))
    llr_ch = jnp.asarray(
        np.stack([np.full((n, batch), v, np.float32) for v in (lx, ly, lx)])
    )
    syn_x = jnp.asarray(rng.integers(0, 2, (code.hx.shape[0], batch)), jnp.float32)
    syn_z = jnp.asarray(rng.integers(0, 2, (code.hz.shape[0], batch)), jnp.float32)

    @jax.jit
    def qc_run(llr, sx, sz):
        return bp4_qc_marginals(qc, llr, sx, sz, num_iter=num_iter, batch_tile=tile)

    t0 = time.perf_counter()
    out = qc_run(llr_ch, syn_x, syn_z)
    _ = float(out[0][0, 0])
    out = qc_run(llr_ch, syn_x, syn_z)
    _ = float(out[0][0, 0])  # second warmup: absorb remote-compile residue
    print(f"qc kernel compile+2 runs: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        out = qc_run(llr_ch, syn_x, syn_z)
        _ = float(out[0][0, 0])  # force full materialisation (remote platform)
    dt_qc = (time.perf_counter() - t0) / reps
    print(
        f"QC kernel  BP4-{num_iter} B={batch} tile={tile}: {dt_qc*1e3:.1f} ms "
        f"= {batch/dt_qc:.0f} samples/s"
    )

    # XLA path comparison
    from feedback_gnn_tpu.codes.graph import QuantumGraph
    from feedback_gnn_tpu.decoders.bp4 import bp4_decode

    gpath = os.path.join(CACHE, f"{name}_graph.pkl")
    if os.path.exists(gpath):
        with open(gpath, "rb") as f:
            graph = pickle.load(f)
    else:
        graph = QuantumGraph.from_code(code, stage_mode=True)
        with open(gpath, "wb") as f:
            pickle.dump(graph, f)

    @jax.jit
    def xla_run(llr, sx, sz):
        r = bp4_decode(graph, llr, sx, sz, num_iter=num_iter)
        return r.llrx, r.llry, r.llrz

    t0 = time.perf_counter()
    ref = xla_run(llr_ch, syn_x, syn_z)
    _ = float(ref[0][0, 0])
    ref = xla_run(llr_ch, syn_x, syn_z)
    _ = float(ref[0][0, 0])
    print(f"xla compile+2 runs: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    t0 = time.perf_counter()
    for _ in range(reps):
        ref = xla_run(llr_ch, syn_x, syn_z)
        _ = float(ref[0][0, 0])
    dt_x = (time.perf_counter() - t0) / reps
    print(
        f"XLA path   BP4-{num_iter} B={batch}: {dt_x*1e3:.1f} ms "
        f"= {batch/dt_x:.0f} samples/s   speedup {dt_x/dt_qc:.2f}x"
    )

    # agreement (hard decisions)
    from feedback_gnn_tpu.decoders.bp4 import hard_decision

    xh_q, zh_q = hard_decision(*out)
    xh_r, zh_r = hard_decision(ref[0][:n], ref[1][:n], ref[2][:n])
    agree = float(
        jnp.mean(
            jnp.logical_and(xh_q == xh_r[:n], zh_q == zh_r[:n]).astype(jnp.float32)
        )
    )
    print(f"hard-decision agreement: {agree:.6f}")


if __name__ == "__main__":
    main()
