#!/usr/bin/env python
"""Multi-host (DCN) smoke test: 2 `jax.distributed` processes on CPU.

Validates the multi-host path end-to-end without pod hardware (SURVEY.md
§2.3 [NEW]; the reference has no distributed code at all): two OS processes,
each owning 4 virtual CPU devices, form one 8-device global mesh via
``jax.distributed.initialize`` (the same coordination path a 2-host TPU
slice uses over DCN), run

  * one sharded Monte-Carlo eval step (``make_sharded_eval_step``, pure DP
    over the global 'data' axis — the production multi-host layout), and
  * one sharded train step (``make_sharded_train_step``),

and compare counts/loss against a single-process 8-device run of the same
program: the eval counts must match EXACTLY (per-shard keys are folded from
the global axis index, which is identical in both layouts) and the loss to
f32 tolerance (cross-process psum may reorder the reduction).

Launcher mode (default) spawns the reference run and both workers:

    python scripts/dcn_smoke.py            # prints PASS/FAIL, exit code

Worker mode is internal (``--role worker --process-id N``).
"""

import argparse
import json
import os
import socket
import subprocess
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)

LOCAL_DEVICES = 4
NUM_PROCESSES = 2


def _child_env(local_devices: int) -> dict:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("_DCN_BASE_XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={local_devices}"
    ).strip()
    # never inherit a TPU/axon grab from the parent
    env.pop("JAX_PLATFORM_NAME", None)
    return env


def run_payload(tag: str):
    """Build the 8-device mesh from jax.devices() (global in worker mode),
    run one eval and one train step, print one JSON result line."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from feedback_gnn_tpu.codes import create_generalized_bicycle_codes
    from feedback_gnn_tpu.codes.graph import QuantumGraph
    from feedback_gnn_tpu.decoders import CascadeConfig, init_feedback_gnn
    from feedback_gnn_tpu.parallel import (
        make_mesh,
        make_sharded_eval_step,
        make_sharded_train_step,
        shard_quantum_graph,
    )
    from feedback_gnn_tpu.train import TrainConfig

    assert len(jax.devices()) == LOCAL_DEVICES * NUM_PROCESSES, jax.devices()

    code = create_generalized_bicycle_codes(24, [0, 2, 8, 15], [0, 2, 12, 17])
    graph = QuantumGraph.from_code(code, stage_mode=True)
    params = init_feedback_gnn(jax.random.PRNGKey(3))
    cfg = CascadeConfig(num_iter1=8, num_iter2=4, num_rounds=2, p0=0.05)

    mesh = make_mesh(data=8, edge=1)
    stacked = shard_quantum_graph(graph, 1)
    step = make_sharded_eval_step(mesh, stacked, [params], cfg, local_batch=32)
    flagged, logical = step(jax.random.PRNGKey(42), jnp.float32(0.08))

    tcfg = TrainConfig(num_iter1=8, num_iter2=8, loss_from=4)
    opt = optax.sgd(1.0)
    opt_state = opt.init(params)
    tstep = make_sharded_train_step(mesh, stacked, tcfg, opt, local_batch=4)
    n, b = graph.n, 32
    rng = np.random.default_rng(7)  # identical on every process
    noise_x = rng.binomial(1, 0.06, (n, b)).astype(np.float32)
    noise_z = rng.binomial(1, 0.06, (n, b)).astype(np.float32)
    new_params, _, loss, fb, bl = tstep(params, opt_state, noise_x, noise_z)

    checksum = float(
        sum(float(jnp.sum(jnp.abs(leaf))) for leaf in jax.tree.leaves(new_params))
    )
    print(
        "DCN_RESULT "
        + json.dumps(
            {
                "tag": tag,
                "flagged": int(flagged),
                "logical": int(logical),
                "loss": float(loss),
                "flagged_bler": float(fb),
                "bler": float(bl),
                "param_checksum": checksum,
            }
        ),
        flush=True,
    )


def worker(args):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from feedback_gnn_tpu.parallel import init_distributed

    init_distributed(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    assert jax.process_count() == args.num_processes, jax.process_count()
    assert len(jax.local_devices()) == LOCAL_DEVICES
    run_payload(f"dist_p{args.process_id}")


def reference(_args):
    import jax

    jax.config.update("jax_platforms", "cpu")
    run_payload("single")


def _parse_result(out: str) -> dict:
    for line in out.splitlines():
        if line.startswith("DCN_RESULT "):
            return json.loads(line[len("DCN_RESULT "):])
    raise AssertionError(f"no DCN_RESULT line in output:\n{out}")


def launcher() -> int:
    me = os.path.abspath(__file__)

    # reference: one process, 8 local devices
    ref_proc = subprocess.run(
        [sys.executable, me, "--role", "reference"],
        env=_child_env(LOCAL_DEVICES * NUM_PROCESSES),
        capture_output=True, text=True, timeout=900,
    )
    if ref_proc.returncode != 0:
        print(ref_proc.stdout + ref_proc.stderr, file=sys.stderr)
        print("FAIL: reference run crashed")
        return 1
    ref = _parse_result(ref_proc.stdout)

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    procs = [
        subprocess.Popen(
            [sys.executable, me, "--role", "worker", "--process-id", str(i),
             "--num-processes", str(NUM_PROCESSES), "--coordinator", coord],
            env=_child_env(LOCAL_DEVICES),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(NUM_PROCESSES)
    ]
    outs = []
    ok = True
    for i, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            ok = False
        outs.append(out)
        if p.returncode != 0:
            ok = False
    if not ok:
        for i, out in enumerate(outs):
            print(f"--- worker {i} ---\n{out}", file=sys.stderr)
        print("FAIL: distributed run crashed/hung")
        return 1

    dist = [_parse_result(out) for out in outs]
    failures = []
    for d in dist:
        for k in ("flagged", "logical"):
            if d[k] != ref[k]:
                failures.append(f"{d['tag']}.{k}: {d[k]} != {ref[k]}")
        for k, tol in (("loss", 1e-5), ("flagged_bler", 1e-6), ("bler", 1e-6),
                       ("param_checksum", 1e-4)):
            if abs(d[k] - ref[k]) > tol * max(1.0, abs(ref[k])):
                failures.append(f"{d['tag']}.{k}: {d[k]} vs {ref[k]}")

    print(f"reference   : {ref}")
    for d in dist:
        print(f"distributed : {d}")
    if failures:
        print("FAIL:\n  " + "\n  ".join(failures))
        return 1
    print(f"PASS: {NUM_PROCESSES}-process DCN run matches the single-process "
          "8-device run (eval counts exact, train loss/params to f32 tol)")
    return 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--role", default="launcher",
                    choices=["launcher", "worker", "reference"])
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--num-processes", type=int, default=NUM_PROCESSES)
    ap.add_argument("--coordinator", default=None)
    args = ap.parse_args()
    if args.role == "worker":
        worker(args)
    elif args.role == "reference":
        reference(args)
    else:
        sys.exit(launcher())


if __name__ == "__main__":
    main()
