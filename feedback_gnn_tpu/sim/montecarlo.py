"""Monte-Carlo logical-error-rate harness.

Host-side driver with the accounting and stopping semantics of the
reference's ``sim_ber`` in qldpc mode (/root/reference/sionna/utils/misc.py:
403-768):

* per p-point: run batches until ``num_target_block_errors`` logical errors
  or ``max_mc_iter`` batches (status codes: max-iter / early-stop /
  target-reached);
* flagged errors (any unsatisfied check) are tracked alongside logical
  errors — ``(flagged_rate, ler)`` is returned, mirroring the reference's
  (ber, bler) pair;
* ``early_stop`` ends the sweep after the first error-free point;
* KeyboardInterrupt returns partial results (remaining points -1);
* live fixed-width progress table.

TPU-native upgrades over the reference:

* the model step returns two scalar counts — not [B, checks] tensors — so
  host<->device traffic per batch is ~8 bytes;
* deterministic PRNG key folding per (point, iteration) makes any batch
  reproducible in isolation and gives independent streams across hosts/chips
  (fold in ``jax.process_index()``);
* MC state (counts per point) is a tiny pytree checkpointed to JSON so an
  interrupted sweep resumes where it stopped (the reference loses the
  p-point, SURVEY.md §5).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

import jax
import numpy as np

__all__ = ["SimResult", "sim_ler"]


@dataclass
class SimResult:
    ps: np.ndarray
    flagged_rate: np.ndarray  # "ber" column of the reference
    ler: np.ndarray  # logical (block) error rate, "bler"
    flagged_errors: np.ndarray
    logical_errors: np.ndarray
    num_blocks: np.ndarray
    runtime: np.ndarray
    status: np.ndarray  # 0 not simulated, 1 max-iter, 2 early-stop, 4 target reached
    throughput: np.ndarray = field(default=None)  # blocks/s per point
    overflow: np.ndarray = field(default=None)  # compaction overflows per point

    def summary(self) -> str:
        status_txt = {
            0: "not simulated",
            1: "reached max iter",
            2: "no errors - early stop",
            4: "reached target block errors",
        }
        lines = [
            f"{'p':>8} | {'flagged':>10} | {'LER':>10} | {'log errs':>9} | "
            f"{'blocks':>12} | {'runtime[s]':>10} | {'blk/s':>9} | status"
        ]
        for i in range(len(self.ps)):
            lines.append(
                f"{self.ps[i]:>8.4g} | {self.flagged_rate[i]:>10.4g} | "
                f"{self.ler[i]:>10.4g} | {self.logical_errors[i]:>9d} | "
                f"{self.num_blocks[i]:>12d} | {self.runtime[i]:>10.1f} | "
                f"{self.throughput[i]:>9.3g} | {status_txt.get(int(self.status[i]), '?')}"
            )
        return "\n".join(lines)


def sim_ler(
    step_fn,
    ps,
    batch_size: int,
    max_mc_iter: int,
    num_target_block_errors: int | None = 100,
    early_stop: bool = True,
    seed: int = 0,
    verbose: bool = True,
    checkpoint_path: str | None = None,
    checkpoint_every_s: float = 60.0,
    write_checkpoint: bool = True,
    fold_process_key: bool = True,
) -> SimResult:
    """Simulate each p in ``ps`` until the stop condition.

    ``step_fn(key, p) -> (flagged_count, logical_count)`` must be a jitted
    callable returning int32 scalars for one batch of ``batch_size`` samples
    (see ``decoders.cascade.sandwich_eval_step``).  An optional third scalar
    is the compaction-overflow count (``return_overflow=True``); any nonzero
    total is reported loudly, since overflowed samples are counted flagged
    with their pre-compaction estimate (pessimistic, never optimistic).

    Multi-process (``jax.distributed``) runs over a GLOBAL mesh must pass
    the same ``checkpoint_path`` to EVERY process (counts are psum-ed inside
    the step, so the restored state is identical everywhere and every
    process takes the same stop decision) with ``write_checkpoint`` True on
    process 0 only, and ``fold_process_key=False`` — the jitted step's key
    is a replicated input and per-shard stream diversity already comes from
    ``fold_in(axis_index)`` inside the step.  ``fold_process_key=True`` is
    for *independent* per-process sweeps (no shared mesh).
    """
    ps = np.asarray(ps, np.float64)
    npts = len(ps)
    state = {
        "flagged": np.zeros(npts, np.int64),
        "logical": np.zeros(npts, np.int64),
        "blocks": np.zeros(npts, np.int64),
        "iters": np.zeros(npts, np.int64),
        "runtime": np.zeros(npts, np.float64),
        "status": np.zeros(npts, np.int64),
        "overflow": np.zeros(npts, np.int64),
    }
    if checkpoint_path and os.path.exists(checkpoint_path):
        with open(checkpoint_path) as f:
            saved = json.load(f)
        if saved.get("ps") == list(ps) and saved.get("batch_size") == batch_size:
            for k in state:
                if k in saved:  # tolerate checkpoints from older versions
                    state[k] = np.asarray(saved[k], dtype=state[k].dtype)
            if verbose:
                print(f"resumed MC state from {checkpoint_path}")

    base_key = jax.random.PRNGKey(seed)
    if fold_process_key:
        base_key = jax.random.fold_in(base_key, jax.process_index())
    last_ckpt = time.perf_counter()

    def save_ckpt():
        if not checkpoint_path or not write_checkpoint:
            return
        payload = {k: v.tolist() for k, v in state.items()}
        payload["ps"] = list(ps)
        payload["batch_size"] = batch_size
        tmp = checkpoint_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(payload, f)
        os.replace(tmp, checkpoint_path)

    header = (
        f"{'p':>8} | {'flagged':>10} | {'LER':>10} | {'log errs':>9} | "
        f"{'blocks':>12} | {'runtime[s]':>10}"
    )
    if verbose:
        print(header)
        print("-" * len(header))

    try:
        for i in range(npts):
            if state["status"][i] != 0:
                continue  # restored, already finished
            point_key = jax.random.fold_in(base_key, i)
            t0 = time.perf_counter() - state["runtime"][i]
            for it in range(int(state["iters"][i]), int(max_mc_iter)):
                key = jax.random.fold_in(point_key, it)
                out = step_fn(key, ps[i])
                flagged, logical = out[0], out[1]
                if len(out) > 2:
                    state["overflow"][i] += int(out[2])
                state["flagged"][i] += int(flagged)
                state["logical"][i] += int(logical)
                state["blocks"][i] += batch_size
                state["iters"][i] = it + 1
                state["runtime"][i] = time.perf_counter() - t0

                if verbose:
                    print(
                        f"\r{ps[i]:>8.4g} | "
                        f"{state['flagged'][i] / state['blocks'][i]:>10.4g} | "
                        f"{state['logical'][i] / state['blocks'][i]:>10.4g} | "
                        f"{state['logical'][i]:>9d} | {state['blocks'][i]:>12d} | "
                        f"{state['runtime'][i]:>10.1f}",
                        end="",
                        flush=True,
                    )
                if checkpoint_path and time.perf_counter() - last_ckpt > checkpoint_every_s:
                    save_ckpt()
                    last_ckpt = time.perf_counter()

                if (
                    num_target_block_errors is not None
                    and state["logical"][i] >= num_target_block_errors
                ):
                    state["status"][i] = 4
                    break
            else:
                state["status"][i] = 1
            if verbose:
                print()
            if state["overflow"][i] and verbose:
                print(
                    f"WARNING: {state['overflow'][i]} compaction-capacity "
                    f"overflows at p={ps[i]:.4g} — results are pessimistic; "
                    "raise --compact/--rounds-cap or disable compaction"
                )
            if early_stop and state["logical"][i] == 0:
                state["status"][i] = 2
                if verbose:
                    print(f"\nsimulation stopped: no errors at p={ps[i]:.4g}\n")
                break
    except KeyboardInterrupt:
        if verbose:
            print("\nsimulation interrupted — returning partial results")
    finally:
        save_ckpt()

    blocks = np.maximum(state["blocks"], 1)
    return SimResult(
        ps=ps,
        flagged_rate=state["flagged"] / blocks,
        ler=state["logical"] / blocks,
        flagged_errors=state["flagged"],
        logical_errors=state["logical"],
        num_blocks=state["blocks"],
        runtime=state["runtime"],
        status=state["status"],
        throughput=state["blocks"] / np.maximum(state["runtime"], 1e-9),
        overflow=state["overflow"],
    )
