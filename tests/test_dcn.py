"""Multi-host (DCN) smoke test: run scripts/dcn_smoke.py, which spawns two
`jax.distributed` CPU processes (4 virtual devices each) forming one
8-device global mesh, executes a sharded eval step and a sharded train step,
and compares against a single-process 8-device run.  See the script's
docstring; the north-star multi-host requirement is SURVEY.md §2.3 [NEW]."""

import os
import subprocess
import sys

import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


@pytest.mark.slow
def test_dcn_two_process_smoke():
    env = dict(os.environ)
    # the launcher sets JAX_PLATFORMS/XLA_FLAGS itself for every child;
    # drop the test process's own 8-device flags so they don't conflict
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "dcn_smoke.py")],
        capture_output=True, text=True, timeout=1800, env=env,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "PASS" in proc.stdout, proc.stdout
