"""Test configuration: force an 8-device virtual CPU platform.

Note: this environment's sitecustomize registers a remote-TPU ("axon") PJRT
backend and forces ``jax_platforms="axon,cpu"`` via jax.config at interpreter
start — the JAX_PLATFORMS env var alone does NOT win.  We override the config
again here before any backend is initialised, so the test suite runs entirely
on the virtual 8-device CPU mesh (the single real TPU chip is reserved for
bench.py, one process at a time)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def small_code():
    """A small CSS code (surface code, n=13) — fast to build, irregular
    degrees (exercises padding)."""
    from feedback_gnn_tpu.codes import create_surface_codes

    return create_surface_codes(3)


@pytest.fixture(scope="session")
def ghp882():
    """The [[882,24]] paper code — biregular (3,6); ~seconds to build."""
    from feedback_gnn_tpu.codes import ghp_882_24

    return ghp_882_24()
