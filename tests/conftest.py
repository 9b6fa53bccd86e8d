"""Test configuration: force an 8-device virtual CPU platform so sharding
tests run without TPU hardware, before jax is imported anywhere."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

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
