"""Test configuration: force CPU with 8 virtual devices for sharding tests.

Multi-chip hardware is not available in CI; all sharding/collective paths
are validated on a virtual 8-device CPU mesh.  Must run before jax imports.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The env var alone can be overridden by site TPU plugins; the config update
# is authoritative (must happen before the backend is initialized).
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def tiny_model():
    from avatar_tpu.testing import synthetic_model

    return synthetic_model(detail=1)


@pytest.fixture()
def rng():
    # function-scoped: a shared session rng makes test inputs depend on
    # execution order (observed flake in test_exp_log_roundtrip)
    return np.random.default_rng(42)
