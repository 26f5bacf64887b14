"""Test configuration: run everything on a virtual 8-device CPU mesh
with x64 enabled, per SURVEY.md section 4 (TPU translation of the
reference's CI strategy: numerics validated on CPU in double precision,
multi-chip logic on xla_force_host_platform_device_count devices)."""

import os

# Request 8 virtual CPU devices before the CPU client initializes.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's sitecustomize registers a remote-TPU ("axon") PJRT
# plugin at interpreter startup and forces jax_platforms="axon,cpu",
# overriding the JAX_PLATFORMS env var.  Select the local CPU via the
# config instead (works because backends are created lazily).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_INPUT = "/root/reference/test_input"


@pytest.fixture
def ref_input_dir():
    return REFERENCE_INPUT


def pytest_configure(config):
    np.random.seed(0)
