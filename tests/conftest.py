"""Test harness: run everything on CPU with 8 virtual devices.

This is the standard JAX trick for testing multi-chip sharding without a
pod (SURVEY.md section 4): env vars must be set before jax initializes.
"""

import os

# The environment pre-registers an 'axon' TPU backend via sitecustomize and
# forces jax_platforms to it; tests must run on local CPU devices, so
# override both the env var and (after import) the live config.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu", "tests must run on CPU devices"
assert len(jax.devices()) == 8, "conftest expects 8 virtual CPU devices"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
