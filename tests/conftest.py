"""Test configuration: run JAX on a virtual 8-device CPU mesh with x64.

Must set env vars before jax is imported anywhere (SURVEY.md section 4:
multi-host behavior is tested by faking devices with
--xla_force_host_platform_device_count).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override the session's axon default
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_ENABLE_X64"] = "1"

# something in the environment imports jax before conftest runs (pytest's
# import chain), so the env vars alone are not enough; override via the
# config API too - the backend has not been initialized yet at this point.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(20260817)
