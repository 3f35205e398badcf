"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the XLA flags before jax initializes its backends, hence the
environment mutation at import time (pytest imports conftest before any test
module imports jax).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# Force CPU for unit tests (the session presets JAX_PLATFORMS to the TPU
# platform; tests need determinism + the 8-device virtual mesh). The env var
# alone is not honored once the TPU plugin is registered, so set the config
# explicitly too. Set SKY_TEST_PLATFORM to override (e.g. run on real TPU).
_platform = os.environ.get("SKY_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform

import jax  # noqa: E402

jax.config.update("jax_platforms", _platform)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
