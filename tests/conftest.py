"""Test configuration: force an 8-device virtual CPU platform BEFORE jax
import so DP/TP mesh tests run without TPU hardware (SURVEY.md §4)."""

import os

# Force-override: the shell environment may pin JAX_PLATFORMS to the real
# TPU tunnel; unit tests always run on the virtual 8-device CPU platform.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# jax may already be imported by a site hook (TPU tunnel plugin) before this
# conftest runs, in which case the env var above is read too late — override
# through the live config as well.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Parity mode for unit tests: this JAX build defaults matmuls to bf16-style
# passes (TPU MXU emulation) even on CPU; oracle comparisons need full f32.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng_np():
    return np.random.RandomState(1234)
