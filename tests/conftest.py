"""Test configuration: force an 8-device virtual CPU mesh so sharding tests run
without TPU hardware.

Note: this environment preloads jax with JAX_PLATFORMS=axon via sitecustomize,
so plain env vars are too late -- use jax.config.update before any backend is
initialized.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: the heavy grad programs (test_train's sharded
# tiny-model steps) take minutes to compile on this 1-core CPU host; cached
# executables load in seconds on every later suite run
from scenerf_tpu.utils.jax_setup import setup_compilation_cache  # noqa: E402

setup_compilation_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
