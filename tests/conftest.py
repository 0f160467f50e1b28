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

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
