"""Test harness: force the CPU backend with 8 virtual devices so multi-chip
sharding is exercised without TPU hardware (SURVEY.md §4 test plan, item d).

Must run before any JAX backend initialization; the axon sitecustomize
registers a TPU backend at interpreter start, but platform selection is still
configurable until first use.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import pytest


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(42)
