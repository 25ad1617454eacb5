"""Test config: force the CPU backend with 8 virtual devices.

Tests never touch the real TPU: sharding tests run on the standard JAX
fake-backend pattern (xla_force_host_platform_device_count). The axon
sitecustomize hook force-sets jax_platforms='axon,cpu' at interpreter start,
so we both set the env vars and re-update the config after import.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def pytest_configure(config):
    assert jax.default_backend() == "cpu", f"tests must run on cpu, got {jax.default_backend()}"
    assert jax.device_count() == 8, f"expected 8 virtual devices, got {jax.device_count()}"
