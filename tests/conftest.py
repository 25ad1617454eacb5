"""Test config: force the CPU backend with 8 virtual devices.

Tests never touch the real TPU: sharding tests run on the standard JAX
fake-backend pattern (xla_force_host_platform_device_count). The axon
sitecustomize hook force-sets jax_platforms='axon,cpu' at interpreter start,
so we both set the env vars and re-update the config after import.
"""

import os

# tests/test_tpu.py is the one file meant to run on the real device: invoke it
# standalone with TPUFLUID_DEVICE=tpu. Everything else runs on 8 virtual CPU
# devices (explicit env var, not argv sniffing, so -k filters / other cwds
# can't accidentally pick the wrong backend).
_TPU_RUN = os.environ.get("TPUFLUID_DEVICE", "").lower() == "tpu"

if not _TPU_RUN:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax

if not _TPU_RUN:
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
    # "quick": the fast verification subset — ops/step/golden/render oracle
    # paths in ~2-3 min on this 1-CPU host (round-4 verdict #9: keeps
    # suite-green claims independently checkable as the suite grows).
    # Run with:  python -m pytest tests/ -m quick -q
    config.addinivalue_line(
        "markers", "quick: fast verification subset (ops/step/golden/render)")
    # tests/test_tpu.py deliberately runs on the device (invoked standalone
    # in a process where jax already initialized the TPU backend).
    if _TPU_RUN:
        return
    assert jax.default_backend() == "cpu", f"tests must run on cpu, got {jax.default_backend()}"
    assert jax.device_count() == 8, f"expected 8 virtual devices, got {jax.device_count()}"
