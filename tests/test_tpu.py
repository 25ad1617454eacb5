"""On-device (TPU) validation of the Pallas path — SKIPPED on CPU backends.

The regular suite runs the kernels in interpret mode on CPU; this file checks
the compiled Mosaic path against the jnp oracle on real hardware. Run with a
TPU visible:  python -m pytest tests/test_tpu.py -q

Note: tests/conftest.py forces the CPU backend for the rest of the suite, so
these tests self-skip there; run this file in a separate process with
JAX_PLATFORMS unset (or via out/tpu_worker.py) to exercise the device.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="requires a TPU backend")


@pytest.fixture(scope="module")
def warm_tunnel():
    # First device->host transfer can take minutes on tunneled backends.
    np.asarray(jnp.ones((8, 128)))


def test_step_pallas_matches_jnp_on_device(warm_tunnel):
    from tpufluid import FluidConfig, init_state
    from tpufluid.step import fluid_step
    from tpufluid.trace import swirl_trace

    cfg = FluidConfig(SIM_RESOLUTION=256, DYE_RESOLUTION=256, CANVAS_WIDTH=256,
                      CANVAS_HEIGHT=256, MAX_SPLATS=8).validate()
    cfg_np = FluidConfig(**{**cfg.__dict__, "USE_PALLAS": False})
    tr = swirl_trace(cfg, 1, seed=42)
    dt = jnp.float32(1 / 60)
    s0 = init_state(cfg)
    sp = jnp.asarray(tr.batches[0])
    a = jax.jit(lambda s, d, b: fluid_step(s, d, b, cfg))(s0, dt, sp)
    b = jax.jit(lambda s, d, b: fluid_step(s, d, b, cfg_np))(s0, dt, sp)
    vel_scale = max(float(jnp.abs(b.velocity).max()), 1.0)
    assert float(jnp.abs(a.velocity - b.velocity).max()) < 1e-4 * vel_scale
    assert float(jnp.abs(a.dye - b.dye).max()) < 1e-3


def test_ragged_demo_config_on_device(warm_tunnel):
    from tpufluid import FluidConfig, init_state
    from tpufluid.step import fluid_step
    from tpufluid.trace import swirl_trace

    cfg = FluidConfig(SIM_RESOLUTION=64, DYE_RESOLUTION=128, CANVAS_WIDTH=320,
                      CANVAS_HEIGHT=180, MAX_SPLATS=8).validate()
    cfg_np = FluidConfig(**{**cfg.__dict__, "USE_PALLAS": False})
    tr = swirl_trace(cfg, 1, seed=1)
    dt = jnp.float32(1 / 60)
    s0 = init_state(cfg)
    sp = jnp.asarray(tr.batches[0])
    a = jax.jit(lambda s, d, b: fluid_step(s, d, b, cfg))(s0, dt, sp)
    b = jax.jit(lambda s, d, b: fluid_step(s, d, b, cfg_np))(s0, dt, sp)
    assert float(jnp.abs(a.dye - b.dye).max()) < 1e-3


def test_scan_throughput_smoke(warm_tunnel):
    """The benchmark execution mode stays finite and makes progress."""
    from tpufluid import FluidConfig, init_state
    from tpufluid.step import make_multi_step
    from tpufluid.trace import swirl_trace

    cfg = FluidConfig(SIM_RESOLUTION=256, DYE_RESOLUTION=256, CANVAS_WIDTH=256,
                      CANVAS_HEIGHT=256, MAX_SPLATS=8).validate()
    tr = swirl_trace(cfg, 50, seed=2)
    multi = make_multi_step(cfg)
    s = multi(init_state(cfg), jnp.float32(1 / 60), jnp.asarray(tr.batches))
    checksum = float(jnp.sum(jnp.abs(s.velocity.astype(jnp.float32))))
    assert np.isfinite(checksum) and checksum > 0
