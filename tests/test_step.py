"""Integration tests of the jitted step: determinism, stability, warm start,
multi-step scan equivalence (SURVEY.md §4.2, §4.4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.quick  # fast verification subset (CLAUDE.md)

from tpufluid import FluidConfig, init_state, make_step
from tpufluid.step import fluid_step, make_multi_step
from tpufluid.trace import swirl_trace

CFG = FluidConfig(SIM_RESOLUTION=48, DYE_RESOLUTION=96, CANVAS_WIDTH=192,
                  CANVAS_HEIGHT=128, MAX_SPLATS=4, USE_PALLAS=False).validate()
DT = np.float32(1 / 60)


def _run(n_steps, cfg=CFG, seed=3):
    trace = swirl_trace(cfg, n_steps, seed=seed)
    step = jax.jit(lambda s, dt, sp: fluid_step(s, dt, sp, cfg))
    s = init_state(cfg)
    for t in range(n_steps):
        s = step(s, DT, jnp.asarray(trace.batches[t]))
    return jax.block_until_ready(s)


def test_determinism_bit_identical():
    a = _run(30)
    b = _run(30)
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_donated_step_matches_undonated():
    cfg = CFG
    trace = swirl_trace(cfg, 20)
    donated = make_step(cfg)
    plain = jax.jit(lambda s, dt, sp: fluid_step(s, dt, sp, cfg))
    s1 = init_state(cfg)
    s2 = init_state(cfg)
    for t in range(20):
        sp = jnp.asarray(trace.batches[t])
        s1 = donated(s1, DT, sp)
        s2 = plain(s2, DT, sp)
    np.testing.assert_array_equal(np.asarray(s1.dye), np.asarray(s2.dye))
    np.testing.assert_array_equal(np.asarray(s1.velocity), np.asarray(s2.velocity))


def test_multi_step_scan_matches_loop():
    """scan-of-steps == loop-of-jitted-steps up to fp reassociation.

    The two compile to different fusions, so results differ at the ulp level;
    the advection gather then amplifies ulps chaotically over long horizons.
    Compare a short horizon against the field scale.
    """
    cfg = CFG
    n = 3
    trace = swirl_trace(cfg, n, seed=3)
    multi = make_multi_step(cfg)
    s_scan = multi(init_state(cfg), DT, jnp.asarray(trace.batches))
    s_loop = _run(n, seed=3)
    vel_scale = float(jnp.abs(s_loop.velocity).max())
    dye_scale = float(jnp.abs(s_loop.dye).max())
    assert float(jnp.abs(s_scan.velocity - s_loop.velocity).max()) < 1e-3 * vel_scale
    assert float(jnp.abs(s_scan.dye - s_loop.dye).max()) < 1e-3 * dye_scale


def test_long_run_stays_bounded_and_finite():
    """The demo's stability property: velocity bounded (clamp at 1000 +
    projection + dissipation), no NaN/Inf over a long horizon."""
    s = _run(150)
    v = np.asarray(s.velocity)
    d = np.asarray(s.dye)
    assert np.isfinite(v).all() and np.isfinite(d).all()
    assert np.abs(v).max() <= 1000.0
    assert d.min() >= 0.0


def test_energy_decays_without_input():
    """With no splats and VELOCITY_DISSIPATION > 0, kinetic energy decays."""
    cfg = CFG
    s = _run(20)
    step = make_step(cfg)
    none = jnp.zeros((cfg.MAX_SPLATS, 8), jnp.float32)
    e0 = float(jnp.sum(s.velocity.astype(jnp.float32) ** 2))
    for _ in range(30):
        s = step(s, DT, none)
    e1 = float(jnp.sum(s.velocity.astype(jnp.float32) ** 2))
    assert e1 < e0


def test_dye_decays_without_input():
    """DENSITY_DISSIPATION=1: dye mass shrinks by ~1/(1+dt) per step."""
    cfg = CFG
    s = _run(20)
    step = make_step(cfg)
    none = jnp.zeros((cfg.MAX_SPLATS, 8), jnp.float32)
    m0 = float(jnp.sum(s.dye.astype(jnp.float32)))
    for _ in range(60):
        s = step(s, DT, none)
    m1 = float(jnp.sum(s.dye.astype(jnp.float32)))
    assert m1 < m0 * 0.75


def test_pressure_warm_start():
    """pressure enters the Jacobi solve scaled by cfg.PRESSURE (script.js:1253-1257):
    with 0 iterations configured, out = warm-started field untouched by sweeps."""
    cfg = FluidConfig(SIM_RESOLUTION=16, DYE_RESOLUTION=16, CANVAS_WIDTH=16,
                      CANVAS_HEIGHT=16, PRESSURE_ITERATIONS=0, MAX_SPLATS=4,
                      CURL=0.0, USE_PALLAS=False).validate()
    s = init_state(cfg)
    s.pressure = jnp.ones_like(s.pressure) * 2.0
    out = jax.jit(lambda st, dt, sp: fluid_step(st, dt, sp, cfg))(
        s, DT, jnp.zeros((4, 8), jnp.float32))
    np.testing.assert_allclose(np.asarray(out.pressure), 2.0 * cfg.PRESSURE, rtol=1e-6)


@pytest.mark.parametrize("dtype16", ["bfloat16", "float16"])
def test_16bit_state_runs(dtype16):
    """Both 16-bit storage modes: bfloat16 (performance) and IEEE float16
    (the reference's exact half-float texture format, script.js:145-153)."""
    cfg = FluidConfig(SIM_RESOLUTION=32, DYE_RESOLUTION=64, DTYPE=dtype16,
                      MAX_SPLATS=4, USE_PALLAS=False).validate()
    trace = swirl_trace(cfg, 10)
    step = make_step(cfg)
    s = init_state(cfg)
    assert s.velocity.dtype == jnp.dtype(dtype16)
    for t in range(10):
        s = step(s, DT, jnp.asarray(trace.batches[t]))
    assert s.dye.dtype == jnp.dtype(dtype16)
    assert np.isfinite(np.asarray(s.dye, dtype=np.float32)).all()


def test_dye_rgb9e5_step():
    """config.DYE_RGB9E5 (bf16-only packed-dye gather storage, ops/quant.py):
    the step runs, stays finite, keeps the dye dtype, and its dye error
    against the float32 truth stays in the SAME noise class as plain bf16
    (it is usually lower: the quant path samples with f32 coordinates, and
    the 9-bit shared-exponent mantissas beat bf16's 8 bits for in-range
    channels). NOTE the two bf16 variants are NOT directly comparable to
    each other — the plain jnp bf16 path casts sampling coordinates to
    bf16 (~0.25-texel position noise), the quant path keeps them f32."""
    def mk(d, q=False):
        return FluidConfig(SIM_RESOLUTION=32, DYE_RESOLUTION=64, DTYPE=d,
                           MAX_SPLATS=4, USE_PALLAS=False,
                           DYE_RGB9E5=q).validate()

    trace = swirl_trace(mk("float32"), 2)

    def run(cfg):
        s = init_state(cfg)
        step = make_step(cfg)
        for t in range(2):
            s = step(s, DT, jnp.asarray(trace.batches[t]))
        return s

    d32 = np.asarray(run(mk("float32")).dye, np.float32)
    scale = max(float(d32.max()), 1e-6)
    sq = run(mk("bfloat16", True))
    assert sq.dye.dtype == jnp.bfloat16
    dq = np.asarray(sq.dye, np.float32)
    assert np.isfinite(dq).all()
    dp = np.asarray(run(mk("bfloat16")).dye, np.float32)
    eq = float(np.abs(dq - d32).mean()) / scale
    ep = float(np.abs(dp - d32).mean()) / scale
    assert 0 < eq < 1.5 * ep + 2.0 ** -9, (eq, ep)


def test_float16_more_faithful_than_bfloat16():
    """The fidelity ordering that justifies offering BOTH 16-bit modes:
    IEEE float16 (11 mantissa bits — the reference's actual RGBA16F storage)
    lands measurably closer to the f32 truth than bfloat16 (8 bits) on a
    single step, before chaotic amplification swamps rounding. (Measured
    here with f32 sampling coordinates: ~0.24% vs ~2.1% single-step
    velocity error.)"""
    mk = lambda d: FluidConfig(SIM_RESOLUTION=32, DYE_RESOLUTION=64,
                               DTYPE=d, MAX_SPLATS=4,
                               USE_PALLAS=False).validate()
    trace = swirl_trace(mk("float32"), 1)
    outs = {}
    for d in ("float16", "bfloat16", "float32"):
        cfg = mk(d)
        s = make_step(cfg)(init_state(cfg), DT, jnp.asarray(trace.batches[0]))
        outs[d] = np.asarray(s.velocity, np.float32)
    v32 = outs["float32"]
    scale = max(float(np.abs(v32).max()), 1.0)
    err16 = float(np.abs(outs["float16"] - v32).max()) / scale
    errbf = float(np.abs(outs["bfloat16"] - v32).max()) / scale
    assert err16 < 0.03, err16
    assert err16 < 0.5 * errbf, (err16, errbf)


def test_dt_clamp_literal():
    """The reference clamps dt at the LITERAL 0.016666 (script.js:1191), not
    1/60 = 0.0166667: a dt between the two must clamp, and the clamped step
    must equal a step at exactly 0.016666 bit-for-bit."""
    from tpufluid.config import MAX_DT

    assert MAX_DT == 0.016666  # the reference's literal
    assert MAX_DT < 1.0 / 60.0
    trace = swirl_trace(CFG, 1)
    sp = jnp.asarray(trace.batches[0])
    step = make_step(CFG)
    between = 0.0166665  # 0.016666 < between < 1/60: must clamp
    assert MAX_DT < between < 1.0 / 60.0
    s_at = step(init_state(CFG), jnp.float32(MAX_DT), sp)
    s_between = step(init_state(CFG), jnp.float32(between), sp)
    s_sixtieth = step(init_state(CFG), jnp.float32(1.0 / 60.0), sp)
    for a, b in ((s_between, s_at), (s_sixtieth, s_at)):
        np.testing.assert_array_equal(np.asarray(a.velocity), np.asarray(b.velocity))
        np.testing.assert_array_equal(np.asarray(a.dye), np.asarray(b.dye))
    # Below the clamp: dt passes through (different dt => different field).
    s_small = step(init_state(CFG), jnp.float32(0.016), sp)
    assert np.abs(np.asarray(s_small.velocity, np.float32)
                  - np.asarray(s_at.velocity, np.float32)).max() > 0


def test_dt_clamp_constants_in_sync():
    """server.py / serve_batch.py keep jax-free module-level copies of the
    clamp; they must equal config.MAX_DT (and trace recording must clamp)."""
    from tpufluid import serve_batch, server
    from tpufluid.config import MAX_DT
    from tpufluid.trace import Trace

    assert server.MAX_DT == MAX_DT
    assert serve_batch.MAX_DT == MAX_DT
    tr = Trace(np.zeros((3, 2, 8), np.float32), [0.01, 1.0 / 60.0, 0.1])
    np.testing.assert_allclose(tr.dts, [0.01, MAX_DT, MAX_DT])
