"""Lane-packed fleet serving mode (tpufluid/batch_packed.py).

The packed layout holds B independent sims side by side in LANES —
(C, H, B*W) — with per-sim walls inside the kernels (sim_w plumbing).
Exactness contract, pinned here in interpret mode:

* pack/unpack are exact inverses;
* the off-TPU fallback (unpack -> vmap(fluid_step) -> pack) is BIT-exact
  vs the vmapped batched step;
* packed Jacobi / fused stencil / gradient-subtract are BIT-exact per sim
  vs the single-sim kernels;
* packed advection carries the established coordinate-rounding class
  (window-base fp differences — the same family that separates the
  windowed single-sim gather from the jnp oracle): tiny relative
  deviations on smooth fields, occasional knife-edge bilinear floor
  flips on noise fields. Device certification: out/jobs/done/p02*.
"""

from functools import partial
from unittest import mock

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import tpufluid.ops.pallas.advect as pa
import tpufluid.ops.pallas.jacobi as pj
import tpufluid.ops.pallas.stencil as ps
import tpufluid.ops.pallas.dispatch as D
from tpufluid import batch_packed as bp
from tpufluid.config import FluidConfig
from tpufluid.state import FluidState
from tpufluid.step import fluid_step


def _interp():
    """Interpret-mode pallas_call (pj/ps/pa share the pl module — patch once)."""
    orig = pj.pl.pallas_call
    return mock.patch.object(pj.pl, "pallas_call",
                             lambda *a, **k: orig(*a, interpret=True, **k))


def _cfg(r=96, dtype="float32", iters=8):
    return FluidConfig(SIM_RESOLUTION=r, DYE_RESOLUTION=r, CANVAS_WIDTH=r,
                       CANVAS_HEIGHT=r, PRESSURE_ITERATIONS=iters,
                       MAX_SPLATS=4, DTYPE=dtype).validate()


def _smooth_state(b, h, w, dtype, rng):
    """Smooth per-sim fields (superposed low-frequency modes): knife-edge
    bilinear floor flips then cost ~local-contrast, which is tiny."""
    yy, xx = np.meshgrid(np.linspace(0, 2 * np.pi, h),
                         np.linspace(0, 2 * np.pi, w), indexing="ij")

    def field(c, scale):
        out = np.zeros((b, c, h, w), np.float32)
        for i in range(b):
            for j in range(c):
                ph = rng.uniform(0, 2 * np.pi, size=4)
                out[i, j] = scale * (np.sin(yy + ph[0]) * np.cos(xx + ph[1])
                                     + 0.5 * np.sin(2 * xx + ph[2])
                                     * np.cos(yy + ph[3]))
        return jnp.asarray(out).astype(dtype)

    return FluidState(velocity=field(2, 300.0),
                      dye=(field(3, 0.4) + 0.5).astype(dtype),
                      pressure=field(1, 1.0)[:, 0])


def _splats(b, rng):
    s = np.zeros((b, 4, 8), np.float32)
    for i in range(b):
        s[i, 0] = [0.3 + 0.05 * i, 0.6, 80, -40, 0.3, 0.2, 0.1, 1.0]
        s[i, 1] = [0.7, 0.2 + 0.05 * i, -60, 90, 0.0, 0.4, 0.2, 1.0]
    return jnp.asarray(s)


def test_pack_unpack_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((3, 2, 16, 24)), jnp.float32)
    pk = bp.pack_fleet(x)
    assert pk.shape == (2, 16, 72)
    # lane layout: packed column b*W + x holds sim b's column x
    np.testing.assert_array_equal(np.asarray(pk[:, :, 24:48]),
                                  np.asarray(x[1]))
    np.testing.assert_array_equal(np.asarray(bp.unpack_fleet(pk, 3)),
                                  np.asarray(x))


def test_supported_gate():
    assert bp.packed_supported(_cfg(96), 4)          # f32 96^2 x4 = 384 lanes
    assert bp.packed_supported(_cfg(128, "bfloat16"), 4)
    assert not bp.packed_supported(_cfg(96), 3)      # 288 lanes % 128 != 0
    assert not bp.packed_supported(_cfg(96, "bfloat16"), 4)  # H pads to 128
    assert not bp.packed_supported(_cfg(96, "float16"), 4)   # f16: vmap mode
    cfg = FluidConfig(SIM_RESOLUTION=64, DYE_RESOLUTION=128, CANVAS_WIDTH=128,
                      CANVAS_HEIGHT=128, DTYPE="float32").validate()
    assert not bp.packed_supported(cfg, 4)           # dye grid != sim grid


def test_fallback_is_bit_exact_vs_vmap(rng):
    """Off-TPU (this CPU suite), packed_fluid_step must route to the
    unpack -> vmap -> pack fallback and equal the vmapped step exactly."""
    cfg = _cfg(96)
    b = 4
    st = _smooth_state(b, 96, 96, cfg.dtype, rng)
    spl = _splats(b, rng)
    dt = jnp.float32(0.016)
    got = bp.packed_fluid_step(bp.pack_state(st), dt, spl, cfg, b)
    want = jax.vmap(partial(fluid_step, config=cfg),
                    in_axes=(0, None, 0))(st, dt, spl)
    for name in ("velocity", "dye", "pressure"):
        np.testing.assert_array_equal(
            np.asarray(bp.unpack_fleet(getattr(got, name), b)),
            np.asarray(getattr(want, name)), err_msg=name)


def test_packed_stencil_kernels_bit_exact_per_sim(rng):
    """Jacobi, fused stencil and gradient-subtract with sim_w walls are
    BIT-exact per sim vs the single-sim kernels (the modular masks realize
    the identical wall condition; interior-wall selects cut every
    dependency cone exactly like array-edge ones)."""
    b, s, h = 4, 96, 96
    vel = jnp.clip(jnp.asarray(rng.standard_normal((b, 2, h, s)) * 300,
                               jnp.float32), -1000, 1000)
    p = jnp.asarray(rng.standard_normal((b, h, s)), jnp.float32)
    dt = jnp.float32(0.016)
    velp, pp = bp.pack_fleet(vel), bp.pack_fleet(p)
    with _interp():
        gv, gd = ps.curl_vorticity_divergence(velp, 30.0, dt, sim_w=s)
        gj = pj.jacobi_pressure(pp, gd, 12, prescale=0.8, sim_w=s)
        gg = ps.gradient_subtract(gv, gj, sim_w=s)
        wv, wd, wj, wg = [], [], [], []
        for i in range(b):
            vp = D.pad_to(vel[i], h, 128)
            ov, od = ps.curl_vorticity_divergence(vp, 30.0, dt,
                                                  true_shape=(h, s))
            oj = pj.jacobi_pressure(D.pad_to(p[i], h, 128),
                                    od, 12, true_shape=(h, s), prescale=0.8)
            og = ps.gradient_subtract(ov, oj, true_shape=(h, s))
            wv.append(ov[..., :s]), wd.append(od[..., :s])
            wj.append(oj[..., :s]), wg.append(og[..., :s])
    for name, got, want in [("vel", gv, jnp.stack(wv)),
                            ("div", gd, jnp.stack(wd)),
                            ("jacobi", gj, jnp.stack(wj)),
                            ("grad_sub", gg, jnp.stack(wg))]:
        np.testing.assert_array_equal(
            np.asarray(bp.unpack_fleet(got, b)), np.asarray(want),
            err_msg=name)


def test_packed_advect_isolation_and_class(rng):
    """The packed gather never reads a foreign sim (walls clamp per lane):
    a sim advected inside a packed fleet of DIFFERENT sims equals the same
    sim advected alone, to the coordinate-rounding class."""
    b, s, h = 4, 96, 96
    st = _smooth_state(b, h, s, jnp.float32, rng)
    dt = jnp.float32(0.016)
    halo = pa.halo_for_displacement(D._MAX_DISP_SIM_TEXELS)
    span = pa.group_span_for_displacement(D._MAX_DISP_SIM_TEXELS)
    with _interp():
        got = pa.advect_pallas(bp.pack_fleet(st.velocity),
                               bp.pack_fleet(st.dye), dt, 1.0, halo=halo,
                               span=span, max_disp_x=D._MAX_DISP_SIM_TEXELS,
                               sim_w=s)
        want = jnp.stack([
            pa.advect_pallas(D.pad_to(st.velocity[i], h, 128),
                             D.pad_to(st.dye[i], h, 128), dt, 1.0,
                             true_shape=(h, s), halo=halo, span=span,
                             max_disp_x=D._MAX_DISP_SIM_TEXELS)[..., :s]
            for i in range(b)])
    d = np.abs(np.asarray(bp.unpack_fleet(got, b)) - np.asarray(want))
    assert d.max() < 2e-4, d.max()   # smooth-field coordinate-rounding class


def test_packed_step_matches_vmapped_kernels(rng):
    """Full packed step (kernel path, interpret) vs the vmapped single-sim
    kernel path on smooth states, one step with per-sim splats."""
    cfg = _cfg(96)
    b = 4
    st = _smooth_state(b, 96, 96, cfg.dtype, rng)
    spl = _splats(b, rng)
    dt = jnp.float32(0.016)
    with _interp(), mock.patch.object(D, "_on_tpu", lambda: True):
        want = jax.vmap(partial(fluid_step, config=cfg),
                        in_axes=(0, None, 0))(st, dt, spl)
        got = bp._packed_step_kernels(bp.pack_state(st), dt, spl, cfg, b)
    gu = bp.unpack_state(got, b)
    for name, tol in [("velocity", 5e-2), ("dye", 2e-3), ("pressure", 1e-3)]:
        a = np.asarray(getattr(gu, name), np.float32)
        w = np.asarray(getattr(want, name), np.float32)
        assert np.abs(a - w).max() < tol, (name, np.abs(a - w).max())


def test_packed_step_bf16_rgb9e5_class(rng):
    """bf16 + rgb9e5 (the serving default): packed vs vmapped kernel path
    stays inside the 16-bit storage class on smooth fields (occasional
    knife-edge floor flips bound by local contrast; p999 tight)."""
    cfg = _cfg(128, "bfloat16")
    assert cfg.DYE_RGB9E5
    b = 4
    st = _smooth_state(b, 128, 128, cfg.dtype, rng)
    spl = _splats(b, rng)
    dt = jnp.float32(0.016)
    with _interp(), mock.patch.object(D, "_on_tpu", lambda: True):
        want = jax.vmap(partial(fluid_step, config=cfg),
                        in_axes=(0, None, 0))(st, dt, spl)
        got = bp._packed_step_kernels(bp.pack_state(st), dt, spl, cfg, b)
    gu = bp.unpack_state(got, b)
    for name, scale in [("velocity", 1000.0), ("dye", 1.0),
                        ("pressure", None)]:
        a = np.asarray(getattr(gu, name), np.float32)
        w = np.asarray(getattr(want, name), np.float32)
        d = np.abs(a - w)
        sc = scale or max(np.abs(w).max(), 1e-6)
        assert np.quantile(d, 0.999) < 0.02 * sc, (name, np.quantile(d, 0.999))
        assert d.max() < 0.1 * sc, (name, d.max())


def test_packed_multi_step_scan(rng):
    """make_packed_multi_step (fallback path on CPU): T scanned steps track
    T sequential packed steps. Not bit-pinned: XLA:CPU contracts FMAs
    differently inside the jitted scan body than in the eager steps (the
    same 1-ULP-per-op class test_jacobi_exact_equals_masked documents),
    and a step's advection gather amplifies coordinate ULPs."""
    cfg = _cfg(96, iters=4)
    b, t = 4, 3
    st = _smooth_state(b, 96, 96, cfg.dtype, rng)
    spl = jnp.stack([_splats(b, rng) for _ in range(t)])
    dt = jnp.float32(0.016)
    multi = bp.make_packed_multi_step(cfg, b)
    got = multi(bp.pack_state(st), dt, spl)
    ref = bp.pack_state(st)
    for k in range(t):
        ref = bp.packed_fluid_step(ref, dt, spl[k], cfg, b)
    for name, scale in [("velocity", 1000.0), ("dye", 1.0),
                        ("pressure", 600.0)]:
        a = np.asarray(getattr(got, name), np.float32)
        w = np.asarray(getattr(ref, name), np.float32)
        assert np.abs(a - w).max() < 1e-3 * scale, \
            (name, np.abs(a - w).max())
