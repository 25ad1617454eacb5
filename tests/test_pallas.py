"""Pallas kernels vs the jnp oracle (interpret mode on CPU; the driver's TPU
bench exercises the compiled path)."""

from unittest import mock

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import tpufluid.ops.pallas.jacobi as pj
from tpufluid.ops import stencil


def _interp(module):
    orig = module.pl.pallas_call
    return mock.patch.object(module.pl, "pallas_call",
                             lambda *a, **k: orig(*a, interpret=True, **k))


@pytest.mark.parametrize("shape", [(64, 128), (128, 256), (512, 128)])
@pytest.mark.parametrize("iters", [1, 7, 20, 45])  # 45: multi-chunk (3 HBM passes)
def test_jacobi_matches_oracle(shape, iters, rng):
    p = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    d = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    with _interp(pj):
        got = pj.jacobi_pressure(p, d, iters)
    want = stencil.jacobi_pressure(p, d, iters)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-6, atol=2e-6)


@pytest.mark.parametrize("shape", [(64, 128), (256, 256)])
def test_jacobi_exact_equals_masked(shape, rng):
    """The select-free (edge-clamped shift) sweep path equals the masked
    chain on unpadded grids — window-edge garbage differs (clamp vs
    roll-wrap) but sits outside every central cell's dependency cone.
    Device runs are BIT-equal (out/jobs/b53/b55); XLA:CPU contracts the
    two graphs' FMAs differently (single 1-ULP stragglers), so this CPU
    guard pins near-equality."""
    p = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    d = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    assert pj._exact_fits(shape, shape, 0)  # default path IS exact here
    with _interp(pj):
        got_exact = pj.jacobi_pressure(p, d, 20, prescale=0.8)
        with mock.patch.object(pj, "_exact_fits", lambda *a: False):
            got_masked = pj.jacobi_pressure(p, d, 20, prescale=0.8)
    np.testing.assert_allclose(np.asarray(got_exact),
                               np.asarray(got_masked),
                               rtol=1e-6, atol=1e-6)


def test_jacobi_supported_gate():
    assert pj.supported((1024, 1024))
    assert pj.supported((128, 128))
    assert not pj.supported((228, 128))   # demo 1280x720 sim grid: H % 8 != 0
    assert not pj.supported((128, 100))   # lane-unaligned width
    # 16K-wide pressure: column-tiled windows (the round-1 gap: this shape
    # silently fell back to 20 full-grid jnp sweeps, ~40% of the 16K step)
    assert pj.supported((16384, 16384), 2)
    assert pj.supported((16384, 16384), 4)


def test_stencil_column_tiled_matches_oracle(rng):
    """Wide grids take 2-D windows in the fused pre-pressure stencil and
    gradient-subtract too (the 16K fallback gap): oracle-exact at the walls
    and with fused splats."""
    import tpufluid.ops.pallas.stencil as ps

    h, w = 64, 16384
    rows, cols = ps._pick_tile(h, w, 4)
    assert cols < w  # really the column-tiled path
    vel = jnp.asarray((rng.standard_normal((2, h, w)) * 200).astype(np.float32))
    dt = jnp.float32(1 / 60)
    S = 4
    gy = jnp.asarray(rng.random((h, S)).astype(np.float32))
    gx = jnp.asarray(rng.random((S, w)).astype(np.float32))
    amt = jnp.asarray((rng.standard_normal((S, 2)) * 50).astype(np.float32))
    with _interp(ps):
        got_v, got_d = ps.curl_vorticity_divergence(vel, 30.0, dt, gy, gx, amt)
    bumped = vel + jnp.einsum("hs,sc,sw->chw", gy, amt, gx)
    c = stencil.curl(bumped)
    want_v = stencil.vorticity_confinement(bumped, c, 30.0, dt)
    want_d = stencil.divergence(want_v)
    scale = float(jnp.abs(want_v).max())
    # 5e-4 relative: the confinement's 1/(|grad|+1e-4) amplifies the
    # dot_f32_3x bump's ~1e-6 rounding (the documented <=2e-4/step contract,
    # ops/pallas/common.dot_f32_3x).
    assert float(jnp.abs(got_v - want_v).max()) < 5e-4 * scale
    assert float(jnp.abs(got_d - want_d).max()) < 5e-4 * scale
    p = jnp.asarray(rng.standard_normal((h, w)).astype(np.float32))
    with _interp(ps):
        got = ps.gradient_subtract(vel, p)
    want = stencil.gradient_subtract(vel, p)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_stencil_fused_splat_bf16_rounds_to_storage(rng):
    """The fused velocity splat rounds to 16-bit STORAGE before the
    curl/confinement chain — matching the jnp fallback and the reference's
    half-float splat texture (script.js:1443-1449). The f32-kept bump
    diverged ~2% p999 through the confinement amplifier at 8192^2
    (out/jobs/b27)."""
    import tpufluid.ops.pallas.stencil as ps

    h, w = 96, 256
    bf = jnp.bfloat16
    vel = jnp.asarray((rng.standard_normal((2, h, w)) * 200)).astype(bf)
    dt = jnp.float32(1 / 60)
    S = 4
    gy = jnp.asarray(rng.random((h, S)).astype(np.float32))
    gx = jnp.asarray(rng.random((S, w)).astype(np.float32))
    amt = jnp.asarray((rng.standard_normal((S, 2)) * 400).astype(np.float32))
    with _interp(ps):
        got_v, got_d = ps.curl_vorticity_divergence(vel, 30.0, dt, gy, gx, amt)
    bumped = (vel.astype(jnp.float32)
              + jnp.einsum("hs,sc,sw->chw", gy, amt, gx)).astype(bf)
    bf32 = bumped.astype(jnp.float32)
    c = stencil.curl(bf32)
    want_v = stencil.vorticity_confinement(bf32, c, 30.0, dt)
    want_d = stencil.divergence(want_v)
    scale = float(jnp.abs(want_v).max())
    # bump rounding matched: the dot_f32_3x vs einsum ~1e-6 difference can
    # still flip ONE bf16 rounding boundary (one ULP = 2^-8 of the value);
    # bound at 2 ULPs of scale (vs ~2e-2 p999 when the kernel kept the
    # bump at f32)
    tol = 2 * scale / 256.0
    assert float(jnp.abs(got_v.astype(jnp.float32) - want_v).max()) < tol
    assert float(jnp.abs(got_d.astype(jnp.float32) - want_d).max()) < tol


def test_jacobi_column_tiled_matches_oracle(rng):
    """Grids too wide for full-width row blocks take 2-D (row x col)
    windows with 128-lane halos; must still equal the oracle exactly,
    including at the walls and with the warm-start prescale."""
    h, w = 112, 8192
    rows, cols = pj._pick_tile(h, w, pj._halo(4), 4)
    assert cols < w  # really the column-tiled path
    p = jnp.asarray(rng.standard_normal((h, w)).astype(np.float32))
    d = jnp.asarray(rng.standard_normal((h, w)).astype(np.float32))
    with _interp(pj):
        got = pj.jacobi_pressure(p, d, 20, prescale=0.8)
    want = stencil.jacobi_pressure(
        (p.astype(jnp.float32) * 0.8).astype(p.dtype), d, 20)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-6, atol=2e-6)


def test_jacobi_zero_iters_identity(rng):
    p = jnp.asarray(rng.standard_normal((64, 128)).astype(np.float32))
    d = jnp.zeros((64, 128), jnp.float32)
    out = pj.jacobi_pressure(p, d, 0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(p))


def test_fused_stencil_matches_oracle(rng):
    import tpufluid.ops.pallas.stencil as ps

    vel = jnp.asarray((rng.standard_normal((2, 64, 128)) * 100).astype(np.float32))
    dt = jnp.float32(1 / 60)
    with _interp(ps):
        v2, d2 = ps.curl_vorticity_divergence(vel, 30.0, dt)
    c = stencil.curl(vel)
    v1 = stencil.vorticity_confinement(vel, c, 30.0, dt)
    d1 = stencil.divergence(v1)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=2e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=2e-5, atol=1e-4)


@pytest.mark.parametrize("channels", [1, 2, 3])
def test_advect_matches_oracle(channels, rng):
    import tpufluid.ops.pallas.advect as pa
    from tpufluid.ops.advect import advect

    H, W = 64, 128
    vel = jnp.clip(jnp.asarray((rng.standard_normal((2, H, W)) * 400).astype(np.float32)),
                   -1000, 1000)
    shape = (H, W) if channels == 1 else (channels, H, W)
    src = jnp.asarray(rng.random(shape).astype(np.float32))
    dt = jnp.float32(1 / 60)
    with _interp(pa):
        got = pa.advect_pallas(vel, src, dt, 0.7)
    want = advect(vel, src, dt, 0.7)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_advect_fused_splat_matches_oracle(rng):
    """The dye splat rides inside the gather kernel as a rank-S MXU bump over
    each source window; must equal splat-then-advect exactly (bilinear
    sampling of a separable bump == product of its 1-D samples)."""
    import tpufluid.ops.pallas.advect as pa
    import tpufluid.ops.pallas.advect_hbm as ah
    from tpufluid.ops.advect import advect

    H, W, S, C = 64, 128, 4, 3
    vel = jnp.clip(jnp.asarray((rng.standard_normal((2, H, W)) * 400).astype(np.float32)),
                   -1000, 1000)
    src = jnp.asarray(rng.random((C, H, W)).astype(np.float32))
    gy = jnp.asarray(rng.random((H, S)).astype(np.float32))
    gx = jnp.asarray(rng.random((S, W)).astype(np.float32))
    amt = jnp.asarray(rng.standard_normal((S, C)).astype(np.float32))
    dt = jnp.float32(1 / 60)

    bumped = src + jnp.einsum("hs,sc,sw->chw", gy, amt, gx)
    want = advect(vel, bumped, dt, 1.0)
    with _interp(pa):
        got = pa.advect_pallas(vel, src, dt, 1.0, splat=(gy, gx, amt))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)
    with _interp(ah):
        got2 = ah.advect_pallas_hbm(vel, src, dt, 1.0, splat=(gy, gx, amt))
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_advect_fused_splat_bf16_packed(rng):
    """bfloat16 fused-splat advection packs the BUMPED window (two channels
    per uint32 lane); the bump rounds to bf16 storage before packing —
    matching the jnp fallback's (src + bump).astype(dtype) and the reference,
    whose splat pass writes half-float dye that advection then reads."""
    import tpufluid.ops.pallas.advect as pa
    from tpufluid.ops.advect import advect

    H, W, S, C = 96, 128, 4, 3
    bf = jnp.bfloat16
    vel = jnp.clip(jnp.asarray((rng.standard_normal((2, H, W)) * 400)),
                   -1000, 1000).astype(bf)
    src = jnp.asarray(rng.random((C, H, W))).astype(bf)
    gy = jnp.asarray(rng.random((H, S)).astype(np.float32))
    gx = jnp.asarray(rng.random((S, W)).astype(np.float32))
    amt = jnp.asarray(rng.standard_normal((S, C)).astype(np.float32))
    dt = jnp.float32(1 / 60)

    bumped = (src.astype(jnp.float32)
              + jnp.einsum("hs,sc,sw->chw", gy, amt, gx)).astype(bf)
    want = advect(vel.astype(jnp.float32), bumped.astype(jnp.float32), dt, 1.0)
    with _interp(pa):
        got = pa.advect_pallas(vel, src, dt, 1.0, splat=(gy, gx, amt))
    assert got.dtype == bf
    scale = float(jnp.abs(want).max())
    assert float(jnp.abs(got.astype(jnp.float32) - want).max()) < 0.02 * scale


def test_jacobi_prescale_fuses_warm_start(rng):
    """jacobi(prescale=k) == jacobi on k*pressure (clearShader fusion)."""
    p = jnp.asarray(rng.standard_normal((64, 128)).astype(np.float32))
    d = jnp.asarray(rng.standard_normal((64, 128)).astype(np.float32))
    with _interp(pj):
        got = pj.jacobi_pressure(p, d, 7, prescale=0.8)
    want = stencil.jacobi_pressure(p * 0.8, d, 7)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-6, atol=2e-6)
    assert float(jnp.abs(pj.jacobi_pressure(p, d, 0, prescale=0.8)
                         - p * 0.8).max()) == 0.0


def test_ragged_shapes_via_padding(rng):
    """The demo's aspect-fitted grids are ragged (e.g. 228x128); kernels get
    edge-padded inputs + true_shape masks. Verify vs the oracle on the true
    region for every kernel."""
    from tpufluid.ops.pallas.common import pad_to, round_up
    import tpufluid.ops.pallas.advect as pa
    import tpufluid.ops.pallas.stencil as ps
    from tpufluid.ops.advect import advect

    h, w = 60, 200
    hp, wp = max(round_up(h, 8), 56), round_up(w, 128)
    vel = jnp.clip(jnp.asarray((rng.standard_normal((2, h, w)) * 300).astype(np.float32)),
                   -1000, 1000)
    dt = jnp.float32(1 / 60)

    # jacobi
    p = jnp.asarray(rng.standard_normal((h, w)).astype(np.float32))
    d = jnp.asarray(rng.standard_normal((h, w)).astype(np.float32))
    with _interp(pj):
        got = pj.jacobi_pressure(pad_to(p, hp, wp), pad_to(d, hp, wp), 12,
                                 true_shape=(h, w))[:h, :w]
    want = stencil.jacobi_pressure(p, d, 12)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)

    # fused stencil
    with _interp(ps):
        v2, d2 = ps.curl_vorticity_divergence(pad_to(vel, hp, wp), 30.0, dt,
                                              true_shape=(h, w))
    c = stencil.curl(vel)
    v1 = stencil.vorticity_confinement(vel, c, 30.0, dt)
    d1 = stencil.divergence(v1)
    np.testing.assert_allclose(np.asarray(v2[..., :h, :w]), np.asarray(v1), rtol=2e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(d2[:h, :w]), np.asarray(d1), rtol=2e-5, atol=1e-4)

    # advect
    src = jnp.asarray(rng.random((3, h, w)).astype(np.float32))
    with _interp(pa):
        got = pa.advect_pallas(pad_to(vel, hp, wp), pad_to(src, hp, wp), dt, 1.0,
                               true_shape=(h, w))[..., :h, :w]
    want = advect(vel, src, dt, 1.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)

    # projection tail: pallas gradient subtract + self-advect (the split
    # the step dispatches; ps.pl and pa.pl are one module, one patch covers both)
    with _interp(ps):
        v2 = ps.gradient_subtract(pad_to(vel, hp, wp), pad_to(p, hp, wp),
                                  true_shape=(h, w))
        got = pa.advect_pallas(v2, v2, dt, 0.2, true_shape=(h, w))[..., :h, :w]
    v1 = stencil.gradient_subtract(vel, p)
    want = advect(v1, v1, dt, 0.2)
    scale = float(jnp.abs(want).max())
    assert float(jnp.abs(got - want).max()) < 5e-5 * scale


def test_advect_cross_resolution_scaled_velocity(rng):
    """Dye advection: coarse velocity resampled to the dye grid and rescaled
    to dye-texels/s; halo/span sized for the ratio (the demo's two-grid
    scheme, script.js:1276)."""
    import tpufluid.ops.pallas.advect as pa
    from tpufluid.ops.advect import advect
    from tpufluid.ops.sampling import resample_bilinear

    hv, wv = 16, 128
    h, w = 64, 256  # 4x rows, 2x cols
    vel = jnp.clip(jnp.asarray((rng.standard_normal((2, hv, wv)) * 400).astype(np.float32)),
                   -1000, 1000)
    dye = jnp.asarray(rng.random((3, h, w)).astype(np.float32))
    dt = jnp.float32(1 / 60)

    halo = pa.halo_for_displacement(1000 / 60 * h / hv)
    span = pa.group_span_for_displacement(1000 / 60 * w / wv)
    assert halo >= 68 and span >= 1

    from tpufluid.ops.pallas.common import pad_to

    hp = max(h, 8 + 2 * halo)  # dispatch pads so the window fits (min_h)
    vel_r = resample_bilinear(vel, (h, w))
    vel_r = jnp.stack([vel_r[0] * (w / wv), vel_r[1] * (h / hv)])
    with _interp(pa):
        got = pa.advect_pallas(pad_to(vel_r, hp, w), pad_to(dye, hp, w), dt, 1.0,
                               halo=halo, span=span, rows_per_block=8,
                               true_shape=(h, w))[..., :h, :w]
    want = advect(vel, dye, dt, 1.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("dtype16", ["bfloat16", "float16"])
def test_bf16_kernels_match_oracle(dtype16, rng):
    """Kernels consume 16-bit storage natively — bfloat16 (the performance
    mode) and IEEE float16 (the reference's EXACT half-float storage format,
    script.js:145-153): in-register upcasts, (16,128)-aligned windows,
    16-bit-tolerance equivalence with the f32 oracle chain. float16 takes
    the unpacked plane path (the channel-packing bit tricks are
    bf16-specific and gated on the dtype)."""
    import tpufluid.ops.pallas.advect as pa
    import tpufluid.ops.pallas.stencil as ps
    from tpufluid.ops.advect import advect

    H, W = 96, 128  # 16-bit windows need align 16 + 2*32-row halos
    dt = jnp.float32(1 / 60)
    bf = jnp.dtype(dtype16)
    vel = jnp.clip(jnp.asarray((rng.standard_normal((2, H, W)) * 400)),
                   -1000, 1000).astype(bf)
    src = jnp.asarray(rng.random((3, H, W))).astype(bf)
    p = jnp.asarray(rng.standard_normal((H, W))).astype(bf)
    d = jnp.asarray(rng.standard_normal((H, W))).astype(bf)

    assert pa.supported((3, H, W), 2) and pj.supported((H, W), 2)
    assert ps.supported((H, W), 2)

    with _interp(pa):
        got = pa.advect_pallas(vel, src, dt, 1.0)
    want = advect(vel.astype(jnp.float32), src.astype(jnp.float32), dt, 1.0)
    assert got.dtype == bf
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(want),
                               rtol=0, atol=0.02)

    with _interp(pj):
        got = pj.jacobi_pressure(p, d, 12)
    want = stencil.jacobi_pressure(p.astype(jnp.float32),
                                   d.astype(jnp.float32), 12)
    assert got.dtype == bf
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(want),
                               rtol=0, atol=0.05)

    with _interp(ps):
        v2, d2 = ps.curl_vorticity_divergence(vel, 30.0, dt)
    vf = vel.astype(jnp.float32)
    c = stencil.curl(vf)
    v1 = stencil.vorticity_confinement(vf, c, 30.0, dt)
    d1 = stencil.divergence(v1)
    scale = float(jnp.abs(v1).max())
    assert float(jnp.abs(v2.astype(jnp.float32) - v1).max()) < 0.02 * scale
    assert float(jnp.abs(d2.astype(jnp.float32) - d1).max()) < 0.05 * scale

    with _interp(ps):
        v2 = ps.gradient_subtract(vel, p)
        got = pa.advect_pallas(v2, v2, dt, 0.2)
    # The projected velocity passes through bf16 STORAGE between the two
    # passes — exactly the reference, whose gradientSubtract writes an RG16F
    # texture that the advection pass reads (script.js:1268-1285). Round the
    # oracle's vel' the same way.
    v1 = stencil.gradient_subtract(vf, p.astype(jnp.float32))
    v1 = v1.astype(bf).astype(jnp.float32)
    want = advect(v1, v1, dt, 0.2)
    scale = float(jnp.abs(want).max())
    assert float(jnp.abs(got.astype(jnp.float32) - want).max()) < 0.02 * scale


@pytest.mark.parametrize("dtype16", ["bfloat16", "float16"])
def test_advect_hbm_bf16_matches_oracle(dtype16, rng):
    import tpufluid.ops.pallas.advect_hbm as ah
    from tpufluid.ops.advect import advect

    H, W = 64, 128
    bf = jnp.dtype(dtype16)
    vel = jnp.clip(jnp.asarray(rng.standard_normal((2, H, W)) * 400),
                   -1000, 1000).astype(bf)
    src = jnp.asarray(rng.random((3, H, W))).astype(bf)
    dt = jnp.float32(1 / 60)
    assert ah.supported((3, H, W), 2)
    with _interp(ah):
        got = ah.advect_pallas_hbm(vel, src, dt, 1.0)
    want = advect(vel.astype(jnp.float32), src.astype(jnp.float32), dt, 1.0)
    assert got.dtype == bf
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(want),
                               rtol=0, atol=0.02)

    # Fused splat: the bump rounds to bf16 storage before packing (matching
    # the jnp fallback and the reference's half-float splat texture).
    S = 4
    gy = jnp.asarray(rng.random((H, S)).astype(np.float32))
    gx = jnp.asarray(rng.random((S, W)).astype(np.float32))
    amt = jnp.asarray(rng.standard_normal((S, 3)).astype(np.float32))
    bumped = (src.astype(jnp.float32)
              + jnp.einsum("hs,sc,sw->chw", gy, amt, gx)).astype(bf)
    want = advect(vel.astype(jnp.float32), bumped.astype(jnp.float32), dt, 1.0)
    with _interp(ah):
        got = ah.advect_pallas_hbm(vel, src, dt, 1.0, splat=(gy, gx, amt))
    scale = float(jnp.abs(want).max())
    assert float(jnp.abs(got.astype(jnp.float32) - want).max()) < 0.02 * scale


def test_advect_hbm_mixed_reach_tiles(rng):
    """One field containing BOTH tile kinds the occupancy guard
    distinguishes: gentle-swirl tiles (guard skips the outer gather
    groups) and tiles with opposite near-clamp velocities whose reach
    spans >2 lane groups (guard must fire). Added while measuring the
    dynamic-base rework (round 5, rejected — see docs/BENCH.md); pins the
    guard's correctness on exactly the geometry that distinguishes the
    variants."""
    import tpufluid.ops.pallas.advect as pa
    import tpufluid.ops.pallas.advect_hbm as ah
    from tpufluid.ops.advect import advect
    from tpufluid.ops.sampling import resample_bilinear

    hv, wv = 16, 128
    H, W = 64, 512  # 128-col windows, span>1: dyn_base active
    dt = jnp.float32(1 / 60)
    # left half: gentle swirl (fast branch); right half: alternating
    # +/-1000 columns (reach spans ~2*133 lanes > 256: slow branch)
    u = np.zeros((hv, wv), np.float32)
    u[:, : wv // 2] = 300.0 * np.sin(np.linspace(0, 3, wv // 2))[None, :]
    u[:, wv // 2:] = np.where(np.arange(wv // 2) % 2 == 0, 1000.0, -1000.0)
    v = 200.0 * np.cos(np.linspace(0, 2, hv))[:, None] * np.ones((hv, wv))
    vel = jnp.asarray(np.stack([u, v]).astype(np.float32))
    dye = jnp.asarray(rng.random((3, H, W)).astype(np.float32))
    vel_r = resample_bilinear(vel, (H, W))
    vel_r = jnp.stack([vel_r[0] * (W / wv), vel_r[1] * (H / hv)])
    disp = 1000 / 60 * W / wv
    span = pa.group_span_for_displacement(disp)
    with _interp(ah):
        got = ah.advect_pallas_hbm(vel_r, dye, dt, 1.0, span=span,
                                   max_disp_x=disp)
    want = advect(vel, dye, dt, 1.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_advect_hbm_matches_oracle(rng):
    """HBM-resident data-bounded-window advection == oracle (same-grid and
    cross-resolution with column tiling)."""
    import tpufluid.ops.pallas.advect_hbm as ah
    import tpufluid.ops.pallas.advect as pa
    from tpufluid.ops.advect import advect
    from tpufluid.ops.sampling import resample_bilinear

    H, W = 64, 128
    vel = jnp.clip(jnp.asarray((rng.standard_normal((2, H, W)) * 400).astype(np.float32)),
                   -1000, 1000)
    src = jnp.asarray(rng.random((3, H, W)).astype(np.float32))
    dt = jnp.float32(1 / 60)
    with _interp(ah):
        got = ah.advect_pallas_hbm(vel, src, dt, 1.0)
    want = advect(vel, src, dt, 1.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)

    hv, wv = 16, 128
    H, W = 64, 512
    vel = jnp.clip(jnp.asarray((rng.standard_normal((2, hv, wv)) * 400).astype(np.float32)),
                   -1000, 1000)
    dye = jnp.asarray(rng.random((3, H, W)).astype(np.float32))
    vel_r = resample_bilinear(vel, (H, W))
    vel_r = jnp.stack([vel_r[0] * (W / wv), vel_r[1] * (H / hv)])
    span = pa.group_span_for_displacement(1000 / 60 * W / wv)
    with _interp(ah):
        got = ah.advect_pallas_hbm(vel_r, dye, dt, 1.0, span=span)
    want = advect(vel, dye, dt, 1.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_advect_extreme_velocity_clamped_displacement(rng):
    """At the +/-1000 clamp the backtrace stays within the HALO window."""
    import tpufluid.ops.pallas.advect as pa
    from tpufluid.ops.advect import advect

    H, W = 64, 128
    vel = jnp.where(jnp.asarray(rng.random((2, H, W))) > 0.5, 1000.0, -1000.0).astype(jnp.float32)
    src = jnp.asarray(rng.random((H, W)).astype(np.float32))
    dt = jnp.float32(1 / 60)
    with _interp(pa):
        got = pa.advect_pallas(vel, src, dt, 1.0)
    want = advect(vel, src, dt, 1.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_advect_out_of_contract_clamps_at_window_edge(rng):
    """Drive a backtrace PAST the gather-halo contract and pin the documented
    degradation (docs/ARCHITECTURE.md "The displacement contract"): the row
    backtrace clamps at each block's WINDOW edge — finite, bounded by the
    source range, and exactly the windowed oracle — while the unbounded
    CLAMP_TO_EDGE jnp advect disagrees (proving the edge is really crossed).
    The reference's own sampler accepts arbitrary backtraces
    (script.js:746-784); this is the one deliberate deviation, previously
    analyzed and warned about but never exercised."""
    import tpufluid.ops.pallas.advect as pa
    from tpufluid.ops.advect import advect as jnp_advect

    h = w = 256
    rows = 64
    halo = pa.HALO  # f32: align 8 -> stays 24; window = 64 + 2*24 = 112 rows
    src = jnp.asarray(rng.random((h, w)).astype(np.float32))
    # 3000 texels/s: a 50-texel backtrace >> the (halo-2)=22-texel contract
    # (the reference clamp would cap at 1000, but the un-clamped gradient
    # kick can exceed it — metrics.backtrace_speed measures exactly this).
    # Zero x velocity keeps the column path exact.
    vy = 3000.0
    vel = jnp.stack([jnp.zeros((h, w), jnp.float32),
                     jnp.full((h, w), vy, jnp.float32)])
    dt = jnp.float32(1 / 60)
    with _interp(pa):
        got = np.asarray(pa.advect_pallas(vel, src, dt, 0.0,
                                          rows_per_block=rows))

    # 1. graceful: finite, bounded by the source range (bilinear is convex)
    s = np.asarray(src)
    assert np.isfinite(got).all()
    assert got.min() >= s.min() - 1e-6 and got.max() <= s.max() + 1e-6

    # 2. exact: the windowed oracle — backtrace clamped at each block's
    # window [rstart, rstart + win - 1] instead of the grid edge
    win = rows + 2 * halo
    y = np.arange(h)
    rstart = np.clip((y // rows) * rows - halo, 0, h - win)
    yg = np.clip(y - float(dt) * vy, rstart, np.minimum(rstart + win - 1, h - 1))
    y0 = np.floor(yg).astype(int)
    fy = (yg - y0)[:, None]
    want = s[y0] * (1 - fy) + s[np.minimum(y0 + 1, h - 1)] * fy
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # 3. the contract edge is genuinely crossed: blocks whose window starts
    # above the grid edge clamp differently from the free oracle
    free = np.asarray(jnp_advect(vel, src, dt, 0.0))
    assert np.abs(free - got).max() > 1e-2


def test_lane_window_plan():
    """Static column-gather plans: legacy default == span-halo plan; a tight
    same-grid displacement bound fits every output group's reach in TWO
    window groups (the saved third dynamic_gather is the round-3 headline
    lever)."""
    import tpufluid.ops.pallas.advect as pa

    # Legacy (no bound): block at span*128, groups g..g+2*span.
    off, lo, hi = pa.lane_window_plan(None, 1, 256, 512)
    assert (off, lo, hi) == (128, 0, 2)
    off, lo, hi = pa.lane_window_plan(None, 2, 256, 768)
    assert (off, lo, hi) == (256, 0, 4)
    # Tight same-grid bound (|v|<=1000 texels/s * dt<=1/60): 2 groups.
    off, lo, hi = pa.lane_window_plan(1000 / 60, 1, 256, 512)
    assert hi - lo + 1 == 2
    D = int(np.ceil(1000 / 60)) + 2
    assert off >= D and off + 255 + D <= 511
    # No column window: block at 0, legacy +/-span.
    assert pa.lane_window_plan(1000 / 60, 1, 128, 128) == (0, -1, 1)
    # Bound wider than the window halo: falls back to the legacy plan.
    assert pa.lane_window_plan(500.0, 1, 256, 512) == (128, 0, 2)


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_advect_tight_plan_matches_oracle(dtype, rng):
    """Windowed column tiling WITH the tight displacement-bound gather plan
    (the dispatch path at >=512-wide grids) == oracle, at velocities spanning
    the full +/-1000 reference clamp and on edge tiles."""
    import tpufluid.ops.pallas.advect as pa
    from tpufluid.ops.advect import advect

    H, W = 80, 512   # cols=256 window mode; tiles include both column edges
    dt = jnp.float32(1 / 60)
    vel = jnp.where(jnp.asarray(rng.random((2, H, W))) > 0.5, 1000.0,
                    -1000.0).astype(jnp.float32)
    vel = (vel * jnp.asarray(rng.random((2, H, W)))).astype(dtype)
    src = jnp.asarray(rng.random((3, H, W))).astype(dtype)
    with _interp(pa):
        got = pa.advect_pallas(vel, src, dt, 0.7, max_disp_x=1000 / 60)
    want = advect(vel.astype(jnp.float32), src.astype(jnp.float32), dt, 0.7)
    tol = 1e-4 if dtype == "float32" else 0.02
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(want),
                               rtol=0, atol=tol)


@pytest.mark.parametrize("u", [1000.0, -1000.0, 150.0])
def test_advect_xpair_corner_semantics(u, rng):
    """Sharp guard for the column-paired odd channel (bf16, c=3): uniform
    velocities put EVERY backtrace either at a true-edge clamp (fx=0, the
    pair's upper half multiplies zero weight) or at a known fractional
    offset crossing lane-group boundaries (u=150: dt*u=2.5 lanes, fx=0.5
    mixing each pair's halves). Values must match the bf16-rounded oracle
    within ONE bf16 ULP — a wrong corner would show up at ~0.5 scale; no
    16-bit noise-chain tolerance to hide behind."""
    import tpufluid.ops.pallas.advect as pa
    from tpufluid.ops.advect import advect

    H, W = 128, 512  # bf16 row halo is 32: H must fit rows + 64
    dt = jnp.float32(1 / 60)
    vel = jnp.stack([jnp.full((H, W), u), jnp.zeros((H, W))]
                    ).astype(jnp.bfloat16)
    src = jnp.asarray(rng.random((3, H, W))).astype(jnp.bfloat16)
    with _interp(pa):
        got = pa.advect_pallas(vel, src, dt, 0.0, max_disp_x=1000 / 60)
    want = advect(vel.astype(jnp.float32), src.astype(jnp.float32), dt, 0.0)
    want = want.astype(jnp.bfloat16)  # the kernel's output storage rounding
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=0, atol=2.0 ** -8)


def test_rgb9e5_format_properties(rng):
    """ops/quant.py shared-exponent packing: error bound vs the texel max
    (<= 2^-9, the same worst case as bf16's 8-bit mantissa), unsigned clamp,
    value-idempotent roundtrip, zero/max handling."""
    from tpufluid.ops.quant import (MAX_RGB9E5, rgb9e5_pack, rgb9e5_roundtrip,
                                    rgb9e5_unpack)

    x = jnp.asarray(np.exp(rng.uniform(-10, 8, (3, 64, 128))).astype(np.float32))
    q = rgb9e5_roundtrip(x)
    rel = np.abs(np.asarray(q - x)) / np.asarray(x).max(axis=0, keepdims=True)
    assert rel.max() <= 2.0 ** -9 * 1.001
    # Roundtrip is value-idempotent: unpacked values are exactly
    # representable, so a second trip changes nothing.
    np.testing.assert_array_equal(np.asarray(rgb9e5_roundtrip(q)),
                                  np.asarray(q))
    # Unsigned: negatives clamp to zero without disturbing other channels.
    xn = x.at[1].multiply(-1.0)
    qn = rgb9e5_roundtrip(xn)
    assert float(jnp.abs(qn[1]).max()) == 0.0
    # Zero packs to zero; values clamp at the format max.
    assert int(rgb9e5_pack(jnp.zeros((3, 8, 128)))[0, 0]) == 0
    assert float(rgb9e5_roundtrip(jnp.full((3, 8, 128), 1e9)).max()) == MAX_RGB9E5


@pytest.mark.parametrize("with_splat", [False, True])
def test_advect_rgb9e5_matches_oracle(with_splat, rng):
    """quant="rgb9e5" packs all 3 dye channels into ONE uint32 plane
    (ops/quant.py): 2 corner gathers per trip instead of 3. Both kernels
    (windowed and HBM-segment) must match the jnp oracle running the SAME
    quantization (advect(..., quant="rgb9e5")) to fp-order tolerance."""
    import tpufluid.ops.pallas.advect as pa
    import tpufluid.ops.pallas.advect_hbm as ah
    from tpufluid.ops.advect import advect

    dt = jnp.float32(1 / 60)

    def case(H, W):
        vel = jnp.clip(jnp.asarray(rng.standard_normal((2, H, W)) * 400),
                       -1000, 1000).astype(jnp.bfloat16)
        src = jnp.asarray(rng.random((3, H, W)) * 2).astype(jnp.bfloat16)
        splat = None
        if with_splat:
            S = 4
            splat = (jnp.asarray(rng.random((H, S)).astype(np.float32)),
                     jnp.asarray(rng.random((S, W)).astype(np.float32)),
                     jnp.asarray(rng.random((S, 3)).astype(np.float32)))
            gy, gx, amt = splat
            srcb = (src.astype(jnp.float32)
                    + jnp.einsum("hs,sc,sw->chw", gy, amt, gx)
                    ).astype(jnp.bfloat16)
        else:
            srcb = src
        want = advect(vel.astype(jnp.float32), srcb.astype(jnp.float32),
                      dt, 1.0, quant="rgb9e5")
        return vel, src, splat, np.asarray(want)

    vel, src, splat, want = case(96, 128)
    with _interp(pa):
        got = pa.advect_pallas(vel, src, dt, 1.0, splat=splat, quant="rgb9e5")
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32), want,
                               rtol=0, atol=2.0 ** -7)

    vel, src, splat, want = case(64, 128)
    with _interp(ah):
        got = ah.advect_pallas_hbm(vel, src, dt, 1.0, splat=splat,
                                   quant="rgb9e5")
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32), want,
                               rtol=0, atol=2.0 ** -7)


@pytest.mark.parametrize("u", [1000.0, -1000.0, 150.0])
def test_advect_rgb9e5_corner_semantics(u, rng):
    """Sharp corner guard for the rgb9e5-packed gather (same construction as
    test_advect_xpair_corner_semantics): uniform velocities pin every
    backtrace at an edge clamp or a known lane-group-crossing fractional
    offset; a wrong corner would show at ~0.5 scale, far above the
    quantization floor."""
    import tpufluid.ops.pallas.advect as pa
    from tpufluid.ops.advect import advect

    H, W = 128, 512
    dt = jnp.float32(1 / 60)
    vel = jnp.stack([jnp.full((H, W), u), jnp.zeros((H, W))]
                    ).astype(jnp.bfloat16)
    src = jnp.asarray(rng.random((3, H, W))).astype(jnp.bfloat16)
    with _interp(pa):
        got = pa.advect_pallas(vel, src, dt, 0.0, max_disp_x=1000 / 60,
                               quant="rgb9e5")
    want = advect(vel.astype(jnp.float32), src.astype(jnp.float32), dt, 0.0,
                  quant="rgb9e5")
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want.astype(jnp.bfloat16),
                                          np.float32),
                               rtol=0, atol=2.0 ** -7)


def test_advect_hbm_tight_plan_matches_oracle(rng):
    """HBM-segment kernel with the tight gather plan (cross-resolution dye,
    span>1) == oracle."""
    import tpufluid.ops.pallas.advect as pa
    import tpufluid.ops.pallas.advect_hbm as ah
    from tpufluid.ops.advect import advect
    from tpufluid.ops.sampling import resample_bilinear

    hv, wv = 16, 128
    H, W = 64, 512
    dt = jnp.float32(1 / 60)
    vel = jnp.clip(jnp.asarray((rng.standard_normal((2, hv, wv)) * 700)
                               .astype(np.float32)), -1000, 1000)
    dye = jnp.asarray(rng.random((3, H, W)).astype(np.float32))
    vel_r = resample_bilinear(vel, (H, W))
    vel_r = jnp.stack([vel_r[0] * (W / wv), vel_r[1] * (H / hv)])
    disp = 1000 / 60 * W / wv
    span = pa.group_span_for_displacement(disp)
    with _interp(ah):
        got = ah.advect_pallas_hbm(vel_r, dye, dt, 1.0, span=span,
                                   max_disp_x=disp)
    want = advect(vel, dye, dt, 1.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4,
                               atol=1e-4)


@pytest.mark.parametrize("shading", [True, False])
@pytest.mark.parametrize("shape", [
    (48, 300, 32, 128),    # downsample both axes, ragged width
    (64, 91, 48, 128),     # sub-lane-width source, column upsample
    (256, 456, 48, 256),   # steep row downsample (bloom-res-like)
    (96, 128, 96, 128),    # identity rows (golden-config shape)
])
def test_display_resample_shade_matches_oracle(shape, shading, rng):
    """Fused display kernel == the jnp tap math (ops/display.shaded_base),
    including the edge tiles' clamped windows."""
    import tpufluid.ops.pallas.display as pdl
    from tpufluid.ops.display import shaded_base

    h, w, oh, ow = shape
    dye = jnp.asarray(rng.random((3, h, w)).astype(np.float32))
    assert pdl.supported((3, h, w), (oh, ow), shading)
    with _interp(pdl):
        got = pdl.resample_shade_pallas(dye, (oh, ow), shading)
    want = shaded_base(dye, (oh, ow), shading)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-6, atol=2e-6)


def test_display_supported_gate():
    import tpufluid.ops.pallas.display as pdl

    assert pdl.supported((3, 1024, 1820), (720, 1280), True)   # config 2
    assert pdl.supported((3, 1024, 1820), (360, 640), True)    # server tick
    assert not pdl.supported((3, 1024, 1820), (910, 512), True)   # capture w
    assert not pdl.supported((3, 24, 200), (32, 256), True)    # source too short
    assert not pdl.supported((3, 1024, 1820), (720, 1280), True, itemsize=2)


def test_display_composite_matches_oracle(rng):
    """Full fused display composite (taps + shading + sunrays multiply +
    dithered gamma bloom + alpha) == ops.display.display_composite, across
    keyword subsets and ragged (non-8-multiple) source row counts."""
    import tpufluid.ops.pallas.display as pdl
    from tpufluid.ops.display import display_composite
    from tpufluid.utils.bluenoise import blue_noise_64

    dye = jnp.asarray(rng.random((3, 100, 171)).astype(np.float32))
    bloom = jnp.asarray((rng.random((3, 44, 57)) * 2).astype(np.float32))
    rays = jnp.asarray(rng.random((42, 43)).astype(np.float32))
    dith = jnp.asarray(blue_noise_64())
    for shading, bl, sr, dt in [(True, bloom, rays, dith),
                                (True, bloom, None, dith),
                                (False, None, rays, None),
                                (True, bloom, rays, None),
                                (False, None, None, None)]:
        assert pdl.supported(
            (3, 100, 171), (48, 256), shading,
            bloom_hw=None if bl is None else tuple(bl.shape[-2:]),
            sunrays_hw=None if sr is None else tuple(sr.shape[-2:]))
        with _interp(pdl):
            got = pdl.display_pallas(dye, (48, 256), shading, bl, sr, dt)
        want = display_composite(dye, (48, 256), shading, bl, sr,
                                 dt if bl is not None else None)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-6, atol=2e-6,
                                   err_msg=str((shading, bl is None, sr is None)))


def test_bloom_pyramid_matches_oracle(rng):
    """VMEM-resident bloom pyramid kernel (matmul blur stages) ==
    ops.bloom.apply_bloom for the default 256-scale chain."""
    import tpufluid.ops.pallas.bloom as pb
    from tpufluid.ops.bloom import apply_bloom
    from tpufluid.ops.sampling import resample_bilinear
    from tpufluid import FluidConfig

    cfg = FluidConfig(SIM_RESOLUTION=128, DYE_RESOLUTION=1024,
                      CANVAS_WIDTH=1280, CANVAS_HEIGHT=720,
                      MAX_SPLATS=8).validate()
    bw, bh = cfg.bloom_size
    mips = cfg.bloom_mip_sizes()
    dye = jnp.asarray((rng.random((3, 256, 420)) * 2).astype(np.float32))
    want = apply_bloom(dye, (bh, bw), mips, cfg.BLOOM_THRESHOLD,
                       cfg.BLOOM_SOFT_KNEE, cfg.BLOOM_INTENSITY)
    assert pb.supported((bh, bw), tuple(mips))
    base = resample_bilinear(dye, (bh, bw))
    with _interp(pb):
        got = pb.bloom_pyramid_pallas(base, mips, cfg.BLOOM_THRESHOLD,
                                      cfg.BLOOM_SOFT_KNEE, cfg.BLOOM_INTENSITY)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_bloom_pyramid_supported_gate():
    import tpufluid.ops.pallas.bloom as pb

    assert not pb.supported((32, 57), ((28, 16),))      # < 2 mips -> zeros path
    assert not pb.supported((256, 455), ((227, 128), (113, 64)), itemsize=2)


def test_backtrace_col_bounds_conservative(rng):
    """The column-occupancy pre-pass bounds must contain every index the
    gather actually uses (skipping a touched group would drop real data)."""
    import tpufluid.ops.pallas.advect as pa

    h, w = 64, 256
    u = jnp.asarray((rng.standard_normal((h, w)) * 900).astype(np.float32))
    dt = 1 / 60
    b0, b1 = pa.backtrace_col_bounds(u, dt, w)
    x = np.clip(np.arange(w)[None, :] - dt * np.asarray(u), 0, w - 1)
    x0 = np.floor(x).astype(int)
    x1 = np.minimum(x0 + 1, w - 1)
    for bi in range(h // 8):
        for bj in range(w // 128):
            blk0 = x0[bi * 8:(bi + 1) * 8, bj * 128:(bj + 1) * 128]
            blk1 = x1[bi * 8:(bi + 1) * 8, bj * 128:(bj + 1) * 128]
            assert int(b0[bi, bj]) <= blk0.min()
            assert int(b1[bi, bj]) >= blk1.max()


def test_tiling_invariance_interior_blocks(rng):
    """Results must not depend on the tile decomposition — pinned at a
    geometry with row- AND column-INTERIOR blocks (windows containing no
    true wall), a class the default pickers rarely produce at test sizes
    and which the rejected interior-fast-path experiment exposed as
    untested (docs/BENCH.md round-6 rejected log), for f32 and bf16."""
    import tpufluid.ops.pallas.stencil as ps

    h, w = 256, 768
    dt = jnp.float32(1 / 60)
    for dt_ in (jnp.float32, jnp.bfloat16):
        p = jnp.asarray(rng.standard_normal((h, w)).astype(np.float32)
                        * 5).astype(dt_)
        d = jnp.asarray(rng.standard_normal((h, w)).astype(np.float32)
                        ).astype(dt_)
        halo = pj._halo(p.dtype.itemsize)
        with _interp(pj):
            # interior tiling: 4 row blocks x 3 col blocks (middle interior)
            a = pj._jacobi_chunk(p, d, 20, halo, 64, 256, (h, w))
            # boundary-only tiling: full-width, 2 row blocks
            b = pj._jacobi_chunk(p, d, 20, halo, 128, w, (h, w))
        assert jnp.array_equal(a, b), "jacobi tiling changed results"
        want = stencil.jacobi_pressure(p.astype(jnp.float32),
                                       d.astype(jnp.float32), 20)
        tol = 3e-6 if dt_ == jnp.float32 else 0.15  # bf16: sweeps in f32
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(want), rtol=tol, atol=tol)

        vel = jnp.asarray((rng.standard_normal((2, h, w)) * 200)
                          ).astype(dt_)
        outs = []
        for tile in ((64, 256), (128, w)):
            with _interp(ps), mock.patch.object(ps, "_pick_tile",
                                                lambda *a, t=tile: t):
                gv, gd = ps.curl_vorticity_divergence(vel, 30.0, dt)
                gg = ps.gradient_subtract(vel, p)
            outs.append((gv, gd, gg))
        # gradient subtract: no FMA sites, bit-identical across chains.
        assert jnp.array_equal(outs[0][2], outs[1][2])
        # confinement chain: different window shapes are different
        # compiled programs, and the compiler's FMA contraction at the
        # chain's mul-add sites (fx*fx + fy*fy, u + fx*scale*dt) is
        # program-dependent — within ~1 ulp-of-chain, not bitwise.
        for x, y in zip(outs[0][:2], outs[1][:2]):
            xf = np.asarray(x, np.float32)
            yf = np.asarray(y, np.float32)
            scale = max(np.abs(yf).max(), 1.0)
            assert np.abs(xf - yf).max() / scale < 1e-6


def test_f16_bits_to_f32_exhaustive():
    """quant.f16_bits_to_f32 decodes EVERY half bit pattern exactly as XLA's
    convert (the staged-f32 path the packed kernel replaces) — including
    subnormals (integer path: immune to VPU flush-to-zero) and infinities;
    NaNs stay NaN (payloads may differ). High-half garbage is ignored."""
    from tpufluid.ops.quant import f16_bits_to_f32

    bits = jnp.arange(65536, dtype=jnp.uint32)
    ours = np.asarray(f16_bits_to_f32(bits | (jnp.uint32(0xABCD) << 16)))
    ref = np.asarray(jax.lax.bitcast_convert_type(
        bits.astype(jnp.uint16), jnp.float16).astype(jnp.float32))
    nan = np.isnan(ref)
    np.testing.assert_array_equal(ours[~nan].view(np.uint32),
                                  ref[~nan].view(np.uint32))
    assert np.isnan(ours[nan]).all()


def test_f16_pack_planes_roundtrip(rng):
    """Pack layout: full pairs (lo/hi), odd trailing channel column-paired
    (x in low, clamp(x+1) in high)."""
    from tpufluid.ops.quant import f16_bits_to_f32, f16_pack_planes

    src = jnp.asarray(rng.standard_normal((3, 8, 16)).astype(np.float16))
    pk = f16_pack_planes(src)
    assert pk.shape == (2, 8, 16) and pk.dtype == jnp.uint32
    np.testing.assert_array_equal(np.asarray(f16_bits_to_f32(pk[0])),
                                  np.asarray(src[0], np.float32))
    np.testing.assert_array_equal(np.asarray(f16_bits_to_f32(pk[0] >> 16)),
                                  np.asarray(src[1], np.float32))
    np.testing.assert_array_equal(np.asarray(f16_bits_to_f32(pk[1])),
                                  np.asarray(src[2], np.float32))
    xp = np.asarray(f16_bits_to_f32(pk[1] >> 16))
    want = np.concatenate([np.asarray(src[2, :, 1:], np.float32),
                           np.asarray(src[2, :, -1:], np.float32)], axis=-1)
    np.testing.assert_array_equal(xp, want)


@pytest.mark.parametrize("channels", [2, 3])
def test_advect_f16_packed_bitexact_vs_staged(channels, rng):
    """The channel-packed float16 gather (round-4 verdict #1): pre-packed
    uint32 planes + in-register half decode must be BIT-IDENTICAL to the
    staged-f32 kernel on the f32-cast source — same f32 math on the same
    values, ceil(C/2) gathers per corner instead of C. Sources include
    half subnormals (decode's integer path) and exact zeros."""
    import tpufluid.ops.pallas.advect as pa
    from tpufluid.ops.quant import f16_pack_planes

    H, W = 64, 256
    vel16 = jnp.clip(jnp.asarray(
        (rng.standard_normal((2, H, W)) * 700).astype(np.float16)),
        -1000, 1000)
    src_np = rng.random((channels, H, W)).astype(np.float16)
    src_np[:, 10:14, 20:40] = (rng.random((channels, 4, 20)) * 5e-5
                               ).astype(np.float16)  # subnormal halves
    src_np[:, 30:32, :] = 0.0
    src16 = jnp.asarray(src_np)
    dt = jnp.float32(0.016666)
    vel = vel16.astype(jnp.float32)
    with _interp(pa):
        want = pa.advect_pallas(vel, src16.astype(jnp.float32), dt, 0.7,
                                max_disp_x=1000.0 / 60.0)
        got = pa.advect_pallas(vel, f16_pack_planes(src16), dt, 0.7,
                               max_disp_x=1000.0 / 60.0, f16c=channels)
    assert got.dtype == jnp.float32
    # XLA:CPU contracts the two graphs' bilinear FMAs differently (1-ULP
    # stragglers, same effect as test_jacobi_exact_equals_masked); measured
    # max |diff| 6e-8 here. Device bit-equality is pinned in test_tpu.py.
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-7, atol=3e-7)
    # The decoded packed values themselves are exact: zero-velocity advection
    # (pure decode + dissipation, no bilinear mix) must agree bitwise.
    with _interp(pa):
        g0 = pa.advect_pallas(jnp.zeros_like(vel), f16_pack_planes(src16),
                              dt, 0.7, max_disp_x=1000.0 / 60.0,
                              f16c=channels)
        w0 = pa.advect_pallas(jnp.zeros_like(vel),
                              src16.astype(jnp.float32), dt, 0.7,
                              max_disp_x=1000.0 / 60.0)
    np.testing.assert_array_equal(np.asarray(g0), np.asarray(w0))


def test_advect_hbm_f16_packed_bitexact_vs_staged(rng):
    """The HBM-segment kernel's pre-packed float16 mode (the demo's 8x
    dye/sim cross-resolution geometry) must be bit-close to the staged-f32
    HBM kernel on the f32-cast source (XLA:CPU FMA contraction allows
    1-ULP stragglers; device equality class pinned by the windowed test)."""
    import tpufluid.ops.pallas.advect_hbm as ah
    from tpufluid.ops.quant import f16_pack_planes

    H, W, C = 128, 256, 3
    vel16 = jnp.clip(jnp.asarray(
        (rng.standard_normal((2, H, W)) * 700).astype(np.float16)),
        -1000, 1000)
    src16 = jnp.asarray(rng.random((C, H, W)).astype(np.float16))
    dt = jnp.float32(0.016666)
    vel = vel16.astype(jnp.float32)
    mdx = 8.0 * 1000.0 / 60.0  # demo-scale column bound
    with _interp(ah):
        want = ah.advect_pallas_hbm(vel, src16.astype(jnp.float32), dt, 1.0,
                                    max_disp_x=mdx)
        got = ah.advect_pallas_hbm(vel, f16_pack_planes(src16), dt, 1.0,
                                   max_disp_x=mdx, f16c=C)
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-7, atol=3e-7)


def test_padded_shape_row_divisor_repair():
    """The 304^2 serving cliff (docs/BENCH.md round 14): heights like
    304 = 16*19 offer only 16-row blocks to the bf16 kernels — 5x halo
    overcompute per sweep, measured at 45% of neighboring grids' texel
    rate — so _padded_shape steps them up to the next divisor-friendly
    height inside the pad budget."""
    from tpufluid.ops.pallas.dispatch import _padded_shape

    for kind in ("jacobi", "stencil", "advect"):
        assert _padded_shape(304, 304, kind, 2) == (320, 384), kind
    # f32's align-8 divisor set already serves 304 (152-row blocks fit).
    assert _padded_shape(304, 304, "jacobi", 4) == (304, 384)
    # Friendly heights stay put — hp == h is what keeps the select-free
    # Jacobi chain engaged on unpadded grids (ops/pallas/jacobi._exact_fits).
    for h in (128, 256, 288, 320, 512, 1024):
        for it in (2, 4):
            assert _padded_shape(h, h, "jacobi", it)[0] == h, (h, it)
    # Budget guard: when every divisor-friendly height would bust the +60%
    # pad budget, keep the (cheap, small-grid) bad divisors instead of
    # refusing the kernel outright.
    assert _padded_shape(96, 96, "jacobi", 2) == (96, 128)


def test_dispatch_repaired_pad_matches_oracle(rng):
    """Dispatch at a repaired height (bf16 304 -> 320 pad): jacobi, the
    fused pre-pressure stencil, and advection routed through
    ops/pallas/dispatch (interpret kernels, _on_tpu mocked) match the jnp
    oracle path on the true region at the 16-bit tolerance class."""
    import tpufluid.ops.pallas.dispatch as D
    import tpufluid.ops.pallas.advect as pa
    from tpufluid.ops.advect import advect

    H, W = 304, 256
    bf = jnp.bfloat16
    dt = jnp.float32(0.016666)
    vel = jnp.clip(jnp.asarray(rng.standard_normal((2, H, W)) * 400),
                   -1000, 1000).astype(bf)
    src = jnp.asarray(rng.random((3, H, W))).astype(bf)
    p = jnp.asarray(rng.standard_normal((H, W))).astype(bf)
    d = jnp.asarray(rng.standard_normal((H, W))).astype(bf)

    with mock.patch.object(D, "_on_tpu", lambda: True), _interp(pa):
        got_p = D.jacobi_pressure(p, d, 12)
        got_v, got_d = D.pre_pressure(vel, 30.0, dt)
        got_a = D.advect_same_grid(vel, src, dt, 1.0,
                                   max_disp_y=1000.0 / 60.0,
                                   max_disp_x=1000.0 / 60.0)
    want_p = stencil.jacobi_pressure(p.astype(jnp.float32),
                                     d.astype(jnp.float32), 12)
    np.testing.assert_allclose(np.asarray(got_p, np.float32),
                               np.asarray(want_p), rtol=0, atol=0.05)
    vf = vel.astype(jnp.float32)
    c = stencil.curl(vf)
    v1 = stencil.vorticity_confinement(vf, c, 30.0, dt)
    d1 = stencil.divergence(v1)
    assert float(jnp.abs(got_v.astype(jnp.float32) - v1).max()) \
        < 0.02 * float(jnp.abs(v1).max()) + 1e-6
    assert float(jnp.abs(got_d.astype(jnp.float32) - d1).max()) \
        < 0.05 * float(jnp.abs(d1).max()) + 1e-6
    want_a = advect(vf, src.astype(jnp.float32), dt, 1.0)
    np.testing.assert_allclose(np.asarray(got_a, np.float32),
                               np.asarray(want_a), rtol=0, atol=0.02)
