"""Kernel-level unit tests: each jnp op vs the loop-based NumPy oracle,
including the CLAMP_TO_EDGE and -C boundary-reflection semantics
(SURVEY.md §4.1)."""

import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.quick  # fast verification subset (CLAUDE.md)

from tpufluid.ops import stencil
from tpufluid.ops.advect import advect
from tpufluid.ops.splat import apply_splat_batch, make_splat_array, splat_field
from tpufluid.ops.sampling import sample_bilinear, sample_bilinear_repeat, resample_bilinear

from tests import reference_impl as ref

H, W = 12, 17


@pytest.fixture
def vel(rng):
    return rng.standard_normal((2, H, W)).astype(np.float32) * 3


@pytest.fixture
def scalar_field(rng):
    return rng.standard_normal((H, W)).astype(np.float32)


def test_curl(vel):
    got = np.asarray(stencil.curl(jnp.asarray(vel)))
    np.testing.assert_allclose(got, ref.np_curl(vel), rtol=1e-5, atol=1e-6)


def test_divergence_boundary_reflection(vel):
    got = np.asarray(stencil.divergence(jnp.asarray(vel)))
    np.testing.assert_allclose(got, ref.np_divergence(vel), rtol=1e-5, atol=1e-6)


def test_vorticity_confinement(vel, rng):
    c = rng.standard_normal((H, W)).astype(np.float32)
    got = np.asarray(stencil.vorticity_confinement(jnp.asarray(vel), jnp.asarray(c), 30.0, 1 / 60))
    want = ref.np_vorticity(vel, c, 30.0, 1 / 60)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_vorticity_velocity_clamp(scalar_field):
    vel = np.full((2, H, W), 5000.0, dtype=np.float32)
    got = np.asarray(stencil.vorticity_confinement(jnp.asarray(vel), jnp.asarray(scalar_field), 30.0, 1 / 60))
    assert got.max() <= 1000.0 and got.min() >= -1000.0


def test_jacobi(scalar_field, rng):
    div = rng.standard_normal((H, W)).astype(np.float32)
    got = np.asarray(stencil.jacobi_pressure(jnp.asarray(scalar_field), jnp.asarray(div), 7))
    want = ref.np_jacobi(scalar_field, div, 7)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_jacobi_solver_converges(vel):
    """Physics property (SURVEY §4.2): the Jacobi iteration converges on the
    compact 5-point system L+R+T+B-4p = div as iterations grow.

    NOTE the projection as a whole does NOT drive divergence to zero — the
    reference's gradientSubtractShader (script.js:892-913) omits the 0.5 on
    the central-difference gradient (GPU Gems ch.38 has it), so it
    over-subtracts 2x and the divergence flips sign instead of vanishing.
    We reproduce the reference's math bit-for-bit; this test therefore checks
    the *solver*, and test_step.py checks long-run boundedness (the property
    the demo actually relies on).
    """
    v = jnp.asarray(vel)
    div = stencil.divergence(v)

    def residual(p):
        L, R, T, B = stencil.neighbors_clamped(p)
        return float(jnp.abs(L + R + T + B - 4.0 * p - div)[2:-2, 2:-2].max())

    p20 = stencil.jacobi_pressure(jnp.zeros_like(div), div, 20)
    p200 = stencil.jacobi_pressure(jnp.zeros_like(div), div, 200)
    assert residual(p200) < residual(p20) * 0.5
    assert residual(p200) < 0.05 * float(jnp.abs(div).max())


def test_gradient_subtract(vel, scalar_field):
    got = np.asarray(stencil.gradient_subtract(jnp.asarray(vel), jnp.asarray(scalar_field)))
    want = ref.np_gradient_subtract(vel, scalar_field)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_sample_bilinear_matches_oracle(rng):
    tex = rng.standard_normal((3, 9, 13)).astype(np.float32)
    uv = rng.random((20, 2)).astype(np.float32) * 1.4 - 0.2  # incl. out of range
    got = np.asarray(sample_bilinear(jnp.asarray(tex), jnp.asarray(uv[:, 0]), jnp.asarray(uv[:, 1])))
    for k in range(20):
        want = ref.np_sample_bilinear(tex, uv[k, 0], uv[k, 1])
        np.testing.assert_allclose(got[:, k], want, rtol=1e-4, atol=1e-5)


def test_sample_at_texel_centers_is_identity(rng):
    tex = rng.standard_normal((5, 8)).astype(np.float32)
    u = (np.arange(8) + 0.5) / 8
    v = (np.arange(5) + 0.5) / 5
    uu, vv = np.meshgrid(u, v)
    got = np.asarray(sample_bilinear(jnp.asarray(tex), jnp.asarray(uu), jnp.asarray(vv)))
    np.testing.assert_allclose(got, tex, rtol=1e-5, atol=1e-6)


def test_sample_repeat_wraps(rng):
    tex = rng.standard_normal((4, 4)).astype(np.float32)
    a = np.asarray(sample_bilinear_repeat(jnp.asarray(tex), jnp.asarray(0.125), jnp.asarray(0.375)))
    b = np.asarray(sample_bilinear_repeat(jnp.asarray(tex), jnp.asarray(1.125), jnp.asarray(-0.625)))
    np.testing.assert_allclose(a, b, rtol=1e-5)


def test_sample_affine_matches_oracle(rng):
    """Separable affine sampling == per-texel bilinear at the same coords
    (clamp and repeat wrap), for offset taps and the sunrays scale-to-center."""
    from tpufluid.ops.sampling import sample_affine

    tex = rng.standard_normal((3, 9, 13)).astype(np.float32)
    for su, ou, sv, ov in [(1.0, 0.0, 1.0, 0.0), (1.0, -0.07, 1.0, 0.11),
                           (0.85, 0.075, 0.85, 0.075), (1.3, -0.2, 0.6, 0.3)]:
        out = np.asarray(sample_affine(jnp.asarray(tex), (6, 10), su, ou, sv, ov))
        for i in range(6):
            for j in range(10):
                u = (j + 0.5) / 10 * su + ou
                v = (i + 0.5) / 6 * sv + ov
                want = ref.np_sample_bilinear(tex, u, v)
                np.testing.assert_allclose(out[:, i, j], want, rtol=1e-4, atol=1e-5)
    # repeat wrap tiles
    d = rng.random((4, 4)).astype(np.float32)
    a = np.asarray(sample_affine(jnp.asarray(d), (8, 8), su=2.0, sv=2.0, wrap=True))
    np.testing.assert_allclose(a[:, :4], a[:, 4:], rtol=1e-5)
    np.testing.assert_allclose(a[:4], a[4:], rtol=1e-5)


def test_resample_matches_pointwise_sampling(rng):
    tex = rng.standard_normal((2, 7, 9)).astype(np.float32)
    out = np.asarray(resample_bilinear(jnp.asarray(tex), (13, 5)))
    for i in range(13):
        for j in range(5):
            want = ref.np_sample_bilinear(tex, (j + 0.5) / 5, (i + 0.5) / 13)
            np.testing.assert_allclose(out[:, i, j], want, rtol=1e-4, atol=1e-5)


def test_advect_velocity_self(vel):
    got = np.asarray(advect(jnp.asarray(vel), jnp.asarray(vel), 1 / 60, 0.2))
    want = ref.np_advect(vel, vel, 1 / 60, 0.2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_advect_dye_cross_resolution(vel, rng):
    dye = rng.random((3, 2 * H, 2 * W)).astype(np.float32)
    got = np.asarray(advect(jnp.asarray(vel), jnp.asarray(dye), 1 / 60, 1.0))
    want = ref.np_advect(vel, dye, 1 / 60, 1.0)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_advect_dissipation_law():
    """Zero velocity: out = in / (1 + k*dt) exactly (script.js:780-781)."""
    vel = np.zeros((2, H, W), dtype=np.float32)
    dye = np.ones((3, H, W), dtype=np.float32)
    out = np.asarray(advect(jnp.asarray(vel), jnp.asarray(dye), 0.5, 2.0))
    np.testing.assert_allclose(out, 0.5, rtol=1e-6)


def test_splat_matches_oracle(rng):
    field = rng.standard_normal((3, H, W)).astype(np.float32)
    got = np.asarray(splat_field(jnp.asarray(field), 0.3, 0.7, jnp.asarray([1.0, 2.0, -1.0]), 0.01, 1.5))
    want = ref.np_splat(field, 0.3, 0.7, [1.0, 2.0, -1.0], 0.01, 1.5)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_splat_batch_masks_inactive(rng):
    vel = jnp.zeros((2, H, W))
    dye = jnp.zeros((3, H, W))
    batch = make_splat_array([(0.5, 0.5, 10.0, -5.0, (1.0, 0.5, 0.2))], 4)
    v1, d1 = apply_splat_batch(vel, dye, batch, 0.01, 1.0)
    # Inactive rows contribute nothing even with garbage values.
    garbage = batch.at[2].set(jnp.array([0.5, 0.5, 99.0, 99.0, 9, 9, 9, 0.0]))
    v2, d2 = apply_splat_batch(vel, dye, garbage, 0.01, 1.0)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2))
    assert float(jnp.abs(v1).max()) > 1.0
