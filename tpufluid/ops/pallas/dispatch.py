"""Backend dispatch: fused Pallas kernels on TPU, jnp oracle elsewhere.

Dispatch is resolved at trace time (backend and shapes are static), so there
is zero runtime cost. Any shape the kernels do not support (lane-unaligned
widths, tiny grids) silently falls back to the jnp path, which is always
semantically identical.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpufluid.ops import stencil as _jnp
from tpufluid.ops.advect import advect as _jnp_advect_fn
from tpufluid.ops.sampling import resample_bilinear, sample_bilinear, uv_grid


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def pre_pressure(velocity, curl_strength, dt):
    """(vel', divergence): curl -> vorticity confinement -> divergence."""
    if _on_tpu():
        from tpufluid.ops.pallas import stencil as _pl

        if _pl.supported(velocity.shape[-2:], velocity.dtype.itemsize):
            return _pl.curl_vorticity_divergence(velocity, curl_strength, dt)
    c = _jnp.curl(velocity)
    vel = _jnp.vorticity_confinement(velocity, c, curl_strength, dt)
    return vel, _jnp.divergence(vel)


def jacobi_pressure(pressure, div, iterations):
    if _on_tpu():
        from tpufluid.ops.pallas import jacobi as _pl

        if _pl.supported(pressure.shape, pressure.dtype.itemsize):
            return _pl.jacobi_pressure(pressure, div, iterations)
    return _jnp.jacobi_pressure(pressure, div, iterations)


def gradient_subtract(velocity, pressure):
    return _jnp.gradient_subtract(velocity, pressure)


def project_and_self_advect(velocity, pressure, dt, dissipation):
    """Fused (vel - grad p) -> self-advection; falls back to two passes."""
    if _on_tpu():
        from tpufluid.ops.pallas import project_advect as _pl

        if _pl.supported(velocity.shape[-2:], velocity.dtype.itemsize):
            return _pl.gradsub_advect_velocity(velocity, pressure, dt, dissipation)
    vel = gradient_subtract(velocity, pressure)
    return advect(vel, vel, dt, dissipation)


def advect(velocity, source, dt, dissipation):
    """Semi-Lagrangian advection; velocity (2,Hs,Ws), source (...,H,W).

    Cross-resolution (dye) advection resamples velocity to the source grid
    with the cheap separable path first (reference samples velocity bilinearly
    at dye uv, script.js:773-777 — identical math), then runs the same-grid
    gather kernel.
    """
    h, w = source.shape[-2], source.shape[-1]
    if _on_tpu():
        from tpufluid.ops.pallas import advect as _pl

        if _pl.supported(source.shape, source.dtype.itemsize):
            vel = velocity
            if velocity.shape[-2:] != (h, w):
                vel = resample_bilinear(velocity, (h, w))
            return _pl.advect_pallas(vel, source, dt, dissipation)
    return _jnp_advect_fn(velocity, source, dt, dissipation)
