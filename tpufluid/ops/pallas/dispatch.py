"""Backend dispatch: fused Pallas kernels on TPU, jnp oracle elsewhere.

Each function mirrors one in tpufluid.ops.stencil. Dispatch is resolved at
trace time (backend and shapes are static), so there is zero runtime cost.
"""

from __future__ import annotations

import jax

from tpufluid.ops import stencil as _jnp


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def curl(velocity):
    return _jnp.curl(velocity)


def vorticity_confinement(velocity, curl_field, curl_strength, dt):
    return _jnp.vorticity_confinement(velocity, curl_field, curl_strength, dt)


def divergence(velocity):
    return _jnp.divergence(velocity)


def jacobi_pressure(pressure, div, iterations):
    if _on_tpu():
        from tpufluid.ops.pallas import jacobi as _pl

        if _pl.supported(pressure.shape):
            return _pl.jacobi_pressure(pressure, div, iterations)
    return _jnp.jacobi_pressure(pressure, div, iterations)


def gradient_subtract(velocity, pressure):
    return _jnp.gradient_subtract(velocity, pressure)
