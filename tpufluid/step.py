"""The simulation step — reference ``step(dt)`` (/root/reference/script.js:1231-1294)
as ONE pure jitted function.

Pass order (identical to the reference, which executes ~27 GL draw calls):
  splats -> curl -> vorticity confinement -> divergence -> pressure warm-start
  (x PRESSURE) -> Jacobi x N -> gradient subtract -> self-advect velocity ->
  advect dye.

The reference's applyInputs() runs immediately before step() each frame
(script.js:1181-1183), so splat injection is folded into the same jit here.
Buffer donation replaces the FBO ping-pong: XLA aliases the state buffers
in place, so a step at steady state allocates nothing.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp

from tpufluid.config import MAX_DT, FluidConfig
from tpufluid.ops import splat as splat_ops
from tpufluid.ops import stencil
from tpufluid.ops.advect import advect
from tpufluid.state import FluidState


def apply_splats(state: FluidState, splats: jnp.ndarray, config: FluidConfig) -> FluidState:
    """Inject a (MAX_SPLATS, 8) batch of impulses (reference splat(), script.js:1441-1455)."""
    velocity, dye = splat_ops.apply_splat_batch(
        state.velocity, state.dye, splats,
        radius=config.splat_radius_uv(), aspect=config.aspect_ratio,
    )
    return FluidState(velocity=velocity, dye=dye, pressure=state.pressure)


def fluid_step(state: FluidState, dt, splats, config: FluidConfig) -> FluidState:
    """One simulation step. ``dt`` is a traced scalar (seconds), ``splats`` a
    (MAX_SPLATS, 8) event batch (rows with active=0 are no-ops)."""
    # The reference clamps dt to the literal 0.016666 s every frame
    # (calcDeltaTime, script.js:1188-1194) — NOT 1/60; see config.MAX_DT.
    # The Pallas advection kernels size their halo windows from the looser
    # 1/60 bound, which stays valid.
    dt = jnp.minimum(jnp.asarray(dt, jnp.float32), MAX_DT)
    # Opt-in packed-dye gather storage (config.DYE_RGB9E5, bf16 only): the
    # dye source quantizes through shared-exponent RGB9E5 at the sampling
    # boundary (ops/quant.py) — 2 gathers/trip instead of 3 in the kernels,
    # identical quantization in the jnp path.
    dye_quant = ("rgb9e5" if config.DYE_RGB9E5 and config.dtype == jnp.bfloat16
                 else None)

    if config.USE_PALLAS:
        from tpufluid.ops.pallas import dispatch as K
        from tpufluid.ops.splat import SPLAT_B, SPLAT_DX, SPLAT_DY, SPLAT_R, splat_factors

        # Both splats ride inside kernels as separable rank-S bumps: the
        # velocity splat in the pre-pressure stencil kernel, the dye splat in
        # the dye-advection gather kernel (an MXU matmul over each source
        # window) — zero extra HBM passes for splat injection.
        radius, aspect = config.splat_radius_uv(), config.aspect_ratio
        dh, dw = state.dye.shape[-2:]
        gy_d, gx_d, amt_d = splat_factors(splats, dh, dw, radius, aspect,
                                          slice(SPLAT_R, SPLAT_B + 1))
        vh, vw = state.velocity.shape[-2:]
        gy_v, gx_v, amt_v = splat_factors(splats, vh, vw, radius, aspect,
                                          slice(SPLAT_DX, SPLAT_DY + 1))
        vel, div = K.pre_pressure(state.velocity, config.CURL, dt,
                                  splat_factors=(gy_v, gx_v, amt_v))
        # Warm start (clearShader p *= PRESSURE, script.js:1253-1257) is
        # fused into the Jacobi kernel's first sweep.
        pressure = K.jacobi_pressure(state.pressure, div,
                                     config.PRESSURE_ITERATIONS,
                                     prescale=config.PRESSURE)
        vel = K.project_and_self_advect(vel, pressure, dt, config.VELOCITY_DISSIPATION)
        dye = K.advect(vel, state.dye, dt, config.DENSITY_DISSIPATION,
                       splat_factors=(gy_d, gx_d, amt_d), quant=dye_quant)
    else:
        state = apply_splats(state, splats, config)
        vel = state.velocity
        curl_field = stencil.curl(vel)
        vel = stencil.vorticity_confinement(vel, curl_field, config.CURL, dt)
        div = stencil.divergence(vel)
        pressure = state.pressure * config.PRESSURE
        pressure = stencil.jacobi_pressure(pressure, div, config.PRESSURE_ITERATIONS)
        vel = stencil.gradient_subtract(vel, pressure)
        vel = advect(vel, vel, dt, config.VELOCITY_DISSIPATION)
        dye = advect(vel, state.dye, dt, config.DENSITY_DISSIPATION,
                     quant=dye_quant)

    return FluidState(velocity=vel, dye=dye, pressure=pressure)


@lru_cache(maxsize=None)
def make_step(config: FluidConfig):
    """Compile step(state, dt, splats) -> state with donated state buffers."""
    step = partial(fluid_step, config=config)
    return jax.jit(step, donate_argnums=0)


@lru_cache(maxsize=None)
def make_multi_step(config: FluidConfig):
    """Compile multi_step(state, dt, splats_seq) -> state: a lax.scan of steps.

    ``splats_seq`` has shape (T, MAX_SPLATS, 8) — one event batch per step.
    ``dt`` is a scalar (constant rate) or a (T,) per-step array (Trace v2:
    the reference recomputes dt from wall time every frame, script.js:1188-1194).
    This is the trace-replay / benchmark entry point: T steps, one dispatch.
    """

    def multi(state: FluidState, dt, splats_seq):
        t = splats_seq.shape[0]
        dts = jnp.broadcast_to(jnp.asarray(dt, jnp.float32).reshape(-1), (t,))

        def body(s, xs):
            dt_t, splats_t = xs
            return fluid_step(s, dt_t, splats_t, config), None

        out, _ = jax.lax.scan(body, state, (dts, splats_seq))
        return out

    return jax.jit(multi, donate_argnums=0)
