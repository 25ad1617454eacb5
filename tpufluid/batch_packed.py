"""Lane-packed fleet serving: B independent sims side by side in LANES.

TPU arrays tile their minor (lane) dimension in 128s, so a small sim pads
its width in both STORAGE and COMPUTE: the vmapped serving mode
(tpufluid/batch.py) runs each 288-wide sim on a (288, 384) padded grid —
25% dead lanes — and measures 0.91 Gtexel/s of true texels against the
chip's ~1.2 G/s envelope (docs/BENCH.md round 14, the "serving pad waste"
item). Packing the fleet into ONE ``(C, H, B*W)`` array makes the lane
dimension exactly divisible (64*288 = 144*128): zero pad waste, and the
kernels pipeline one large grid instead of B shallow ones — the packed-
geometry proxy measured 1.51 Gtexel/s (out/packed_proxy.json).

Per-sim walls ride INSIDE the kernels (``sim_w`` plumbing in
ops/pallas/{jacobi,stencil,advect}.py): modular column masks put a TRUE
wall every ``sim_w`` lanes (Jacobi neighbor-of-self, divergence -C
reflection, clamp — reference script.js:786-812,804-807), and the gather
kernels clamp each lane's backtrace at its own sim's walls (the
CLAMP_TO_EDGE contract, script.js:746-784). Every wall mask cuts the
dependency cone at the sim boundary each sweep/pass, so sims never
contaminate each other — the same exactness argument as the sharded
step's wall bands (parallel/sharded_step.py), applied per-lane-segment.

Parity: each packed sim steps exactly like the reference step(dt)
pipeline; the packed fleet matches the vmapped jnp oracle per sim
(tests/test_packed.py; device certification out/jobs/done/p02*).

Restrictions (callers fall back to batch.make_batched_multi_step):

* lock-step dt — one shared clock for the fleet (per-sim dt would need
  per-lane dt vectors inside the kernels; the vmapped mode covers it);
* sim grid == dye grid (the serving geometry, bench config 7);
* ``(B * W) % 128 == 0`` — round the fleet size up with idle sims if
  needed (e.g. 288-wide sims need B % 4 == 0);
* kernel-friendly unpadded geometry (``packed_supported`` checks).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp

from tpufluid.config import MAX_DT, FluidConfig
from tpufluid.state import FluidState
from tpufluid.ops.pallas.common import LANE, row_align
from tpufluid.ops.splat import (SPLAT_ACTIVE, SPLAT_B, SPLAT_DX, SPLAT_DY,
                                SPLAT_R, SPLAT_X, SPLAT_Y)


def pack_fleet(x: jnp.ndarray) -> jnp.ndarray:
    """(B, ..., H, W) -> (..., H, B*W); packed lane index = b*W + x."""
    b, h, w = x.shape[0], x.shape[-2], x.shape[-1]
    mid = x.shape[1:-2]
    return jnp.moveaxis(x, 0, -2).reshape(*mid, h, b * w)


def unpack_fleet(x: jnp.ndarray, batch: int) -> jnp.ndarray:
    """(..., H, B*W) -> (B, ..., H, W): inverse of :func:`pack_fleet`."""
    h, wp = x.shape[-2], x.shape[-1]
    mid = x.shape[:-2]
    return jnp.moveaxis(x.reshape(*mid, h, batch, wp // batch), -2, 0)


def pack_state(batched: FluidState) -> FluidState:
    """Batched state (leading B axis, tpufluid/batch.py) -> packed state."""
    return jax.tree.map(pack_fleet, batched)


def unpack_state(packed: FluidState, batch: int) -> FluidState:
    return jax.tree.map(partial(unpack_fleet, batch=batch), packed)


def init_packed(config: FluidConfig, batch: int) -> FluidState:
    """Zeroed packed fleet state."""
    from tpufluid.state import init_state

    one = init_state(config)
    return jax.tree.map(
        lambda x: jnp.zeros(x.shape[:-1] + (batch * x.shape[-1],), x.dtype),
        one)


def packed_supported(config: FluidConfig, batch: int) -> bool:
    """True when the packed kernel path covers this (config, batch):
    sim == dye grid, f32/bf16, lane-exact packed width, and every kernel
    takes the packed geometry UNPADDED (the sim_w masks assume array
    coords == true coords; tile-padding interplay is the vmapped mode's
    job)."""
    from tpufluid.ops.pallas import advect as _pa
    from tpufluid.ops.pallas import jacobi as _pj
    from tpufluid.ops.pallas import stencil as _ps
    from tpufluid.ops.pallas.dispatch import (_MAX_DISP_SIM_TEXELS,
                                              _padded_shape)

    sw, sh = config.sim_size
    if (sw, sh) != tuple(config.dye_size):
        return False
    if config.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    it = jnp.dtype(config.dtype).itemsize
    wp = batch * sw
    if wp % LANE or sh % row_align(it):
        return False
    for kind in ("jacobi", "stencil", "advect"):
        if _padded_shape(sh, wp, kind, it) != (sh, wp):
            return False
    halo = _pa.halo_for_displacement(_MAX_DISP_SIM_TEXELS)
    span = _pa.group_span_for_displacement(_MAX_DISP_SIM_TEXELS)
    return (_pj.supported((sh, wp), it) and _ps.supported((sh, wp), it)
            and _pa.supported((3, sh, wp), it, halo, span)
            and _pa.supported((2, sh, wp), it, halo, span))


def _packed_splat_bump(field: jnp.ndarray, splats: jnp.ndarray,
                       amount_cols: slice, radius: float, aspect: float,
                       sim_w: int) -> jnp.ndarray:
    """field (C, H, B*W) + per-sim separable gaussian splat bumps, rounded
    to storage (the reference's splat pass writes the half-float FBO that
    the next pass reads, script.js:145-153,1441-1455; the jnp oracle
    ops/splat.apply_splat_batch rounds identically).

    Batched rank-S MXU bump straight into the packed VIEW: the packed
    (C, H, B*W) layout reshapes freely to (C, H, B, W), and one tiny
    (H, S) x (S, W) matmul per sim lands there as einsum -> chbw — the
    block-diagonal sim structure costs B small dots, NOT one dense
    (B*S)-slot dot, and no (B, C, H, W) bump transpose ever materializes
    (the first cut lane-repeated S*C elementwise planes instead; XLA
    materialized them — ~4x the step's whole HBM budget at 288^2 B=64)."""
    c, h, wp = field.shape
    b = wp // sim_w
    u = (jnp.arange(sim_w, dtype=jnp.float32) + 0.5) / sim_w
    v = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    px = (u[None, None, :] - splats[..., SPLAT_X][..., None]) * aspect
    py = v[None, None, :] - splats[..., SPLAT_Y][..., None]
    gx = jnp.exp(-(px * px) / radius)                      # (B, S, W)
    gy = jnp.exp(-(py * py) / radius)                      # (B, S, H)
    amt = (splats[..., amount_cols]
           * splats[..., SPLAT_ACTIVE][..., None])         # (B, S, C)
    bump = jnp.einsum("bsc,bsh,bsw->chbw", amt.astype(jnp.float32), gy, gx,
                      precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=jnp.float32)
    out = field.astype(jnp.float32).reshape(c, h, b, sim_w) + bump
    return out.reshape(c, h, wp).astype(field.dtype)


def _packed_step_kernels(state: FluidState, dt, splats,
                         config: FluidConfig, batch: int) -> FluidState:
    """The packed kernel path (no gating): reference pass order
    (script.js:1231-1294) over the packed fleet, sim_w walls in-kernel.
    Splats are pre-applied with storage rounding (unlike the single-sim
    step's fused bumps, whose dense rank-S dot would not exploit the
    fleet's block-diagonal splat structure)."""
    from tpufluid.ops.pallas import advect as _pa
    from tpufluid.ops.pallas import jacobi as _pj
    from tpufluid.ops.pallas import stencil as _ps
    from tpufluid.ops.pallas.dispatch import _MAX_DISP_SIM_TEXELS

    dt = jnp.minimum(jnp.asarray(dt, jnp.float32), MAX_DT)
    sw, _ = config.sim_size
    radius, aspect = config.splat_radius_uv(), config.aspect_ratio
    vel = _packed_splat_bump(state.velocity, splats,
                             slice(SPLAT_DX, SPLAT_DY + 1), radius, aspect,
                             sim_w=sw)
    dye = _packed_splat_bump(state.dye, splats,
                             slice(SPLAT_R, SPLAT_B + 1), radius, aspect,
                             sim_w=sw)

    halo = _pa.halo_for_displacement(_MAX_DISP_SIM_TEXELS)
    span = _pa.group_span_for_displacement(_MAX_DISP_SIM_TEXELS)
    dye_quant = ("rgb9e5"
                 if config.DYE_RGB9E5 and config.dtype == jnp.bfloat16
                 else None)

    vel, div = _ps.curl_vorticity_divergence(vel, config.CURL, dt, sim_w=sw)
    pressure = _pj.jacobi_pressure(state.pressure, div,
                                   config.PRESSURE_ITERATIONS,
                                   prescale=config.PRESSURE, sim_w=sw)
    vel = _ps.gradient_subtract(vel, pressure, sim_w=sw)
    vel = _pa.advect_pallas(vel, vel, dt, config.VELOCITY_DISSIPATION,
                            halo=halo, span=span,
                            max_disp_x=_MAX_DISP_SIM_TEXELS, sim_w=sw)
    dye = _pa.advect_pallas(vel, dye, dt, config.DENSITY_DISSIPATION,
                            halo=halo, span=span,
                            max_disp_x=_MAX_DISP_SIM_TEXELS,
                            quant=dye_quant, sim_w=sw)
    return FluidState(velocity=vel, dye=dye, pressure=pressure)


def packed_fluid_step(state: FluidState, dt, splats, config: FluidConfig,
                      batch: int) -> FluidState:
    """One lock-step fleet step on packed state (C, H, B*W); ``splats`` is
    (B, MAX_SPLATS, 8). Off-TPU or on unsupported geometry this unpacks,
    runs the vmapped single-sim step, and repacks — bit-identical
    semantics, so the packed layout is safe to hold everywhere."""
    from tpufluid.ops.pallas.dispatch import _on_tpu

    if _on_tpu() and packed_supported(config, batch):
        return _packed_step_kernels(state, dt, splats, config, batch)
    from tpufluid.step import fluid_step

    st = unpack_state(state, batch)
    out = jax.vmap(partial(fluid_step, config=config),
                   in_axes=(0, None, 0))(st, jnp.asarray(dt, jnp.float32),
                                         splats)
    return pack_state(out)


@lru_cache(maxsize=None)
def make_packed_step(config: FluidConfig, batch: int):
    """Compile step(packed_state, dt, splats) -> packed_state (donated)."""
    step = partial(packed_fluid_step, config=config, batch=batch)
    return jax.jit(step, donate_argnums=0)


@lru_cache(maxsize=None)
def make_packed_multi_step(config: FluidConfig, batch: int):
    """Compile multi(packed_state, dt, splats_seq) -> packed_state: a
    lax.scan of T lock-step fleet steps in ONE dispatch (the packed analog
    of batch.make_batched_multi_step; splats_seq is (T, B, MAX_SPLATS, 8),
    dt a scalar or (T,))."""

    def multi(state: FluidState, dt, splats_seq):
        t = splats_seq.shape[0]
        dts = jnp.broadcast_to(jnp.asarray(dt, jnp.float32).reshape(-1), (t,))

        def body(s, xs):
            dt_t, splats_t = xs
            return packed_fluid_step(s, dt_t, splats_t, config,
                                     splats_seq.shape[1]), None

        out, _ = jax.lax.scan(body, state, (dts, splats_seq))
        return out

    return jax.jit(multi, donate_argnums=0)
