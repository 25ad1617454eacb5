"""Communication-explicit sharded step: shard_map + halo exchange around the
SAME kernel suite the single-device step uses.

Every field is row-sharded over the 1-D mesh (tpufluid.parallel.mesh). Each
phase exchanges a ghost-row halo sized for its stencil/backtrace reach, then
runs the shared dispatch op (Pallas kernels on TPU, the jnp oracle elsewhere
— tpufluid.ops.pallas.dispatch) on the PADDED block and keeps the central
rows. This deletes the round-1 duplicate jnp physics: the sharded path and
the single-device path execute one implementation.

Exactness on padded blocks:
  * interior ghosts hold REAL neighbor data, so stencils/backtraces within
    the halo read global values;
  * at the global boundary the exchange replicates the edge row
    (parallel/halo.py) — exactly CLAMP_TO_EDGE for SINGLE-layer reads and
    gathers (bilinear samples between replicas equal the edge value);
  * ITERATED sweeps are different: a replicated ghost EVOLVES unlike a
    clamped boundary, so the Jacobi phase MIRRORS its boundary ghosts
    (ghost[-k] = p[k-1]); the mirror is a fixed point of the symmetric
    5-point sweep, making the true edge row see B == p[edge] every sweep —
    the clamp semantic — while the kernel's own padded-edge masks stay
    >=`_G_JACOBI` > sweeps rows away from any true row;
  * the fused curl->confinement->divergence kernel chains 3 stencil layers,
    so its outputs at the global WALL rows see a second-layer ghost artifact
    (|curl| of a replicated band loses the wall term) — the wall bands are
    recomputed with the jnp oracle ops on an 8-row strip whose array edge IS
    the wall (vel' rows {0,-1}; div rows {0,1,-2,-1}, which also restores the
    -C reflection, script.js:804-807);
  * the projection is SPLIT here (gradient_subtract, exchange, self-advect)
    rather than fused: the gather's source ghosts must be the exchanged
    projected velocity, not ghost-side recomputations.

Halo widths may exceed a shard's block height (flagship dye advection);
exchange_halo_rows chains multi-hop ppermutes for that. dt and velocity obey
the reference clamps (script.js:1191, 863), which bound every backtrace.
"""

from __future__ import annotations

import math
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from tpufluid.config import FluidConfig
from tpufluid.ops import stencil as _ops
from tpufluid.ops.pallas import dispatch as K
from tpufluid.ops.splat import SPLAT_B, SPLAT_DX, SPLAT_DY, SPLAT_R, splat_factors
from tpufluid.parallel.halo import exchange_halo_rows
from tpufluid.parallel.mesh import ROW_AXIS, make_mesh, state_specs
from tpufluid.state import FluidState

MAX_DT = 1.0 / 60.0  # reference dt clamp (script.js:1191)
MAX_SPEED = 1000.0   # reference velocity clamp (script.js:863)

_G_STENCIL = 16  # >= 3 stencil layers; 16-row aligned for bf16 kernels
_G_JACOBI = 32   # > the 20 sweeps per chunk (mirror-ghost safety margin)
_G_VEL = 32      # >= ceil(1000/60) + bilinear corner
_BAND = 8        # oracle-op wall-band strip height


def _round16(x: float) -> int:
    return max(16, -(-int(math.ceil(x)) // 16) * 16)


def dye_halo_width(config: FluidConfig) -> int:
    """Ghost rows for dye advection: the sim-grid displacement bound scaled
    by the dye/sim resolution ratio, plus the bilinear corner."""
    sw, sh = config.sim_size
    dw, dh = config.dye_size
    return _round16(MAX_SPEED * MAX_DT * dh / sh + 2)


def vel_halo_width(config: FluidConfig) -> int:
    return _G_VEL


def _mirror_wall_ghosts(pad, width: int, idx, h_loc: int, h_total: int):
    """Rewrite ghost rows that fall OUTSIDE the global grid with the MIRROR
    of the rows just inside the wall (ghost at global row -k := row k-1; the
    top wall symmetric). The mirror is the fixed point that makes iterated
    symmetric sweeps equal clamped boundary reads (module docstring). EVERY
    device whose ghost region crosses a wall needs this, not just the edge
    devices — the mirrored source rows provably lie within its own pad."""
    hp = pad.shape[-2]
    base = idx * h_loc - width
    gr = base + jnp.arange(hp)
    m = jnp.where(gr < 0, -gr - 1,
                  jnp.where(gr > h_total - 1, 2 * h_total - 1 - gr, gr))
    src = jnp.clip(m - base, 0, hp - 1)
    return jnp.take(pad, src, axis=-2)


def _splat_bump(gy_rows, gx, amt):
    """(C, rows, W) separable splat bump for a band of gy rows."""
    return jnp.einsum("rs,sc,sw->crw", gy_rows.astype(jnp.float32),
                      amt.astype(jnp.float32), gx.astype(jnp.float32))


def sharded_fluid_step(state: FluidState, dt, splats, config: FluidConfig) -> FluidState:
    """The shard_map body: halo exchanges around the shared dispatch ops."""
    dt = jnp.minimum(jnp.asarray(dt, jnp.float32), MAX_DT)  # calcDeltaTime clamp
    idx = lax.axis_index(ROW_AXIS)
    n = lax.axis_size(ROW_AXIS)

    sw, sh_g = config.sim_size  # global (w, h)
    dw, dh_g = config.dye_size
    vel = state.velocity
    dye = state.dye
    h_loc = vel.shape[-2]
    hd_loc = dye.shape[-2]
    aspect = config.aspect_ratio
    radius = config.splat_radius_uv()
    first = idx == 0
    last = idx == n - 1

    # ---- splat + curl + vorticity + divergence (one fused pass) ----
    # Splat factors use clamped GLOBAL row coords for the padded block, so
    # boundary ghost replicas carry exactly the edge row's bump.
    g = _G_STENCIL
    vel_pad = exchange_halo_rows(vel, g)
    gy_v, gx_v, amt_v = splat_factors(
        splats, h_loc + 2 * g, sw, radius, aspect, slice(SPLAT_DX, SPLAT_DY + 1),
        row0=idx * h_loc - g, h_total=sh_g)
    velp, div = K.pre_pressure(vel_pad, config.CURL, dt,
                               splat_factors=(gy_v, gx_v, amt_v))
    vel = velp[:, g:-g]
    div = div[g:-g]

    # Wall-band fix: rerun the oracle chain on an 8-row strip whose array
    # edge IS the global wall (exact clamp + -C reflection semantics).
    def band_chain(raw_band):
        c = _ops.curl(raw_band)
        v2 = _ops.vorticity_confinement(raw_band, c, config.CURL, dt)
        return v2, _ops.divergence(v2)

    bot_raw = (vel_pad[:, g:g + _BAND].astype(jnp.float32)
               + _splat_bump(gy_v[g:g + _BAND], gx_v, amt_v)).astype(vel.dtype)
    top_raw = (vel_pad[:, -g - _BAND:-g].astype(jnp.float32)
               + _splat_bump(gy_v[-g - _BAND:-g], gx_v, amt_v)).astype(vel.dtype)
    vb, db = band_chain(bot_raw)
    vt, dtop = band_chain(top_raw)
    vel = jnp.where(first, vel.at[:, :1].set(vb[:, :1]), vel)
    div = jnp.where(first, div.at[:2].set(db[:2]), div)
    vel = jnp.where(last, vel.at[:, -1:].set(vt[:, -1:]), vel)
    div = jnp.where(last, div.at[-2:].set(dtop[-2:]), div)

    # ---- pressure: warm start + Jacobi, K sweeps per halo exchange ----
    # One mirror-ghost exchange amortizes 20 per-sweep collectives
    # (structurally, ring attention's per-step neighbor passing).
    p = state.pressure
    iters = config.PRESSURE_ITERATIONS
    if iters == 0:
        p = (p.astype(jnp.float32) * config.PRESSURE).astype(p.dtype)
    else:
        div_pad = _mirror_wall_ghosts(exchange_halo_rows(div, _G_JACOBI),
                                      _G_JACOBI, idx, h_loc, sh_g)
        done = 0
        while done < iters:
            k = min(20, iters - done)
            p_pad = _mirror_wall_ghosts(exchange_halo_rows(p, _G_JACOBI),
                                        _G_JACOBI, idx, h_loc, sh_g)
            p_pad = K.jacobi_pressure(p_pad, div_pad, k,
                                      prescale=config.PRESSURE if done == 0 else 1.0)
            p = p_pad[_G_JACOBI:-_G_JACOBI]
            done += k

    # ---- projection, then velocity self-advection ----
    # Split (not the single-device fused kernel): the gather's source ghosts
    # must be the exchanged PROJECTED velocity.
    gs = _G_STENCIL
    vel = K.gradient_subtract(exchange_halo_rows(vel, gs),
                              exchange_halo_rows(p, gs))[:, gs:-gs]
    gv = _G_VEL
    vel_pad = exchange_halo_rows(vel, gv)
    max_disp = MAX_SPEED * MAX_DT
    vel = K.advect_same_grid(vel_pad, vel_pad, dt, config.VELOCITY_DISSIPATION,
                             max_disp, max_disp)[:, gv:-gv]

    # ---- dye advection at dye resolution, splat fused ----
    # Velocity resampled PER SHARD at the padded dye block's global texel
    # centers (clamped = the reference's CLAMP_TO_EDGE bilinear sample,
    # script.js:773-777), rescaled to dye-texels/s.
    gd = dye_halo_width(config)
    dye_pad = exchange_halo_rows(dye, gd)
    vel_pad1 = exchange_halo_rows(vel, 16)
    rows_d = jnp.clip(idx * hd_loc - gd + jnp.arange(hd_loc + 2 * gd,
                                                     dtype=jnp.float32),
                      0, dh_g - 1)
    row_coords = (rows_d + 0.5) / dh_g * sh_g - 0.5 - (idx * h_loc - 16)
    vel_d = _sample_rows_cols(vel_pad1.astype(jnp.float32), row_coords, dw, sw)
    vel_d = jnp.stack([vel_d[0] * (dw / sw), vel_d[1] * (dh_g / sh_g)])

    gy_d, gx_d, amt_d = splat_factors(
        splats, hd_loc + 2 * gd, dw, radius, aspect, slice(SPLAT_R, SPLAT_B + 1),
        row0=idx * hd_loc - gd, h_total=dh_g)
    dye = K.advect_same_grid(vel_d, dye_pad, dt, config.DENSITY_DISSIPATION,
                             max_disp * dh_g / sh_g, max_disp * dw / sw,
                             splat_factors=(gy_d, gx_d, amt_d))[:, gd:-gd]

    return FluidState(velocity=vel, dye=dye, pressure=p)


def _sample_rows_cols(tex, row_coords, w_out: int, w_src_true: int):
    """Separable bilinear sample of (..., h, w) at explicit row coords (texel
    units, local to ``tex``) x standard texel centers of a w_out-wide target
    (CLAMP_TO_EDGE both axes). The shard-aware resample: callers pass row
    coords built from GLOBAL texel centers shifted into the padded block."""
    h, w = tex.shape[-2], tex.shape[-1]
    # columns: global affine map (the width is unsharded)
    xs = (jnp.arange(w_out, dtype=jnp.float32) + 0.5) / w_out * w_src_true - 0.5
    x0 = jnp.floor(xs)
    fx = (xs - x0).astype(tex.dtype)
    ix0 = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    ix1 = jnp.clip(x0.astype(jnp.int32) + 1, 0, w - 1)
    a = jnp.take(tex, ix0, axis=-1)
    b = jnp.take(tex, ix1, axis=-1)
    tex = a + (b - a) * fx
    # rows: explicit coords
    y0 = jnp.floor(row_coords)
    fy = (row_coords - y0).astype(tex.dtype)
    iy0 = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    iy1 = jnp.clip(y0.astype(jnp.int32) + 1, 0, h - 1)
    a = jnp.take(tex, iy0, axis=-2)
    b = jnp.take(tex, iy1, axis=-2)
    fy = fy.reshape((1,) * (tex.ndim - 2) + (-1, 1))
    return a + (b - a) * fy


@lru_cache(maxsize=None)
def make_sharded_step(config: FluidConfig, mesh=None):
    """Compile the shard_map step over a row mesh. Grid heights must divide
    the mesh size. Note: this path always routes through the dispatch ops
    (Pallas on TPU, the jnp oracle elsewhere) — config.USE_PALLAS only
    selects the single-device step's branch."""
    if mesh is None:
        mesh = make_mesh()
    n = mesh.devices.size
    sw, sh = config.sim_size
    dw, dh = config.dye_size
    if sh % n or dh % n:
        raise ValueError(f"grid heights {(sh, dh)} must divide mesh size {n}")

    specs = state_specs()
    body = partial(sharded_fluid_step, config=config)
    mapped = jax.shard_map(
        body, mesh=mesh,
        in_specs=(specs, P(), P()),
        out_specs=specs,
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=0)
