"""Communication-explicit sharded step: shard_map + per-stencil halo exchange.

Every field is row-sharded over the 1-D mesh (tpufluid.parallel.mesh). Each
stencil pass exchanges a 1-row halo; the Jacobi loop does one exchange per
sweep (structurally identical to ring attention's per-step neighbor passing,
SURVEY.md §5.7); semi-Lagrangian advection exchanges a halo wide enough for
the maximum backtrace displacement, which the reference bounds by construction
(velocity clamped to +/-1000 sim-texels/s, script.js:863, and dt clamped to
1/60 s, script.js:1191 => displacement <= ~16.7 sim texels).

Semantics match tpufluid.step.fluid_step exactly (tested on the 8-device CPU
mesh against the single-device step).
"""

from __future__ import annotations

import math
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from tpufluid.config import FluidConfig
from tpufluid.parallel.halo import exchange_halo_rows
from tpufluid.parallel.mesh import ROW_AXIS, make_mesh, state_specs
from tpufluid.state import FluidState

MAX_DT = 1.0 / 60.0  # reference dt clamp (script.js:1191)
MAX_SPEED = 1000.0   # reference velocity clamp (script.js:863)


def _col_neighbors(f):
    """L, R along the unsharded column axis with clamp-to-edge."""
    pad = [(0, 0)] * (f.ndim - 2) + [(0, 0), (1, 1)]
    p = jnp.pad(f, pad, mode="edge")
    return p[..., :, 0:-2], p[..., :, 2:]


def _row_neighbors_from_pad(fp):
    """T, B from a (..., h+2, W) 1-ghost-row padded block."""
    return fp[..., 2:, :], fp[..., 0:-2, :]


def _local_uv(h_local: int, w: int, h_global: int, idx):
    """Texel-center (u, v) for this device's row block."""
    row0 = idx * h_local
    u = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    vrows = (row0 + jnp.arange(h_local, dtype=jnp.float32) + 0.5) / h_global
    return jnp.broadcast_to(u[None, :], (h_local, w)), jnp.broadcast_to(vrows[:, None], (h_local, w))


def _gather_padded(tex_pad, x, y_local):
    """Bilinear gather on a padded local block. x: global col coord (texels,
    already x*W-0.5); y_local: row coord in padded-local texel units."""
    hp, wp = tex_pad.shape[-2], tex_pad.shape[-1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y_local)
    fx = x - x0
    fy = y_local - y0
    ix0 = jnp.clip(x0.astype(jnp.int32), 0, wp - 1)
    ix1 = jnp.clip(x0.astype(jnp.int32) + 1, 0, wp - 1)
    iy0 = jnp.clip(y0.astype(jnp.int32), 0, hp - 1)
    iy1 = jnp.clip(y0.astype(jnp.int32) + 1, 0, hp - 1)

    def g(iy, ix):
        if tex_pad.ndim == 2:
            return tex_pad[iy, ix]
        return tex_pad[..., iy, ix]

    a, b, c, d = g(iy0, ix0), g(iy0, ix1), g(iy1, ix0), g(iy1, ix1)
    fx = fx.astype(tex_pad.dtype)
    fy = fy.astype(tex_pad.dtype)
    top = a + (b - a) * fx
    bot = c + (d - c) * fx
    return top + (bot - top) * fy


def vel_halo_width(config: FluidConfig) -> int:
    """Ghost rows needed by velocity self-advection (+1 bilinear corner, +1 slack)."""
    return int(math.ceil(MAX_SPEED * MAX_DT)) + 2


def dye_halo_width(config: FluidConfig) -> int:
    sw, sh = config.sim_size
    dw, dh = config.dye_size
    return int(math.ceil(MAX_SPEED * MAX_DT * dh / sh)) + 2


def sharded_fluid_step(state: FluidState, dt, splats, config: FluidConfig) -> FluidState:
    """The shard_map body: identical math to fluid_step on row blocks."""
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

    # ---- splats (reference splat(), script.js:1441-1455) ----
    u_s, v_s = _local_uv(h_loc, sw, sh_g, idx)
    u_d, v_d = _local_uv(hd_loc, dw, dh_g, idx)

    def splat_body(i, carry):
        v_f, d_f = carry
        row = splats[i]
        active = row[7]
        px = (u_s - row[0]) * aspect
        py = v_s - row[1]
        g = jnp.exp(-(px * px + py * py) / radius).astype(v_f.dtype)
        vamt = jnp.stack([row[2], row[3]]) * active
        v_f = v_f + vamt.astype(v_f.dtype)[:, None, None] * g[None]
        pxd = (u_d - row[0]) * aspect
        pyd = v_d - row[1]
        gd = jnp.exp(-(pxd * pxd + pyd * pyd) / radius).astype(d_f.dtype)
        camt = row[4:7] * active
        d_f = d_f + camt.astype(d_f.dtype)[:, None, None] * gd[None]
        return v_f, d_f

    vel, dye = lax.fori_loop(0, splats.shape[0], splat_body, (vel, dye))

    first = idx == 0
    last = idx == n - 1

    # ---- curl (script.js:814-833) ----
    vel_p1 = exchange_halo_rows(vel, 1)
    Lv, Rv = _col_neighbors(vel[1])
    Tu, Bu = _row_neighbors_from_pad(vel_p1[0])
    curl_f = 0.5 * (Rv - Lv - Tu + Bu)

    # ---- vorticity confinement (script.js:835-866), highp f32 ----
    cf = exchange_halo_rows(curl_f.astype(jnp.float32), 1)
    c32 = cf[1:-1]
    Lc, Rc = _col_neighbors(c32)
    Tc, Bc = _row_neighbors_from_pad(cf)
    fx = 0.5 * (jnp.abs(Tc) - jnp.abs(Bc))
    fy = 0.5 * (jnp.abs(Rc) - jnp.abs(Lc))
    inv_len = 1.0 / (jnp.sqrt(fx * fx + fy * fy) + 1e-4)
    scale = config.CURL * c32 * inv_len
    v32 = vel.astype(jnp.float32)
    vel = jnp.clip(
        jnp.stack([v32[0] + fx * scale * dt, v32[1] - fy * scale * dt]),
        -1000.0, 1000.0,
    ).astype(vel.dtype)

    # ---- divergence with -C wall reflection (script.js:786-812) ----
    vel_p1 = exchange_halo_rows(vel, 1)
    Lu, Ru = _col_neighbors(vel[0])
    Tv, Bv = _row_neighbors_from_pad(vel_p1[1])
    u_c, v_c = vel[0], vel[1]
    Lu = Lu.at[:, 0].set(-u_c[:, 0])
    Ru = Ru.at[:, -1].set(-u_c[:, -1])
    # Row walls live on the first/last devices only.
    Bv = jnp.where(first, Bv.at[0, :].set(-v_c[0, :]), Bv)
    Tv = jnp.where(last, Tv.at[-1, :].set(-v_c[-1, :]), Tv)
    div = 0.5 * (Ru - Lu + Tv - Bv)

    # ---- pressure: warm start + Jacobi with per-sweep halo exchange ----
    p = state.pressure * config.PRESSURE

    def jacobi_body(_, p):
        pp = exchange_halo_rows(p, 1)
        Lp, Rp = _col_neighbors(p)
        Tp, Bp = _row_neighbors_from_pad(pp)
        return (Lp + Rp + Tp + Bp - div) * 0.25

    p = lax.fori_loop(0, config.PRESSURE_ITERATIONS, jacobi_body, p)

    # ---- gradient subtract (script.js:892-913) ----
    pp = exchange_halo_rows(p, 1)
    Lp, Rp = _col_neighbors(p)
    Tp, Bp = _row_neighbors_from_pad(pp)
    vel = jnp.stack([vel[0] - (Rp - Lp), vel[1] - (Tp - Bp)])

    # ---- self-advect velocity (script.js:1275-1285) ----
    # Halo widths may exceed the per-device block height (multi-hop exchange).
    hw_v = vel_halo_width(config)
    vel_pad = exchange_halo_rows(vel, hw_v)
    row0 = idx * h_loc
    x = u_s * sw - 0.5 - dt * vel[0].astype(jnp.float32)
    y = v_s * sh_g - 0.5 - dt * vel[1].astype(jnp.float32)
    y_local = y - row0.astype(jnp.float32) + hw_v
    vel_adv = _gather_padded(vel_pad, x, y_local)
    vel = (vel_adv / (1.0 + config.VELOCITY_DISSIPATION * dt)).astype(vel.dtype)

    # ---- advect dye at dye resolution (script.js:1287-1293) ----
    # velocity sampled bilinearly at dye texel centers (needs 1 ghost row).
    vel_pad1 = exchange_halo_rows(vel, 1)
    xv = u_d * sw - 0.5
    yv_local = (v_d * sh_g - 0.5) - (idx * h_loc).astype(jnp.float32) + 1.0
    vel_at_dye_u = _gather_padded(vel_pad1[0], xv, yv_local).astype(jnp.float32)
    vel_at_dye_v = _gather_padded(vel_pad1[1], xv, yv_local).astype(jnp.float32)

    hw_d = dye_halo_width(config)
    dye_pad = exchange_halo_rows(dye, hw_d)
    # Backtraced coord in *dye* texels: uv - dt * vel * simTexel, then * dye size.
    xd = (u_d - dt * vel_at_dye_u / sw) * dw - 0.5
    yd = (v_d - dt * vel_at_dye_v / sh_g) * dh_g - 0.5
    yd_local = yd - (idx * hd_loc).astype(jnp.float32) + hw_d
    dye_adv = _gather_padded(dye_pad, xd, yd_local)
    dye = (dye_adv / (1.0 + config.DENSITY_DISSIPATION * dt)).astype(dye.dtype)

    return FluidState(velocity=vel, dye=dye, pressure=p)


@lru_cache(maxsize=None)
def make_sharded_step(config: FluidConfig, mesh=None):
    """Compile the shard_map step over a row mesh. Grid heights must divide
    the mesh size."""
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
