"""Communication-explicit sharded step: shard_map over a 2-D (rows, cols)
device mesh + halo exchange around the SAME kernel suite the single-device
step uses.

Fields are sharded (H over mesh axis 'y', W over 'x' — SURVEY.md §2.4's 2-D
domain decomposition; a 1-D row decomposition is the nx=1 special case and
skips every column exchange). Each phase exchanges ghost rows/columns sized
for its stencil/backtrace reach, then runs the shared dispatch op (Pallas
kernels on TPU, the jnp oracle elsewhere — tpufluid.ops.pallas.dispatch) on
the PADDED block and keeps the central region. There is no duplicate
physics: the sharded path and the single-device path execute one
implementation.

Exactness on padded blocks:
  * interior ghosts hold REAL neighbor data (sequential row-then-column
    exchanges also fill corners with the diagonal neighbors'), so any
    stencil/backtrace within the halo reads global values;
  * at the global walls the exchange replicates the edge row/column —
    exactly CLAMP_TO_EDGE for SINGLE-layer stencils and for bilinear
    gathers (samples between replicas equal the edge value);
  * the fused curl->confinement->divergence kernel chains 3 stencil layers,
    whose wall behavior cannot be emulated by ghost contents — it takes the
    TRUE-wall positions as traced bounds (SMEM) and applies its clamp and
    -C reflection masks exactly there;
  * ITERATED sweeps see a different fixed point: the Jacobi phase MIRRORS
    out-of-grid ghosts (ghost at global index -k := index k-1, per axis, by
    global coordinates on every device whose halo crosses a wall); the
    mirror is a fixed point of the symmetric 5-point sweep, so the true
    edge cells see clamped neighbors every sweep, while the kernel's own
    padded-edge masks stay >= ghost-width > sweeps cells away from any true
    cell. One exchange amortizes 20 per-sweep collectives (structurally,
    ring attention's per-step neighbor passing with a K-deep halo);
  * the projection is SPLIT (gradient_subtract kernel, exchange,
    self-advect gather) — identical to the single-device dispatch — so the
    gather's source ghosts are the exchanged projected velocity.

Halo widths may exceed a shard's block extent (flagship dye advection);
exchange_halo chains multi-hop ppermutes for that. Column ghost widths are
multiples of 64 so padded widths keep the 128-lane alignment the kernels
need. dt and velocity obey the reference clamps (script.js:1191, 863),
which bound every backtrace.
"""

from __future__ import annotations

import math
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from tpufluid.config import FluidConfig
from tpufluid.ops.pallas import dispatch as K
from tpufluid.ops.splat import SPLAT_B, SPLAT_DX, SPLAT_DY, SPLAT_R, splat_factors
from tpufluid.parallel.halo import exchange_halo, ghost_strips
from tpufluid.parallel.mesh import COL_AXIS, ROW_AXIS, make_mesh, state_specs
from tpufluid.state import FluidState

from tpufluid.config import MAX_DT  # reference dt clamp, literal 0.016666 (script.js:1191)

# Displacement/ghost-width bound dt: 1/60 is a strict upper bound of MAX_DT;
# ghost widths derived from it stay valid (and their power-of-two-friendly
# rounding untouched) while the runtime clamp uses the exact literal.
_BOUND_DT = 1.0 / 60.0
MAX_SPEED = 1000.0   # reference velocity clamp (script.js:863)

_G_STENCIL = 16  # >= 3 stencil layers; 16-row aligned for bf16 kernels
_JACOBI_SWEEPS_PER_EXCHANGE = 20
_G_JACOBI = 32   # > the 20 sweeps per chunk (mirror-ghost margin). NOT 24:
#                  padded heights must keep a large power-of-two factor or
#                  the kernels' divisor-constrained tile pickers collapse
#                  (1024+48=16*67 forces 16-row Jacobi blocks = 4x
#                  overcompute; measured 473 vs 520 steps/s sharded,
#                  out/jobs/b05). 1024+64=2^6*17 keeps 272-row blocks.
_G_VEL = 32      # >= ceil(1000/60) + bilinear corner (18); 32 for the same
#                  divisibility reason as _G_JACOBI
_GC = 64         # column ghosts: >= every per-phase reach; keeps W % 128
#                  (rows have no lane constraint; columns stay at the one
#                  aligned width)
_BIG = 1 << 30   # sentinel: "this shard owns no wall here"

assert _G_JACOBI > _JACOBI_SWEEPS_PER_EXCHANGE


def _round_mult(x: float, m: int) -> int:
    return max(m, -(-int(math.ceil(x)) // m) * m)


def _jacobi_ghost(h_loc: int, w_pad: int, itemsize: int) -> int:
    """Mirror-ghost rows for the Jacobi exchange. Fixed at _G_JACOBI=32:
    an adaptive 32-vs-64 chooser (modeled kernel-tile overcompute) picked
    64 at 16K block heights and hit Mosaic's scoped-VMEM ceiling INSIDE the
    scan-inside-shard_map program (the identical window compiles
    standalone — the scan context shrinks scoped headroom; out/jobs/b16).
    32 is exact (> 20 sweeps) and proven at every measured geometry."""
    return _G_JACOBI


def dye_halo_width(config: FluidConfig) -> int:
    """Ghost rows for dye advection: the sim-grid displacement bound scaled
    by the dye/sim resolution ratio, plus the bilinear corner."""
    sw, sh = config.sim_size
    dw, dh = config.dye_size
    return _round_mult(MAX_SPEED * _BOUND_DT * dh / sh + 2, 16)


def dye_halo_width_cols(config: FluidConfig) -> int:
    sw, sh = config.sim_size
    dw, dh = config.dye_size
    return _round_mult(MAX_SPEED * _BOUND_DT * dw / sw + 2, 64)


def vel_halo_width(config: FluidConfig) -> int:
    return _G_VEL


def vel_resample_pad(config: FluidConfig) -> int:
    """Ghost rows/cols of VELOCITY needed by the per-shard dye resample.

    Invariant (why a small pad is enough even at 8x+ dye/sim ratios): only
    the padded dye block's CENTER rows/cols survive the post-gather crop,
    and each advection output depends solely on the resampled velocity at
    its own texel — so velocity must be true only at the center dye texel
    centers. Those map at most ``0.5*sim/dye - 0.5`` sim texels beyond the
    shard's own sim block, plus one texel for the bilinear +1 tap; the
    ghost rows' resampled velocity is arbitrary and discarded. The pad is
    therefore driven by the SIM/dye ratio (>= 2 whenever dye >= sim), not
    by the dye/sim ratio the halo widths scale with."""
    sw, sh = config.sim_size
    dw, dh = config.dye_size
    need_r = math.ceil(0.5 * sh / dh - 0.5) + 1
    need_c = math.ceil(0.5 * sw / dw - 0.5) + 1
    return max(2, need_r, need_c)


def _sample_2d(tex, row_coords, col_coords):
    """Separable bilinear sample of (..., h, w) at explicit row/col coords
    (texel units, local to ``tex``, CLAMP_TO_EDGE). The shard-aware
    resample: callers build the coords from GLOBAL texel centers shifted
    into the padded block."""
    h, w = tex.shape[-2], tex.shape[-1]
    x0 = jnp.floor(col_coords)
    fx = (col_coords - x0).astype(tex.dtype)
    ix0 = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    ix1 = jnp.clip(x0.astype(jnp.int32) + 1, 0, w - 1)
    a = jnp.take(tex, ix0, axis=-1)
    b = jnp.take(tex, ix1, axis=-1)
    tex = a + (b - a) * fx
    y0 = jnp.floor(row_coords)
    fy = (row_coords - y0).astype(tex.dtype)
    iy0 = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    iy1 = jnp.clip(y0.astype(jnp.int32) + 1, 0, h - 1)
    a = jnp.take(tex, iy0, axis=-2)
    b = jnp.take(tex, iy1, axis=-2)
    fy = fy.reshape((1,) * (tex.ndim - 2) + (-1, 1))
    return a + (b - a) * fy


def overhead_report(config: FluidConfig, mesh_shape) -> dict:
    """Static decomposition of the sharded step's per-device overhead, so a
    real-slice run is predictable from the 1-device-mesh measurements
    (everything here is geometry — no device needed).

    Per phase: ghost rows/cols, overcompute fraction (padded block area /
    true block area - 1), and the bytes each device SENDS over the mesh per
    step for that phase's halo exchange (rows + columns; multi-hop
    exchanges forward whole strips, counted once per hop)."""
    ny, nx = mesh_shape
    sw, sh = config.sim_size
    dw, dh = config.dye_size
    B = jnp.dtype(config.dtype).itemsize
    h, w = sh // ny, sw // nx
    hd, wd = dh // ny, dw // nx
    gc = 0 if nx == 1 else _GC
    gj = _jacobi_ghost(h, _round_mult(w + 2 * gc, 128), B)
    gd = dye_halo_width(config)
    gdc = 0 if nx == 1 else dye_halo_width_cols(config)
    same_grid = (sw, sh) == (dw, dh)
    n_jacobi_ex = -(-config.PRESSURE_ITERATIONS // _JACOBI_SWEEPS_PER_EXCHANGE)

    def phase(name, gr, gcc, bh, bw, ch, repeats=1):
        # multi-hop exchanges forward whole strips: each hop sends an
        # up-to-block-height strip both directions per axis
        hops_r = -(-gr // bh) if ny > 1 else 0
        hops_c = -(-gcc // bw) if nx > 1 else 0
        send = 2 * ch * B * (min(gr, bh) * (bw + 2 * gcc) * hops_r
                             + min(gcc, bw) * bh * hops_c)
        over = ((bh + 2 * gr) * (bw + 2 * gcc)) / (bh * bw) - 1.0
        out = {"phase": name, "ghost_rows": gr, "ghost_cols": gcc,
               "overcompute_frac": round(over, 4),
               "send_bytes_per_step": send * repeats}
        if config.overlap_halo and bh >= 3 * gr:
            # Split-phase: interior band (bh rows, NO row ghosts) + two
            # 3*gr-row strip envs — 4*gr MORE rows of compute than the
            # monolithic padded block, traded for (a) interior compute
            # overlapping the ppermutes and (b) the interior running on
            # the UNPADDED block height (power-of-two-friendly kernel
            # tiles; the padded 16K height 64*257 collapses tile pickers).
            over_s = ((bh + 6 * gr) * (bw + 2 * gcc)) / (bh * bw) - 1.0
            out["overlap_overcompute_frac"] = round(over_s, 4)
        return out

    phases = [
        phase("splat+curl+vort+div", _G_STENCIL, gc, h, w, 2),
        phase("jacobi", gj, gc, h, w, 2, repeats=max(n_jacobi_ex, 1)),
        phase("gradient_subtract", _G_STENCIL, gc, h, w, 3),
        phase("vel_self_advect", _G_VEL, gc, h, w, 2),
        phase("dye_advect", gd, gdc, hd, wd,
              3 + (2 if same_grid else 0)),
    ]
    if not same_grid:
        phases.append(phase("vel_resample", vel_resample_pad(config),
                            vel_resample_pad(config) if nx > 1 else 0,
                            h, w, 2))
    total = sum(p["send_bytes_per_step"] for p in phases)
    return {"mesh": [ny, nx], "phases": phases,
            "total_send_bytes_per_step": total,
            "mean_overcompute_frac": round(
                sum(p["overcompute_frac"] for p in phases) / len(phases), 4)}


def _overlap_rows(g: int, operands, op):
    """Split-phase (interior/boundary-overlap) row application of a
    halo-padded phase: compute ``op`` on an INTERIOR band that depends only
    on local data — XLA's latency-hiding scheduler is then free to run it
    while the halo ppermutes fly — plus two thin boundary strips assembled
    from the arrived ghosts, and concatenate the three bands.

    operands: list of ``(block, ghost_below, ghost_above)`` (from
    halo.ghost_strips), all sharing the local row extent ``h_loc``.
    op(envs, r0) -> result pytree with the envs' row extent, where ``r0``
    is the env's first row in g-padded coordinates [0, h_loc + 2g) —
    callers use it to slice row-indexed splat factors and shift true-wall
    bounds. Returns the result cropped to the h_loc center rows.

    EXACTNESS (the reason this equals the monolithic padded call, pinned by
    tests/test_sharding.py):
      * every dispatch op clamps reads at its array edges (CLAMP_TO_EDGE /
        edge-clamped shifts), so a wrong edge contaminates at most its
        dependency reach d rows inward — and every phase's reach satisfies
        d <= g by the same sizing that chose its ghost width (stencil
        chains d<=3, gathers d<=ceil(disp)+1, k-sweep Jacobi d=k<20<32);
      * the interior band keeps padded rows [2g, h), >= g >= d rows from
        the local block's (wrong for ridx>0) edges;
      * each boundary strip env spans g ghost rows + 2g local rows; its
        kept g rows sit >= g from both env edges, and the env's outer edge
        IS the padded array's edge, where the monolithic kernel applies the
        identical clamp.
    Requires h_loc >= 3g (callers gate and fall back to the monolithic
    path otherwise).

    ASSEMBLY (the round-12 aliasing lever): the interior op's env is the
    raw local block, so its output rows are ALREADY in local coordinates —
    rows [g, h_loc-g) are its kept band and only the outer g-row bands are
    wrong-edge garbage. Overwriting those bands in place
    (`dynamic_update_slice` on the dead interior buffer, which XLA aliases)
    replaces the former slice-center + 3-way concatenate — at 16K that
    materialized the bf16[3,16320,16384] interior TWICE (~1.6 GB/step of
    pure HBM copy, the top line of out/sharded_tax_16k.json's
    phase-boundary bucket). Values are identical either way."""
    h_loc = operands[0][0].shape[-2]
    lo = 2 * g
    interior = op([x for x, _, _ in operands], g)
    top = op([jnp.concatenate([gb, x[..., :lo, :]], axis=-2)
              for x, gb, _ in operands], 0)
    bot = op([jnp.concatenate([x[..., -lo:, :], ga], axis=-2)
              for x, _, ga in operands], g + h_loc - lo)

    def assemble(inner, t, b):
        inner = inner.at[..., :g, :].set(t[..., g:lo, :])
        return inner.at[..., h_loc - g:, :].set(b[..., lo - g:lo, :])

    return jax.tree.map(assemble, interior, top, bot)


def _mirror_row_strips(x, gb, ga, width: int, axis_name: str,
                       axis: int = -2):
    """Rewrite ghost STRIPS that fall outside the global grid with the
    local mirror (ghost at global index -k := index k-1; far side
    symmetric: ghost at global index H-1+k := index H-k — the fixed point
    that makes iterated symmetric sweeps equal clamped boundary reads, see
    module docstring). Used by the Jacobi paths. At a wall the mirrored
    source slices are the shard's own first/last ``width`` slices, so no
    collective is involved and no full-field take() is materialized."""
    assert width <= x.shape[axis], \
        "strip mirror is single-hop only (ghost deeper than the shard " \
        "can cross a wall on NON-edge devices — use _mirror_wall_ghosts)"
    idx = lax.axis_index(axis_name)
    n = lax.axis_size(axis_name)
    if axis == -2:
        mt = jnp.flip(x[..., :width, :], axis=-2)
        mb = jnp.flip(x[..., -width:, :], axis=-2)
    else:
        mt = jnp.flip(x[..., :width], axis=-1)
        mb = jnp.flip(x[..., -width:], axis=-1)
    gb = jnp.where(idx == 0, mt, gb)
    ga = jnp.where(idx == n - 1, mb, ga)
    return gb, ga


def _mirror_wall_ghosts(pad, width: int, idx, loc: int, total: int, axis: int):
    """Rewrite ghost slices that fall OUTSIDE the global grid with the MIRROR
    of the slices just inside the wall (ghost at global index -k := index
    k-1; far wall symmetric), via a full-field take on the padded array —
    needed when the ghost is DEEPER than the shard (multi-hop exchange), in
    which case non-edge devices' halos also cross the wall and the mirror
    sources lie in their exchanged pads. _mirror_row_strips is the cheap
    single-hop strip variant."""
    hp = pad.shape[axis]
    base = idx * loc - width
    gr = base + jnp.arange(hp)
    m = jnp.where(gr < 0, -gr - 1,
                  jnp.where(gr > total - 1, 2 * total - 1 - gr, gr))
    src = jnp.clip(m - base, 0, hp - 1)
    return jnp.take(pad, src, axis=axis)


def _mirrored_pad(x, width: int, axis_name: str, axis: int):
    """Halo-pad one axis with mirror-at-walls ghosts. Single-hop ghosts
    (width <= shard extent — every large-grid geometry) assemble from
    strips: one concatenate, no full-field take (at 16K the take copies
    were ~2 GB/step of HBM). Deeper ghosts fall back to the exchanged-pad
    take, which non-edge wall-crossing devices need."""
    idx = lax.axis_index(axis_name)
    n = lax.axis_size(axis_name)
    loc = x.shape[axis]
    total = loc * n
    if width <= loc:
        gb, ga = _mirror_row_strips(
            x, *ghost_strips(x, width, axis_name, axis),
            width=width, axis_name=axis_name, axis=axis)
        return jnp.concatenate([gb, x, ga], axis=axis)
    pad = exchange_halo(x, width, axis_name, axis)
    return _mirror_wall_ghosts(pad, width, idx, loc, total, axis)


def sharded_fluid_step(state: FluidState, dt, splats, config: FluidConfig) -> FluidState:
    """The shard_map body: halo exchanges around the shared dispatch ops."""
    dt = jnp.minimum(jnp.asarray(dt, jnp.float32), MAX_DT)  # calcDeltaTime clamp
    ridx = lax.axis_index(ROW_AXIS)
    cidx = lax.axis_index(COL_AXIS)
    ny = lax.axis_size(ROW_AXIS)
    nx = lax.axis_size(COL_AXIS)

    sw, sh_g = config.sim_size  # global (w, h)
    dw, dh_g = config.dye_size
    vel = state.velocity
    dye = state.dye
    h_loc, w_loc = vel.shape[-2:]
    hd_loc, wd_loc = dye.shape[-2:]
    aspect = config.aspect_ratio
    radius = config.splat_radius_uv()
    max_disp = MAX_SPEED * _BOUND_DT

    def exch2d(x, wr, wc):
        x = exchange_halo(x, wr, ROW_AXIS, -2)
        if wc:
            x = exchange_halo(x, wc, COL_AXIS, -1)
        return x

    def wall_bounds(wr, wc, hl, wl):
        """True-wall positions in this shard's padded-array coords (sentinels
        where a wall belongs to another shard)."""
        return (jnp.where(ridx == 0, wr, -_BIG),
                jnp.where(ridx == ny - 1, wr + hl - 1, _BIG),
                jnp.where(cidx == 0, wc, -_BIG),
                jnp.where(cidx == nx - 1, wc + wl - 1, _BIG))

    def factors(h, w, amount_cols, row0, col0, h_total, w_total):
        return splat_factors(splats, h, w, radius, aspect, amount_cols,
                             row0=row0, h_total=h_total,
                             col0=col0, w_total=w_total)

    gc = 0 if nx == 1 else _GC
    overlap = config.overlap_halo

    def colpad(x, wc):
        """Column halo exchange only (the row axis is what the split-phase
        path overlaps; columns — absent on rows-only meshes — are exchanged
        up front)."""
        return exchange_halo(x, wc, COL_AXIS, -1) if wc else x

    # ---- splat + curl + vorticity + divergence (one fused pass, wall
    #      positions passed as traced bounds) ----
    g = _G_STENCIL
    gy_v, gx_v, amt_v = factors(h_loc + 2 * g, w_loc + 2 * gc,
                                slice(SPLAT_DX, SPLAT_DY + 1),
                                ridx * h_loc - g, cidx * w_loc - gc, sh_g, sw)
    if overlap and h_loc >= 3 * g:
        vc = colpad(vel, gc)
        vgb, vga = ghost_strips(vc, g, ROW_AXIS)

        def op_pre(envs, r0):
            (venv,) = envs
            eh = venv.shape[-2]
            tb = (jnp.where(ridx == 0, g - r0, -_BIG),
                  jnp.where(ridx == ny - 1, g - r0 + h_loc - 1, _BIG),
                  jnp.where(cidx == 0, gc, -_BIG),
                  jnp.where(cidx == nx - 1, gc + w_loc - 1, _BIG))
            return K.pre_pressure(venv, config.CURL, dt,
                                  splat_factors=(gy_v[r0:r0 + eh], gx_v, amt_v),
                                  true_bounds=tb)

        velp, div = _overlap_rows(g, [(vc, vgb, vga)], op_pre)
        vel = velp[:, :, gc:gc + w_loc]
        div = div[:, gc:gc + w_loc]
    else:
        vel_pad = exch2d(vel, g, gc)
        velp, div = K.pre_pressure(vel_pad, config.CURL, dt,
                                   splat_factors=(gy_v, gx_v, amt_v),
                                   true_bounds=wall_bounds(g, gc, h_loc, w_loc))
        vel = velp[:, g:-g, gc:gc + w_loc]
        div = div[g:-g, gc:gc + w_loc]

    # ---- pressure: warm start + Jacobi, 20 sweeps per mirror-ghost halo ----
    p = state.pressure
    iters = config.PRESSURE_ITERATIONS
    gj = _jacobi_ghost(h_loc, _round_mult(w_loc + 2 * gc, 128),
                       jnp.dtype(config.dtype).itemsize)  # == _G_JACOBI

    def jacobi_pad(x):
        # Strip-assembled mirror padding: same values as the former
        # exchange-then-full-field-mirror-take chain (mirror maps are
        # per-axis position maps, so the compositions commute; pinned by
        # the multi-chunk and 2-D-mesh equality tests) without the two
        # full-field take() copies — at 16K that is ~2 GB/step of HBM.
        x = _mirrored_pad(x, gj, ROW_AXIS, -2)
        if gc:
            x = _mirrored_pad(x, gc, COL_AXIS, -1)
        return x

    if iters == 0:
        p = (p.astype(jnp.float32) * config.PRESSURE).astype(p.dtype)
    elif overlap and h_loc >= 3 * gj:
        def colpad_mirror(x):
            if not gc:
                return x
            return _mirrored_pad(x, gc, COL_AXIS, -1)

        divc = colpad_mirror(div)
        dgb, dga = _mirror_row_strips(divc, *ghost_strips(divc, gj, ROW_AXIS),
                                      width=gj, axis_name=ROW_AXIS)
        done = 0
        while done < iters:
            k = min(_JACOBI_SWEEPS_PER_EXCHANGE, iters - done)
            prescale = config.PRESSURE if done == 0 else 1.0
            pc = colpad_mirror(p)
            pgb, pga = _mirror_row_strips(pc, *ghost_strips(pc, gj, ROW_AXIS),
                                          width=gj, axis_name=ROW_AXIS)

            def op_jac(envs, r0, k=k, prescale=prescale):
                return K.jacobi_pressure(envs[0], envs[1], k, prescale=prescale)

            p = _overlap_rows(gj, [(pc, pgb, pga), (divc, dgb, dga)],
                              op_jac)[:, gc:gc + w_loc]
            done += k
    else:
        div_pad = jacobi_pad(div)
        done = 0
        while done < iters:
            k = min(_JACOBI_SWEEPS_PER_EXCHANGE, iters - done)
            p_pad = K.jacobi_pressure(jacobi_pad(p), div_pad, k,
                                      prescale=config.PRESSURE if done == 0 else 1.0)
            p = p_pad[gj:-gj, gc:gc + w_loc]
            done += k

    # ---- projection, then velocity self-advection (the same split the
    #      single-device dispatch uses; single-layer clamp == replicas) ----
    gs = _G_STENCIL
    if overlap and h_loc >= 3 * gs:
        vc = colpad(vel, gc)
        pcs = colpad(p, gc)
        vgb, vga = ghost_strips(vc, gs, ROW_AXIS)
        pgb, pga = ghost_strips(pcs, gs, ROW_AXIS)

        def op_grad(envs, r0):
            return K.gradient_subtract(envs[0], envs[1])

        vel = _overlap_rows(gs, [(vc, vgb, vga), (pcs, pgb, pga)],
                            op_grad)[:, :, gc:gc + w_loc]
    else:
        vel = K.gradient_subtract(exch2d(vel, gs, gc),
                                  exch2d(p, gs, gc))[:, gs:-gs, gc:gc + w_loc]
    gv = _G_VEL
    if overlap and h_loc >= 3 * gv:
        vc = colpad(vel, gc)
        vgb, vga = ghost_strips(vc, gv, ROW_AXIS)

        def op_vadv(envs, r0):
            return K.advect_same_grid(envs[0], envs[0], dt,
                                      config.VELOCITY_DISSIPATION,
                                      max_disp, max_disp)

        vel = _overlap_rows(gv, [(vc, vgb, vga)], op_vadv)[:, :, gc:gc + w_loc]
    else:
        vel_pad = exch2d(vel, gv, gc)
        vel = K.advect_same_grid(vel_pad, vel_pad, dt,
                                 config.VELOCITY_DISSIPATION,
                                 max_disp, max_disp)[:, gv:-gv, gc:gc + w_loc]

    # ---- dye advection at dye resolution, splat fused ----
    # Velocity resampled PER SHARD at the padded dye block's global texel
    # centers (clamped = the reference's CLAMP_TO_EDGE bilinear sample,
    # script.js:773-777), rescaled to dye-texels/s.
    gd = dye_halo_width(config)
    gdc = 0 if nx == 1 else dye_halo_width_cols(config)
    same_grid = (sw, sh_g) == (dw, dh_g)
    gy_d, gx_d, amt_d = factors(hd_loc + 2 * gd, wd_loc + 2 * gdc,
                                slice(SPLAT_R, SPLAT_B + 1),
                                ridx * hd_loc - gd, cidx * wd_loc - gdc,
                                dh_g, dw)
    # DYE_RGB9E5 carries straight into the per-shard gather: the packing is
    # POINTWISE (ops/quant.py), and halo ghosts hold the neighbor blocks'
    # true values, so the quantized padded block equals the quantized global
    # field restricted to the window — sharded-vs-single equality holds
    # exactly as for the unquantized path.
    dye_quant = ("rgb9e5" if config.DYE_RGB9E5
                 and config.dtype == jnp.bfloat16 else None)
    if overlap and hd_loc >= 3 * gd:
        # Split-phase dye advection. Same-grid: the velocity field IS the
        # dye-texel-center velocity, so it joins the band assembly as a
        # second operand. Cross-resolution: velocity enters through the
        # per-shard resample instead — the op slices the padded-block
        # coordinate grid at each band's rows and samples the SMALL
        # (vel_resample_pad-ghosted) velocity pad, so only that tiny
        # exchange gates the interior band, not the deep dye halo.
        dc = colpad(dye, gdc)
        dgb, dga = ghost_strips(dc, gd, ROW_AXIS)
        if same_grid:
            vc = colpad(vel, gdc)
            vgb, vga = ghost_strips(vc, gd, ROW_AXIS)
            operands = [(vc, vgb, vga), (dc, dgb, dga)]

            def vel_for(envs, r0, eh):
                return envs[0]

            def dye_env(envs):
                return envs[1]
        else:
            gvr = vel_resample_pad(config)
            gvrc = gvr if nx > 1 else 0
            vel_pad1 = exch2d(vel, gvr, gvrc).astype(jnp.float32)
            rows_d = jnp.clip(ridx * hd_loc - gd
                              + jnp.arange(hd_loc + 2 * gd, dtype=jnp.float32),
                              0, dh_g - 1)
            cols_d = jnp.clip(cidx * wd_loc - gdc
                              + jnp.arange(wd_loc + 2 * gdc, dtype=jnp.float32),
                              0, dw - 1)
            row_coords = (rows_d + 0.5) / dh_g * sh_g - 0.5 - (ridx * h_loc - gvr)
            col_coords = (cols_d + 0.5) / dw * sw - 0.5 - (cidx * w_loc - gvrc)
            operands = [(dc, dgb, dga)]

            def vel_for(envs, r0, eh):
                vd = _sample_2d(vel_pad1, row_coords[r0:r0 + eh], col_coords)
                return jnp.stack([vd[0] * (dw / sw), vd[1] * (dh_g / sh_g)])

            def dye_env(envs):
                return envs[0]

        def op_dye(envs, r0):
            denv = dye_env(envs)
            eh = denv.shape[-2]
            return K.advect_same_grid(
                vel_for(envs, r0, eh), denv, dt, config.DENSITY_DISSIPATION,
                max_disp * dh_g / sh_g, max_disp * dw / sw,
                splat_factors=(gy_d[r0:r0 + eh], gx_d, amt_d),
                quant=dye_quant)

        dye = _overlap_rows(gd, operands, op_dye)[:, :, gdc:gdc + wd_loc]
        return FluidState(velocity=vel, dye=dye, pressure=p)

    dye_pad = exch2d(dye, gd, gdc)
    if same_grid:
        # Same-grid dye (headline / 16K configs): the dye-texel-center
        # velocity IS the velocity field — skip the resample entirely. The
        # exchanged ghosts replicate the edge row/column at walls, exactly
        # the clamped global sample the resample path would produce (only
        # the CENTER rows' velocity matters — see vel_resample_pad).
        vel_d = exch2d(vel, gd, gdc)
    else:
        gvr = vel_resample_pad(config)  # see its docstring for the invariant
        gvrc = gvr if nx > 1 else 0     # plain-jnp sample: no lane alignment
        vel_pad1 = exch2d(vel, gvr, gvrc)
        rows_d = jnp.clip(ridx * hd_loc - gd
                          + jnp.arange(hd_loc + 2 * gd, dtype=jnp.float32),
                          0, dh_g - 1)
        cols_d = jnp.clip(cidx * wd_loc - gdc
                          + jnp.arange(wd_loc + 2 * gdc, dtype=jnp.float32),
                          0, dw - 1)
        row_coords = (rows_d + 0.5) / dh_g * sh_g - 0.5 - (ridx * h_loc - gvr)
        col_coords = (cols_d + 0.5) / dw * sw - 0.5 - (cidx * w_loc - gvrc)
        vel_d = _sample_2d(vel_pad1.astype(jnp.float32), row_coords, col_coords)
        vel_d = jnp.stack([vel_d[0] * (dw / sw), vel_d[1] * (dh_g / sh_g)])

    dye = K.advect_same_grid(vel_d, dye_pad, dt, config.DENSITY_DISSIPATION,
                             max_disp * dh_g / sh_g, max_disp * dw / sw,
                             splat_factors=(gy_d, gx_d, amt_d),
                             quant=dye_quant
                             )[:, gd:-gd, gdc:gdc + wd_loc]

    return FluidState(velocity=vel, dye=dye, pressure=p)


@lru_cache(maxsize=None)
def make_sharded_step(config: FluidConfig, mesh=None):
    """Compile the shard_map step over a (rows, cols) mesh. Grid extents
    must divide the mesh axes. Note: this path always routes through the
    dispatch ops (Pallas on TPU, the jnp oracle elsewhere) —
    config.USE_PALLAS only selects the single-device step's branch."""
    if mesh is None:
        mesh = make_mesh()
    ny, nx = mesh.devices.shape
    sw, sh = config.sim_size
    dw, dh = config.dye_size
    if sh % ny or dh % ny or sw % nx or dw % nx:
        raise ValueError(
            f"grid extents {(sh, sw)}/{(dh, dw)} must divide mesh {(ny, nx)}")

    specs = state_specs()
    body = partial(sharded_fluid_step, config=config)
    mapped = jax.shard_map(
        body, mesh=mesh,
        in_specs=(specs, P(), P()),
        out_specs=specs,
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=0)


@lru_cache(maxsize=None)
def make_sharded_multi_step(config: FluidConfig, mesh=None):
    """Scan a batch of steps INSIDE one shard_map region: (state, dt,
    batches (T, MAX_SPLATS, 8)) -> state after T steps.

    One dispatch per T steps (the per-call dispatch tax dominates per-step
    loops on tunneled backends), one shard_map entry/exit instead of T, and
    the halo-exchange collectives ride inside the compiled loop — this is
    the execution mode the trace-replay benchmarks use (bench.py), mirrored
    for the sharded path."""
    if mesh is None:
        mesh = make_mesh()
    ny, nx = mesh.devices.shape
    sw, sh = config.sim_size
    dw, dh = config.dye_size
    if sh % ny or dh % ny or sw % nx or dw % nx:
        raise ValueError(
            f"grid extents {(sh, sw)}/{(dh, dw)} must divide mesh {(ny, nx)}")

    specs = state_specs()

    def multi(state, dt, batches):
        def body(c, b):
            return sharded_fluid_step(c, dt, b, config), 0.0
        return lax.scan(body, state, batches)[0]

    mapped = jax.shard_map(
        multi, mesh=mesh,
        in_specs=(specs, P(), P()),
        out_specs=specs,
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=0)
