"""Fused pre-pressure stencil kernel: curl -> vorticity confinement -> divergence.

The reference runs these as three full-grid GL passes (script.js:1234-1251).
This kernel computes all three in ONE HBM pass over the velocity field: row
blocks with an 8-row in-bounds halo window (3 stencil layers needed; windows
clamped per ops/pallas/common.py so no edge-pad copy is materialized),
neighbors via pltpu.roll + global-boundary masking. Grids too wide for a
full-width row block (16384^2) tile columns too, with a 128-lane halo per
side (lane windows must be 128-aligned; 3 layers of staleness << 128) —
without this the 16K configs fell back to the multi-pass jnp chain.

Outputs the post-confinement velocity (clamped to +/-1000, script.js:863) and
its divergence (with the -C no-slip wall reflection, script.js:804-807).
Optionally fuses the velocity splat batch (reference splat(),
script.js:1443-1449) as a separable rank-S bump added before curl.
Semantics identical to the jnp oracle chain in tpufluid.ops.stencil.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpufluid.ops.pallas.common import Element as _Element

from tpufluid.ops.pallas.common import (
    LANE, dot_f32_3x, row_align, window_start,
)

_VMEM_BUDGET = 10 * 1024 * 1024
# Column-tiled windows carry extra live f32 temps (column iota, the output
# column selects) the byte model undercounts, and Mosaic's 16MB scoped-vmem
# ceiling shrinks further inside scan-inside-shard_map programs: 12288^2
# bf16 picked a (256,1536) jacobi tile that compiled to 16.73M scoped and
# OOM'd (out/jobs/b33); 442K-element windows OOM'd in scan contexts
# (out/jobs/b16) while 410K squeaked by. Worst observed actual/model ratio
# is 2.4x, so the column-candidate budget is ~6.6MB: it keeps 16384^2's
# (256,1024) jacobi tile (model 6.55M — empirically compiles and runs in
# the jit-scan bench, out/jobs/b12-b14) while rejecting the 7.3M+ tiles
# that OOM'd; everything else stays well under the 16MB ceiling.
_VMEM_BUDGET_COL = int(6.6 * 1024 * 1024)
_COL_HALO = LANE  # lane windows are 128-aligned; >> 3 layers of staleness


def _halo(itemsize: int) -> int:
    # >= 3 stencil layers, multiple of the dtype row alignment (8 f32/16 bf16)
    return row_align(itemsize)


def _pick_tile(h: int, w: int, itemsize: int) -> Optional[Tuple[int, int]]:
    """(rows, cols) per block, or None. cols == w means no column windows."""
    align = row_align(itemsize)
    halo = _halo(itemsize)
    bytes_per = 8 * itemsize + 16

    def best_rows(cw: int, budget: int) -> int:
        best = 0
        for r in range(align, h + 1, align):
            if h % r or r + 2 * halo > h:
                continue
            if bytes_per * (r + 2 * halo) * cw <= budget:
                best = r
        return best

    best = None
    r = best_rows(w, _VMEM_BUDGET)
    if r:
        # see jacobi._pick_tile: full-width kept only when within 10% of
        # the best column candidate's modeled overcompute
        best = (((r + 2 * halo) / r) / 1.1, (r, w))
    cols = (w // LANE // 2) * LANE
    while cols >= LANE:
        if w % cols == 0 and cols + 2 * _COL_HALO <= w:
            r = best_rows(cols + 2 * _COL_HALO, _VMEM_BUDGET_COL)
            if r:
                over = ((r + 2 * halo) / r) * ((cols + 2 * _COL_HALO) / cols)
                if best is None or over < best[0]:
                    best = (over, (r, cols))
        cols -= LANE
    return best[1] if best else None


def supported(shape: Tuple[int, int], itemsize: int = 4) -> bool:
    h, w = shape
    if itemsize not in (2, 4):
        return False
    if w % LANE or h % row_align(itemsize):
        return False
    return _pick_tile(h, w, itemsize) is not None


def _kernel(dt_ref, bounds_ref, vel_ref, gy_ref, gx_ref, amt_ref,
            out_vel_ref, out_div_ref, *,
            curl_strength: float, rows_per_block: int, cols_per_block: int,
            h_global: int, w_global: int, with_splats: bool, halo: int,
            col_halo: int, align: int, sim_w: int):
    i = pl.program_id(0)
    blk_h = vel_ref.shape[1]
    w = vel_ref.shape[2]
    dt = dt_ref[0, 0]
    start = window_start(i, rows_per_block, halo, h_global, align)
    if col_halo:
        j = pl.program_id(1)
        cstart = window_start(j, cols_per_block, col_halo, w_global, LANE)
    else:
        cstart = 0

    rows = lax.broadcasted_iota(jnp.int32, (blk_h, w), 0) + start
    cols = lax.broadcasted_iota(jnp.int32, (blk_h, w), 1) + cstart
    # The grid's TRUE walls as array coords (SMEM, may be traced): clamp +
    # -C reflection act exactly there. A shard passes sentinel bounds for
    # walls it does not own; padded/ghost regions then never mask.
    first_row = rows == bounds_ref[0]
    last_row = rows == bounds_ref[1]
    if sim_w:
        # Lane-packed fleet mode (batch_packed.py): a TRUE wall every sim_w
        # columns — the clamp and -C reflection act at every sim boundary.
        cm = jnp.remainder(cols, sim_w)
        first_col = cm == 0
        last_col = cm == sim_w - 1
    else:
        first_col = cols == bounds_ref[2]
        last_col = cols == bounds_ref[3]

    def shift_l(x):
        return jnp.where(first_col, x, pltpu.roll(x, 1, axis=1))

    def shift_r(x):
        return jnp.where(last_col, x, pltpu.roll(x, w - 1, axis=1))

    def shift_b(x):  # below = row - 1
        return jnp.where(first_row, x, pltpu.roll(x, 1, axis=0))

    def shift_t(x):  # above = row + 1
        return jnp.where(last_row, x, pltpu.roll(x, blk_h - 1, axis=0))

    u = vel_ref[0].astype(jnp.float32)
    v = vel_ref[1].astype(jnp.float32)

    if with_splats:
        # Separable rank-S gaussian bump. gy arrives as a BlockSpec window
        # aligned with the velocity window: an in-kernel dynamic sublane
        # slice feeding the MXU miscompiled at clamped window starts
        # (h=176 dense-factor repro, out/jobs/93) — the DMA engine does the
        # dynamic offset instead. gx is windowed on columns the same way.
        gy = gy_ref[...].astype(jnp.float32)         # (blk_h, S)
        gx = gx_ref[:].astype(jnp.float32)           # (S, w)
        amt = amt_ref[:]                             # (S, 2)
        # Static slices + reshape (Mosaic can't lower fancy [None,:,0] gathers).
        amt_u = amt[:, 0:1].reshape(1, -1)
        amt_v = amt[:, 1:2].reshape(1, -1)
        # dot_f32_3x: Mosaic's default f32 dot is single-pass bf16 (~3e-3
        # relative), which made splat bumps diverge between kernels and the
        # XLA oracle; it rejects Precision.HIGH, and HIGHEST (6 passes)
        # measured -27% on the demo config (ops/pallas/common.py).
        dims = (((1,), (0,)), ((), ()))
        u = u + dot_f32_3x(gy * amt_u, gx, dims)
        v = v + dot_f32_3x(gy * amt_v, gx, dims)
        if out_vel_ref.dtype != jnp.float32:
            # Round the bumped velocity to STORAGE before the stencil
            # chain: the reference's splat pass writes a half-float texture
            # that curl then reads (script.js:1443-1449), and the jnp
            # fallback rounds identically. Without this the f32-kept bump
            # diverges from the oracle through the confinement amplifier
            # (~2% p999 over the splat region at 8192^2, out/jobs/b27).
            u = u.astype(out_vel_ref.dtype).astype(jnp.float32)
            v = v.astype(out_vel_ref.dtype).astype(jnp.float32)

    # curl = 0.5 * (R.y - L.y - T.x + B.x)   (script.js:814-833)
    c = 0.5 * (shift_r(v) - shift_l(v) - shift_t(u) + shift_b(u))

    # vorticity confinement (script.js:835-866)
    fx = 0.5 * (jnp.abs(shift_t(c)) - jnp.abs(shift_b(c)))
    fy = 0.5 * (jnp.abs(shift_r(c)) - jnp.abs(shift_l(c)))
    inv_len = 1.0 / (jnp.sqrt(fx * fx + fy * fy) + 1e-4)
    scale = curl_strength * c * inv_len
    u = jnp.clip(u + fx * scale * dt, -1000.0, 1000.0)
    v = jnp.clip(v - fy * scale * dt, -1000.0, 1000.0)

    # divergence with -C wall reflection (script.js:786-812)
    left_u = jnp.where(first_col, -u, shift_l(u))
    right_u = jnp.where(last_col, -u, shift_r(u))
    below_v = jnp.where(first_row, -v, shift_b(v))
    above_v = jnp.where(last_row, -v, shift_t(v))
    div = 0.5 * (right_u - left_u + above_v - below_v)

    off = i * rows_per_block - start
    r = rows_per_block
    ou = jnp.zeros((r, w), u.dtype)
    ov = jnp.zeros((r, w), v.dtype)
    od = jnp.zeros((r, w), div.dtype)
    for k in range(0, 2 * halo + 1, align):
        ou = jnp.where(off == k, u[k:k + r], ou)
        ov = jnp.where(off == k, v[k:k + r], ov)
        od = jnp.where(off == k, div[k:k + r], od)
    if col_halo:
        coff = j * cols_per_block - cstart
        cb = cols_per_block
        ouc = jnp.zeros((r, cb), ou.dtype)
        ovc = jnp.zeros((r, cb), ov.dtype)
        odc = jnp.zeros((r, cb), od.dtype)
        for k in range(0, 2 * col_halo + 1, LANE):
            ouc = jnp.where(coff == k, ou[:, k:k + cb], ouc)
            ovc = jnp.where(coff == k, ov[:, k:k + cb], ovc)
            odc = jnp.where(coff == k, od[:, k:k + cb], odc)
        ou, ov, od = ouc, ovc, odc
    out_vel_ref[0] = ou.astype(out_vel_ref.dtype)
    out_vel_ref[1] = ov.astype(out_vel_ref.dtype)
    out_div_ref[:] = od.astype(out_div_ref.dtype)


def _gs_kernel(vel_ref, p_ref, out_ref, *, rows_per_block: int,
               cols_per_block: int, h_global: int, w_global: int,
               h_true: int, w_true: int, halo: int, col_halo: int,
               align: int, sim_w: int):
    """vel - un-halved grad(p) (gradientSubtractShader, script.js:892-913 —
    the reference's missing 0.5 factor is deliberate, see ops/stencil.py)."""
    i = pl.program_id(0)
    blk_h = p_ref.shape[0]
    w = p_ref.shape[1]
    start = window_start(i, rows_per_block, halo, h_global, align)
    if col_halo:
        j = pl.program_id(1)
        cstart = window_start(j, cols_per_block, col_halo, w_global, LANE)
    else:
        cstart = 0

    rows = lax.broadcasted_iota(jnp.int32, (blk_h, w), 0) + start
    cols = lax.broadcasted_iota(jnp.int32, (blk_h, w), 1) + cstart
    first_row = rows == 0
    last_row = rows == h_true - 1
    if sim_w:  # lane-packed fleet mode: walls every sim_w columns
        cm = jnp.remainder(cols, sim_w)
        first_col = cm == 0
        last_col = cm == sim_w - 1
    else:
        first_col = cols == 0
        last_col = cols == w_true - 1

    p = p_ref[:].astype(jnp.float32)
    pl_ = jnp.where(first_col, p, pltpu.roll(p, 1, axis=1))
    pr = jnp.where(last_col, p, pltpu.roll(p, w - 1, axis=1))
    pb = jnp.where(first_row, p, pltpu.roll(p, 1, axis=0))
    pt = jnp.where(last_row, p, pltpu.roll(p, blk_h - 1, axis=0))

    u = vel_ref[0].astype(jnp.float32) - (pr - pl_)
    v = vel_ref[1].astype(jnp.float32) - (pt - pb)

    off = i * rows_per_block - start
    r = rows_per_block
    ou = jnp.zeros((r, w), u.dtype)
    ov = jnp.zeros((r, w), v.dtype)
    for k in range(0, 2 * halo + 1, align):
        ou = jnp.where(off == k, u[k:k + r], ou)
        ov = jnp.where(off == k, v[k:k + r], ov)
    if col_halo:
        coff = j * cols_per_block - cstart
        cb = cols_per_block
        ouc = jnp.zeros((r, cb), ou.dtype)
        ovc = jnp.zeros((r, cb), ov.dtype)
        for k in range(0, 2 * col_halo + 1, LANE):
            ouc = jnp.where(coff == k, ou[:, k:k + cb], ouc)
            ovc = jnp.where(coff == k, ov[:, k:k + cb], ovc)
        ou, ov = ouc, ovc
    out_ref[0] = ou.astype(out_ref.dtype)
    out_ref[1] = ov.astype(out_ref.dtype)


def _tile_geometry(h: int, w: int, itemsize: int):
    tile = _pick_tile(h, w, itemsize)
    if tile is None:
        raise ValueError(f"unsupported shape {(h, w)}")
    rows, cols = tile
    halo = _halo(itemsize)
    align = row_align(itemsize)
    col_halo = 0 if cols == w else _COL_HALO
    win = rows + 2 * halo
    cw = cols + 2 * col_halo
    grid = (h // rows,) if not col_halo else (h // rows, w // cols)

    def idx(lead_dims: int):
        def index_map(i, j=0):
            rs = window_start(i, rows, halo, h, align)
            cs = window_start(j, cols, col_halo, w, LANE) if col_halo else 0
            return (0,) * lead_dims + (rs, cs)
        return index_map

    return rows, cols, halo, col_halo, align, win, cw, grid, idx


def gradient_subtract(velocity: jnp.ndarray, pressure: jnp.ndarray,
                      true_shape=None, sim_w: int = 0) -> jnp.ndarray:
    """One-HBM-pass Pallas gradient subtract (the projection's last step;
    the self-advection gather then reads the projected velocity straight
    from its ref — single-device and sharded paths share this split).
    sim_w > 0: lane-packed fleet mode — column walls every sim_w lanes."""
    _, h, w = velocity.shape
    if true_shape is None:
        true_shape = (h, w)
    (rows, cols, halo, col_halo, align, win, cw, grid, idx) = _tile_geometry(
        h, w, velocity.dtype.itemsize)
    kernel = functools.partial(_gs_kernel, rows_per_block=rows,
                               cols_per_block=cols, h_global=h, w_global=w,
                               h_true=true_shape[0], w_true=true_shape[1],
                               halo=halo, col_halo=col_halo, align=align,
                               sim_w=sim_w)
    out_idx = (lambda i: (0, i, 0)) if not col_halo else \
        (lambda i, j: (0, i, j))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_Element(2, (0, 0)), _Element(win), _Element(cw)),
                         idx(1), memory_space=pltpu.VMEM),
            pl.BlockSpec((_Element(win), _Element(cw)), idx(0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, rows, cols), out_idx,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, h, w), velocity.dtype),
        cost_estimate=pl.CostEstimate(
            flops=6 * h * w,
            bytes_accessed=5 * h * w * velocity.dtype.itemsize,
            transcendentals=0,
        ),
    )(velocity, pressure)


def curl_vorticity_divergence(velocity: jnp.ndarray, curl_strength: float, dt,
                              splat_gy: Optional[jnp.ndarray] = None,
                              splat_gx: Optional[jnp.ndarray] = None,
                              splat_amt: Optional[jnp.ndarray] = None,
                              true_shape=None, true_bounds=None,
                              sim_w: int = 0):
    """(vel', div) — fused (optional splat) + curl + confinement + divergence.

    splat_gy (H, S), splat_gx (S, W), splat_amt (S, 2): the separable splat
    factors (see ops.splat._splat_sum); pass all three or none.
    true_bounds: (row_lo, row_hi, col_lo, col_hi) array coords of the grid's
    TRUE walls (traced OK; sentinels outside the array disable a wall) —
    defaults to the true_shape extents. Lets a halo-padded shard place the
    clamp and -C reflection at the real walls.
    """
    _, h, w = velocity.shape
    if true_shape is None:
        true_shape = (h, w)
    (rows, cols, halo, col_halo, align, win, cw, grid, idx) = _tile_geometry(
        h, w, velocity.dtype.itemsize)
    # (1,1) not (1,): a batched SMEM block lowers only when its last two
    # dims are (8,128)-divisible OR equal the full array dims -- (1,1)
    # satisfies the latter, so vmap(step) can batch a per-sim dt
    # (out/jobs/done/c01_batched_smem_probe.py); (1,) cannot.
    dt_arr = jnp.asarray(dt, jnp.float32).reshape(1, 1)

    with_splats = splat_gy is not None
    if not with_splats:
        s = 8
        splat_gy = jnp.zeros((h, s), velocity.dtype)
        splat_gx = jnp.zeros((s, w), velocity.dtype)
        splat_amt = jnp.zeros((s, 2), jnp.float32)

    if true_bounds is None:
        true_bounds = (0, true_shape[0] - 1, 0, true_shape[1] - 1)
    bounds = jnp.stack([jnp.asarray(b, jnp.int32) for b in true_bounds])
    kernel = functools.partial(_kernel, curl_strength=float(curl_strength),
                               rows_per_block=rows, cols_per_block=cols,
                               h_global=h, w_global=w,
                               with_splats=with_splats, halo=halo,
                               col_halo=col_halo, align=align, sim_w=sim_w)

    def gy_idx(i, j=0):
        return (window_start(i, rows, halo, h, align), 0)

    def gx_idx(i, j=0):
        cs = window_start(j, cols, col_halo, w, LANE) if col_halo else 0
        return (0, cs)

    out_v_idx = (lambda i: (0, i, 0)) if not col_halo else \
        (lambda i, j: (0, i, j))
    out_d_idx = (lambda i: (i, 0)) if not col_halo else (lambda i, j: (i, j))
    out_vel, out_div = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # true-wall bounds (4,)
            pl.BlockSpec((_Element(2, (0, 0)), _Element(win), _Element(cw)),
                         idx(1), memory_space=pltpu.VMEM),
            # gy windowed like the velocity rows; gx windowed on columns
            pl.BlockSpec((_Element(win), _Element(splat_gy.shape[1])),
                         gy_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((_Element(splat_gx.shape[0]), _Element(cw)),
                         gx_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # amt (S, 2) whole
        ],
        out_specs=(
            pl.BlockSpec((2, rows, cols), out_v_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, cols), out_d_idx, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((2, h, w), velocity.dtype),
            jax.ShapeDtypeStruct((h, w), velocity.dtype),
        ),
        cost_estimate=pl.CostEstimate(
            flops=40 * h * w,
            bytes_accessed=6 * h * w * velocity.dtype.itemsize,
            transcendentals=h * w,
        ),
    )(dt_arr, bounds, velocity, splat_gy, splat_gx, splat_amt)
    return out_vel, out_div
