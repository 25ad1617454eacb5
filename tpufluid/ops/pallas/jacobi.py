"""Fused Pallas Jacobi pressure solve.

The reference pays one GL draw call per sweep (script.js:1259-1266: 20 draws
through texture memory per frame). Here K sweeps run per HBM pass entirely in
VMEM: the grid tiles the plane and each program loads an overlapping haloed
window of pressure and divergence, runs K unrolled sweeps
p' = (L + R + T + B - div) * 0.25 on the VPU (neighbors via pltpu.roll +
global-boundary masking), and writes back the central block, which is exact
because staleness moves inward one cell per sweep.

Tiling is 2-D: rows always, and — for grids too wide for a full-width row
block (16384^2 pressure once fell back to 20 full-grid jnp sweeps, ~40% of
that config's step) — columns as well, with a 128-lane halo per side (lane
windows must be 128-aligned; 128 > the 20-sweep staleness reach). Windows
are IN-BOUNDS (clamped starts, ops/pallas/common.py) — no edge-pad copies of
the fields are ever materialized in HBM.

bfloat16 fields (the reference's R16F textures) are loaded natively and
upcast in-register — sweeps run in f32 like the shader's arithmetic — which
halves the HBM traffic vs round 1's cast-through-f32 staging; their window
offsets respect the (16, 128) bf16 tiling.

Semantics identical to tpufluid.ops.stencil.jacobi_pressure (the oracle);
verified by tests/test_pallas.py in interpret mode and on-device by bench.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Element-indexed block dims allow overlapping (haloed) input windows.
from tpufluid.ops.pallas.common import Element as _Element

from tpufluid.ops.pallas.common import LANE, edge_shift, row_align, window_start

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
_COL_HALO = LANE  # lane windows are 128-aligned; 128 > 20-sweep staleness


def _halo(itemsize: int) -> int:
    """>= sweeps per chunk (20), multiple of the dtype's row alignment."""
    return 24 if itemsize == 4 else 32


# Mosaic's scoped-VMEM liveness for STANDALONE full-width sweep programs:
# ~30 B/elem for BOTH the masked and the select-free chains ((576,1024)
# windows compile to 17.39-17.50M scoped > the 16M ceiling, out/jobs/
# b48/b51/b54 — yet the IDENTICAL kernel fits when compiled inside the
# fused step program; Mosaic's stack liveness is context-dependent). The
# tile picker caps full-width windows to this standalone model so
# jacobi_pressure compiles at EVERY entry point, not just inside the step
# (step-level cost of the smaller headline tile: -0.2%, noise —
# out/jobs/b56). Column-tiled windows keep their own empirical budget
# (_VMEM_BUDGET_COL, validated in-scan at 16384^2).
_FULLW_BYTES_PER_ELEM = 30
_SCOPED_CEILING = 15 * 1024 * 1024  # 1M margin under Mosaic's 16M limit


def _exact_fits(true_shape, shape, col_halo: int) -> bool:
    """Select-free (edge-clamped shift) sweeps engage on every UNPADDED
    grid: clamped window starts (rows AND columns) mean a true wall only
    ever sits at a window edge, so edge clamping IS the wall condition.
    Full-width windows are liveness-capped by the picker (~30 B/elem
    standalone, matching the masked chain); column-tiled windows compile
    within the _VMEM_BUDGET_COL envelope ((320,1280) verified standalone,
    out/jobs/b65) and measure 12-13% faster than masked at 4096^2/16384^2,
    bit-identical. Padded grids (sharded mirror-ghost blocks, tile-pad
    dispatch) keep the masked chain: true walls sit mid-window there."""
    return tuple(true_shape) == tuple(shape)


def _pick_tile(h: int, w: int, halo: int,
               itemsize: int) -> Optional[Tuple[int, int]]:
    """(rows, cols) per block, or None. cols == w means no column windows
    (the fast path every grid up to ~8K wide takes)."""
    align = row_align(itemsize)
    bytes_per = 4 * itemsize + 8  # p+div loads (it) + f32 p + roll temp

    def best_rows(cw: int, budget: int, elem_cap: int = 0) -> int:
        best = 0
        for r in range(align, h + 1, align):
            if h % r or r + 2 * halo > h:
                continue
            if elem_cap and (r + 2 * halo) * cw > elem_cap:
                continue
            if bytes_per * (r + 2 * halo) * cw <= budget:
                best = r
        return best

    best = None
    r = best_rows(w, _VMEM_BUDGET,
                  elem_cap=_SCOPED_CEILING // _FULLW_BYTES_PER_ELEM)
    if r:
        # Full-width is NOT automatically best: at 8192-wide bf16 it just
        # fits with a 16-row block (5x overcompute) while a (128,1024)
        # column tile is 1.9x — compare modeled overcompute and keep
        # full-width only when it is within 10% (fewer programs, no column
        # selects) of the best column candidate (out/jobs/b38).
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
    return _pick_tile(h, w, _halo(itemsize), itemsize) is not None


def _jacobi_chunk_kernel(p_ref, d_ref, out_ref, *, sweeps: int, halo: int,
                         col_halo: int, rows_per_block: int,
                         cols_per_block: int, h_global: int, w_global: int,
                         h_true: int, w_true: int, align: int,
                         prescale: float, exact: bool, sim_w: int,
                         rows_exact: bool):
    i = pl.program_id(0)
    blk_h = p_ref.shape[0]
    blk_w = p_ref.shape[1]
    start = window_start(i, rows_per_block, halo, h_global, align)
    if col_halo:
        j = pl.program_id(1)
        cstart = window_start(j, cols_per_block, col_halo, w_global, LANE)
    else:
        cstart = 0

    div = d_ref[:].astype(jnp.float32)
    # prescale fuses the reference's warm start (clearShader: p *= PRESSURE,
    # script.js:1253-1257) into the first sweep's load — no extra HBM pass.
    p = p_ref[:].astype(jnp.float32) * prescale
    if exact:
        # Unpadded grids (true extents == array extents): window starts are
        # CLAMPED, so a true wall can only ever sit at a window EDGE — the
        # neighbor-of-self wall condition IS edge clamping, and the whole
        # program specializes statically: no iotas, no masks, no per-sweep
        # selects (the round-6 runtime-cond experiments all lost,
        # docs/BENCH.md rejected log items 4-5; this removes the selects at
        # compile time instead). Window-edge rows/cols of wall-free windows
        # get clamp garbage instead of the masked path's roll-wrap garbage —
        # both sit outside every central cell's dependency cone (the
        # wrongness front moves inward one cell per sweep and sweeps <=
        # halo-1 < halo), so central outputs are BIT-identical to the
        # masked path's (device-verified, out/jobs/b48).
        for _ in range(sweeps):
            # Sequential accumulation (not four live shift temps): keeps
            # peak scoped VMEM at ~2 window temps — the sum order matches
            # the masked branch's left-associative (((L+R)+B)+A) exactly.
            acc = edge_shift(p, 1, axis=1)
            acc = acc + edge_shift(p, -1, axis=1)
            acc = acc + edge_shift(p, 1, axis=0)
            acc = acc + edge_shift(p, -1, axis=0)
            p = (acc - div) * 0.25
    elif sim_w and rows_exact:
        # Lane-packed fleet mode (batch_packed.py): B independent sims side
        # by side in lanes, a TRUE wall every sim_w columns. The modular
        # masks make each sweep's wall condition (neighbor-of-self) cut the
        # dependency cone at every sim boundary, so sims never contaminate
        # each other even inside a shared window. ROWS keep the select-free
        # edge-clamped shifts (packed_supported gates on unpadded rows, so
        # the exact-path argument holds per axis: a true row wall only ever
        # sits at a window edge) — half the masked chain's per-sweep
        # selects, and the sum order matches it exactly.
        cols = lax.broadcasted_iota(jnp.int32, (blk_h, blk_w), 1) + cstart
        cm = jnp.remainder(cols, sim_w)
        first_col = cm == 0
        last_col = cm == sim_w - 1
        for _ in range(sweeps):
            acc = jnp.where(first_col, p, pltpu.roll(p, 1, axis=1))
            acc = acc + jnp.where(last_col, p, pltpu.roll(p, blk_w - 1, axis=1))
            acc = acc + edge_shift(p, 1, axis=0)
            acc = acc + edge_shift(p, -1, axis=0)
            p = (acc - div) * 0.25
    else:
        rows = lax.broadcasted_iota(jnp.int32, (blk_h, blk_w), 0) + start
        cols = lax.broadcasted_iota(jnp.int32, (blk_h, blk_w), 1) + cstart
        first_row = rows == 0
        last_row = rows == h_true - 1
        if sim_w:  # packed fleet on row-padded arrays: modular col walls
            cm = jnp.remainder(cols, sim_w)
            first_col = cm == 0
            last_col = cm == sim_w - 1
        else:
            first_col = cols == 0
            last_col = cols == w_true - 1
        for _ in range(sweeps):
            # pltpu.roll needs non-negative shift: roll by N-1 == shift -1.
            left = jnp.where(first_col, p, pltpu.roll(p, 1, axis=1))
            right = jnp.where(last_col, p, pltpu.roll(p, blk_w - 1, axis=1))
            below = jnp.where(first_row, p, pltpu.roll(p, 1, axis=0))
            above = jnp.where(last_row, p, pltpu.roll(p, blk_h - 1, axis=0))
            p = (left + right + below + above - div) * 0.25

    # Central rows/cols sit at dynamic (aligned) offsets inside the window.
    off = i * rows_per_block - start
    out = jnp.zeros((rows_per_block, blk_w), dtype=p.dtype)
    for k in range(0, 2 * halo + 1, align):
        out = jnp.where(off == k, p[k:k + rows_per_block], out)
    if col_halo:
        coff = j * cols_per_block - cstart
        outc = jnp.zeros((rows_per_block, cols_per_block), dtype=p.dtype)
        for k in range(0, 2 * col_halo + 1, LANE):
            outc = jnp.where(coff == k, out[:, k:k + cols_per_block], outc)
        out = outc
    out_ref[:] = out.astype(out_ref.dtype)


def _jacobi_chunk(p: jnp.ndarray, div: jnp.ndarray, sweeps: int, halo: int,
                  rows_per_block: int, cols_per_block: int, true_shape,
                  prescale: float = 1.0, sim_w: int = 0) -> jnp.ndarray:
    h, w = p.shape
    align = row_align(p.dtype.itemsize)
    n_blocks = h // rows_per_block
    col_halo = 0 if cols_per_block == w else _COL_HALO
    n_cblocks = w // cols_per_block
    kernel = functools.partial(
        _jacobi_chunk_kernel, sweeps=sweeps, halo=halo, col_halo=col_halo,
        rows_per_block=rows_per_block, cols_per_block=cols_per_block,
        h_global=h, w_global=w, h_true=true_shape[0], w_true=true_shape[1],
        align=align, prescale=float(prescale), sim_w=sim_w,
        exact=_exact_fits(true_shape, (h, w), col_halo) and not sim_w,
        rows_exact=true_shape[0] == h,
    )
    win = rows_per_block + 2 * halo
    cw = cols_per_block + 2 * col_halo

    def idx(i, j=0):
        start = window_start(i, rows_per_block, halo, h, align)
        if col_halo:
            return (start, window_start(j, cols_per_block, col_halo, w, LANE))
        return (start, 0)

    grid = (n_blocks,) if not col_halo else (n_blocks, n_cblocks)
    out_idx = (lambda i: (i, 0)) if not col_halo else (lambda i, j: (i, j))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_Element(win), _Element(cw)), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((_Element(win), _Element(cw)), idx, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows_per_block, cols_per_block), out_idx,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w), p.dtype),
        cost_estimate=pl.CostEstimate(
            flops=6 * sweeps * h * w,
            bytes_accessed=(3 * win * cw * n_cblocks + rows_per_block * w)
            * n_blocks * p.dtype.itemsize,
            transcendentals=0,
        ),
    )(p, div)


def jacobi_pressure(pressure: jnp.ndarray, div: jnp.ndarray, iterations: int,
                    chunk: int = 20, true_shape=None,
                    prescale: float = 1.0, sim_w: int = 0) -> jnp.ndarray:
    """``iterations`` Jacobi sweeps, K=chunk sweeps per HBM pass.

    true_shape: (h_true, w_true) when the arrays are edge-padded to tile
    alignment; boundary masks act at the true extents.
    prescale: warm-start factor applied to the incoming pressure (the
    reference's clearShader p *= PRESSURE pass, fused into the first load).
    sim_w > 0: lane-packed fleet mode (batch_packed.py) — the array holds
    W/sim_w independent sims side by side in lanes; column walls repeat
    every sim_w columns (modular masks) while rows keep the global walls."""
    if iterations == 0:
        if prescale == 1.0:
            return pressure
        return (pressure.astype(jnp.float32) * prescale).astype(pressure.dtype)
    h, w = pressure.shape
    if true_shape is None:
        true_shape = (h, w)
    chunk = min(chunk, iterations)
    halo = _halo(pressure.dtype.itemsize)
    # Exactness bound: staleness moves inward one cell per sweep, so each
    # pass's sweep count must stay below every halo width.
    chunk = min(chunk, halo - 1, _COL_HALO - 1)
    tile = _pick_tile(h, w, halo, pressure.dtype.itemsize)
    if tile is None:
        raise ValueError(f"unsupported shape {pressure.shape}")
    rows_per_block, cols_per_block = tile

    p = pressure
    done = 0
    while done < iterations:
        k = min(chunk, iterations - done)
        p = _jacobi_chunk(p, div, k, halo, rows_per_block, cols_per_block,
                          true_shape, prescale=prescale if done == 0 else 1.0,
                          sim_w=sim_w)
        done += k
    return p
