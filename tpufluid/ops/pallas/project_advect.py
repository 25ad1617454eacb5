"""Fused gradient-subtract + velocity self-advection kernel.

The reference runs these as two full-grid passes (gradientSubtractShader then
advectionShader on velocity, script.js:1268-1285). Fusing them saves a full
HBM round-trip of the velocity field. Each 2-D tile (rows x columns — small
tiles keep the gather's row-offset trip count tracking the LOCAL velocity
range, see ops/pallas/advect.py):

  1. computes vel' = vel - (R-L, T-B) of pressure over its whole haloed
     window (the un-halved central difference, preserving the reference's
     2x-gradient quirk — see ops/stencil.gradient_subtract);
  2. lane-rotates the window once so the target block sits at a static lane
     offset;
  3. backtraces from the central rows through vel' itself and gathers
     bilinearly from the in-register window (ops/pallas/advect.py machinery),
     applying the 1/(1 + dissipation*dt) decay.

Windows are IN-BOUNDS clamped — no HBM edge-pad copies. The outermost window
ring holds a vel' computed with a window-wrapped pressure neighbor; the
backtrace (bounded by ~18 texels < halo-1) can never reach it, and when the
window IS clipped its edge coincides with the global boundary where the mask
handling is exact.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpufluid.ops.pallas.common import Element as _Element

from tpufluid.ops.pallas.advect import HALO, _clamped_start, _gather_stream
from tpufluid.ops.pallas.common import LANE, SUBLANE, round_up, row_align

_VMEM_BUDGET = 12 * 1024 * 1024
_PREF_ROWS = 32
_PREF_COLS = 256
_SPAN = 1  # ratio-1 self-advection: column displacement <= ~18 < 128


def _halo(itemsize: int) -> int:
    return round_up(HALO, row_align(itemsize))


def _pick_tile(h: int, w: int, itemsize: int) -> Tuple[int, int]:
    align = row_align(itemsize)
    halo = _halo(itemsize)
    rows = 0
    for r in range(align, h + 1, align):
        if h % r == 0 and r + 2 * halo <= h:
            rows = r
            if r >= _PREF_ROWS:
                break
    if rows == 0:
        return (0, 0)
    cols = 0
    for cb in range(LANE, w + 1, LANE):
        if w % cb == 0 and cb + 2 * _SPAN * LANE <= w:
            cols = cb
            if cb >= _PREF_COLS:
                break
    if cols == 0:
        cols = w
    cbw = cols + (2 * _SPAN * LANE if cols != w else 0)
    # vel window (2) + p window (1) + f32 vel' copy (2) + temps
    vmem = (((3 * itemsize + 8) * (rows + 2 * halo)) * cbw
            + 22 * rows * cbw * itemsize)
    if vmem > _VMEM_BUDGET:
        return (0, 0)
    return rows, cols


def supported(shape: Tuple[int, int], itemsize: int = 4) -> bool:
    h, w = shape
    if itemsize not in (2, 4):
        return False
    if w % LANE or h % row_align(itemsize):
        return False
    return _pick_tile(h, w, itemsize)[0] > 0


def _kernel(dt_ref, vel_ref, p_ref, out_ref, velp_ref, *, dissipation: float,
            rows: int, cols: int, h_global: int, w_global: int,
            h_true: int, w_true: int, col_halo: int, halo: int, align: int):
    r, cb = rows, cols
    blk_h = vel_ref.shape[1]
    cbw = vel_ref.shape[2]
    i = pl.program_id(0)
    j = pl.program_id(1)
    dt = dt_ref[0]

    rstart = _clamped_start(i, r, halo, h_global, align)
    roff = i * r - rstart
    if col_halo:
        cstart = _clamped_start(j, cb, col_halo, w_global, LANE)
        coff = j * cb - cstart
    else:
        cstart = j * cb
        coff = 0

    rows_g = lax.broadcasted_iota(jnp.int32, (blk_h, cbw), 0) + rstart
    cols_g = lax.broadcasted_iota(jnp.int32, (blk_h, cbw), 1) + cstart
    first_row = rows_g == 0
    last_row = rows_g == h_true - 1
    first_col = cols_g == 0
    last_col = cols_g == w_true - 1

    # vel' = vel - un-halved grad(p) over the whole window. Roll-wrapped
    # neighbors only pollute the outermost window ring, which the bounded
    # backtrace never reads (module docstring).
    p = p_ref[:].astype(jnp.float32)
    pl_ = jnp.where(first_col, p, pltpu.roll(p, 1, axis=1))
    pr = jnp.where(last_col, p, pltpu.roll(p, cbw - 1, axis=1))
    pb = jnp.where(first_row, p, pltpu.roll(p, 1, axis=0))
    pt = jnp.where(last_row, p, pltpu.roll(p, blk_h - 1, axis=0))

    u = vel_ref[0].astype(jnp.float32) - (pr - pl_)
    v = vel_ref[1].astype(jnp.float32) - (pt - pb)
    velp = jnp.stack([u, v])

    # Align the window so the target block sits at lane offset col_halo,
    # then stage vel' in VMEM scratch: the gather loop slices its rows
    # dynamically, which refs support and values don't in this lowering.
    if col_halo:
        velp = pltpu.roll(velp, jnp.mod(col_halo - coff, cbw), axis=2)
    velp_ref[:] = velp

    def load(al):
        return velp_ref[:, pl.ds(al, r + align), :]

    # Target rows/cols of vel' (row offset dynamic aligned, cols static).
    uu = jnp.zeros((r, cbw), jnp.float32)
    vv = jnp.zeros((r, cbw), jnp.float32)
    for k in range(0, 2 * halo + 1, align):
        uu = jnp.where(roff == k, velp[0, k:k + r].astype(jnp.float32), uu)
        vv = jnp.where(roff == k, velp[1, k:k + r].astype(jnp.float32), vv)
    csl = slice(col_halo, col_halo + cb)
    uu = uu[:, csl]
    vv = vv[:, csl]

    rows_local = lax.broadcasted_iota(jnp.int32, (r, cb), 0).astype(jnp.float32)
    cols_local = lax.broadcasted_iota(jnp.int32, (r, cb), 1).astype(jnp.float32)

    x_local = cols_local + jnp.float32(col_halo) - dt * uu
    yp = rows_local + roff.astype(jnp.float32) - dt * vv

    jcb = (j * cb).astype(jnp.float32)
    x_lo = jnp.maximum(jnp.float32(col_halo) - jcb, 0.0)
    x_hi = jnp.minimum(jnp.float32(w_true - 1) - jcb + col_halo,
                       jnp.float32(cbw - 1))
    yp_hi = jnp.minimum(jnp.float32(blk_h - 1),
                        jnp.float32(h_true - 1) - rstart.astype(jnp.float32))

    acc = _gather_stream(load, 2, blk_h, cbw, x_local, yp, x_lo, x_hi, yp_hi,
                         _SPAN, r, cb, col_halo // LANE, align)
    out_ref[:] = (acc / (1.0 + dissipation * dt)).astype(out_ref.dtype)


def gradsub_advect_velocity(velocity: jnp.ndarray, pressure: jnp.ndarray, dt,
                            dissipation: float, true_shape=None) -> jnp.ndarray:
    """vel - grad(pressure), then self-advected: one fused HBM pass."""
    _, h, w = velocity.shape
    if true_shape is None:
        true_shape = (h, w)
    rows, cols = _pick_tile(h, w, velocity.dtype.itemsize)
    if rows == 0:
        raise ValueError(f"unsupported shape {velocity.shape}")
    halo = _halo(velocity.dtype.itemsize)
    align = row_align(velocity.dtype.itemsize)
    col_halo = _SPAN * LANE if cols != w else 0
    n_r = h // rows
    n_c = w // cols
    dt_arr = jnp.asarray(dt, jnp.float32).reshape(1)

    win = rows + 2 * halo
    cbw = cols + 2 * col_halo

    def win_idx(lead):
        def index_map(i, j):
            rs = pl.multiple_of(jnp.clip(i * rows - halo, 0, h - win), align)
            if col_halo:
                cs = pl.multiple_of(jnp.clip(j * cols - col_halo, 0, w - cbw), LANE)
            else:
                cs = j * cols
            return (0,) * lead + (rs, cs)

        return index_map

    kernel = functools.partial(_kernel, dissipation=float(dissipation),
                               rows=rows, cols=cols, h_global=h, w_global=w,
                               h_true=true_shape[0], w_true=true_shape[1],
                               col_halo=col_halo, halo=halo, align=align)
    return pl.pallas_call(
        kernel,
        grid=(n_r, n_c),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((_Element(2, (0, 0)), _Element(win), _Element(cbw)),
                         win_idx(1), memory_space=pltpu.VMEM),
            pl.BlockSpec((_Element(win), _Element(cbw)), win_idx(0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, rows, cols), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, h, w), velocity.dtype),
        # vel' is computed and staged in f32 (the dynamic rotate/gather ops
        # are 32-bit-only in this Mosaic).
        scratch_shapes=[pltpu.VMEM((2, win, cbw), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=80 * h * w,
            bytes_accessed=9 * h * w * velocity.dtype.itemsize,
            transcendentals=0,
        ),
    )(dt_arr, velocity, pressure)
