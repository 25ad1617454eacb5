"""Pallas semi-Lagrangian advection (advectionShader, script.js:746-784).

XLA lowers the backtrace gather to scalar loads (~35 ms for 1024^2 on v5e —
99% of the whole step). This kernel exploits the displacement bound the
reference guarantees by construction (|v| <= 1000 sim-texels/s after the
vorticity clamp script.js:863, dt <= 1/60 s script.js:1191 => backtrace moves
at most ~17 texels):

  * grid over row blocks; the source is read through an IN-BOUNDS clamped
    24-row halo window (ops/pallas/common.py — no HBM edge-pad copies);
  * the row component of the gather becomes a fori_loop over the *actual*
    integer row-offset range present in the block (typically ~4 iterations,
    worst case ~38), each using a row-aligned operand built from an 8-aligned
    dynamic window slice + static sub-offset select;
  * the column component is a true vectorized gather: per 128-lane group,
    jnp.take_along_axis against the {-1, 0, +1} neighboring source lane
    groups (Mosaic lowers these to tpu.dynamic_gather) — legal because the
    column displacement is also bounded by 17 < 128;
  * bilinear weights and the 1/(1 + dissipation*dt) decay (script.js:780-781)
    are applied in-register.

Cross-resolution (dye) advection first resamples the coarse velocity to the
dye grid with the cheap separable XLA path, then uses this same-grid kernel.
Semantics match tpufluid.ops.advect.advect (the oracle).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jax._src.pallas.core import Element as _Element

from tpufluid.ops.pallas.common import (
    LANE, SUBLANE, make_window_index_map, window_start,
)

HALO = 24  # ceil(1000/60) + bilinear corner + margin, multiple of sublanes
_VMEM_BUDGET = 10 * 1024 * 1024


def _pick_block_rows(h: int, w: int, channels: int, itemsize: int) -> int:
    # Prefer SMALL blocks: the gather loop's trip count scales with the
    # velocity range inside the block (measured optimum r=16 at 1024^2).
    best = 0
    for r in range(SUBLANE, h + 1, SUBLANE):
        if h % r or r + 2 * HALO > h:
            continue
        vmem = (channels * (8 * r + 2 * HALO + SUBLANE) + 10 * r) * w * itemsize
        if vmem <= _VMEM_BUDGET:
            best = r
            if r >= 16:
                break
    return best


def supported(src_shape: Tuple[int, ...], itemsize: int = 4) -> bool:
    h, w = src_shape[-2], src_shape[-1]
    c = src_shape[0] if len(src_shape) == 3 else 1
    if itemsize != 4:
        return False  # Mosaic dynamic gather/rotate support 32-bit only here
    if w % LANE or h % SUBLANE:
        return False
    return _pick_block_rows(h, w, c, itemsize) > 0


def _gather_lanes_windowed(rows, idx, w):
    """rows (C, R, W) gathered along lanes at integer idx (R, W), |idx - j| < 128.

    Decomposes W into 128-lane groups; each output group gathers from its
    {-1, 0, +1} neighbor groups via per-group take_along_axis.
    """
    c, r, _ = rows.shape
    n_groups = w // LANE
    out = []
    for g in range(n_groups):
        sl = slice(g * LANE, (g + 1) * LANE)
        idx_g = idx[:, sl]
        acc = jnp.zeros((c, r, LANE), dtype=rows.dtype)
        for s in (-1, 0, 1):
            gg = g + s
            if gg < 0 or gg >= n_groups:
                continue
            local = idx_g - gg * LANE
            valid = (local >= 0) & (local < LANE)
            local_c = jnp.clip(local, 0, LANE - 1)
            op = rows[:, :, gg * LANE:(gg + 1) * LANE]
            vals = [jnp.take_along_axis(op[ch], local_c, axis=1) for ch in range(c)]
            v = jnp.stack(vals)
            acc = acc + jnp.where(valid[None], v, 0.0)
        out.append(acc)
    return jnp.concatenate(out, axis=-1)


def bilinear_backtrace_gather(window, x, yp, fx_dtype=jnp.float32):
    """Gather src at (x, yp) with bilinear weights; yp in window-local texels.

    window: (C, WIN, W) VALUE holding the haloed row window.
    x: (R, W) float column coords (already j - dt*u); clamped to [0, W-1].
    yp: (R, W) float window-local row coords; caller guarantees the backtrace
    stays inside the window (displacement bound) and that window rows are
    globally valid, so clamping to the window extent == CLAMP_TO_EDGE.

    Row alignment per integer offset ``oy`` uses a *dynamic* sublane rotate
    (tpu.DynamicRotate): rotated row i == window[(i + oy) mod WIN]. Wrapped
    rows are only ever combined with exactly-zero bilinear weights (a clamped
    integer coordinate has zero fractional part), so the wrap is harmless.
    Returns (C, R, W) float32.
    """
    c, win, w = window.shape
    r = x.shape[0]

    x0 = jnp.floor(x)
    fx = (x - x0).astype(fx_dtype)
    x0i = x0.astype(jnp.int32)
    x0c = jnp.clip(x0i, 0, w - 1)
    x1c = jnp.clip(x0i + 1, 0, w - 1)

    yp = jnp.clip(yp, 0.0, jnp.float32(win - 1))
    y0 = jnp.floor(yp)
    fy = (yp - y0).astype(jnp.float32)
    rows_local = lax.broadcasted_iota(jnp.int32, (r, w), 0)
    y0_rel = y0.astype(jnp.int32) - rows_local

    oy_min = jnp.min(y0_rel)
    oy_max = jnp.max(y0_rel)

    def body(oy, acc):
        shift = jnp.mod(win - oy, win)
        rolled = pltpu.roll(window, shift, axis=1)
        rows_op = rolled[:, :r, :]
        g0 = _gather_lanes_windowed(rows_op, x0c, w)
        g1 = _gather_lanes_windowed(rows_op, x1c, w)
        gx = g0.astype(jnp.float32) * (1.0 - fx)[None] + g1.astype(jnp.float32) * fx[None]
        # Operand row oy serves as y0 (weight 1-fy) where y0_rel == oy and as
        # y0+1 (weight fy) where y0_rel == oy - 1.
        wgt = (jnp.where(y0_rel == oy, 1.0 - fy, 0.0)
               + jnp.where(y0_rel == oy - 1, fy, 0.0))
        return acc + gx * wgt[None]

    acc = jnp.zeros((c, r, w), dtype=jnp.float32)
    return lax.fori_loop(oy_min, oy_max + 2, body, acc)


def _advect_kernel(dt_ref, vel_ref, src_ref, out_ref, *, dissipation: float,
                   rows_per_block: int, h_global: int, channels: int):
    r = rows_per_block
    w = vel_ref.shape[-1]
    i = pl.program_id(0)
    dt = dt_ref[0]
    start = window_start(i, r, HALO, h_global)
    off = (i * r - start).astype(jnp.float32)

    rows_local = lax.broadcasted_iota(jnp.int32, (r, w), 0).astype(jnp.float32)
    cols = lax.broadcasted_iota(jnp.int32, (r, w), 1).astype(jnp.float32)

    vel_u = vel_ref[0].astype(jnp.float32)
    vel_v = vel_ref[1].astype(jnp.float32)

    # Backtraced coordinate in texel units (x = u*W - 0.5 = j - dt*vel_u);
    # row coordinate mapped into window-local units (+off).
    x = cols - dt * vel_u
    yp = rows_local + off - dt * vel_v

    acc = bilinear_backtrace_gather(src_ref[:], x, yp)
    out_ref[:] = (acc / (1.0 + dissipation * dt)).astype(out_ref.dtype)


def advect_pallas(velocity: jnp.ndarray, source: jnp.ndarray, dt,
                  dissipation: float, rows_per_block: int = 0) -> jnp.ndarray:
    """Same-grid semi-Lagrangian advection. velocity (2,H,W); source (C,H,W)
    or (H,W) on the SAME grid."""
    squeeze = source.ndim == 2
    src = source[None] if squeeze else source
    c, h, w = src.shape
    if rows_per_block == 0:
        rows_per_block = _pick_block_rows(h, w, c, src.dtype.itemsize)
    if rows_per_block == 0:
        raise ValueError(f"unsupported shape {source.shape}")
    n_blocks = h // rows_per_block
    dt_arr = jnp.asarray(dt, jnp.float32).reshape(1)

    win = rows_per_block + 2 * HALO
    idx = make_window_index_map(rows_per_block, HALO, h, lead_dims=1)
    kernel = functools.partial(
        _advect_kernel, dissipation=float(dissipation),
        rows_per_block=rows_per_block, h_global=h, channels=c,
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((_Element(2, (0, 0)), _Element(rows_per_block), _Element(w)),
                         lambda i: (0, i * rows_per_block, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_Element(c, (0, 0)), _Element(win), _Element(w)),
                         idx, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c, rows_per_block, w), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, h, w), src.dtype),
        cost_estimate=pl.CostEstimate(
            flops=50 * c * h * w,
            bytes_accessed=(3 * c + 2) * h * w * src.dtype.itemsize,
            transcendentals=0,
        ),
    )(dt_arr, velocity, src)
    return out[0] if squeeze else out
