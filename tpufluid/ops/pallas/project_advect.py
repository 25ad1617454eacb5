"""Fused gradient-subtract + velocity self-advection kernel.

The reference runs these as two full-grid passes (gradientSubtractShader then
advectionShader on velocity, script.js:1268-1285). Fusing them saves a full
HBM round-trip of the velocity field: each row block

  1. computes vel' = vel - (R-L, T-B) of pressure over its whole haloed
     window (the un-halved central difference, preserving the reference's
     2x-gradient quirk — see ops/stencil.gradient_subtract);
  2. stores vel' to a VMEM scratch;
  3. backtraces from the central rows through vel' itself and gathers
     bilinearly from the scratch window (ops/pallas/advect.py machinery),
     applying the 1/(1 + dissipation*dt) decay.

Windows are IN-BOUNDS clamped (ops/pallas/common.py) — no HBM edge-pad
copies. The outermost window row on each side holds a vel' computed with a
window-clamped pressure neighbor; the backtrace (bounded by ~18 rows < HALO-1)
can never reach it, and when the window IS clipped its edge coincides with
the global boundary where the mask handling is exact.
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

from tpufluid.ops.pallas.advect import HALO, bilinear_backtrace_gather
from tpufluid.ops.pallas.common import (
    LANE, SUBLANE, make_window_index_map, window_start,
)

_VMEM_BUDGET = 10 * 1024 * 1024


def _pick_block_rows(h: int, w: int, itemsize: int) -> int:
    best = 0
    for r in range(SUBLANE, h + 1, SUBLANE):
        if h % r or r + 2 * HALO > h:
            continue
        vmem = (5 * (r + 2 * HALO) + 22 * r) * w * itemsize
        if vmem <= _VMEM_BUDGET:
            best = r
    return best


def supported(shape: Tuple[int, int], itemsize: int = 4) -> bool:
    h, w = shape
    if itemsize != 4:
        return False  # Mosaic dynamic gather/rotate support 32-bit only here
    if w % LANE or h % SUBLANE:
        return False
    return _pick_block_rows(h, w, itemsize) > 0


def _kernel(dt_ref, vel_ref, p_ref, out_ref, *, dissipation: float,
            rows_per_block: int, h_global: int, h_true: int, w_true: int):
    r = rows_per_block
    blk_h = vel_ref.shape[1]          # r + 2*HALO
    w = vel_ref.shape[2]
    i = pl.program_id(0)
    dt = dt_ref[0]
    start = window_start(i, r, HALO, h_global)

    rows_g = lax.broadcasted_iota(jnp.int32, (blk_h, w), 0) + start
    cols = lax.broadcasted_iota(jnp.int32, (blk_h, w), 1)
    first_row = rows_g == 0
    last_row = rows_g == h_true - 1
    first_col = cols == 0
    last_col = cols == w_true - 1

    # vel' = vel - un-halved grad(p) over the whole window. Row neighbors via
    # sublane roll: the outermost window rows pick up a wrapped neighbor, but
    # they are never consumed (see module docstring).
    p = p_ref[:]
    pl_ = jnp.where(first_col, p, pltpu.roll(p, 1, axis=1))
    pr = jnp.where(last_col, p, pltpu.roll(p, w - 1, axis=1))
    pb = jnp.where(first_row, p, pltpu.roll(p, 1, axis=0))
    pt = jnp.where(last_row, p, pltpu.roll(p, blk_h - 1, axis=0))

    u = vel_ref[0] - (pr - pl_)
    v = vel_ref[1] - (pt - pb)
    velp = jnp.stack([u, v])

    # Backtrace from the central rows (window offset off) through vel'.
    off = i * r - start
    rows_local = lax.broadcasted_iota(jnp.int32, (r, w), 0).astype(jnp.float32)
    colsf = lax.broadcasted_iota(jnp.int32, (r, w), 1).astype(jnp.float32)

    uu = jnp.zeros((r, w), jnp.float32)
    vv = jnp.zeros((r, w), jnp.float32)
    for k in range(0, 2 * HALO + 1, SUBLANE):
        uu = jnp.where(off == k, u[k:k + r].astype(jnp.float32), uu)
        vv = jnp.where(off == k, v[k:k + r].astype(jnp.float32), vv)

    x = colsf - dt * uu
    yp = rows_local + off.astype(jnp.float32) - dt * vv
    yp_hi = jnp.minimum(jnp.float32(blk_h - 1),
                        jnp.float32(h_true - 1) - start.astype(jnp.float32))
    acc = bilinear_backtrace_gather(velp, x, yp, w_true=w_true, yp_hi=yp_hi)
    out_ref[:] = (acc / (1.0 + dissipation * dt)).astype(out_ref.dtype)


def gradsub_advect_velocity(velocity: jnp.ndarray, pressure: jnp.ndarray, dt,
                            dissipation: float, true_shape=None) -> jnp.ndarray:
    """vel - grad(pressure), then self-advected: one fused HBM pass."""
    _, h, w = velocity.shape
    if true_shape is None:
        true_shape = (h, w)
    r = _pick_block_rows(h, w, velocity.dtype.itemsize)
    if r == 0:
        raise ValueError(f"unsupported shape {velocity.shape}")
    n_blocks = h // r
    dt_arr = jnp.asarray(dt, jnp.float32).reshape(1)

    win = r + 2 * HALO
    idx1 = make_window_index_map(r, HALO, h, lead_dims=1)
    idx0 = make_window_index_map(r, HALO, h, lead_dims=0)
    kernel = functools.partial(_kernel, dissipation=float(dissipation),
                               rows_per_block=r, h_global=h,
                               h_true=true_shape[0], w_true=true_shape[1])
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((_Element(2, (0, 0)), _Element(win), _Element(w)),
                         idx1, memory_space=pltpu.VMEM),
            pl.BlockSpec((_Element(win), _Element(w)), idx0, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, r, w), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, h, w), velocity.dtype),
        cost_estimate=pl.CostEstimate(
            flops=80 * h * w,
            bytes_accessed=9 * h * w * velocity.dtype.itemsize,
            transcendentals=0,
        ),
    )(dt_arr, velocity, pressure)
