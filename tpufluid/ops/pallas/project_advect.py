"""Fused gradient-subtract + velocity self-advection kernel.

The reference runs these as two full-grid passes (gradientSubtractShader then
advectionShader on velocity, script.js:1268-1285). Fusing them saves a full
HBM round-trip of the velocity field: each row block

  1. computes vel' = vel - (R-L, T-B) of pressure over its whole haloed
     window (the un-halved central difference, preserving the reference's
     2x-gradient quirk — see ops/stencil.gradient_subtract);
  2. stores vel' to a VMEM scratch;
  3. backtraces from the central rows through vel' itself and gathers
     bilinearly from the scratch window (same bounded-displacement scheme as
     ops/pallas/advect.py), applying the 1/(1 + dissipation*dt) decay.

Window halo = advect HALO + 1 stencil row for the pressure gradient.
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
from tpufluid.ops.pallas.advect import HALO, _gather_lanes_windowed

_WHALO = HALO + 4  # advect halo + pressure stencil row, rounded to sublanes
_LANE = 128
_SUBLANE = 8
_VMEM_BUDGET = 10 * 1024 * 1024


def _pick_block_rows(h: int, w: int, itemsize: int) -> int:
    best = 0
    for r in range(_SUBLANE, h + 1, _SUBLANE):
        if h % r:
            continue
        # vel window 2(R+2Wh), p window (R+2Wh+8), scratch 2(R+2Wh),
        # gather temps ~12R, coords ~8R
        vmem = (5 * (r + 2 * _WHALO) + 22 * r) * w * itemsize
        if vmem <= _VMEM_BUDGET:
            best = r
    return best


def supported(shape: Tuple[int, int], itemsize: int = 4) -> bool:
    h, w = shape
    if w % _LANE or h % _SUBLANE:
        return False
    return _pick_block_rows(h, w, itemsize) > 0


def _kernel(dt_ref, vel_ref, p_ref, out_ref, scratch, *, dissipation: float,
            rows_per_block: int, h_global: int):
    r = rows_per_block
    blk_h = vel_ref.shape[1]          # r + 2*_WHALO
    w = vel_ref.shape[2]
    i = pl.program_id(0)
    dt = dt_ref[0]

    # Global ids over the window (window starts at global row i*r - _WHALO).
    row0 = i * r - _WHALO
    rows_g = lax.broadcasted_iota(jnp.int32, (blk_h, w), 0) + row0
    cols = lax.broadcasted_iota(jnp.int32, (blk_h, w), 1)
    first_row = rows_g == 0
    last_row = rows_g == h_global - 1
    first_col = cols == 0
    last_col = cols == w - 1

    # Pressure neighbors (p window has 4 extra rows each side for sublane
    # alignment; only +/-1 is used).
    p = p_ref[:]
    pc = p[4:-4]
    pl_ = jnp.where(first_col, pc, pltpu.roll(pc, 1, axis=1))
    pr = jnp.where(last_col, pc, pltpu.roll(pc, w - 1, axis=1))
    pb = jnp.where(first_row, pc, p[3:-5])
    pt = jnp.where(last_row, pc, p[5:-3])

    u = vel_ref[0] - (pr - pl_)
    v = vel_ref[1] - (pt - pb)
    scratch[0] = u
    scratch[1] = v

    # Backtrace from the central rows through vel'.
    rows_local = lax.broadcasted_iota(jnp.int32, (r, w), 0).astype(jnp.float32)
    colsf = lax.broadcasted_iota(jnp.int32, (r, w), 1).astype(jnp.float32)
    tc = slice(_WHALO, _WHALO + r)
    uu = u[tc].astype(jnp.float32)
    vv = v[tc].astype(jnp.float32)

    x = colsf - dt * uu
    yp = rows_local + _WHALO - dt * vv
    x0 = jnp.floor(x)
    fx = (x - x0).astype(jnp.float32)
    x0i = x0.astype(jnp.int32)
    x0c = jnp.clip(x0i, 0, w - 1)
    x1c = jnp.clip(x0i + 1, 0, w - 1)
    # Global CLAMP_TO_EDGE on rows: window rows outside [0, h_global) hold
    # vel' recomputed from padded inputs (NOT the true edge row), so clamp
    # the backtrace into the globally-valid part of the window.
    lo = jnp.float32(0) - row0.astype(jnp.float32)            # window row of global 0
    hi = jnp.float32(h_global - 1) - row0.astype(jnp.float32)  # window row of global H-1
    yp = jnp.clip(yp, jnp.maximum(lo, 0.0), jnp.minimum(hi, jnp.float32(blk_h - 1)))
    y0 = jnp.floor(yp)
    fy = (yp - y0).astype(jnp.float32)
    y0_rel = y0.astype(jnp.int32) - rows_local.astype(jnp.int32)

    oy_min = jnp.min(y0_rel)
    oy_max = jnp.max(y0_rel)

    def body(oy, acc):
        base = pl.multiple_of((oy // _SUBLANE) * _SUBLANE, _SUBLANE)
        sub = oy - base
        b = scratch[:, pl.ds(base, r + _SUBLANE), :]
        rows_op = jnp.zeros((2, r, w), dtype=b.dtype)
        for s_static in range(_SUBLANE):
            rows_op = jnp.where(sub == s_static, b[:, s_static:s_static + r, :], rows_op)
        g0 = _gather_lanes_windowed(rows_op, x0c, w)
        g1 = _gather_lanes_windowed(rows_op, x1c, w)
        gx = g0.astype(jnp.float32) * (1.0 - fx)[None] + g1.astype(jnp.float32) * fx[None]
        wgt = (jnp.where(y0_rel == oy, 1.0 - fy, 0.0)
               + jnp.where(y0_rel == oy - 1, fy, 0.0))
        return acc + gx * wgt[None]

    acc = jnp.zeros((2, r, w), dtype=jnp.float32)
    acc = lax.fori_loop(oy_min, oy_max + 2, body, acc)
    out_ref[:] = (acc / (1.0 + dissipation * dt)).astype(out_ref.dtype)


def gradsub_advect_velocity(velocity: jnp.ndarray, pressure: jnp.ndarray, dt,
                            dissipation: float) -> jnp.ndarray:
    """vel - grad(pressure), then self-advected: one fused pass."""
    _, h, w = velocity.shape
    r = _pick_block_rows(h, w, velocity.dtype.itemsize)
    if r == 0:
        raise ValueError(f"unsupported shape {velocity.shape}")
    n_blocks = h // r

    vel_pad = jnp.pad(velocity, ((0, 0), (_WHALO, _WHALO), (0, 0)), mode="edge")
    p_pad = jnp.pad(pressure, ((_WHALO + 4, _WHALO + 4), (0, 0)), mode="edge")
    dt_arr = jnp.asarray(dt, jnp.float32).reshape(1)

    kernel = functools.partial(_kernel, dissipation=float(dissipation),
                               rows_per_block=r, h_global=h)
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((_Element(2, (0, 0)), _Element(r + 2 * _WHALO), _Element(w)),
                         lambda i: (0, i * r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_Element(r + 2 * _WHALO + 8), _Element(w)),
                         lambda i: (i * r, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, r, w), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, h, w), velocity.dtype),
        scratch_shapes=[pltpu.VMEM((2, r + 2 * _WHALO, w), velocity.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=80 * h * w,
            bytes_accessed=9 * h * w * velocity.dtype.itemsize,
            transcendentals=0,
        ),
    )(dt_arr, vel_pad, p_pad)
