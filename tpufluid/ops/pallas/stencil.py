"""Fused pre-pressure stencil kernel: curl -> vorticity confinement -> divergence.

The reference runs these as three full-grid GL passes (script.js:1234-1251);
XLA also leaves them as 3+ HBM round-trips (measured ~4 ms total at 1024^2 on
v5e). This kernel computes all three in ONE pass over the velocity field:
row blocks with a 3-row halo (one stencil layer per stage), neighbors via
pltpu.roll + global-boundary masking (same scheme as the Jacobi kernel).

Outputs the post-confinement velocity (clamped to +/-1000, script.js:863) and
its divergence (with the -C no-slip wall reflection, script.js:804-807).
Semantics identical to the jnp oracle chain in tpufluid.ops.stencil.
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

_HALO = 4  # curl(1) + vorticity(1) + divergence(1) + 1 for 8-row alignment
_VMEM_BUDGET = 10 * 1024 * 1024
_LANE = 128
_SUBLANE = 8


def _pick_block_rows(h: int, w: int, itemsize: int) -> int:
    best = 0
    for r in range(_SUBLANE, h + 1, _SUBLANE):
        if h % r:
            continue
        # ~6 live (R+6, w) planes (u, v, curl, temps) + outputs
        if 8 * (r + 2 * _HALO) * w * itemsize <= _VMEM_BUDGET:
            best = r
    return best


def supported(shape: Tuple[int, int], itemsize: int = 4) -> bool:
    h, w = shape
    if w % _LANE or h % _SUBLANE:
        return False
    return _pick_block_rows(h, w, itemsize) > 0


def _kernel(dt_ref, vel_ref, out_vel_ref, out_div_ref, *, curl_strength: float,
            rows_per_block: int, h_global: int):
    i = pl.program_id(0)
    blk_h = vel_ref.shape[1]
    w = vel_ref.shape[2]
    dt = dt_ref[0]

    row0 = i * rows_per_block - _HALO
    rows = lax.broadcasted_iota(jnp.int32, (blk_h, w), 0) + row0
    cols = lax.broadcasted_iota(jnp.int32, (blk_h, w), 1)
    first_row = rows == 0
    last_row = rows == h_global - 1
    first_col = cols == 0
    last_col = cols == w - 1

    def shift_l(x):  # value of the left neighbor (clamped)
        return jnp.where(first_col, x, pltpu.roll(x, 1, axis=1))

    def shift_r(x):
        return jnp.where(last_col, x, pltpu.roll(x, w - 1, axis=1))

    def shift_b(x):  # below = row - 1
        return jnp.where(first_row, x, pltpu.roll(x, 1, axis=0))

    def shift_t(x):  # above = row + 1
        return jnp.where(last_row, x, pltpu.roll(x, blk_h - 1, axis=0))

    u = vel_ref[0]
    v = vel_ref[1]

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

    sl = slice(_HALO, _HALO + rows_per_block)
    out_vel_ref[0] = u[sl]
    out_vel_ref[1] = v[sl]
    out_div_ref[:] = div[sl]


def curl_vorticity_divergence(velocity: jnp.ndarray, curl_strength: float, dt):
    """(vel', div) — fused curl+confinement+divergence over (2, H, W) velocity."""
    _, h, w = velocity.shape
    rows_per_block = _pick_block_rows(h, w, velocity.dtype.itemsize)
    if rows_per_block == 0:
        raise ValueError(f"unsupported shape {velocity.shape}")
    n_blocks = h // rows_per_block
    vel_pad = jnp.pad(velocity, ((0, 0), (_HALO, _HALO), (0, 0)), mode="edge")
    dt_arr = jnp.asarray(dt, jnp.float32).reshape(1)

    kernel = functools.partial(_kernel, curl_strength=float(curl_strength),
                               rows_per_block=rows_per_block, h_global=h)
    out_vel, out_div = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((_Element(2, (0, 0)), _Element(rows_per_block + 2 * _HALO),
                          _Element(w)),
                         lambda i: (0, i * rows_per_block, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((2, rows_per_block, w), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_per_block, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
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
    )(dt_arr, vel_pad)
    return out_vel, out_div
