"""Fused Pallas Jacobi pressure solve.

The reference pays one GL draw call per sweep (script.js:1259-1266: 20 draws
through texture memory per frame). Here K sweeps run per HBM pass entirely in
VMEM: the grid tiles the row axis and each program loads an overlapping
(R + 2K', W) window of pressure and divergence, runs K unrolled sweeps
p' = (L + R + T + B - div) * 0.25 on the VPU (neighbors via pltpu.roll +
global-boundary masking), and writes back the central R rows, which are exact
because staleness moves inward one row per sweep.

Windows are IN-BOUNDS (clamped starts, ops/pallas/common.py) — no edge-pad
copies of the fields are ever materialized in HBM.

Semantics identical to tpufluid.ops.stencil.jacobi_pressure (the oracle);
verified by tests/test_pallas.py in interpret mode and on-device by bench.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Element-indexed block dims allow overlapping (haloed) input windows.
from tpufluid.ops.pallas.common import Element as _Element

from tpufluid.ops.pallas.common import (
    LANE, SUBLANE, make_window_index_map, window_start,
)

_VMEM_BUDGET = 10 * 1024 * 1024
_HALO = 24  # >= sweeps per chunk (20), multiple of the sublane count


def _pick_block_rows(h: int, w: int, halo: int, itemsize: int) -> int:
    best = 0
    for r in range(SUBLANE, h + 1, SUBLANE):
        if h % r or r + 2 * halo > h:
            continue
        vmem = 4 * (r + 2 * halo) * w * itemsize
        if vmem <= _VMEM_BUDGET:
            best = r
    return best


def supported(shape: Tuple[int, int], itemsize: int = 4, halo: int = _HALO) -> bool:
    h, w = shape
    if itemsize != 4:
        return False  # Mosaic dynamic gather/rotate support 32-bit only here
    if w % LANE or h % SUBLANE:
        return False
    return _pick_block_rows(h, w, halo, itemsize) > 0


def _jacobi_chunk_kernel(p_ref, d_ref, out_ref, *, sweeps: int, halo: int,
                         rows_per_block: int, h_global: int, h_true: int,
                         w_true: int):
    i = pl.program_id(0)
    blk_h = p_ref.shape[0]
    w = p_ref.shape[1]
    start = window_start(i, rows_per_block, halo, h_global)

    rows = lax.broadcasted_iota(jnp.int32, (blk_h, w), 0) + start
    cols = lax.broadcasted_iota(jnp.int32, (blk_h, w), 1)
    first_row = rows == 0
    last_row = rows == h_true - 1
    first_col = cols == 0
    last_col = cols == w_true - 1

    div = d_ref[:]
    p = p_ref[:]
    for _ in range(sweeps):
        # pltpu.roll needs non-negative shift: roll by N-1 == shift -1.
        left = jnp.where(first_col, p, pltpu.roll(p, 1, axis=1))
        right = jnp.where(last_col, p, pltpu.roll(p, w - 1, axis=1))
        below = jnp.where(first_row, p, pltpu.roll(p, 1, axis=0))
        above = jnp.where(last_row, p, pltpu.roll(p, blk_h - 1, axis=0))
        p = (left + right + below + above - div) * 0.25

    # Central rows sit at dynamic (8-aligned) offset i*R - start.
    off = i * rows_per_block - start
    out = jnp.zeros((rows_per_block, w), dtype=p.dtype)
    for k in range(0, 2 * halo + 1, SUBLANE):
        out = jnp.where(off == k, p[k:k + rows_per_block], out)
    out_ref[:] = out


def _jacobi_chunk(p: jnp.ndarray, div: jnp.ndarray, sweeps: int, halo: int,
                  rows_per_block: int, true_shape) -> jnp.ndarray:
    h, w = p.shape
    n_blocks = h // rows_per_block
    kernel = functools.partial(
        _jacobi_chunk_kernel, sweeps=sweeps, halo=halo,
        rows_per_block=rows_per_block, h_global=h,
        h_true=true_shape[0], w_true=true_shape[1],
    )
    win = rows_per_block + 2 * halo
    idx = make_window_index_map(rows_per_block, halo, h)
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((_Element(win), _Element(w)), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((_Element(win), _Element(w)), idx, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows_per_block, w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w), p.dtype),
        cost_estimate=pl.CostEstimate(
            flops=6 * sweeps * h * w,
            bytes_accessed=(3 * win + rows_per_block) * n_blocks * w * p.dtype.itemsize,
            transcendentals=0,
        ),
    )(p, div)


def jacobi_pressure(pressure: jnp.ndarray, div: jnp.ndarray, iterations: int,
                    chunk: int = 20, true_shape=None) -> jnp.ndarray:
    """``iterations`` Jacobi sweeps, K=chunk sweeps per HBM pass.

    true_shape: (h_true, w_true) when the arrays are edge-padded to tile
    alignment; boundary masks act at the true extents."""
    if iterations == 0:
        return pressure
    h, w = pressure.shape
    if true_shape is None:
        true_shape = (h, w)
    chunk = min(chunk, iterations)
    rows_per_block = _pick_block_rows(h, w, _HALO, pressure.dtype.itemsize)
    if rows_per_block == 0:
        raise ValueError(f"unsupported shape {pressure.shape}")

    p = pressure
    done = 0
    while done < iterations:
        k = min(chunk, iterations - done)
        p = _jacobi_chunk(p, div, k, _HALO, rows_per_block, true_shape)
        done += k
    return p
