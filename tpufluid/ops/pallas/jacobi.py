"""Fused Pallas Jacobi pressure solve.

The reference pays one GL draw call per sweep (script.js:1259-1266: 20 draws
through HBM-equivalent texture memory per frame). The XLA fori_loop version
already fuses each sweep, but still round-trips pressure through HBM every
iteration (~12 MB traffic x iterations at 1024^2). This kernel blocks rows
and runs K sweeps per HBM pass entirely in VMEM with an overlapping K-row
halo, cutting HBM traffic by ~K.

Scheme (per chunk of K sweeps):
  * rows are padded by K (edge clamp) outside the kernel;
  * the grid tiles the row axis; each program loads its (R + 2K, W) pressure
    and divergence blocks into VMEM;
  * K unrolled sweeps p' = (L + R + T + B - div) * 0.25 run on the VPU, with
    CLAMP_TO_EDGE neighbors realized as pltpu.roll + boundary masking on
    *global* row/col ids (so halo garbage never contaminates the interior);
  * after K sweeps the central R rows are exact and are written out.

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
from jax._src.pallas.core import Element as _Element

# VMEM budget for the three resident blocks (2x pressure + divergence + out).
_VMEM_BUDGET = 10 * 1024 * 1024
_LANE = 128
_SUBLANE = 8


def _pick_block_rows(h: int, w: int, halo: int, itemsize: int) -> int:
    """Largest divisor R of h (multiple of 8) with ~4 blocks of (R+2K, w) in budget."""
    best = 0
    for r in range(_SUBLANE, h + 1, _SUBLANE):
        if h % r:
            continue
        vmem = 4 * (r + 2 * halo) * w * itemsize
        if vmem <= _VMEM_BUDGET:
            best = r
    return best


def supported(shape: Tuple[int, int], itemsize: int = 4, halo: int = 20) -> bool:
    h, w = shape
    if w % _LANE or h % _SUBLANE:
        return False
    return _pick_block_rows(h, w, halo, itemsize) > 0


def _jacobi_chunk_kernel(p_ref, d_ref, out_ref, *, sweeps: int, halo: int,
                         rows_per_block: int, h_global: int):
    i = pl.program_id(0)
    blk_h = p_ref.shape[0]
    w = p_ref.shape[1]
    # Global row id of each local row: block i covers padded rows
    # [i*R, i*R + R + 2K) == global rows [i*R - K, ...).
    row0 = i * rows_per_block - halo
    rows = lax.broadcasted_iota(jnp.int32, (blk_h, w), 0) + row0
    cols = lax.broadcasted_iota(jnp.int32, (blk_h, w), 1)
    first_row = rows == 0
    last_row = rows == h_global - 1
    first_col = cols == 0
    last_col = cols == w - 1

    div = d_ref[:]
    p = p_ref[:]
    for _ in range(sweeps):
        # pltpu.roll requires non-negative shift: roll by N-1 == shift -1.
        left = jnp.where(first_col, p, pltpu.roll(p, 1, axis=1))
        right = jnp.where(last_col, p, pltpu.roll(p, w - 1, axis=1))
        below = jnp.where(first_row, p, pltpu.roll(p, 1, axis=0))
        above = jnp.where(last_row, p, pltpu.roll(p, blk_h - 1, axis=0))
        p = (left + right + below + above - div) * 0.25
    out_ref[:] = p[halo:halo + rows_per_block]


def _jacobi_chunk(p: jnp.ndarray, div_pad: jnp.ndarray, sweeps: int, halo: int,
                  rows_per_block: int) -> jnp.ndarray:
    h, w = p.shape
    p_pad = jnp.pad(p, ((halo, halo), (0, 0)), mode="edge")
    n_blocks = h // rows_per_block
    kernel = functools.partial(
        _jacobi_chunk_kernel, sweeps=sweeps, halo=halo,
        rows_per_block=rows_per_block, h_global=h,
    )
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((_Element(rows_per_block + 2 * halo), _Element(w)),
                         lambda i: (i * rows_per_block, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_Element(rows_per_block + 2 * halo), _Element(w)),
                         lambda i: (i * rows_per_block, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows_per_block, w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w), p.dtype),
        cost_estimate=pl.CostEstimate(
            flops=6 * sweeps * h * w,
            bytes_accessed=(3 * (rows_per_block + 2 * halo) + rows_per_block)
            * n_blocks * w * p.dtype.itemsize,
            transcendentals=0,
        ),
    )(p_pad, div_pad)


def jacobi_pressure(pressure: jnp.ndarray, div: jnp.ndarray, iterations: int,
                    chunk: int = 20) -> jnp.ndarray:
    """`iterations` Jacobi sweeps, K=chunk sweeps per HBM pass."""
    if iterations == 0:
        return pressure
    h, w = pressure.shape
    chunk = min(chunk, iterations)
    rows_per_block = _pick_block_rows(h, w, chunk, pressure.dtype.itemsize)
    if rows_per_block == 0:
        raise ValueError(f"unsupported shape {pressure.shape}")
    # Divergence halo is static across sweeps: pad once.
    div_pad = jnp.pad(div, ((chunk, chunk), (0, 0)), mode="edge")

    p = pressure
    done = 0
    while done < iterations:
        k = min(chunk, iterations - done)
        p = _jacobi_chunk(p, div_pad, k, chunk, rows_per_block)
        done += k
    return p
