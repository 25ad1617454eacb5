"""Halo exchange for row-sharded grids (runs inside shard_map).

The fluid-grid analog of ring attention's neighbor block passing (SURVEY.md
§5.7): every 5-point stencil needs one ghost row from each mesh neighbor;
semi-Lagrangian advection needs ``ceil(max|v| * dt)`` rows (bounded by the
reference's +/-1000 velocity clamp, script.js:863). Ghosts move over ICI via
``lax.ppermute``; at the global top/bottom the ghost is the clamped edge row
(CLAMP_TO_EDGE semantics of the single-device kernels).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from tpufluid.parallel.mesh import ROW_AXIS


def exchange_halo_rows(block: jnp.ndarray, width: int, axis_name: str = ROW_AXIS) -> jnp.ndarray:
    """Pad a local (..., h, W) row-block with ``width`` ghost rows per side.

    Device k receives its upper ghost (rows just above its block) from device
    k+1's bottom rows and its lower ghost from device k-1's top rows. The
    first/last devices replicate their own edge row (global clamp-to-edge).
    Returns (..., h + 2*width, W).
    """
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)

    top_rows = block[..., -width:, :]     # my top rows -> neighbor above's lower ghost
    bottom_rows = block[..., :width, :]   # my bottom rows -> neighbor below's upper ghost

    if n > 1:
        # ghost_above[k] = bottom rows of k+1
        ghost_above = lax.ppermute(bottom_rows, axis_name,
                                   [(i + 1, i) for i in range(n - 1)])
        # ghost_below[k] = top rows of k-1
        ghost_below = lax.ppermute(top_rows, axis_name,
                                   [(i, i + 1) for i in range(n - 1)])
    else:
        ghost_above = jnp.zeros_like(bottom_rows)
        ghost_below = jnp.zeros_like(top_rows)

    # Global boundaries: replicate the local edge row (CLAMP_TO_EDGE).
    edge_top = jnp.broadcast_to(block[..., -1:, :], top_rows.shape)
    edge_bottom = jnp.broadcast_to(block[..., :1, :], bottom_rows.shape)
    ghost_above = jnp.where(idx == n - 1, edge_top, ghost_above)
    ghost_below = jnp.where(idx == 0, edge_bottom, ghost_below)

    return jnp.concatenate([ghost_below, block, ghost_above], axis=-2)


def is_first_row_device(axis_name: str = ROW_AXIS) -> jnp.ndarray:
    return lax.axis_index(axis_name) == 0


def is_last_row_device(axis_name: str = ROW_AXIS) -> jnp.ndarray:
    return lax.axis_index(axis_name) == lax.axis_size(axis_name) - 1
