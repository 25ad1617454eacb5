"""Halo exchange for mesh-sharded grids (runs inside shard_map).

The fluid-grid analog of ring attention's neighbor block passing (SURVEY.md
§5.7): every 5-point stencil needs one ghost row/column from each mesh
neighbor; semi-Lagrangian advection needs ``ceil(max|v| * dt)`` (bounded by
the reference's +/-1000 velocity clamp, script.js:863). Ghosts move over ICI
via ``lax.ppermute``; at the global walls the ghost is the clamped edge
row/column (CLAMP_TO_EDGE semantics of the single-device kernels).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from tpufluid.parallel.mesh import COL_AXIS, ROW_AXIS


def ghost_strips(block: jnp.ndarray, width: int, axis_name: str,
                 axis: int = -2):
    """The two ghost strips of a halo exchange along ``axis`` (-2 rows or
    -1 columns, both sliced natively — no transposes), WITHOUT
    concatenating them onto the block: ``(ghost_below, ghost_above)``,
    each ``width`` slices.

    ``ghost_below`` holds the rows just ABOVE the block in global order
    (from device idx-1; the global top edge replicates the block's first
    row) and ``ghost_above`` the rows just below (from idx+1; bottom edge
    replicates the last row). Exposed separately so the split-phase
    (interior/boundary overlap) step can compute interior tiles with no
    data dependency on the ppermutes and so callers can assemble thin
    boundary strips instead of materializing a full padded copy of the
    field. ``exchange_halo`` is ``concat([below, block, above])`` of these.

    ``width`` may exceed the local block extent (e.g. the flagship config's
    dye advection needs a 136-row halo over 128-row shards): the exchange
    then runs ceil(width / extent) neighbor hops, chaining full blocks so
    device k sees devices k±1..k±hops. Once a chain crosses the global
    boundary it carries the edge-replicated block, which is exactly
    CLAMP_TO_EDGE semantics.
    """
    assert axis in (-1, -2)

    def first(x, k):
        return x[..., :k, :] if axis == -2 else x[..., :k]

    def last(x, k):
        return x[..., -k:, :] if axis == -2 else x[..., -k:]

    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    h_loc = block.shape[axis]
    hops = -(-width // h_loc)

    up_perm = [(i, i + 1) for i in range(n - 1)]   # block flows to higher idx
    dn_perm = [(i + 1, i) for i in range(n - 1)]   # block flows to lower idx

    if hops == 1:
        top_rows = last(block, width)     # -> neighbor above's lower ghost
        bottom_rows = first(block, width)  # -> neighbor below's upper ghost
        if n > 1:
            ghost_above = lax.ppermute(bottom_rows, axis_name, dn_perm)
            ghost_below = lax.ppermute(top_rows, axis_name, up_perm)
        else:
            ghost_above = jnp.zeros_like(bottom_rows)
            ghost_below = jnp.zeros_like(top_rows)
        edge_top = jnp.broadcast_to(last(block, 1), top_rows.shape)
        edge_bottom = jnp.broadcast_to(first(block, 1), bottom_rows.shape)
        ghost_above = jnp.where(idx == n - 1, edge_top, ghost_above)
        ghost_below = jnp.where(idx == 0, edge_bottom, ghost_below)
        return ghost_below, ghost_above

    # Multi-hop: pass whole blocks along the ring. After hop j, `below` holds
    # device idx-1-j's block and `above` device idx+1+j's. The global-edge
    # devices substitute their edge-replicated block every hop, so chains that
    # run off the grid keep carrying the clamped edge row.
    edge_lo = jnp.broadcast_to(first(block, 1), block.shape)
    edge_hi = jnp.broadcast_to(last(block, 1), block.shape)
    below_blocks = []
    above_blocks = []
    below = block
    above = block
    for _ in range(hops):
        if n > 1:
            below = lax.ppermute(below, axis_name, up_perm)
            above = lax.ppermute(above, axis_name, dn_perm)
        below = jnp.where(idx == 0, edge_lo, below)
        above = jnp.where(idx == n - 1, edge_hi, above)
        below_blocks.append(below)
        above_blocks.append(above)

    ghost_below = last(jnp.concatenate(below_blocks[::-1], axis=axis), width)
    ghost_above = first(jnp.concatenate(above_blocks, axis=axis), width)
    return ghost_below, ghost_above


def exchange_halo(block: jnp.ndarray, width: int, axis_name: str,
                  axis: int) -> jnp.ndarray:
    """Pad a local block with ``width`` ghost slices per side along ``axis``
    (a positional array axis), exchanged over mesh axis ``axis_name``.

    Device k receives its upper ghost (slices just above its block) from
    device k+1's first slices and its lower ghost from device k-1's last
    slices. The first/last devices replicate their own edge slice (global
    clamp-to-edge). See ghost_strips for the multi-hop chaining semantics.
    """
    if axis not in (-1, -2):
        moved = jnp.moveaxis(block, axis, -2)
        out = exchange_halo(moved, width, axis_name, -2)
        return jnp.moveaxis(out, -2, axis)
    ghost_below, ghost_above = ghost_strips(block, width, axis_name, axis)
    return jnp.concatenate([ghost_below, block, ghost_above], axis=axis)


def exchange_halo_rows(block: jnp.ndarray, width: int,
                       axis_name: str = ROW_AXIS) -> jnp.ndarray:
    """Row (sublane-axis) halo exchange: (..., h, W) -> (..., h+2w, W)."""
    return exchange_halo(block, width, axis_name, -2)


def exchange_halo_cols(block: jnp.ndarray, width: int,
                       axis_name: str = COL_AXIS) -> jnp.ndarray:
    """Column (lane-axis) halo exchange: (..., H, w) -> (..., H, w+2w)."""
    return exchange_halo(block, width, axis_name, -1)


def is_first_row_device(axis_name: str = ROW_AXIS) -> jnp.ndarray:
    return lax.axis_index(axis_name) == 0


def is_last_row_device(axis_name: str = ROW_AXIS) -> jnp.ndarray:
    return lax.axis_index(axis_name) == lax.axis_size(axis_name) - 1
