"""Shared window machinery for the stencil/advection kernels.

Instead of edge-padding arrays in HBM (a full extra copy per field per pass),
every kernel reads an IN-BOUNDS haloed window: block i wants rows
[i*R - halo, i*R + R + halo), which is clamped to [start, start + R + 2*halo)
with start = clamp(i*R - halo, 0, H - R - 2*halo). The kernel recomputes
``start`` from its program id, so the target rows sit at dynamic (but
8-aligned) offset ``i*R - start`` inside the window, and global boundary
semantics (CLAMP_TO_EDGE / -C reflection) are realized with masks on global
row ids — never with padded data.

All row quantities (R, halo) are multiples of the sublane count so dynamic
window starts and offsets stay provably tile-aligned.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.experimental import pallas as pl

# Compatibility shims (single place to update on a JAX upgrade): Element
# block-dim indexing and the any-memory-space marker moved into the public
# pallas namespace in recent JAX; fall back to the private path on older ones.
try:
    Element = pl.Element
except AttributeError:  # pragma: no cover
    from jax._src.pallas.core import Element  # type: ignore

try:
    ANY_SPACE = pl.ANY
except AttributeError:  # pragma: no cover
    from jax.experimental.pallas import tpu as _pltpu

    ANY_SPACE = _pltpu.ANY

SUBLANE = 8
LANE = 128


def row_align(itemsize: int) -> int:
    """Alignment for dynamic row offsets: the dtype's sublane tiling —
    (8, 128) for 4-byte, (16, 128) for 2-byte (bfloat16) arrays."""
    return 2 * SUBLANE if itemsize == 2 else SUBLANE


def window_start(i, rows_per_block: int, halo: int, h: int,
                 align: int = SUBLANE):
    """Clamped window start row for block i (traced or static).

    Every branch of the clip is a multiple of ``align`` (R, halo and h are),
    and pl.multiple_of tells Mosaic so.
    """
    lo = i * rows_per_block - halo
    return pl.multiple_of(jnp.clip(lo, 0, h - rows_per_block - 2 * halo), align)


def make_window_index_map(rows_per_block: int, halo: int, h: int,
                          lead_dims: int = 0, align: int = SUBLANE):
    """BlockSpec index_map returning the clamped start (Element indexing)."""

    def index_map(i):
        start = window_start(i, rows_per_block, halo, h, align)
        return (0,) * lead_dims + (start, 0)

    return index_map


def local_offset(i, rows_per_block: int, halo: int, h: int,
                 align: int = SUBLANE):
    """Row offset of block i's target rows inside its clamped window."""
    start = window_start(i, rows_per_block, halo, h, align)
    return pl.multiple_of(i * rows_per_block - start, align)


def round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def edge_shift(p: jnp.ndarray, shift: int, axis: int) -> jnp.ndarray:
    """Neighbor values via an edge-clamped static shift: out[i] = p[i-shift]
    with the vacated edge row/col holding the edge value (= self).

    On UNPADDED grids this is the whole wall condition: clamped window starts
    mean a true wall only ever sits at a window edge, so the per-cell
    iota/compare/select boundary masks specialize away entirely (no Mosaic
    select per sweep, no runtime cond — see ops/pallas/jacobi.py).

    Implemented as a static concatenate of the edge slice with the shifted
    body (Mosaic rejects both scatter and value-level dynamic_update_slice,
    so a narrow edge overwrite is not expressible). Callers must ACCUMULATE
    neighbor sums sequentially rather than holding all four shift results
    live: four window-sized concat temps at once blew the 16M scoped-VMEM
    ceiling at the bf16 headline Jacobi tile (out/jobs/b48)."""
    sl = [slice(None)] * p.ndim
    ed = [slice(None)] * p.ndim
    if shift == 1:
        sl[axis] = slice(None, -1)
        ed[axis] = slice(None, 1)
        return jnp.concatenate([p[tuple(ed)], p[tuple(sl)]], axis=axis)
    sl[axis] = slice(1, None)
    ed[axis] = slice(-1, None)
    return jnp.concatenate([p[tuple(sl)], p[tuple(ed)]], axis=axis)


def dot_f32_3x(a: jnp.ndarray, b: jnp.ndarray, dims) -> jnp.ndarray:
    """f32 matmul at bf16x3 accuracy (~5e-7 relative) from three
    DEFAULT-precision MXU passes.

    Mosaic's default f32 dot is single-pass bf16 (~3e-3 relative — enough to
    make fused splat bumps diverge from the XLA oracle), it rejects
    lax.Precision.HIGH, and HIGHEST (6 passes) measured 4-5% slower on the
    headline/demo configs even with segment-level staging. The classic hi/lo
    split recovers HIGH's accuracy at half HIGHEST's cost: a = hi(a) + lo(a)
    with hi = round-to-bf16, so a@b ~ hi@hi + hi@lo + lo@hi (the dropped
    lo@lo term is O(2^-16) of either factor). The resulting contract,
    asserted by the config-fuzz evidence jobs: fused-splat bumps are exact
    to ~1e-6 of the bump magnitude — far inside the reference's own
    half-float splat-texture rounding — and kernel-vs-oracle step
    deviations stay <= ~2e-4 relative per step."""
    import jax

    a_hi = a.astype(jnp.bfloat16).astype(jnp.float32)
    a_lo = a - a_hi
    b_hi = b.astype(jnp.bfloat16).astype(jnp.float32)
    b_lo = b - b_hi
    dot = lambda x, y: jax.lax.dot_general(
        x, y, dims, preferred_element_type=jnp.float32)
    return dot(a_hi, b_hi) + dot(a_hi, b_lo) + dot(a_lo, b_hi)


def pad_to(x: jnp.ndarray, h_pad: int, w_pad: int) -> jnp.ndarray:
    """Edge-pad the trailing (H, W) dims up to (h_pad, w_pad).

    Edge mode means a clamped read into the pad region returns the same value
    as a CLAMP_TO_EDGE read of the true array — but kernels must still mask
    multi-stage/iterated neighbor reads at the TRUE extents (pad cells evolve
    as garbage)."""
    h, w = x.shape[-2], x.shape[-1]
    if h == h_pad and w == w_pad:
        return x
    pad = [(0, 0)] * (x.ndim - 2) + [(0, h_pad - h), (0, w_pad - w)]
    return jnp.pad(x, pad, mode="edge")
