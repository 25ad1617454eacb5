"""Semi-Lagrangian advection with DATA-BOUNDED row windows (HBM-resident source).

The windowed-BlockSpec kernel (ops/pallas/advect.py) sizes its row halo for
the WORST-CASE displacement bound; at the demo's 8x dye/sim resolution ratio
that is a 136-row halo, so overlapping tile windows read ~18x the output
bytes. This kernel keeps the source in HBM and, per tile, DMAs only the row
segments its backtrace ACTUALLY reaches (bounds computed from the velocity
in-register; a dynamic segment loop still covers the worst case exactly):

  traffic ~ (actual_span + rows) / rows x output   (typically ~2x, not 18x).

Each needed source row belongs to exactly one segment (ownership by
floor((row - base0) / seg)), so contributions are added exactly once across
the segment loop. Column windows stay worst-case (bounded by span*128 lanes
and far cheaper). The gather core (dynamic sublane rotate + windowed lane
take_along_axis) matches ops/pallas/advect.py; semantics match the jnp
oracle (tests/test_pallas.py in interpret mode).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpufluid.ops.pallas.advect import _clamped_start
from tpufluid.ops.pallas.common import Element as _Element, ANY_SPACE
from tpufluid.ops.pallas.common import LANE, SUBLANE, row_align

_VMEM_BUDGET = 12 * 1024 * 1024
_PREF_ROWS = 16
_PREF_COLS = 256
_EXTRA = 32  # window slack rows beyond the tile (multiple of 8)


def _pick_tile(h: int, w: int, channels: int, itemsize: int,
               span: int) -> Tuple[int, int]:
    align = row_align(itemsize)
    rows = 0
    for r in range(align, h + 1, align):
        if h % r == 0 and r + _EXTRA <= h:
            rows = r
            if r >= _PREF_ROWS:
                break
    if rows == 0:
        return (0, 0)
    cols = 0
    for cb in range(LANE, w + 1, LANE):
        if w % cb == 0 and cb + 2 * span * LANE <= w:
            cols = cb
            if cb >= _PREF_COLS:
                break
    if cols == 0:
        cols = w
    cbw = cols + (2 * span * LANE if cols != w else 0)
    win2 = rows + _EXTRA
    vmem = (channels * (2 * win2 + 8 * rows) + 10 * rows) * cbw * itemsize
    if vmem > _VMEM_BUDGET:
        return (0, 0)
    return rows, cols


def supported(src_shape: Tuple[int, ...], itemsize: int = 4,
              span: int = 1) -> bool:
    h, w = src_shape[-2], src_shape[-1]
    c = src_shape[0] if len(src_shape) == 3 else 1
    if itemsize not in (2, 4):
        return False
    if w % LANE or h % row_align(itemsize):
        return False
    return _pick_tile(h, w, c, itemsize, span)[0] > 0


def _kernel(dt_ref, vel_ref, src_ref, *rest,
            dissipation: float, rows: int, cols: int, h_global: int,
            w_global: int, channels: int, h_true: int, w_true: int,
            span: int, col_halo: int, align: int, with_splats: bool):
    if with_splats:
        gy_ref, gx_ref, amt_ref, out_ref, scratch, sem = rest
    else:
        out_ref, scratch, sem = rest
    r, cb = rows, cols
    win2 = r + _EXTRA
    cbw = cols + 2 * col_halo
    seg = _EXTRA - align  # fresh rows owned per segment
    i = pl.program_id(0)
    j = pl.program_id(1)
    dt = dt_ref[0]

    if col_halo:
        cstart = _clamped_start(j, cb, col_halo, w_global, LANE)
        coff = j * cb - cstart
    else:
        cstart = pl.multiple_of(j * cb, LANE)
        coff = 0

    rows_local = lax.broadcasted_iota(jnp.int32, (r, cb), 0)
    cols_local = lax.broadcasted_iota(jnp.int32, (r, cb), 1).astype(jnp.float32)

    vel_u = vel_ref[0].astype(jnp.float32)
    vel_v = vel_ref[1].astype(jnp.float32)

    # Global-row backtrace coords; CLAMP_TO_EDGE at the true extents.
    yg = (i * r).astype(jnp.float32) + rows_local.astype(jnp.float32) - dt * vel_v
    yg = jnp.clip(yg, 0.0, jnp.float32(h_true - 1))
    y0g = jnp.floor(yg)
    fy = (yg - y0g).astype(jnp.float32)
    y0i = y0g.astype(jnp.int32)

    # Aligned-window column coords (target block at lane offset col_halo).
    x_local = cols_local + jnp.float32(col_halo) - dt * vel_u
    jcb = (j * cb).astype(jnp.float32)
    x_lo = jnp.maximum(jnp.float32(col_halo) - jcb, 0.0)
    x_hi = jnp.minimum(jnp.float32(w_true - 1) - jcb + col_halo,
                       jnp.float32(cbw - 1))
    x_local = jnp.clip(x_local, x_lo, x_hi)
    x0 = jnp.floor(x_local)
    fx = (x_local - x0).astype(jnp.float32)
    x0i = x0.astype(jnp.int32)
    x1i = jnp.minimum((x0i + 1).astype(jnp.float32), x_hi).astype(jnp.int32)

    lo = jnp.min(y0i)
    hi = jnp.max(y0i) + 1  # highest row needed (the y0+1 corner)
    base0 = (lo // align) * align
    n_seg = (hi - base0) // seg + 1

    goff = col_halo // LANE
    n_groups_out = cb // LANE
    n_groups_win = cbw // LANE
    sentinel = win2 + r  # out-of-range oy for masked bound computation

    def gather_at(idx, rows_op):
        out = []
        for g_out in range(n_groups_out):
            sl = slice(g_out * LANE, (g_out + 1) * LANE)
            idx_g = idx[:, sl]
            acc = jnp.zeros((rows_op.shape[0], r, LANE), dtype=rows_op.dtype)
            for s in range(-span, span + 1):
                gg = g_out + goff + s
                if gg < 0 or gg >= n_groups_win:
                    continue
                local = idx_g - gg * LANE
                valid = (local >= 0) & (local < LANE)
                local_c = jnp.clip(local, 0, LANE - 1)
                op = rows_op[:, :, gg * LANE:(gg + 1) * LANE]
                vals = [jnp.take_along_axis(op[ch], local_c, axis=1)
                        for ch in range(rows_op.shape[0])]
                v = jnp.stack(vals)
                acc = acc + jnp.where(valid[None], v, 0.0)
            out.append(acc)
        return jnp.concatenate(out, axis=-1)

    def seg_body(sidx, acc):
        base = pl.multiple_of(
            jnp.clip(base0 + sidx * seg, 0, h_global - win2), align)
        if col_halo:
            copy = pltpu.make_async_copy(
                src_ref.at[:, pl.ds(base, win2), pl.ds(cstart, cbw)],
                scratch, sem)
        else:
            copy = pltpu.make_async_copy(
                src_ref.at[:, pl.ds(base, win2), :], scratch, sem)
        copy.start()
        copy.wait()
        # bf16 sources upcast in-register: rotate/gather are 32-bit ops.
        window = scratch[:].astype(jnp.float32)
        if with_splats:
            # Separable rank-S splat bump over this segment's rows (the
            # reference splats dye then advects it; bilinear sampling of
            # dye+bump == sampling each — exact), fused as an MXU matmul
            # instead of a separate full-grid splat pass.
            gy_sl = gy_ref[pl.ds(base, win2), :].astype(jnp.float32)
            gxs = gx_ref[:, pl.ds(cstart, cbw)].astype(jnp.float32)
            chans = []
            for ch in range(channels):
                amt_ch = amt_ref[:, ch:ch + 1].reshape(1, -1)
                bump = jax.lax.dot_general(
                    gy_sl * amt_ch, gxs, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                chans.append(window[ch] + bump)
            window = jnp.stack(chans)
        if col_halo:
            window = pltpu.roll(window, jnp.mod(col_halo - coff, cbw), axis=2)

        # Exactly-once ownership: row q belongs to segment (q - base0) // seg.
        own0 = (y0i - base0) // seg == sidx            # y0 row owner
        own1 = (y0i + 1 - base0) // seg == sidx        # y0+1 row owner
        # Window-local operand offsets for this tile's output rows.
        oy0 = y0i - base - rows_local
        oy1 = oy0 + 1
        lo_oy = jnp.minimum(jnp.min(jnp.where(own0, oy0, sentinel)),
                            jnp.min(jnp.where(own1, oy1, sentinel)))
        hi_oy = jnp.maximum(jnp.max(jnp.where(own0, oy0, -sentinel)),
                            jnp.max(jnp.where(own1, oy1, -sentinel)))

        def oy_body(oy, acc):
            shift = jnp.mod(win2 - oy, win2)
            rolled = pltpu.roll(window, shift, axis=1)
            rows_op = rolled[:, :r, :]
            g0 = gather_at(x0i, rows_op)
            g1 = gather_at(x1i, rows_op)
            gx = (g0.astype(jnp.float32) * (1.0 - fx)[None]
                  + g1.astype(jnp.float32) * fx[None])
            w0 = jnp.where(own0 & (oy0 == oy), 1.0 - fy, 0.0)
            w1 = jnp.where(own1 & (oy1 == oy), fy, 0.0)
            return acc + gx * (w0 + w1)[None]

        return lax.fori_loop(lo_oy, hi_oy + 1, oy_body, acc)

    acc = jnp.zeros((channels, r, cb), dtype=jnp.float32)
    acc = lax.fori_loop(0, n_seg, seg_body, acc)
    out_ref[:] = (acc / (1.0 + dissipation * dt)).astype(out_ref.dtype)


def advect_pallas_hbm(velocity: jnp.ndarray, source: jnp.ndarray, dt,
                      dissipation: float, true_shape=None,
                      span: int = 1, splat=None) -> jnp.ndarray:
    """Same-grid semi-Lagrangian advection, velocity in source-texels/second.

    No worst-case row halo: segments are DMA'd on demand, so this is the
    right kernel when the displacement bound is large (cross-resolution dye
    advection). ``span`` sizes the column gather window only.
    splat: optional (gy (H,S), gx (S,W), amt (S,C)) separable splat factors
    added to each DMA'd segment in-kernel before sampling."""
    squeeze = source.ndim == 2
    src = source[None] if squeeze else source
    c, h, w = src.shape
    if true_shape is None:
        true_shape = (h, w)
    rows, cols = _pick_tile(h, w, c, src.dtype.itemsize, span)
    if rows == 0:
        raise ValueError(f"unsupported shape {source.shape}")
    col_halo = span * LANE if cols != w else 0
    n_r = h // rows
    n_c = w // cols
    dt_arr = jnp.asarray(dt, jnp.float32).reshape(1)
    win2 = rows + _EXTRA
    cbw = cols + 2 * col_halo

    with_splats = splat is not None
    kernel = functools.partial(
        _kernel, dissipation=float(dissipation), rows=rows, cols=cols,
        h_global=h, w_global=w, channels=c,
        h_true=true_shape[0], w_true=true_shape[1],
        span=span, col_halo=col_halo, align=row_align(src.dtype.itemsize),
        with_splats=with_splats,
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((_Element(2, (0, 0)), _Element(rows), _Element(cols)),
                     lambda i, j: (0, i * rows, j * cols),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=ANY_SPACE),   # source stays in HBM
    ]
    args = [dt_arr, velocity, src]
    if with_splats:
        in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3
        args += list(splat)
    out = pl.pallas_call(
        kernel,
        grid=(n_r, n_c),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((c, rows, cols), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, h, w), src.dtype),
        scratch_shapes=[
            pltpu.VMEM((c, win2, cbw), src.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=50 * c * h * w,
            bytes_accessed=(3 * c + 2) * h * w * src.dtype.itemsize,
            transcendentals=0,
        ),
    )(*args)
    return out[0] if squeeze else out
