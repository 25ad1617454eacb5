"""Semi-Lagrangian advection with DATA-BOUNDED row windows (HBM-resident source).

The windowed-BlockSpec kernel (ops/pallas/advect.py) sizes its row halo for
the WORST-CASE displacement bound; at the demo's 8x dye/sim resolution ratio
that is a 136-row halo, so overlapping tile windows read ~18x the output
bytes. This kernel keeps the source in HBM and only DMAs the row segments a
tile's backtrace ACTUALLY reaches:

  * the row-offset bounds per tile come from an SMEM side input computed by
    one vectorized XLA pre-pass over the velocity
    (ops/pallas/advect.backtrace_row_bounds) — in-kernel vector->scalar
    reductions stall the scalar pipeline;
  * the row-offset loop walks [lo, hi+2) once, in order; overlapping
    fixed-size segments (fresh stride = _EXTRA - align rows) are DMA'd on
    demand, so every trip's (rows + align)-row slice lies inside exactly one
    segment and each offset is processed exactly once — no ownership masks;
  * each trip slices rows+align aligned rows from the segment scratch (free
    address arithmetic) and row-aligns them with one small sublane roll;
  * traffic ~ (actual_span + rows) / rows x output   (typically ~2x, not 18x).

The gather core (windowed lane take_along_axis per 128-lane group) matches
ops/pallas/advect.py; column windows stay worst-case (bounded by span*128
lanes and far cheaper). Optional separable splat factors are added to each
slice in-register (MXU) — exact, since bilinear sampling of a separable bump
is the product of its 1-D samples. Semantics match the jnp oracle
(tests/test_pallas.py in interpret mode).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpufluid.ops.pallas.advect import (_clamped_start,
                                        _corners_from_packed,
                                        _corners_from_packed_f16,
                                        _corners_from_rgb9e5, _pack_bf16,
                                        _pack_bf16_xpair,
                                        backtrace_col_bounds,
                                        backtrace_row_bounds,
                                        lane_window_plan)
from tpufluid.ops.pallas.common import Element as _Element, ANY_SPACE
from tpufluid.ops.pallas.common import (LANE, SUBLANE, dot_f32_3x,
                                        row_align)

_VMEM_BUDGET = 12 * 1024 * 1024
_PREF_ROWS = 32
_EXTRA = 48  # segment rows beyond the tile (multiple of 16)


def _pick_tile(h: int, w: int, channels: int, itemsize: int,
               span: int) -> Tuple[int, int]:
    align = row_align(itemsize)
    rows = 0
    # Cap the scan: ragged heights (e.g. 688 = 16*43) have huge divisors
    # whose windows blow the VMEM budget and made supported() reject the
    # whole shape (round-4 config fuzz); small tiles always work.
    for r in range(align, min(h, 4 * _PREF_ROWS) + 1, align):
        if h % r == 0 and r + _EXTRA <= h:
            rows = r
            if r >= _PREF_ROWS:
                break
    if rows == 0:
        return (0, 0)
    # NARROWEST column tiles first: this kernel serves large displacement
    # ratios, where the trip count tracks the tile's velocity range times
    # the ratio — a full-width tile's range can approach the worst case
    # (measured 7.8 ms/step on the demo config). With the tight lane plan
    # the span-group count scales with the window width, so 128-col tiles
    # beat 256+ (round-3 device sweep: demo 171.5 vs 146.4 steps/s at 384).
    cands = (128, 256, 384, 512) + ((w,) if w <= 2048 else ())
    cols = 0
    for cb in cands:
        if cb > w or w % cb or cb % LANE:
            continue
        if cb != w and cb + 2 * span * LANE > w:
            continue
        cbw = cb + (2 * span * LANE if cb != w else 0)
        win2 = rows + _EXTRA
        # double-buffered segment scratch (2x win2) + packed/unpacked temps
        vmem = (channels * (2 * win2 * 4 + 2 * win2 * itemsize)
                + (8 * channels + 10) * rows * 4) * cbw
        if vmem <= _VMEM_BUDGET:
            cols = cb
            break
    if cols == 0:
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


def _kernel(dt_ref, lo_ref, hi_ref, xlo_ref, xhi_ref, vel_ref, src_ref, *rest,
            dissipation: float, rows: int, cols: int, h_global: int,
            w_global: int, channels: int, h_true: int, w_true: int,
            span: int, col_halo: int, align: int, with_splats: bool,
            packed: bool, lane_off: int, s_range: Tuple[int, int]):
    if with_splats:
        gy_ref, gx_ref, amt_ref, out_ref = rest[:4]
        scratch_list = rest[4:]
    else:
        out_ref = rest[0]
        scratch_list = rest[1:]
    if packed == "f16":
        # Segments arrive PRE-PACKED from HBM (uint32 channel-pair planes,
        # ops/quant.f16_pack_planes): no per-segment pack, no pk scratch.
        scratch, sem = scratch_list
        pk_ref = st_ref = None
    elif packed:
        scratch, pk_ref, sem = scratch_list
        st_ref = None
    elif with_splats:
        scratch, st_ref, sem = scratch_list
        pk_ref = None
    else:
        scratch, sem = scratch_list
        pk_ref = st_ref = None
    r, cb = rows, cols
    win2 = r + _EXTRA
    cbw = cols + 2 * col_halo
    stride = _EXTRA - align  # fresh rows per segment; slices never straddle
    i = pl.program_id(0)
    j = pl.program_id(1)
    dt = dt_ref[0, 0]

    if col_halo:
        cstart = _clamped_start(j, cb, col_halo, w_global, LANE)
        coff = j * cb - cstart
    else:
        cstart = pl.multiple_of(j * cb, LANE)
        coff = 0

    # Per-tile row-offset bounds, reduced in the pre-pass (one SMEM scalar
    # read each; SMEM blocks must be (8,128)-divisible so the whole tiny
    # (n_r, n_c) arrays ride along unblocked).
    lo_t = lo_ref[i, j]
    hi_t = hi_ref[i, j]
    # Column-group occupancy guard (aligned-window lane coords): gather
    # groups outside [lmin, lmax] are skipped — exact, their masks would be
    # all-false (advect.backtrace_col_bounds).
    lmin_t = xlo_ref[i, j] - j * cols + lane_off
    lmax_t = xhi_ref[i, j] - j * cols + lane_off

    rows_local = lax.broadcasted_iota(jnp.int32, (r, cb), 0)
    cols_local = lax.broadcasted_iota(jnp.int32, (r, cb), 1).astype(jnp.float32)

    vel_u = vel_ref[0].astype(jnp.float32)
    vel_v = vel_ref[1].astype(jnp.float32)

    # Global-row backtrace coords; CLAMP_TO_EDGE at the true extents.
    yg = (i * r).astype(jnp.float32) + rows_local.astype(jnp.float32) - dt * vel_v
    yg = jnp.clip(yg, 0.0, jnp.float32(h_true - 1))
    y0g = jnp.floor(yg)
    fy = (yg - y0g).astype(jnp.float32)
    s_rel = y0g.astype(jnp.int32) - (i * r + rows_local)  # global offsets

    # Aligned-window column coords (the per-trip roll puts the target block
    # at lane_off — see advect.lane_window_plan).
    x_local = cols_local + jnp.float32(lane_off) - dt * vel_u
    jcb = (j * cb).astype(jnp.float32)
    x_lo = jnp.maximum(jnp.float32(lane_off) - jcb, 0.0)
    x_hi = jnp.minimum(jnp.float32(w_true - 1) - jcb + lane_off,
                       jnp.float32(cbw - 1))
    x_local = jnp.clip(x_local, x_lo, x_hi)
    x0 = jnp.floor(x_local)
    fx = (x_local - x0).astype(jnp.float32)
    x0i = x0.astype(jnp.int32)
    x1i = jnp.minimum((x0i + 1).astype(jnp.float32), x_hi).astype(jnp.int32)

    n_groups_out = cb // LANE
    n_groups_win = cbw // LANE
    nr2 = r + 2 * align

    # Segment plan (all scalars): trips walk [lo_t, hi_t+1] once; segment k
    # serves trips whose (unclipped) aligned slice start falls in
    # [S0 + k*stride, S0 + (k+1)*stride). Clipped starts only ever wrap
    # zero-weight rows (same argument as ops/pallas/advect._gather_stream).
    s0_un = ((i * r + lo_t) // align) * align
    al_last = ((i * r + hi_t + 1) // align) * align
    n_seg = (al_last - s0_un) // stride + 1

    if with_splats:
        gxs = gx_ref[:, pl.ds(cstart, cbw)].astype(jnp.float32)

    def seg_copy(k, slot):
        """Async-copy descriptor for segment k into double-buffer slot."""
        seg_start = pl.multiple_of(
            jnp.clip(s0_un + k * stride, 0, h_global - win2), align)
        if col_halo:
            return pltpu.make_async_copy(
                src_ref.at[:, pl.ds(seg_start, win2), pl.ds(cstart, cbw)],
                scratch.at[slot], sem.at[slot])
        return pltpu.make_async_copy(
            src_ref.at[:, pl.ds(seg_start, win2), :],
            scratch.at[slot], sem.at[slot])

    # The tight plan centers typical reach on the MIDDLE groups of the
    # static span (lane_window_plan); the extremal groups exist for the
    # worst-case displacement contract but are untouched by ~90% of tiles
    # at bench state (out/jobs/73: occupancy 2.06 of 4, p90 = 2). The inner
    # pair runs unconditionally; the outer groups ride ONE lax.cond per
    # corner pair — per-group conds measured SLOWER than the skipped
    # gathers (~30 cycles each x 16/trip, out/jobs/75).
    s_all = [s for s in range(s_range[0], s_range[1] + 1)
             if any(0 <= g_out + s < n_groups_win
                    for g_out in range(n_groups_out))]
    # The guard is sound only for single-output-group tiles: the per-tile
    # scalar bounds live in tile coords, but with several output groups the
    # s offsets are group-RELATIVE — a neighbor-group gather (s=-1) can be
    # needed while the tile-level bounds look interior (the 320x180 ragged
    # config dropped real dye through exactly that hole).
    if len(s_all) > 2 and n_groups_out == 1:
        # The inner pair = the groups holding the ZERO-displacement reach
        # (x_local ~ cols_local + lane_off), NOT the middle of the static
        # span: the plan's lane_off decides where typical backtraces land
        # (assuming the middle silently dropped real data on plans whose
        # lane_off sits low in the window — round-4 ragged-config repro).
        lo = lane_off // LANE
        hi = lo + 1
        if lo in s_all and hi in s_all:
            s_inner = (lo, hi)
            s_outer = [s for s in s_all if s not in s_inner]
        else:  # zero-displacement reach outside the plan: don't guard
            s_inner = tuple(s_all)
            s_outer = []
    else:
        s_inner = tuple(s_all)
        s_outer = []

    def gather_groups(idx, rows_op, subset, n_planes):
        out = []
        for g_out in range(n_groups_out):
            sl = slice(g_out * LANE, (g_out + 1) * LANE)
            idx_g = idx[:, sl]
            acc = jnp.zeros((n_planes, idx.shape[0], LANE),
                            dtype=rows_op.dtype)
            for s in subset:
                gg = g_out + s
                if gg < 0 or gg >= n_groups_win:
                    continue
                local = idx_g - gg * LANE
                valid = (local >= 0) & (local < LANE)
                local_c = jnp.clip(local, 0, LANE - 1)
                op = rows_op[:, :, gg * LANE:(gg + 1) * LANE]
                vals = [jnp.take_along_axis(op[ch], local_c, axis=1)
                        for ch in range(n_planes)]
                v = jnp.stack(vals)
                acc = acc + jnp.where(valid[None], v, jnp.zeros((), v.dtype))
            out.append(acc)
        return jnp.concatenate(out, axis=-1)

    if s_outer:
        # Any output group's reach past its inner pair triggers the outer
        # groups for the whole tile (conservative, tile-uniform scalar).
        inner_lo = jnp.int32(s_inner[0] * LANE)
        inner_hi = jnp.int32((s_inner[-1] + 1) * LANE - 1)
        # bounds are in aligned-window lane coords relative to group g_out:
        # reach outside [g_out*LANE + inner_lo - ... ] — compare against the
        # widest output group's inner window.
        need_outer = ((lmin_t < inner_lo)
                      | (lmax_t > inner_hi + (n_groups_out - 1) * LANE))

    def gather_pair(idx0, idx1, rows_op):
        cp = rows_op.shape[0]
        # Odd trailing channel is column-paired: its single gather carries
        # both x-corners, so the x1 gather skips that plane entirely.
        cp1 = (cp - 1 if packed in ("pairs", "f16") and channels % 2 == 1
               else cp)
        g0 = gather_groups(idx0, rows_op, s_inner, cp)
        g1 = gather_groups(idx1, rows_op, s_inner, cp1)
        if not s_outer:
            return g0, g1

        def with_outer(pair):
            a, b = pair
            return (a + gather_groups(idx0, rows_op, s_outer, cp),
                    b + gather_groups(idx1, rows_op, s_outer, cp1))

        return lax.cond(need_outer, with_outer, lambda p: p, (g0, g1))

    # Pre-rolled lane alignment applies per slice (column-window mode).
    lane_shift = jnp.mod(lane_off - coff, cbw) if col_halo else 0

    def seg_body(k, acc):
        # Double-buffered segments: wait on this slot, immediately start the
        # NEXT segment's DMA into the other slot, then compute — the copy
        # overlaps the gather trips (the serial start-wait version measured
        # the DMA at ~25% of the demo-config step).
        slot = lax.rem(k, 2)
        seg_start = pl.multiple_of(
            jnp.clip(s0_un + k * stride, 0, h_global - win2), align)
        seg_copy(k, slot).wait()

        @pl.when(k + 1 < n_seg)
        def _():
            seg_copy(k + 1, lax.rem(k + 1, 2)).start()

        if packed == "f16":
            pass  # segments are pre-packed uint32 planes straight from HBM
        elif packed:
            # Pack the DMA'd bf16 segment ONCE (channel pairs per uint32
            # lane, ops/pallas/advect._pack_bf16) so every trip slices and
            # rolls half the planes. A fused splat bump rounds to bf16
            # storage before packing — the jnp fallback and the reference's
            # half-float splat texture do the same.
            raw = scratch[slot]
            if with_splats:
                # Single DEFAULT-precision dot: the bump rounds to bf16
                # STORAGE right here (like the reference's half-float splat
                # texture), which dwarfs the 1-pass matmul error; channels
                # stack along rows so ONE dot serves all (MXU latency, not
                # MACs, is what the per-channel dots cost).
                gy_sl = gy_ref[pl.ds(seg_start, win2), :].astype(jnp.float32)
                a = jnp.concatenate(
                    [gy_sl * amt_ref[:, ch:ch + 1].reshape(1, -1)
                     for ch in range(channels)], axis=0)
                full = jax.lax.dot_general(
                    a, gxs, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                raw = jnp.stack([
                    raw[ch].astype(jnp.float32)
                    + full[ch * win2:(ch + 1) * win2]
                    for ch in range(channels)]).astype(jnp.bfloat16)
            if packed == "rgb9e5":
                # All three channels share ONE uint32 plane (shared-exponent
                # RGB9E5, ops/quant.py): 2 corner gathers per trip instead
                # of 3, and every trip slices/rolls a single plane.
                from tpufluid.ops.quant import rgb9e5_pack

                pk_ref[:] = rgb9e5_pack(raw.astype(jnp.float32))[None]
            else:
                pk_ref[:] = jnp.stack([
                    _pack_bf16(raw[2 * kk], raw[2 * kk + 1])
                    if 2 * kk + 1 < channels
                    else _pack_bf16_xpair(raw[2 * kk])
                    for kk in range((channels + 1) // 2)])
        elif with_splats:
            # f32 path: bump the WHOLE segment once into the staging scratch
            # — per-trip-slice bumps serialized 3 MXU passes against every
            # gather trip (demo f32 -15% measured, out/jobs/a01).
            gy_sl = gy_ref[pl.ds(seg_start, win2), :].astype(jnp.float32)
            a = jnp.concatenate(
                [gy_sl * amt_ref[:, ch:ch + 1].reshape(1, -1)
                 for ch in range(channels)], axis=0)
            full = dot_f32_3x(a, gxs, (((1,), (0,)), ((), ())))
            for ch in range(channels):
                st_ref[ch] = (scratch[slot, ch].astype(jnp.float32)
                              + full[ch * win2:(ch + 1) * win2])

        oy_lo = jnp.maximum(lo_t, s0_un + k * stride - i * r)
        oy_hi = jnp.minimum(hi_t + 1, s0_un + (k + 1) * stride - 1 - i * r)

        # One loop over the tile's union offset range: per-slab bounds were
        # measured SLOWER here (92 vs 120 steps/s on the demo config) — the
        # extra loop entries and small operands cost more than the skipped
        # zero-weight trips, the same lesson as the same-grid kernel. TWO
        # offsets per trip share one slice+roll (the second operand is a
        # static shift); the second weight is masked past the segment's end
        # so the next segment does not double-serve it.
        def sub_body(oy, rows_op, gate, acc):
            if col_halo:
                rows_op = pltpu.roll(rows_op, lane_shift, axis=2)
            g0, g1 = gather_pair(x0i, x1i, rows_op)
            if packed == "rgb9e5":
                g0, g1 = _corners_from_rgb9e5(g0, g1)
            elif packed == "f16":
                g0, g1 = _corners_from_packed_f16(g0, g1, channels)
            elif packed:
                g0, g1 = _corners_from_packed(g0, g1, channels)
            gxv = g0 * (1.0 - fx)[None] + g1 * fx[None]
            wgt = (jnp.where(s_rel == oy, 1.0 - fy, 0.0)
                   + jnp.where(s_rel == oy - 1, fy, 0.0)) * gate
            return acc + gxv * wgt[None]

        def oy_body(kk, acc):
            oy = oy_lo + 2 * kk
            al_un = ((i * r + oy) // align) * align
            al = pl.multiple_of(jnp.clip(al_un, 0, h_global - nr2), align)
            al_loc = pl.multiple_of(al - seg_start, align)
            if packed == "f16":
                sl16 = scratch[slot, :, pl.ds(al_loc, nr2), :]
            elif packed:
                sl16 = pk_ref[:, pl.ds(al_loc, nr2), :]
            elif with_splats:
                sl16 = st_ref[:, pl.ds(al_loc, nr2), :]
            else:
                # bf16 sources upcast here: rotate/gather are 32-bit ops.
                sl16 = scratch[slot, :, pl.ds(al_loc, nr2), :].astype(jnp.float32)
            m = i * r + oy - al
            rolled = pltpu.roll(sl16, jnp.mod(-m, nr2), axis=1)
            acc = sub_body(oy, rolled[:, :r, :], 1.0, acc)
            gate = (oy + 1 <= oy_hi).astype(jnp.float32)
            return sub_body(oy + 1, rolled[:, 1:r + 1, :], gate, acc)

        n_trips = (oy_hi + 1 - oy_lo + 1) // 2
        return lax.fori_loop(0, n_trips, oy_body, acc)

    seg_copy(0, 0).start()
    acc = jnp.zeros((channels, r, cb), jnp.float32)
    acc = lax.fori_loop(0, n_seg, seg_body, acc)
    out_ref[:] = (acc / (1.0 + dissipation * dt)).astype(out_ref.dtype)


def advect_pallas_hbm(velocity: jnp.ndarray, source: jnp.ndarray, dt,
                      dissipation: float, true_shape=None,
                      span: int = 1, splat=None,
                      max_disp_x=None, quant=None,
                      f16c: int = 0) -> jnp.ndarray:
    """Same-grid semi-Lagrangian advection, velocity in source-texels/second.

    No worst-case row halo: segments are DMA'd on demand, so this is the
    right kernel when the displacement bound is large (cross-resolution dye
    advection). ``span`` sizes the column gather window only; max_disp_x
    (source texels) tightens the gather group plan below the span worst case
    (advect.lane_window_plan).
    splat: optional (gy (H,S), gx (S,W), amt (S,C)) separable splat factors
    added to each slice in-kernel before sampling.
    f16c > 0: float16 mode — ``source`` is the PRE-PACKED (ceil(f16c/2),H,W)
    uint32 plane stack (ops/quant.f16_pack_planes; see advect.advect_pallas);
    output float32, splats pre-applied by the caller."""
    squeeze = source.ndim == 2
    src = source[None] if squeeze else source
    c, h, w = src.shape
    if f16c:
        if splat is not None:
            raise ValueError("f16 packed mode: pre-apply splats in the pack "
                             "pass (no f16 refs in Mosaic)")
        if src.dtype != jnp.uint32 or c != (f16c + 1) // 2:
            raise ValueError(f"f16c={f16c} expects ({(f16c + 1) // 2},H,W) "
                             f"uint32 planes, got {src.shape} {src.dtype}")
        c = f16c
    if true_shape is None:
        true_shape = (h, w)
    align = row_align(src.dtype.itemsize)
    rows, cols = _pick_tile(h, w, c, src.dtype.itemsize, span)
    if rows == 0:
        raise ValueError(f"unsupported shape {source.shape}")
    col_halo = span * LANE if cols != w else 0
    n_r = h // rows
    n_c = w // cols
    # (1,1) not (1,): a batched SMEM block lowers only when its last two
    # dims are (8,128)-divisible OR equal the full array dims -- (1,1)
    # satisfies the latter, so vmap(step) can batch a per-sim dt
    # (out/jobs/done/c01_batched_smem_probe.py); (1,) cannot.
    dt_arr = jnp.asarray(dt, jnp.float32).reshape(1, 1)
    win2 = rows + _EXTRA
    cbw = cols + 2 * col_halo

    lo_b, hi_b = backtrace_row_bounds(velocity[1], dt, true_shape[0])
    # Pad-region velocities are unconstrained garbage; clamping the bounds
    # (not the coords) caps their trip counts without touching valid trips.
    lo_b = jnp.maximum(lo_b, -(h + align))
    hi_b = jnp.minimum(hi_b, h + align)
    # Per-tile bounds plan the DMA segments and the union offset walk.
    lo_t = lo_b.reshape(n_r, rows // SUBLANE, n_c, cols // LANE).min((1, 3))
    hi_t = hi_b.reshape(n_r, rows // SUBLANE, n_c, cols // LANE).max((1, 3))
    # Column-group occupancy bounds: skip gather groups a tile never reaches.
    xlo_b, xhi_b = backtrace_col_bounds(velocity[0], dt, true_shape[1])
    xlo_t = xlo_b.reshape(n_r, rows // SUBLANE, n_c, cols // LANE).min((1, 3))
    xhi_t = xhi_b.reshape(n_r, rows // SUBLANE, n_c, cols // LANE).max((1, 3))

    with_splats = splat is not None
    # Channel-packed gathers (see ops/pallas/advect.py): bf16 sources gather
    # ceil(C/2) uint32 planes ("pairs"), or ONE shared-exponent RGB9E5 plane
    # for the 3-channel dye when quant requests it; splat bumps round to bf16
    # storage at segment packing (matching the jnp fallback's
    # (src + bump).astype(dtype)).
    packed = False
    if f16c:
        packed = "f16"
    elif src.dtype == jnp.bfloat16 and c > 1:
        packed = "rgb9e5" if (quant == "rgb9e5" and c == 3) else "pairs"
    n_planes = 1 if packed == "rgb9e5" else (c + 1) // 2
    lane_off, s_lo, s_hi = lane_window_plan(max_disp_x, span, cols, cbw)
    kernel = functools.partial(
        _kernel, dissipation=float(dissipation), rows=rows, cols=cols,
        h_global=h, w_global=w, channels=c,
        h_true=true_shape[0], w_true=true_shape[1],
        span=span, col_halo=col_halo, align=align, with_splats=with_splats,
        packed=packed, lane_off=lane_off, s_range=(s_lo, s_hi),
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((_Element(2, (0, 0)), _Element(rows), _Element(cols)),
                     lambda i, j: (0, i * rows, j * cols),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=ANY_SPACE),   # source stays in HBM
    ]
    args = [dt_arr, lo_t, hi_t, xlo_t, xhi_t, velocity, src]
    if with_splats:
        in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3
        args += list(splat)
    out = pl.pallas_call(
        kernel,
        grid=(n_r, n_c),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((c, rows, cols), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        # f16 mode outputs f32 (the caller rounds to f16 at the pass
        # boundary, where the reference's half-float FBO write rounds).
        out_shape=jax.ShapeDtypeStruct(
            (c, h, w), jnp.float32 if packed == "f16" else src.dtype),
        scratch_shapes=(
            [pltpu.VMEM((2, src.shape[0], win2, cbw), src.dtype)]
            + ([pltpu.VMEM((n_planes, win2, cbw), jnp.uint32)]
               if packed and packed != "f16" else
               [pltpu.VMEM((c, win2, cbw), jnp.float32)] if with_splats
               else [])
            + [pltpu.SemaphoreType.DMA((2,))]),
        cost_estimate=pl.CostEstimate(
            flops=50 * c * h * w,
            bytes_accessed=(3 * c + 2) * h * w * src.dtype.itemsize,
            transcendentals=0,
        ),
    )(*args)
    return out[0] if squeeze else out
