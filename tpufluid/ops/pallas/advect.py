"""Pallas semi-Lagrangian advection (advectionShader, script.js:746-784).

XLA lowers the backtrace gather to scalar loads (~35 ms for 1024^2 on v5e —
99% of the whole step). This kernel exploits the displacement bound the
reference guarantees by construction (|v| <= 1000 sim-texels/s after the
vorticity clamp script.js:863, dt <= 1/60 s script.js:1191 => the backtrace
moves at most ~17 *sim* texels — scaled by the source/sim resolution ratio
for dye):

  * 2-D grid over (row, column) tiles; the source is read through an
    IN-BOUNDS clamped halo window in BOTH axes (ops/pallas/common.py — no
    HBM edge-pad copies). Small tiles matter: the gather loop's trip count
    tracks the VELOCITY RANGE inside the tile, so tiling in x too keeps it
    near the local physical variation instead of the full-row range;
  * the row component of the gather is a fori_loop over the actual integer
    row-offset range present in the tile, each iteration slicing rows+8
    aligned window rows (free address arithmetic on a ref) and row-aligning
    them with one small sublane rotate (wrapped rows only ever combine with
    exactly-zero bilinear weights) — round 1 rotated the WHOLE halo window
    every iteration;
  * the column component is a true vectorized gather: per 128-lane group,
    jnp.take_along_axis against the +/-span neighboring source lane groups
    (Mosaic lowers these to tpu.dynamic_gather);
  * bilinear weights and the 1/(1 + dissipation*dt) decay (script.js:780-781)
    are applied in-register.

Cross-resolution (dye) advection resamples the coarse velocity to the dye
grid and rescales it to dye-texels/s (dispatch.advect), then uses this
same-grid kernel with halo/span sized for the ratio.
Semantics match tpufluid.ops.advect.advect (the oracle).
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpufluid.ops.pallas.common import Element as _Element

from tpufluid.ops.pallas.common import (LANE, SUBLANE, dot_f32_3x,
                                        round_up, row_align)

# Worst-case same-grid displacement budget. The reference clamps velocity to
# +/-1000 texels/s (script.js:863) and dt to 1/60 s (script.js:1191) AFTER
# vorticity confinement but BEFORE the pressure-gradient subtraction, which
# is NOT re-clamped (script.js:892-913): HALO therefore carries ceil(1000/60)
# = 17 texels of clamped velocity + 1 bilinear corner + 6 texels of slack for
# the un-clamped post-projection gradient kick. Backtraces beyond the window
# clamp silently (matching the out-of-contract behavior of any bounded
# sampler); tpufluid.metrics logs 'max_speed' on every instrumented run so a
# violation of the budget is observable.
HALO = 24  # multiple of the sublane count
_VMEM_BUDGET = 12 * 1024 * 1024
# Round-3 device sweep at 1024^2 with the tight lane plan: 64x128 tiles beat
# the r1 optimum 32x256 (f32 665 vs 597 steps/s; bf16 900 vs 826 — narrower
# windows mean fewer span groups and a smaller per-tile velocity range,
# taller tiles amortize the per-tile coordinate setup).
_PREF_ROWS = 64
_PREF_COLS = 128


def halo_for_displacement(max_disp: float) -> int:
    """Row halo for a max backtrace displacement in *source* texels."""
    return max(HALO, -(-(int(math.ceil(max_disp)) + 2) // SUBLANE) * SUBLANE)


def group_span_for_displacement(max_disp: float) -> int:
    """Lane-group neighbor span for the windowed column gather."""
    return max(1, int(math.ceil((max_disp + 2) / LANE)))


def lane_window_plan(max_disp_x, span: int, cols: int, cbw: int):
    """Static column-gather plan: (lane_off, s_lo, s_hi).

    ``lane_off`` is the in-window lane offset the staging roll gives the
    target block; output lane-group g then gathers from window groups g+s,
    s in [s_lo, s_hi]. The reachable span per output lane is +/-D lanes
    around its own position, so CENTERING the block mid-group (lane_off ~64
    at the same-grid bound) makes the span straddle one group boundary
    instead of two: 2 dynamic_gathers per corner instead of 3 — the gather
    issue rate is the measured floor of the whole advection (docs/BENCH.md).

    max_disp_x None keeps the legacy span-halo plan (block at lane offset
    span*128, groups g..g+2*span), which is what a span-sized displacement
    bound degenerates to; callers with a tighter bound (dispatch knows the
    reference's +/-1000 texels/s * dt clamp) get the narrower plan.
    """
    if cols == cbw:  # no column window: block at lane offset 0
        return 0, -span, span
    D = (span * LANE - 2) if max_disp_x is None else int(math.ceil(max_disp_x))
    D += 2  # bilinear x1 corner + roundoff
    best = None
    for off in range(D, cbw - cols - D + 1):
        s_lo = (off - D) // LANE
        s_hi = (LANE - 1 + off + D) // LANE
        # Prefer fewer groups, then balanced slack for out-of-contract kicks.
        key = (s_hi - s_lo + 1, -min(off - D, (cbw - cols - D) - off))
        if best is None or key < best[0]:
            best = (key, (off, s_lo, s_hi))
    if best is None:  # bound exceeds the window halo: legacy centered plan
        return span * LANE, 0, 2 * span
    return best[1]


def _pick_tile(h: int, w: int, channels: int, itemsize: int,
               halo: int = HALO, span: int = 1) -> Tuple[int, int]:
    """(rows, cols) per tile: prefer small tiles (gather work tracks the
    local velocity range), subject to VMEM and divisibility."""
    align = row_align(itemsize)
    halo = round_up(halo, align)
    rows = 0
    for r in range(align, h + 1, align):
        if h % r == 0 and r + 2 * halo <= h:
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
        cols = w  # single column tile, no column windowing needed
    # VMEM: window + rotate copy 2*C*(r+2halo)*(cb+2span*128) + temps
    while True:
        cbw = cols + (2 * span * LANE if cols != w else 0)
        vmem = (channels * (2 * (rows + 2 * halo)) * cbw
                + (channels * 8 + 10) * rows * cbw) * itemsize
        if vmem <= _VMEM_BUDGET or rows == align:
            break
        # Re-align after halving: h's divisors need not halve to multiples
        # of the sublane count (688 = 16*43 halves 344 -> 172, not 8-aligned
        # — the portrait-config crash caught by the round-4 config fuzz).
        rows = (rows // 2 // align) * align
        while rows >= align and h % rows:
            rows -= align
        if rows < align:
            return (0, 0)
    if vmem > _VMEM_BUDGET:
        return (0, 0)
    return rows, cols


def supported(src_shape: Tuple[int, ...], itemsize: int = 4, halo: int = HALO,
              span: int = 1) -> bool:
    h, w = src_shape[-2], src_shape[-1]
    c = src_shape[0] if len(src_shape) == 3 else 1
    if itemsize not in (2, 4):
        return False
    if w % LANE or h % row_align(itemsize):
        return False
    return _pick_tile(h, w, c, itemsize, halo, span)[0] > 0


def _trip_unroll(win: int, r: int, align: int) -> int:
    """Row offsets served per gather-loop trip (static shifts of one rolled
    slice); bounded by the halo so the slice always fits the window. Two is
    the measured f32 optimum (the past-the-end sub-bodies of wider unrolls
    multiply zeros ~20% of the time); the channel-packed bf16 path (align
    16) prefers four (916 vs 900 steps/s at 1024^2, r3 sweep) — its slices
    are half the bytes, so the wider slice costs less than the saved loop
    entries."""
    return max(1, min(4 if align == 16 else 2, (win - r) // align))


def _clamped_start(i, block: int, halo: int, total: int, align: int):
    lo = i * block - halo
    return pl.multiple_of(jnp.clip(lo, 0, total - block - 2 * halo), align)


def backtrace_row_bounds(vel_v, dt, h_true: int):
    """Per-(8-row x 128-lane)-block min/max integer backtrace row offsets
    (s = floor(clip(row - dt*v)) - row), as two (H/8, W/128) i32 arrays.

    Computed OUTSIDE a kernel as one vectorized XLA pass: in-kernel
    vector->scalar min/max reductions stall the scalar pipeline, while
    precomputed bounds enter kernels through SMEM where scalar reads are
    free. Offsets are in GLOBAL row coords. Conservative overestimates only
    add zero-weight loop trips."""
    h, w = vel_v.shape[-2:]
    rowg = jnp.arange(h, dtype=jnp.float32)[:, None]
    yp = jnp.clip(rowg - jnp.asarray(dt, jnp.float32) * vel_v.astype(jnp.float32),
                  0.0, float(h_true - 1))
    s = jnp.floor(yp).astype(jnp.int32) - jnp.arange(h, dtype=jnp.int32)[:, None]
    sb = s.reshape(h // SUBLANE, SUBLANE, w // LANE, LANE)
    return sb.min(axis=(1, 3)), sb.max(axis=(1, 3))


def backtrace_col_bounds(vel_u, dt, w_true: int):
    """Per-(8-row x 128-lane)-block min x0 / max x1 GLOBAL backtrace column
    indices (x = clip(col - dt*u)), as two (H/8, W/128) i32 arrays — the
    column analog of backtrace_row_bounds. Kernels use the per-tile
    reduction to SKIP gather lane groups the tile's backtraces never touch
    (measured demo-config occupancy: 2.06 of the 4 statically-planned
    groups, out/jobs/73). Conservative: computed with the global clamp
    only, a superset of the kernel's window-capped reach, and skipping an
    untouched group is exact — its validity masks would be all-false."""
    h, w = vel_u.shape[-2:]
    colg = jnp.arange(w, dtype=jnp.float32)[None, :]
    xp = jnp.clip(colg - jnp.asarray(dt, jnp.float32) * vel_u.astype(jnp.float32),
                  0.0, float(w_true - 1))
    x0 = jnp.floor(xp).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w_true - 1)
    b0 = x0.reshape(h // SUBLANE, SUBLANE, w // LANE, LANE).min(axis=(1, 3))
    b1 = x1.reshape(h // SUBLANE, SUBLANE, w // LANE, LANE).max(axis=(1, 3))
    return b0, b1


def _pack_bf16(lo, hi):
    """Pack two bf16 planes into one uint32 plane (lo in bits 0..15).
    bf16 is the top half of f32, so the bf16 bit pattern is
    bitcast(f32(x)) >> 16 — exact, and no 16-bit vector ops are needed."""
    b_lo = lax.bitcast_convert_type(lo.astype(jnp.float32), jnp.uint32) >> 16
    if hi is None:
        return b_lo
    b_hi = (lax.bitcast_convert_type(hi.astype(jnp.float32), jnp.uint32)
            & jnp.uint32(0xFFFF0000))
    return b_lo | b_hi


def _pack_bf16_xpair(v):
    """Pack the COLUMN pair (v[x], v[x+1]) into one uint32 plane (v[x] in
    bits 0..15); the last lane pairs with itself — exactly the reference's
    CLAMP_TO_EDGE x1 = min(x0+1, edge) corner. One gather of this plane
    yields BOTH bilinear x-corners of the channel: the odd channel of a
    packed source would otherwise waste its plane's upper half on zeros
    AND pay a second (x1) gather per trip."""
    b = lax.bitcast_convert_type(v.astype(jnp.float32), jnp.uint32) >> 16
    nxt = jnp.concatenate([b[..., 1:], b[..., -1:]], axis=-1)
    return b | (nxt << 16)


def _corners_from_rgb9e5(g0, g1):
    """(x0, x1) f32 3-channel stacks from ONE rgb9e5-packed plane's two
    corner gathers (ops/quant.py: all three dye channels share a uint32 via
    a 5-bit shared exponent — 2 gathers per trip instead of the 16-bit
    information floor's 3)."""
    from tpufluid.ops.quant import rgb9e5_unpack

    return rgb9e5_unpack(g0[0]), rgb9e5_unpack(g1[0])


def _corners_from_packed_f16(g0, g1, c: int):
    """(x0, x1) f32 channel stacks from PRE-PACKED float16 gather results
    (ops/quant.f16_pack_planes layout — identical to the bf16 pairs layout;
    only the 16-bit decode differs: IEEE half -> f32 via quant.
    f16_bits_to_f32, which is exact for every finite half)."""
    from tpufluid.ops.quant import f16_bits_to_f32

    cp = (c + 1) // 2
    odd = c % 2 == 1
    ch0, ch1 = [], []
    for k in range(cp):
        lo0 = f16_bits_to_f32(g0[k])
        hi0 = f16_bits_to_f32(g0[k] >> 16)
        if odd and k == cp - 1:
            ch0.append(lo0)
            ch1.append(hi0)
        else:
            ch0.append(lo0)
            ch1.append(f16_bits_to_f32(g1[k]))
            ch0.append(hi0)
            ch1.append(f16_bits_to_f32(g1[k] >> 16))
    return jnp.stack(ch0), jnp.stack(ch1)


def _corners_from_packed(g0, g1, c: int):
    """(x0, x1) f32 channel stacks from packed gather results. Full planes
    carry TWO CHANNELS at one corner (g0/g1 are the x0/x1 corner gathers);
    an odd trailing plane is COLUMN-paired (_pack_bf16_xpair) — its x1
    corner is its own upper half, so g1 omits that plane entirely."""
    cp = (c + 1) // 2
    odd = c % 2 == 1
    hi_mask = jnp.uint32(0xFFFF0000)
    ch0, ch1 = [], []
    for k in range(cp):
        lo0 = lax.bitcast_convert_type(g0[k] << 16, jnp.float32)
        hi0 = lax.bitcast_convert_type(g0[k] & hi_mask, jnp.float32)
        if odd and k == cp - 1:
            ch0.append(lo0)
            ch1.append(hi0)
        else:
            ch0.append(lo0)
            ch1.append(lax.bitcast_convert_type(g1[k] << 16, jnp.float32))
            ch0.append(hi0)
            ch1.append(lax.bitcast_convert_type(g1[k] & hi_mask,
                                                jnp.float32))
    return jnp.stack(ch0), jnp.stack(ch1)


def _advect_kernel(dt_ref, vel_ref, src_ref, *rest,
                   dissipation: float,
                   rows: int, cols: int, h_global: int, w_global: int,
                   channels: int, h_true: int, w_true: int, halo: int,
                   span: int, col_halo: int, align: int, with_splats: bool,
                   packed: bool, lane_off: int, s_range: Tuple[int, int],
                   sim_w: int):
    if with_splats:
        gy_ref, gx_ref, amt_ref, out_ref = rest[:4]
        scratch = rest[4:]
    else:
        out_ref = rest[0]
        scratch = rest[1:]
    i = pl.program_id(0)
    j = pl.program_id(1)
    dt = dt_ref[0, 0]
    r, cb = rows, cols
    win = r + 2 * halo
    cbw = cb + 2 * col_halo

    rstart = _clamped_start(i, r, halo, h_global, align)
    roff = (i * r - rstart).astype(jnp.float32)

    if col_halo:
        cstart = _clamped_start(j, cb, col_halo, w_global, LANE)
        coff = j * cb - cstart
    else:
        cstart = pl.multiple_of(j * cb, LANE)

    if with_splats:
        # The separable rank-S splat bump (the reference splats dye then
        # advects it, script.js:1287-1293; bilinear sampling of dye+bump ==
        # sampling each — exact): one tiny MXU matmul per loaded slice
        # instead of a full extra HBM pass over the dye — or a staged f32
        # window copy, which measured slower.
        gxs = gx_ref[:, pl.ds(cstart, cbw)].astype(jnp.float32)
        amts = [amt_ref[:, ch:ch + 1].reshape(1, -1) for ch in range(channels)]

    def bumped(raw, al, nrows):
        if not with_splats:
            return raw
        raw = raw.astype(jnp.float32)
        gy_sl = gy_ref[pl.ds(pl.multiple_of(rstart + al, align), nrows),
                       :].astype(jnp.float32)
        # Channels stack along rows: ONE dot instead of C serial dots (MXU
        # latency, not MACs, dominates these rank-S bumps). Packed mode
        # rounds the bump to bf16 storage immediately (the reference's
        # half-float splat texture does the same), so the single-pass
        # default precision is below the storage rounding; f32 mode needs
        # the bf16x3 split (ops/pallas/common.dot_f32_3x).
        a = jnp.concatenate([gy_sl * amts[ch] for ch in range(channels)],
                            axis=0)
        dims = (((1,), (0,)), ((), ()))
        if packed:
            full = jax.lax.dot_general(a, gxs, dims,
                                       preferred_element_type=jnp.float32)
        else:
            full = dot_f32_3x(a, gxs, dims)
        return jnp.stack([
            raw[ch] + full[ch * nrows:(ch + 1) * nrows]
            for ch in range(channels)])

    nrk = r + _trip_unroll(win, r, align) * align
    if packed == "f16":
        # float16 mode: the source arrives PRE-PACKED as uint32 channel-pair
        # planes (ops/quant.f16_pack_planes) — Mosaic has no f16 refs, so
        # unlike bf16 the pack cannot happen here; splat bumps were
        # pre-applied (with f16 storage rounding) in the same XLA pack pass.
        # Staging is therefore just the lane-alignment roll — or nothing.
        if col_halo:
            win_ref = scratch[0]
            win_ref[:] = pltpu.roll(src_ref[:],
                                    jnp.mod(lane_off - coff, cbw), axis=2)

            def load2(al):
                return win_ref[:, pl.ds(al, nrk), :]
        else:
            def load2(al):
                return src_ref[:, pl.ds(al, nrk), :]
    elif packed:
        # Channel-packed bf16 mode: TWO bf16 channels share one uint32
        # gather plane — tpu.dynamic_gather is 32-bit-only, so this cuts the
        # gather issues and the per-trip roll bytes ~in half. Packed once per
        # tile into uint32 scratch; per-group `valid` masks are disjoint
        # across neighbor groups, so the integer accumulation in gather_at
        # never mixes live halves. Unpacked after the gathers. A fused splat
        # bump rounds to bf16 STORAGE before packing — exactly the jnp
        # fallback (and the reference, whose splat pass writes half-float dye
        # that the advection pass then reads, script.js:1287-1293).
        win_ref = scratch[0]
        raw = src_ref[:]
        if with_splats:
            raw = bumped(raw, 0, win).astype(jnp.bfloat16)
        if packed == "rgb9e5":
            # All three channels share ONE uint32 plane (shared-exponent
            # RGB9E5, ops/quant.py): 2 corner gathers per trip instead of 3,
            # and the staged window + per-trip roll shrink to one plane.
            from tpufluid.ops.quant import rgb9e5_pack

            pk = rgb9e5_pack(raw.astype(jnp.float32))[None]
        else:
            # Full channel pairs share a plane (both channels at one corner
            # per gather); an odd trailing channel packs its own COLUMN pair
            # instead (both corners in one gather — it skips the x1 gather
            # entirely, cutting the 3-channel dye's gathers 4 -> 3 per trip).
            cp = (channels + 1) // 2
            pk = jnp.stack([
                _pack_bf16(raw[2 * k], raw[2 * k + 1])
                if 2 * k + 1 < channels else _pack_bf16_xpair(raw[2 * k])
                for k in range(cp)])
        if col_halo:
            pk = pltpu.roll(pk, jnp.mod(lane_off - coff, cbw), axis=2)
        win_ref[:] = pk

        def load2(al):
            return win_ref[:, pl.ds(al, nrk), :]
    elif col_halo:
        # Column-window mode: lane-align the window once so the target block
        # sits at lane offset col_halo regardless of edge clamping, staged
        # in f32 VMEM scratch (refs support the gather loop's dynamic row
        # slicing; bf16 upcasts here — rotate/gather are 32-bit ops). The
        # bump rides the staging (pre-roll coords).
        win_ref = scratch[0]
        win_ref[:] = pltpu.roll(bumped(src_ref[:], 0, win).astype(jnp.float32),
                                jnp.mod(lane_off - coff, cbw), axis=2)

        def load2(al):
            return win_ref[:, pl.ds(al, nrk), :]
    else:
        def load2(al):
            return bumped(src_ref[:, pl.ds(al, nrk), :], al, nrk)

    rows_local = lax.broadcasted_iota(jnp.int32, (r, cb), 0).astype(jnp.float32)
    cols_local = lax.broadcasted_iota(jnp.int32, (r, cb), 1).astype(jnp.float32)

    vel_u = vel_ref[0].astype(jnp.float32)
    vel_v = vel_ref[1].astype(jnp.float32)

    # Aligned-window coords: global x = j*cb + local - dt*u; aligned local
    # x = global - j*cb + lane_off (the staging roll puts the target block at
    # lane_off — see lane_window_plan).
    x_local = cols_local + jnp.float32(lane_off) - dt * vel_u
    yp = rows_local + roff - dt * vel_v

    # Global CLAMP_TO_EDGE bounds in aligned-window coords.
    jcb = (j * cb).astype(jnp.float32)
    x_lo = jnp.maximum(jnp.float32(lane_off) - jcb, 0.0)
    x_hi = jnp.minimum(jnp.float32(w_true - 1) - jcb + lane_off,
                       jnp.float32(cbw - 1))
    if sim_w:
        # Lane-packed fleet mode: each output lane's backtrace clamps at ITS
        # sim's walls (a wall every sim_w columns), never reading a foreign
        # sim's lanes with nonzero weight. The per-lane bounds only NARROW
        # the global window bounds, so the clamped sample stays between the
        # lane's own position and its unclamped backtrace — always inside
        # the statically planned gather window.
        gcol = lax.broadcasted_iota(jnp.int32, (1, cb), 1) + j * cb
        base = ((gcol // sim_w) * sim_w).astype(jnp.float32) - jcb \
            + jnp.float32(lane_off)
        x_lo = jnp.maximum(base, x_lo)
        x_hi = jnp.minimum(base + jnp.float32(sim_w - 1), x_hi)
    yp_hi = jnp.minimum(jnp.float32(win - 1),
                        jnp.float32(h_true - 1) - rstart.astype(jnp.float32))

    acc = _gather_stream(load2, channels, win, cbw, x_local, yp, x_lo, x_hi,
                         yp_hi, s_range, r, cb, align, packed=packed)
    out_ref[:] = (acc / (1.0 + dissipation * dt)).astype(out_ref.dtype)


def _gather_stream(load2, c, win, cbw, x_local, yp, x_lo, x_hi, yp_hi,
                   s_range, r, cb, align: int = SUBLANE, packed: bool = False):
    """Bilinear gather on an ALIGNED window ref: the staging roll puts the
    target block at a static lane offset chosen by lane_window_plan, so each
    output lane-group reads only from window groups g + s, s in s_range —
    2 TAAs per corner at the same-grid displacement bound instead of the
    legacy 3 (the span-halo plan).

    load2(al) -> (C, r+2*align, CBW): rows [al, al+r+2*align) of the staged
    window (al align-ed; align is the dtype's sublane tiling). Each loop trip
    slices those aligned rows (free address arithmetic on a ref), row-aligns
    them with ONE small sublane roll, and serves TWO consecutive row offsets
    (the second operand is a static shift of the same roll) — round 1 rolled
    the whole (r + 2*halo)-row window once per single offset. bf16 loads
    upcast in-register before the 32-bit-only rotate/gather ops. Rows
    wrapped by the alignment roll only ever combine with exactly-zero
    bilinear weights."""
    x_local = jnp.clip(x_local, x_lo, x_hi)
    x0 = jnp.floor(x_local)
    fx = (x_local - x0).astype(jnp.float32)
    x0i = x0.astype(jnp.int32)
    x1i = jnp.minimum((x0i + 1).astype(jnp.float32), x_hi).astype(jnp.int32)

    yp = jnp.clip(yp, 0.0, yp_hi)
    y0 = jnp.floor(yp)
    fy = (yp - y0).astype(jnp.float32)
    rows_local = lax.broadcasted_iota(jnp.int32, (r, cb), 0)
    y0_rel = y0.astype(jnp.int32) - rows_local

    oy_min = jnp.min(y0_rel)
    oy_max = jnp.max(y0_rel)

    n_groups_out = cb // LANE
    n_groups_win = cbw // LANE

    def gather_at(idx, rows_op, n_planes):
        out = []
        for g_out in range(n_groups_out):
            sl = slice(g_out * LANE, (g_out + 1) * LANE)
            idx_g = idx[:, sl]
            acc = jnp.zeros((n_planes, r, LANE), dtype=rows_op.dtype)
            for s in range(s_range[0], s_range[1] + 1):
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

    unroll = _trip_unroll(win, r, align)
    nrk = r + unroll * align

    def sub_body(oy, rows_op, acc):
        cp = rows_op.shape[0]
        # trailing channel col-paired (its x1 corner is its own upper half)
        odd = packed in ("pairs", "f16") and c % 2 == 1
        g0 = gather_at(x0i, rows_op, cp)
        g1 = gather_at(x1i, rows_op, cp - 1 if odd else cp)
        if packed == "rgb9e5":
            g0, g1 = _corners_from_rgb9e5(g0, g1)
        elif packed == "f16":
            g0, g1 = _corners_from_packed_f16(g0, g1, c)
        elif packed:
            g0, g1 = _corners_from_packed(g0, g1, c)
        gx = g0.astype(jnp.float32) * (1.0 - fx)[None] + g1.astype(jnp.float32) * fx[None]
        wgt = (jnp.where(y0_rel == oy, 1.0 - fy, 0.0)
               + jnp.where(y0_rel == oy - 1, fy, 0.0))
        return acc + gx * wgt[None]

    def body(k, acc):
        # SEVERAL row offsets per trip: the oy+d operands are free static
        # shifts of the same rolled slice, dividing loop entries, loads and
        # rolls (the dynamic-bound fori's entry overhead measured comparable
        # to a trip's gather work). Past-the-end offsets multiply zeros.
        oy = oy_min + unroll * k
        al = pl.multiple_of(jnp.clip((oy // align) * align, 0, win - nrk),
                            align)
        op = load2(al)
        if not packed:
            op = op.astype(jnp.float32)
        rolled = pltpu.roll(op, jnp.mod(al - oy, nrk), axis=1)
        for d in range(unroll):
            acc = sub_body(oy + d, rolled[:, d:r + d, :], acc)
        return acc

    acc = jnp.zeros((c, r, cb), dtype=jnp.float32)
    n_trips = (oy_max + 2 - oy_min + unroll - 1) // unroll
    return lax.fori_loop(0, n_trips, body, acc)


def advect_pallas(velocity: jnp.ndarray, source: jnp.ndarray, dt,
                  dissipation: float, rows_per_block: int = 0,
                  true_shape=None, halo: int = HALO, span: int = 1,
                  splat=None, max_disp_x=None, quant=None,
                  f16c: int = 0, sim_w: int = 0) -> jnp.ndarray:
    """Same-grid semi-Lagrangian advection. velocity (2,H,W) in *source-grid
    texels/second*; source (C,H,W) or (H,W) on the SAME grid.

    halo/span size the row halo and lane-group gather span for the maximum
    backtrace displacement in source texels (halo_for_displacement /
    group_span_for_displacement); the defaults cover the same-grid bound.
    max_disp_x (source texels) tightens the column-gather group plan below
    the span worst case (lane_window_plan); None keeps the legacy plan.
    splat: optional (gy (H,S), gx (S,W), amt (S,C)) separable splat factors
    added to the source in-kernel before sampling (one MXU bump per window
    instead of a separate full-grid splat pass).
    f16c > 0: float16 mode — ``source`` is the PRE-PACKED (ceil(f16c/2),H,W)
    uint32 plane stack of an (f16c,H,W) float16 field (ops/quant.
    f16_pack_planes); output is float32 (caller rounds to f16 storage at the
    pass boundary, exactly where the reference's half-float FBO write rounds,
    script.js:145-153). Splats must be pre-applied (Mosaic has no f16 refs,
    so the bump cannot ride the in-kernel pack as it does for bf16)."""
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
    halo = round_up(halo, align)
    rows, cols = _pick_tile(h, w, c, src.dtype.itemsize, halo, span)
    if rows_per_block:
        rows = rows_per_block
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

    win = rows + 2 * halo
    cbw = cols + 2 * col_halo

    def vel_idx(i, j):
        return (0, i * rows, j * cols)

    def src_idx(i, j):
        rs = jnp.clip(i * rows - halo, 0, h - win)
        rs = pl.multiple_of(rs, align)
        if col_halo:
            cs = jnp.clip(j * cols - col_halo, 0, w - cbw)
            cs = pl.multiple_of(cs, LANE)
        else:
            cs = j * cols
        return (0, rs, cs)

    with_splats = splat is not None
    # Channel-packed gathers: bf16 sources gather ceil(C/2) uint32 planes
    # instead of C ("pairs"), or ONE shared-exponent RGB9E5 plane for the
    # 3-channel dye when quant requests it ("rgb9e5", ops/quant.py); fused
    # splat bumps round to bf16 storage at staging (matching the jnp
    # fallback's (src + bump).astype(dtype)).
    packed = False
    if f16c:
        packed = "f16"
    elif src.dtype == jnp.bfloat16 and c > 1:
        packed = "rgb9e5" if (quant == "rgb9e5" and c == 3) else "pairs"
    n_planes = 1 if packed == "rgb9e5" else (c + 1) // 2
    lane_off, s_lo, s_hi = lane_window_plan(max_disp_x, span, cols, cbw)
    kernel = functools.partial(
        _advect_kernel, dissipation=float(dissipation),
        rows=rows, cols=cols, h_global=h, w_global=w, channels=c,
        h_true=true_shape[0], w_true=true_shape[1],
        halo=halo, span=span, col_halo=col_halo, align=align,
        with_splats=with_splats, packed=packed,
        lane_off=lane_off, s_range=(s_lo, s_hi), sim_w=sim_w,
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((_Element(2, (0, 0)), _Element(rows), _Element(cols)),
                     vel_idx, memory_space=pltpu.VMEM),
        pl.BlockSpec((_Element(src.shape[0], (0, 0)), _Element(win),
                      _Element(cbw)),
                     src_idx, memory_space=pltpu.VMEM),
    ]
    args = [dt_arr, velocity, src]
    if with_splats:
        gy, gx, amt = splat
        in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3
        args += [gy, gx, amt]
    out = pl.pallas_call(
        kernel,
        grid=(n_r, n_c),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((c, rows, cols), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        # f16 mode outputs f32 (Mosaic has no f16 stores; the caller rounds
        # to f16 storage at the pass boundary like the reference's FBO write).
        out_shape=jax.ShapeDtypeStruct(
            (c, h, w), jnp.float32 if packed == "f16" else src.dtype),
        # Staged modes keep the window 32-bit (dynamic rotate/gather are
        # 32-bit-only in this Mosaic): channel-packed uint32 planes for
        # splat-free bf16 and pre-packed f16 (the latter stages only when a
        # lane-alignment roll is needed), f32 otherwise.
        scratch_shapes=(
            [pltpu.VMEM((n_planes, win, cbw), jnp.uint32)]
            if (packed and (packed != "f16" or col_halo))
            else [pltpu.VMEM((c, win, cbw), jnp.float32)]
            if (col_halo and not packed)
            else []),
        cost_estimate=pl.CostEstimate(
            flops=50 * c * h * w,
            bytes_accessed=(3 * c + 2) * h * w * src.dtype.itemsize,
            transcendentals=0,
        ),
    )(*args)
    return out[0] if squeeze else out
