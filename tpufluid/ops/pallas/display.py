"""Fused display Pallas kernel: resample + shading + composite.

The display shader samples the dye bilinearly at the target's texel centers
and, with SHADING, at four 1-display-texel neighbor offsets whose norms drive
a diffuse term; it then multiplies in the sunrays texture, adds the dithered
gamma-encoded bloom, and sets alpha = max(r,g,b) (displayShaderSource,
/root/reference/script.js:549-612; drawDisplay binds texelSize = 1/target
size, script.js:1336-1340). The jnp path (ops/display.py) lowers each
bilinear tap to XLA takes, which transpose the taken axis to the front and
pay full-size layout copies back, plus a VMEM prefetch of the whole dye in
two layouts — measured ~1.35 ms of the 2.1 ms config-2 frame, with another
~0.4 ms of display-resolution bloom/sunrays/dither sampling and the gamma
pow (out/jaxtrace_render2/3). This kernel reads each source row window ONCE
per output row tile and emits the finished premultiplied RGBA block:

  * 1-D grid over output row tiles; every source (dye, bloom, sunrays)
    enters through an IN-BOUNDS clamped row window (full width — the lane
    dim needs no 128 alignment because no lane rolls touch it; gather tails
    are mask-guarded). Window starts use pure integer arithmetic so the
    BlockSpec index_maps and the kernel body agree exactly.
  * Sampling coordinates enter as DATA, not in-kernel math: the (i0, i1, f)
    plans come from sampling.affine_axis_plan — the same code path the jnp
    oracle uses — because in-kernel recomputation can differ by an ulp (FMA
    fusion), which a 1024-scale coordinate amplifies to ~1e-4 in texel
    space. Plans are packed into lane-/sublane-sliceable arrays that XLA
    constant-folds per configuration.
  * Row stage per source: all its v-taps' bilinear row mixes ride ONE
    shared offset loop (the advect trick, ops/pallas/advect.py): each trip
    slices rows+unroll*align window rows, row-aligns them with one small
    sublane roll, and serves ``unroll`` consecutive row offsets,
    accumulating into a VMEM scratch of (row-tap, C*R, W_pad) planes. The
    64x64 dither tile is the exception: its REPEAT-wrapped row indices are
    non-monotone, so its row stage is done OUTSIDE in XLA (a (out_h, 64)
    take — tiny) and enters as a pre-staged input block.
  * Column stage: per output 128-lane group, a static gather plan reads the
    2-3 source lane groups its span touches with tpu.dynamic_gather; the C
    channels of a row-tap are stacked along sublanes so ONE gather serves
    all channels.
  * Shading norms, the diffuse clamp, the sunrays multiply, the dithered
    gamma bloom add and alpha=max(rgb) happen in-register.

Boundary semantics: plans clamp corner indices to [0, N-1] (CLAMP_TO_EDGE,
script.js:1051-1052; REPEAT for the dither, script.js:1133-1134) exactly as
the jnp path does. Background blending stays outside (one fused XLA op).

Semantics match ops.display.display_composite (the oracle); verified in
interpret mode by tests/test_pallas.py and on device by tests/test_tpu.py.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpufluid.ops.pallas.common import Element as _Element
from tpufluid.ops.pallas.common import LANE, SUBLANE, round_up
from tpufluid.ops.sampling import affine_axis_plan

_VMEM_BUDGET = 10 * 1024 * 1024
_UNROLL = 2


def _v_offsets(out_h: int, shading: bool):
    """The display's row-tap v offsets: center, +ty, -ty (script.js:571-574)."""
    ty = np.float32(1.0) / np.float32(out_h)
    return (np.float32(0.0), ty, -ty) if shading else (np.float32(0.0),)


def _u_offsets(out_w: int, shading: bool):
    tx = np.float32(1.0) / np.float32(out_w)
    return (np.float32(0.0), -tx, tx) if shading else (np.float32(0.0),)


def _pick_rows(out_h: int) -> int:
    """Output rows per tile: total row-stage work scales with
    tiles*(offset span + tap overhead), so prefer small tiles; window DMA
    amplification caps how small (>= 16 keeps it under ~1.5x)."""
    best = 0
    for r in range(SUBLANE, out_h + 1, SUBLANE):
        if out_h % r:
            continue
        best = r
        if r >= 16:
            break
    return best


def _margin(h: int, out_h: int) -> int:
    """Integer slack covering the taps' +/-ty reach, the bilinear corner and
    any ulp wiggle of the fp plans around the integer start estimate."""
    return -(-h // out_h) + 3


def _row_plan(h: int, out_h: int, rows: int) -> Optional[Tuple[int, int]]:
    """(window_rows, unroll), or None if the source is too short for the
    streaming slices (tiny upsample-only shapes -> jnp fallback).
    ``h`` is the TRUE source height; the window must fit its row-padded
    extent round_up(h, SUBLANE)."""
    m = _margin(h, out_h)
    # Window must span [lo(t), hi(t)] for every tile t (see _row_start):
    # hi - lo <= ((rows-1)*h)//out_h + 2*m + 1, plus the align-down slack.
    reach = ((rows - 1) * h) // out_h + 2 * m + 2 + SUBLANE
    for unroll in (_UNROLL, 1):
        win = round_up(max(reach, rows + unroll * SUBLANE + SUBLANE), SUBLANE)
        if win <= round_up(h, SUBLANE):
            return win, unroll
    return None


def _row_start(t, rows: int, h: int, out_h: int, win: int):
    """Clamped window start row for tile t — integer arithmetic only, so the
    BlockSpec index_map and the kernel body agree bit-for-bit.

    ``h`` is the TRUE source height (the coordinate ratio); the clip's upper
    bound comes from the row-PADDED extent, because h - win must itself be
    8-aligned or the multiple_of promise to Mosaic is a lie — the silent
    miscompile that broke the 196-row sunrays source before callers
    edge-padded ragged row counts."""
    lo = (t * rows * h) // out_h - _margin(h, out_h)
    lo = (lo // SUBLANE) * SUBLANE
    return pl.multiple_of(jnp.clip(lo, 0, round_up(h, SUBLANE) - win), SUBLANE)


def _np_col_groups(w_in: int, out_w: int, off_u: float, scale: float = 1.0,
                   wrap: bool = False):
    """Static per-output-group list of source lane groups its span touches,
    with +/-1 slack so an ulp flip in the fp plan stays covered."""
    if wrap:  # only the 64-wide dither uses wrap: a single source group
        assert w_in <= LANE
        return [[0]] * (out_w // LANE)
    u = ((np.arange(out_w, dtype=np.float32) + np.float32(0.5))
         / np.float32(out_w) * np.float32(scale) + np.float32(off_u))
    x = u * np.float32(w_in) - np.float32(0.5)
    i0 = np.clip(np.floor(x).astype(np.int64), 0, w_in - 1)
    groups = []
    n_win_groups = -(-w_in // LANE)
    for g in range(out_w // LANE):
        sl = i0[g * LANE:(g + 1) * LANE]
        g_lo = max(0, (int(sl.min()) - 1) // LANE)
        g_hi = min(n_win_groups - 1, (int(sl.max()) + 2) // LANE)
        groups.append(list(range(g_lo, g_hi + 1)))
    return groups


def _pack_source_plans(h: int, w: int, out_h: int, out_w: int,
                       v_offs, u_offs, su: float = 1.0, sv: float = 1.0,
                       wrap: bool = False):
    """rowplan (out_h, LANE) f32 with lane 3*tap+k = [i0, i1, f][k] per
    v-tap; colplan (16, out_w) f32 with row 3*tap+k likewise per u-tap.
    Indices stored as f32 (exact below 2^24); XLA constant-folds both."""
    rowplan = jnp.zeros((out_h, LANE), jnp.float32)
    for tap, ov in enumerate(v_offs):
        i0, i1, f = affine_axis_plan(h, out_h, scale=sv, off=float(ov),
                                     wrap=wrap)
        for k, vec in enumerate((i0.astype(jnp.float32),
                                 i1.astype(jnp.float32), f)):
            rowplan = rowplan.at[:, 3 * tap + k].set(vec)
    colplan = jnp.zeros((2 * SUBLANE, out_w), jnp.float32)
    for tap, ou in enumerate(u_offs):
        i0, i1, f = affine_axis_plan(w, out_w, scale=su, off=float(ou),
                                     wrap=wrap)
        for k, vec in enumerate((i0.astype(jnp.float32),
                                 i1.astype(jnp.float32), f)):
            colplan = colplan.at[3 * tap + k, :].set(vec)
    return rowplan, colplan


def _fill_row_stage(src_ref, scr_ref, rowp_ref, *, t, c: int, rows: int,
                    h: int, w: int, out_h: int, win: int, unroll: int,
                    n_vtaps: int):
    """Run one source's shared offset loop, writing its row-stage scratch."""
    start = _row_start(t, rows, h, out_h, win)
    z0s, z1s, fys = [], [], []
    rows_iota = lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    for tap in range(n_vtaps):
        i0 = rowp_ref[:, 3 * tap:3 * tap + 1].astype(jnp.int32)
        i1 = rowp_ref[:, 3 * tap + 1:3 * tap + 2].astype(jnp.int32)
        z0s.append(i0 - start - rows_iota)
        z1s.append(i1 - start - rows_iota)
        fys.append(rowp_ref[:, 3 * tap + 2:3 * tap + 3])
    # Full reductions, not endpoints: the edge clamp breaks monotonicity on
    # the first/last tiles. Once per tile, so the scalar cost is irrelevant.
    oy_min = functools.reduce(jnp.minimum, [jnp.min(z) for z in z0s])
    oy_max = functools.reduce(jnp.maximum, [jnp.max(z) for z in z1s])

    scr_ref[...] = jnp.zeros(scr_ref.shape, scr_ref.dtype)
    nrk = rows + unroll * SUBLANE

    two_d = len(src_ref.shape) == 2  # single-channel sources skip the
    # leading block dim entirely (a size-1 Element dim miscompiled).

    def body(k, carry):
        oy = oy_min + unroll * k
        al = pl.multiple_of(
            jnp.clip((oy // SUBLANE) * SUBLANE, 0, win - nrk), SUBLANE)
        if two_d:
            op = src_ref[pl.ds(al, nrk), :].astype(jnp.float32)[None]
        else:
            op = src_ref[:, pl.ds(al, nrk), :].astype(jnp.float32)
        rolled = pltpu.roll(op, jnp.mod(al - oy, nrk), axis=1)
        for d in range(unroll):
            cur = oy + d
            for tap in range(n_vtaps):
                fy = fys[tap]
                wgt = (jnp.where(z0s[tap] == cur, 1.0 - fy, 0.0)
                       + jnp.where(z1s[tap] == cur, fy, 0.0))
                for ch in range(c):
                    sl = slice(ch * rows, (ch + 1) * rows)
                    scr_ref[tap, sl, :w] += rolled[ch, d:rows + d, :] * wgt
        return carry

    n_trips = (oy_max + 1 - oy_min + unroll - 1) // unroll
    lax.fori_loop(0, n_trips, body, jnp.float32(0.0))


def _col_sample(scr_ref, colp_ref, groups, *, row_tap: int, u_tap: int,
                c: int, rows: int, out_w: int):
    """(C*R, out_w) bilinear column sample of one row-tap scratch plane."""
    i0 = colp_ref[3 * u_tap:3 * u_tap + 1, :].astype(jnp.int32)
    i1 = colp_ref[3 * u_tap + 1:3 * u_tap + 2, :].astype(jnp.int32)
    fx = colp_ref[3 * u_tap + 2:3 * u_tap + 3, :]
    parts = []
    for g in range(out_w // LANE):
        sl = slice(g * LANE, (g + 1) * LANE)
        acc = None
        for idx, wgt in ((i0[:, sl], 1.0 - fx[:, sl]), (i1[:, sl], fx[:, sl])):
            # Mosaic cannot vector.broadcast a 1-sublane slice to the gather
            # height; pltpu.repeat materializes it (i32 only: bool vregs
            # cannot be repeated, so masks derive from the repeated index).
            wgt_b = pltpu.repeat(wgt, c * rows, axis=0)
            corner = None
            for gg in groups[g]:
                if row_tap is None:
                    op = scr_ref[:, gg * LANE:(gg + 1) * LANE]
                else:
                    op = scr_ref[row_tap, :, gg * LANE:(gg + 1) * LANE]
                local_b = pltpu.repeat(idx - gg * LANE, c * rows, axis=0)
                idx_b = jnp.clip(local_b, 0, LANE - 1)
                v = jnp.take_along_axis(op, idx_b, axis=1)
                if len(groups[g]) > 1:
                    ok = (local_b >= 0) & (local_b < LANE)
                    v = jnp.where(ok, v, 0.0)
                corner = v if corner is None else corner + v
            acc = corner * wgt_b if acc is None else acc + corner * wgt_b
        parts.append(acc)
    return jnp.concatenate(parts, axis=-1)


def _linear_to_gamma(color):
    """max(1.055 * c^(1/2.4) - 0.055, 0) (script.js:563-566)."""
    color = jnp.maximum(color, 0.0)
    return jnp.maximum(1.055 * jnp.power(color, 0.416666667) - 0.055, 0.0)


def _kernel(*refs, c: int, rows: int, h: int, w: int, out_h: int, out_w: int,
            win: int, unroll: int, shading: bool, compose: bool,
            bloom_hw, sunrays_hw, with_dither: bool):
    t = pl.program_id(0)
    it = iter(refs)
    tex_ref, rowp_ref, colp_ref = next(it), next(it), next(it)
    bloom = bloom_hw is not None
    rays = sunrays_hw is not None
    if bloom:
        bl_ref, bl_rowp, bl_colp = next(it), next(it), next(it)
    if rays:
        sr_ref, sr_rowp, sr_colp = next(it), next(it), next(it)
    if with_dither:
        di_rows_ref, di_colp = next(it), next(it)
    out_ref = next(it)
    t_scr = next(it)
    if bloom:
        bl_scr = next(it)
    if rays:
        sr_scr = next(it)

    n_vtaps = 3 if shading else 1
    _fill_row_stage(tex_ref, t_scr, rowp_ref, t=t, c=c, rows=rows, h=h, w=w,
                    out_h=out_h, win=win, unroll=unroll, n_vtaps=n_vtaps)
    dye_groups = [
        _np_col_groups(w, out_w, float(ou))
        for ou in _u_offsets(out_w, shading)]
    col = functools.partial(_col_sample, t_scr, colp_ref,
                            c=c, rows=rows, out_w=out_w)

    cc = col(dye_groups[0], row_tap=0, u_tap=0)
    if shading:
        def norm(x):
            s = x[:rows] * x[:rows]
            for ch in range(1, c):
                s = s + x[ch * rows:(ch + 1) * rows] ** 2
            return jnp.sqrt(s)

        n_l = norm(col(dye_groups[1], row_tap=0, u_tap=1))
        n_r = norm(col(dye_groups[2], row_tap=0, u_tap=2))
        n_t = norm(col(dye_groups[0], row_tap=1, u_tap=0))
        n_b = norm(col(dye_groups[0], row_tap=2, u_tap=0))
        dx = n_r - n_l
        dy = n_t - n_b
        tx = np.float32(1.0) / np.float32(out_w)
        ty = np.float32(1.0) / np.float32(out_h)
        nz = np.float32(np.sqrt(np.float32(tx * tx) + np.float32(ty * ty)))
        # 1/sqrt, not rsqrt: both correctly rounded, matching the jnp oracle.
        inv_len = 1.0 / jnp.sqrt(dx * dx + dy * dy + nz * nz)
        diffuse = jnp.clip(nz * inv_len + 0.7, 0.7, 1.0)
        cs = [cc[ch * rows:(ch + 1) * rows] * diffuse for ch in range(c)]
    else:
        cs = [cc[ch * rows:(ch + 1) * rows] for ch in range(c)]

    if not compose:
        for ch in range(c):
            out_ref[ch] = cs[ch]
        return

    # --- Composite (display shader order, script.js:586-609). ---
    bls = None
    if bloom:
        bh, bw = bloom_hw
        bwin, bunroll = _row_plan(bh, out_h, rows)
        _fill_row_stage(bl_ref, bl_scr, bl_rowp, t=t, c=3, rows=rows, h=bh,
                        w=bw, out_h=out_h, win=bwin, unroll=bunroll, n_vtaps=1)
        bl = _col_sample(bl_scr, bl_colp, _np_col_groups(bw, out_w, 0.0),
                         row_tap=0, u_tap=0, c=3, rows=rows, out_w=out_w)
        bls = [bl[ch * rows:(ch + 1) * rows] for ch in range(3)]
    if rays:
        sh_, sw_ = sunrays_hw
        swin, sunroll = _row_plan(sh_, out_h, rows)
        _fill_row_stage(sr_ref, sr_scr, sr_rowp, t=t, c=1, rows=rows, h=sh_,
                        w=sw_, out_h=out_h, win=swin, unroll=sunroll, n_vtaps=1)
        r = _col_sample(sr_scr, sr_colp, _np_col_groups(sw_, out_w, 0.0),
                        row_tap=0, u_tap=0, c=1, rows=rows, out_w=out_w)
        cs = [x * r for x in cs]
        if bls is not None:
            bls = [x * r for x in bls]
    if bls is not None:
        if with_dither:
            # Row stage precomputed outside (REPEAT row indices are
            # non-monotone); only the wrapped column gather runs here.
            noise = _col_sample(di_rows_ref, di_colp,
                                _np_col_groups(64, out_w, 0.0, wrap=True),
                                row_tap=None, u_tap=0, c=1, rows=rows,
                                out_w=out_w)
            bls = [x + (noise * 2.0 - 1.0) / 255.0 for x in bls]
        bls = [_linear_to_gamma(x) for x in bls]
        cs = [x + b for x, b in zip(cs, bls)]

    a = cs[0]
    for x in cs[1:]:
        a = jnp.maximum(a, x)
    for ch in range(c):
        out_ref[ch] = cs[ch]
    out_ref[c] = a


def supported(tex_shape: Tuple[int, ...], out_hw: Tuple[int, int],
              shading: bool, itemsize: int = 4,
              bloom_hw=None, sunrays_hw=None) -> bool:
    if itemsize != 4 or len(tex_shape) != 3:
        return False
    c, h, w = tex_shape
    out_h, out_w = out_hw
    if out_w % LANE or out_h % SUBLANE or c < 1 or c > 4:
        return False
    rows = _pick_rows(out_h)
    if rows == 0:
        return False
    vmem = 4 * (c * rows * out_w + 6 * rows * out_w)  # out + temporaries
    for (sh_, sw_), cc_, taps in (((h, w), c, 3 if shading else 1),
                                  (bloom_hw or (0, 0), 3, 1),
                                  (sunrays_hw or (0, 0), 1, 1)):
        if sh_ == 0:
            continue
        plan = _row_plan(sh_, out_h, rows)
        if plan is None:
            return False
        wp = round_up(sw_, LANE)
        vmem += 4 * (cc_ * plan[0] * wp + taps * cc_ * rows * wp)
    return vmem <= _VMEM_BUDGET


def display_pallas(tex: jnp.ndarray, out_hw: Tuple[int, int], shading: bool,
                   bloom_tex: Optional[jnp.ndarray] = None,
                   sunrays_tex: Optional[jnp.ndarray] = None,
                   dither_tex: Optional[jnp.ndarray] = None,
                   compose: bool = True,
                   rows_per_block: int = 0) -> jnp.ndarray:
    """Fused display pass over ``tex`` (C, H, W) f32.

    compose=True -> (C+1, out_h, out_w) premultiplied RGBA display (bloom /
    sunrays / dither applied, alpha = max over channels) ready for the
    background blend. compose=False -> (C, out_h, out_w) shaded center only
    (the resample+shading subset). Equals ops.display's jnp math."""
    c, h, w = tex.shape
    out_h, out_w = out_hw
    rows = rows_per_block or _pick_rows(out_h)
    plan = _row_plan(h, out_h, rows) if rows else None
    if plan is None or out_w % LANE or out_h % rows:
        raise ValueError(f"unsupported display resample {tex.shape}->{out_hw}")
    win, unroll = plan

    def pad_rows(x):
        """Edge-pad rows to the sublane multiple: keeps every dynamic window
        start 8-aligned (see _row_start) and is value-exact — the plans'
        clamped indices never exceed the true extent, and edge rows equal
        CLAMP_TO_EDGE reads."""
        hh = x.shape[-2]
        hp = round_up(hh, SUBLANE)
        if hp == hh:
            return x
        pad = [(0, 0)] * (x.ndim - 2) + [(0, hp - hh), (0, 0)]
        return jnp.pad(x, pad, mode="edge")

    rowplan, colplan = _pack_source_plans(
        h, w, out_h, out_w, _v_offsets(out_h, shading),
        _u_offsets(out_w, shading))

    zero = np.float32(0.0)
    args = [pad_rows(tex), rowplan, colplan]
    in_specs = [
        pl.BlockSpec((_Element(c, (0, 0)), _Element(win), _Element(w)),
                     lambda t: (0, _row_start(t, rows, h, out_h, win), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rows, LANE), lambda t: (t, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((2 * SUBLANE, out_w), lambda t: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    n_taps = 3 if shading else 1
    scratch = [pltpu.VMEM((n_taps, c * rows, round_up(w, LANE)), jnp.float32)]

    bloom_hw = sunrays_hw = None
    if compose and bloom_tex is not None:
        bh, bw = bloom_tex.shape[-2:]
        bloom_hw = (bh, bw)
        bwin, _ = _row_plan(bh, out_h, rows)
        brp, bcp = _pack_source_plans(bh, bw, out_h, out_w, (zero,), (zero,))
        args += [pad_rows(bloom_tex), brp, bcp]
        in_specs += [
            pl.BlockSpec((_Element(3, (0, 0)), _Element(bwin), _Element(bw)),
                         lambda t, _b=bh, _w=bwin: (
                             0, _row_start(t, rows, _b, out_h, _w), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, LANE), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * SUBLANE, out_w), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        scratch.append(
            pltpu.VMEM((1, 3 * rows, round_up(bw, LANE)), jnp.float32))
    if compose and sunrays_tex is not None:
        sh_, sw_ = sunrays_tex.shape[-2:]
        sunrays_hw = (sh_, sw_)
        swin, _ = _row_plan(sh_, out_h, rows)
        srp, scp = _pack_source_plans(sh_, sw_, out_h, out_w, (zero,), (zero,))
        args += [pad_rows(sunrays_tex.reshape(sh_, sw_)), srp, scp]
        in_specs += [
            pl.BlockSpec((_Element(swin), _Element(sw_)),
                         lambda t, _s=sh_, _w=swin: (
                             _row_start(t, rows, _s, out_h, _w), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, LANE), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * SUBLANE, out_w), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        scratch.append(
            pltpu.VMEM((1, rows, round_up(sw_, LANE)), jnp.float32))
    with_dither = compose and bloom_tex is not None and dither_tex is not None
    if with_dither:
        from tpufluid.ops.sampling import sample_affine_axis

        dh, dw = dither_tex.shape[-2:]
        scale_y = out_h / dh
        scale_x = out_w / dw
        # Row stage outside: REPEAT indices are non-monotone (uDithering is
        # tiled at ditherScale = target/texture size, script.js:1626-1631).
        # Tiled to a full 128-lane operand for the in-kernel column gather.
        di_rows = sample_affine_axis(dither_tex.astype(jnp.float32), out_h,
                                     axis=-2, scale=scale_y, wrap=True)
        di_rows = jnp.tile(di_rows, (1, -(-LANE // dw)))[:, :LANE]
        _, dcp = _pack_source_plans(dh, dw, out_h, out_w, (zero,), (zero,),
                                    su=scale_x, wrap=True)
        args += [di_rows, dcp]
        in_specs += [
            pl.BlockSpec((rows, LANE), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * SUBLANE, out_w), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ]

    out_c = c + 1 if compose else c
    kernel = functools.partial(
        _kernel, c=c, rows=rows, h=h, w=w, out_h=out_h, out_w=out_w,
        win=win, unroll=unroll, shading=shading, compose=compose,
        bloom_hw=bloom_hw, sunrays_hw=sunrays_hw, with_dither=with_dither)

    return pl.pallas_call(
        kernel,
        grid=(out_h // rows,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((out_c, rows, out_w), lambda t: (0, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((out_c, out_h, out_w), jnp.float32),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=(40 if shading else 12) * c * out_h * out_w,
            bytes_accessed=4 * (c * h * w + (c + 1) * out_h * out_w),
            transcendentals=3 * out_h * out_w if bloom_hw else 0,
        ),
    )(*args)


def resample_shade_pallas(tex: jnp.ndarray, out_hw: Tuple[int, int],
                          shading: bool,
                          rows_per_block: int = 0) -> jnp.ndarray:
    """Bilinear-resample ``tex`` (C, H, W) f32 to (C, out_h, out_w) at the
    target's texel centers and, with ``shading``, apply the display shader's
    diffuse term (script.js:578-584). Equals ops.display's jnp tap math."""
    return display_pallas(tex, out_hw, shading, compose=False,
                          rows_per_block=rows_per_block)
