"""Fused display resample + shading Pallas kernel.

The display shader samples the dye bilinearly at the target's texel centers
and, with SHADING, at four 1-display-texel neighbor offsets whose norms drive
a diffuse term (displayShaderSource, /root/reference/script.js:549-612;
drawDisplay binds texelSize = 1/target size, script.js:1336-1340). The jnp
path (ops/display.py) lowers each tap to XLA takes, which transpose the taken
axis to the front and pay full-size layout copies back, plus a VMEM prefetch
of the whole dye in two layouts — measured ~1.35 ms of the 2.1 ms config-2
frame (out/jaxtrace_render2). This kernel reads each dye row window ONCE and
produces the shaded center directly:

  * 1-D grid over output row tiles; the dye enters through an IN-BOUNDS
    clamped row window (full width — the lane dim needs no 128 alignment
    because no lane rolls touch it; the gather tail is mask-guarded). Window
    starts use pure integer arithmetic so the BlockSpec index_map and the
    kernel body agree exactly.
  * Sampling coordinates enter as DATA, not in-kernel math: the (i0, i1, f)
    plans are computed outside with sampling.affine_axis_plan — the same
    code path the jnp oracle uses — because recomputing them in-kernel can
    differ by an ulp (FMA fusion), which a 1024-scale coordinate amplifies
    to ~1e-4 in texel space. The plans are packed into lane-/sublane-
    sliceable arrays that XLA constant-folds per configuration.
  * Row stage: every v-tap's bilinear row mix rides ONE shared offset loop
    (the advect trick, ops/pallas/advect.py): each trip slices rows+2*align
    window rows, row-aligns them with one small sublane roll, and serves two
    consecutive row offsets; the three v-taps (v, v+ty, v-ty) consume the
    same rolled slice with per-corner hat weights, accumulating into a VMEM
    scratch of (row-tap, C*R, W_pad) planes.
  * Column stage: per output 128-lane group, a static gather plan (the
    coordinate map is affine and known at trace time) reads the 2-3 source
    lane groups its span touches with tpu.dynamic_gather; the C channels of
    a row-tap are stacked along sublanes so ONE gather serves all channels.
  * Shading norms, the diffuse clamp and the center multiply happen
    in-register; output is the shaded (C, R, out_w) center block.

Boundary semantics: plans clamp corner indices to [0, N-1]
(CLAMP_TO_EDGE, script.js:1051-1052) exactly as the jnp path does.

Semantics match ops.display.display_composite's tap math (the oracle);
verified in interpret mode by tests/test_pallas.py and on device by
tests/test_tpu.py.
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


def _row_plan(h: int, out_h: int, rows: int,
              shading: bool) -> Optional[Tuple[int, int]]:
    """(window_rows, unroll), or None if the source is too short for the
    streaming slices (tiny upsample-only shapes -> jnp fallback)."""
    m = _margin(h, out_h)
    # Window must span [lo(t), hi(t)] for every tile t (see _row_start):
    # hi - lo <= ((rows-1)*h)//out_h + 2*m + 1, plus the align-down slack.
    reach = ((rows - 1) * h) // out_h + 2 * m + 2 + SUBLANE
    for unroll in (_UNROLL, 1):
        win = round_up(max(reach, rows + unroll * SUBLANE + SUBLANE), SUBLANE)
        if win <= h:
            return win, unroll
    return None


def _row_start(t, rows: int, h: int, out_h: int, win: int, shading: bool):
    """Clamped window start row for tile t — integer arithmetic only, so the
    BlockSpec index_map and the kernel body agree bit-for-bit."""
    lo = (t * rows * h) // out_h - _margin(h, out_h)
    lo = (lo // SUBLANE) * SUBLANE
    return pl.multiple_of(jnp.clip(lo, 0, h - win), SUBLANE)


def _np_col_groups(w_in: int, out_w: int, off_u: float):
    """Static per-output-group list of source lane groups its span touches,
    with +/-1 slack so an ulp flip in the fp plan stays covered."""
    u = ((np.arange(out_w, dtype=np.float32) + np.float32(0.5))
         / np.float32(out_w) + np.float32(off_u))
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


def supported(tex_shape: Tuple[int, ...], out_hw: Tuple[int, int],
              shading: bool, itemsize: int = 4) -> bool:
    if itemsize != 4 or len(tex_shape) != 3:
        return False
    c, h, w = tex_shape
    out_h, out_w = out_hw
    if out_w % LANE or out_h % SUBLANE or c < 1 or c > 4:
        return False
    rows = _pick_rows(out_h)
    if rows == 0 or _row_plan(h, out_h, rows, shading) is None:
        return False
    win, _ = _row_plan(h, out_h, rows, shading)
    wp = round_up(w, LANE)
    n_taps = 3 if shading else 1
    vmem = 4 * (c * win * wp                # input window
                + n_taps * c * rows * wp    # row-stage scratch
                + c * rows * out_w          # output block
                + 6 * rows * out_w)         # col-stage temporaries
    return vmem <= _VMEM_BUDGET


def _build_plans(h: int, w: int, out_h: int, out_w: int, shading: bool):
    """Pack the jnp-exact sampling plans into sliceable arrays.

    rowplan (out_h, LANE) f32: lane 3*tap+k holds [i0, i1, f][k] for v-tap
    ``tap`` (indices stored as f32 — exact below 2^24).
    colplan (16, out_w) f32: row 3*tap+k holds [i0, i1, f][k] for u-tap ``tap``.
    Both are shape-only functions of the config, so XLA constant-folds them.
    """
    rowplan = jnp.zeros((out_h, LANE), jnp.float32)
    for tap, ov in enumerate(_v_offsets(out_h, shading)):
        i0, i1, f = affine_axis_plan(h, out_h, off=float(ov))
        for k, vec in enumerate((i0.astype(jnp.float32),
                                 i1.astype(jnp.float32), f)):
            rowplan = rowplan.at[:, 3 * tap + k].set(vec)
    colplan = jnp.zeros((2 * SUBLANE, out_w), jnp.float32)
    for tap, ou in enumerate(_u_offsets(out_w, shading)):
        i0, i1, f = affine_axis_plan(w, out_w, off=float(ou))
        for k, vec in enumerate((i0.astype(jnp.float32),
                                 i1.astype(jnp.float32), f)):
            colplan = colplan.at[3 * tap + k, :].set(vec)
    return rowplan, colplan


def _kernel(tex_ref, rowp_ref, colp_ref, out_ref, t_ref, *, c: int, rows: int,
            h: int, w: int, out_h: int, out_w: int, win: int, unroll: int,
            shading: bool):
    t = pl.program_id(0)
    start = _row_start(t, rows, h, out_h, win, shading)
    n_vtaps = 3 if shading else 1

    # --- Row stage: shared offset loop over the v-taps' corner weights. ---
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

    t_ref[...] = jnp.zeros(t_ref.shape, t_ref.dtype)
    nrk = rows + unroll * SUBLANE

    def body(k, carry):
        oy = oy_min + unroll * k
        al = pl.multiple_of(
            jnp.clip((oy // SUBLANE) * SUBLANE, 0, win - nrk), SUBLANE)
        op = tex_ref[:, pl.ds(al, nrk), :].astype(jnp.float32)
        rolled = pltpu.roll(op, jnp.mod(al - oy, nrk), axis=1)
        for d in range(unroll):
            cur = oy + d
            for tap in range(n_vtaps):
                fy = fys[tap]
                wgt = (jnp.where(z0s[tap] == cur, 1.0 - fy, 0.0)
                       + jnp.where(z1s[tap] == cur, fy, 0.0))
                for ch in range(c):
                    sl = slice(ch * rows, (ch + 1) * rows)
                    t_ref[tap, sl, :w] += rolled[ch, d:rows + d, :] * wgt
        return carry

    n_trips = (oy_max + 1 - oy_min + unroll - 1) // unroll
    lax.fori_loop(0, n_trips, body, jnp.float32(0.0))

    # --- Column stage: static per-lane-group gathers, channels stacked. ---
    def col_sample(row_tap: int, u_tap: int):
        """(C*R, out_w) bilinear column sample of row-tap ``row_tap``."""
        groups = _np_col_groups(w, out_w, float(_u_offsets(out_w, shading)[u_tap]))
        i0 = colp_ref[3 * u_tap:3 * u_tap + 1, :].astype(jnp.int32)
        i1 = colp_ref[3 * u_tap + 1:3 * u_tap + 2, :].astype(jnp.int32)
        fx = colp_ref[3 * u_tap + 2:3 * u_tap + 3, :]
        parts = []
        for g in range(out_w // LANE):
            sl = slice(g * LANE, (g + 1) * LANE)
            acc = None
            for idx, wgt in ((i0[:, sl], 1.0 - fx[:, sl]),
                             (i1[:, sl], fx[:, sl])):
                # Mosaic cannot vector.broadcast a 1-sublane slice to the
                # gather height; pltpu.repeat materializes it instead.
                wgt_b = pltpu.repeat(wgt, c * rows, axis=0)
                corner = None
                for gg in groups[g]:
                    op = t_ref[row_tap, :, gg * LANE:(gg + 1) * LANE]
                    # repeat the i32 index (bool vregs can't be repeated)
                    # and derive the in-group mask at full height.
                    local_b = pltpu.repeat(idx - gg * LANE, c * rows, axis=0)
                    idx_b = jnp.clip(local_b, 0, LANE - 1)
                    v = jnp.take_along_axis(op, idx_b, axis=1)
                    if len(groups[g]) > 1:
                        ok = (local_b >= 0) & (local_b < LANE)
                        v = jnp.where(ok, v, 0.0)
                    corner = v if corner is None else corner + v
                acc = (corner * wgt_b if acc is None
                       else acc + corner * wgt_b)
            parts.append(acc)
        return jnp.concatenate(parts, axis=-1)

    cc = col_sample(0, 0)
    if shading:
        def norm(x):
            s = x[:rows] * x[:rows]
            for ch in range(1, c):
                s = s + x[ch * rows:(ch + 1) * rows] ** 2
            return jnp.sqrt(s)

        n_l = norm(col_sample(0, 1))
        n_r = norm(col_sample(0, 2))
        n_t = norm(col_sample(1, 0))
        n_b = norm(col_sample(2, 0))
        dx = n_r - n_l
        dy = n_t - n_b
        tx = np.float32(1.0) / np.float32(out_w)
        ty = np.float32(1.0) / np.float32(out_h)
        nz = np.float32(np.sqrt(np.float32(tx * tx) + np.float32(ty * ty)))
        # 1/sqrt, not rsqrt: both correctly rounded, matching the jnp oracle.
        inv_len = 1.0 / jnp.sqrt(dx * dx + dy * dy + nz * nz)
        diffuse = jnp.clip(nz * inv_len + 0.7, 0.7, 1.0)
        for ch in range(c):
            out_ref[ch] = cc[ch * rows:(ch + 1) * rows] * diffuse
    else:
        for ch in range(c):
            out_ref[ch] = cc[ch * rows:(ch + 1) * rows]


def resample_shade_pallas(tex: jnp.ndarray, out_hw: Tuple[int, int],
                          shading: bool,
                          rows_per_block: int = 0) -> jnp.ndarray:
    """Bilinear-resample ``tex`` (C, H, W) f32 to (C, out_h, out_w) at the
    target's texel centers and, with ``shading``, apply the display shader's
    diffuse term (script.js:578-584). Equals ops.display's jnp tap math."""
    c, h, w = tex.shape
    out_h, out_w = out_hw
    rows = rows_per_block or _pick_rows(out_h)
    plan = _row_plan(h, out_h, rows, shading) if rows else None
    if plan is None or out_w % LANE or out_h % rows:
        raise ValueError(f"unsupported display resample {tex.shape}->{out_hw}")
    win, unroll = plan
    rowplan, colplan = _build_plans(h, w, out_h, out_w, shading)

    n_taps = 3 if shading else 1
    kernel = functools.partial(
        _kernel, c=c, rows=rows, h=h, w=w, out_h=out_h, out_w=out_w,
        win=win, unroll=unroll, shading=shading)

    def tex_idx(t):
        return (0, _row_start(t, rows, h, out_h, win, shading), 0)

    return pl.pallas_call(
        kernel,
        grid=(out_h // rows,),
        in_specs=[
            pl.BlockSpec((_Element(c, (0, 0)), _Element(win), _Element(w)),
                         tex_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, LANE), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * SUBLANE, out_w), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c, rows, out_w), lambda t: (0, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, out_h, out_w), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((n_taps, c * rows, round_up(w, LANE)), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=(30 if shading else 8) * c * out_h * out_w,
            bytes_accessed=4 * (c * h * w + c * out_h * out_w),
            transcendentals=0,
        ),
    )(tex, rowplan, colplan)
