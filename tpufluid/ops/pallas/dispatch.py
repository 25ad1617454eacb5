"""Backend dispatch: fused Pallas kernels on TPU, jnp oracle elsewhere.

bfloat16 states (the reference's half-float storage budget) are consumed
NATIVELY by the kernels: loads upcast in-register (computing in f32 matches
the highp shader math; Mosaic's dynamic gather/rotate are 32-bit-only), so
HBM traffic is half the f32 path — round 1 staged f32 casts through HBM.
bf16 window offsets respect the (16, 128) sublane tiling.

Dispatch is resolved at trace time (backend and shapes are static), so there
is zero runtime cost. Ragged grids (the reference's aspect-fitted sizes,
e.g. 228x128 sim / 1821x1024 dye at a 1280x720 canvas) are edge-padded up to
tile alignment and the kernels mask boundary semantics at the TRUE extents;
anything else falls back to the jnp path, which is always semantically
identical.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from tpufluid.ops import stencil as _jnp
from tpufluid.ops.advect import advect as _jnp_advect_fn
from tpufluid.ops.sampling import resample_bilinear
from tpufluid.ops.pallas.common import LANE, pad_to, round_up, row_align

# Minimum padded height so an (align + 2*halo)-row window fits, per dtype
# itemsize (f32 halos 24/8/24, bf16 halos 32/16/32 — see each kernel).
_MIN_H = {"jacobi": {4: 56, 2: 80}, "stencil": {4: 24, 2: 48},
          "advect": {4: 56, 2: 80}}
# Don't pad when the overhead would exceed ~60% extra area.
_MAX_PAD_FRACTION = 0.6

# Reference bounds: velocity clamped to +/-1000 sim-texels/s (script.js:863),
# dt clamped to 1/60 s (script.js:1191).
_MAX_DISP_SIM_TEXELS = 1000.0 / 60.0


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _kernel_dtype(dtype) -> bool:
    """Mosaic compiles f32 and bf16 only ('Unsupported type in mosaic
    dialect: f16', measured on device) — float16 states stage through f32
    around each pass (_f16_staged below). The kernels themselves are
    dtype-generic (interpret-mode f16 tests pass); this gate is about the
    TPU compiler, not the kernel math."""
    return dtype in (jnp.float32, jnp.bfloat16)


def _f16_staged(dtype) -> bool:
    """True when a float16 state should run this pass as f32 compute with
    f16 results — on TPU, always: Mosaic rejects f16 kernels and XLA's TPU
    f16 gather lowering measured 14.6 steps/s at 1024^2 (vs 643 f32). The
    staging is SEMANTICALLY the reference pipeline: GLSL highp/mediump
    shader math is >= f32, and rounding to IEEE half happens only at the
    FBO write — i.e. at the pass boundary, exactly where these wrappers
    round (script.js:145-153)."""
    return dtype == jnp.float16 and _on_tpu()


def _has_good_rows(h: int, align: int, halo: int) -> bool:
    """True when h offers a row-block divisor with <= 2x halo overcompute:
    some aligned r in [2*halo, 8*halo] divides h and its window fits. The
    upper bound keeps the qualifying window moderate so every kernel's
    VMEM budget can actually take it (pickers scan all divisors anyway)."""
    r = 2 * halo
    while r <= min(h, 8 * halo):
        if h % r == 0 and r + 2 * halo <= h:
            return True
        r += align
    return False


def _padded_shape(h: int, w: int, kind: str, itemsize: int = 4,
                  min_h: int = 0) -> Optional[Tuple[int, int]]:
    align = row_align(itemsize)
    hp = max(round_up(h, align), _MIN_H[kind][itemsize], min_h)
    wp = round_up(w, LANE)
    budget = (1 + _MAX_PAD_FRACTION) * h * w
    # Row-divisor repair (the 304^2 serving cliff, docs/BENCH.md round 14):
    # kernels tile rows into aligned divisors of hp, so a height like
    # 304 = 16*19 offers only 16-row blocks — (16 + 2*32)/16 = 5x halo
    # overcompute per bf16 sweep, measured at 45% of neighboring grids'
    # texel rate. When hp has no divisor within 2x overcompute, step it up
    # to the next height that does, inside the pad budget the caller
    # already accepts. Good heights are untouched (hp == h keeps the
    # select-free Jacobi engaged on unpadded grids).
    halo = max((_MIN_H[kind][itemsize] - align) // 2, (min_h - align) // 2)
    if not _has_good_rows(hp, align, halo):
        cand = hp + align
        while cand * wp <= budget:
            if _has_good_rows(cand, align, halo):
                hp = cand
                break
            cand += align
    if hp * wp > budget:
        return None
    return hp, wp


def _apply_bump_rounded(field, splat_factors):
    """Pre-apply a separable splat bump WITH storage rounding (the reference
    writes the splat to the half-float FBO before the next pass reads it,
    script.js:145-153,1219-1232). Used by the f16-staged wrappers: fusing the
    bump into an f32-staged kernel would skip the float16 rounding that both
    the jnp oracle and the reference apply at the splat write — measured ~2%
    p999 through the confinement amplifier for the analogous bf16 case
    (out/jobs/b27)."""
    gy, gx, amt = splat_factors
    bump = jnp.einsum("sc,hs,sw->chw", amt, gy.astype(jnp.float32),
                      gx.astype(jnp.float32),
                      precision=jax.lax.Precision.HIGHEST)
    if field.ndim == 2:
        bump = bump[0]
    return (field.astype(jnp.float32) + bump).astype(field.dtype)


@functools.lru_cache(maxsize=None)
def _warn_quant_fallback(shape, halo) -> None:
    """Once per (shape, halo): the rgb9e5 default forced the XLA-gather
    fallback because the all-channel window overflows VMEM and per-channel
    launches cannot span-pack. Runs at TRACE time (static shapes), so the
    warning fires at compile, not per step."""
    import warnings

    warnings.warn(
        f"advect dye {shape} halo={halo}: rgb9e5 packing cannot run "
        f"per-channel and the all-channel window overflows VMEM — using the "
        f"slower jnp gather; set DYE_RGB9E5=False to restore the "
        f"per-channel kernel for this geometry", stacklevel=3)


def _clamp_bounds(x, bounds):
    """Replace rows/cols outside the true-wall bounds with the wall row/col
    (array-coordinate clamp): single-layer oracle ops on the result behave
    as if they clamped at the true walls."""
    row_lo, row_hi, col_lo, col_hi = bounds
    h, w = x.shape[-2:]
    r = jnp.clip(jnp.arange(h), row_lo, row_hi)
    c = jnp.clip(jnp.arange(w), col_lo, col_hi)
    return jnp.take(jnp.take(x, r, axis=-2), c, axis=-1)


def pre_pressure(velocity, curl_strength, dt, splat_factors=None,
                 true_bounds=None):
    """(vel', divergence): curl -> vorticity confinement -> divergence.

    splat_factors: optional (gy (H,S), gx (S,W), amt (S,2)) separable splat
    bump fused before curl (TPU kernel path only; callers pre-apply the bump
    on fallback paths).
    true_bounds: optional (row_lo, row_hi, col_lo, col_hi) array coords of
    the grid's TRUE walls for halo-padded shards (traced OK) — the clamp and
    -C reflection act there instead of at the array extents."""
    if _f16_staged(velocity.dtype):
        if splat_factors is not None:
            velocity = _apply_bump_rounded(velocity, splat_factors)
        v, d = pre_pressure(velocity.astype(jnp.float32), curl_strength, dt,
                            true_bounds=true_bounds)
        return v.astype(jnp.float16), d.astype(jnp.float16)
    h, w = velocity.shape[-2:]
    if _on_tpu() and _kernel_dtype(velocity.dtype):
        from tpufluid.ops.pallas import stencil as _pl

        pad = _padded_shape(h, w, "stencil", velocity.dtype.itemsize)
        if pad is not None and _pl.supported(pad, velocity.dtype.itemsize):
            gy = gx = amt = None
            if splat_factors is not None:
                gy, gx, amt = splat_factors
                gy = jnp.pad(gy, ((0, pad[0] - h), (0, 0)), mode="edge")
                gx = jnp.pad(gx, ((0, 0), (0, pad[1] - w)), mode="edge")
            vel_p = pad_to(velocity, *pad)
            out_v, out_d = _pl.curl_vorticity_divergence(
                vel_p, curl_strength, dt, gy, gx, amt, true_shape=(h, w),
                true_bounds=true_bounds)
            return out_v[..., :h, :w], out_d[..., :h, :w]

    if splat_factors is not None:
        gy, gx, amt = splat_factors
        velocity = (velocity.astype(jnp.float32)
                    + jnp.einsum("sc,hs,sw->chw", amt, gy, gx,
                                 precision=jax.lax.Precision.HIGHEST)
                    ).astype(velocity.dtype)
    if true_bounds is None:
        c = _jnp.curl(velocity)
        vel = _jnp.vorticity_confinement(velocity, c, curl_strength, dt)
        return vel, _jnp.divergence(vel)
    # Bounds-aware fallback: re-clamp at the true walls between the chained
    # stencil layers, so each single-layer oracle op reads clamped values
    # exactly as the kernel's masks would.
    velocity = _clamp_bounds(velocity, true_bounds)
    c = _clamp_bounds(_jnp.curl(velocity), true_bounds)
    vel = _clamp_bounds(_jnp.vorticity_confinement(velocity, c, curl_strength, dt),
                        true_bounds)
    # -C wall reflection: out-of-bounds neighbors read the NEGATED wall value
    # (script.js:804-807); after the clamp above, negating the out-of-bounds
    # region makes the oracle divergence read exactly -C there. Its own
    # array-edge reflection only touches out-of-bounds outputs.
    row_lo, row_hi, col_lo, col_hi = true_bounds
    rr = jnp.arange(vel.shape[-2])[:, None]
    cc = jnp.arange(vel.shape[-1])[None, :]
    oob = ((rr < row_lo) | (rr > row_hi) | (cc < col_lo) | (cc > col_hi))
    div = _jnp.divergence(jnp.where(oob[None], -vel, vel))
    return vel, div


def jacobi_pressure(pressure, div, iterations, prescale=1.0):
    """Jacobi solve with the warm-start scale (reference clearShader
    p *= PRESSURE, script.js:1253-1257) fused into the first sweep's load."""
    if _f16_staged(pressure.dtype):
        return jacobi_pressure(pressure.astype(jnp.float32),
                               div.astype(jnp.float32), iterations,
                               prescale=prescale).astype(jnp.float16)
    h, w = pressure.shape
    if _on_tpu() and _kernel_dtype(pressure.dtype):
        from tpufluid.ops.pallas import jacobi as _pl

        pad = _padded_shape(h, w, "jacobi", pressure.dtype.itemsize)
        if pad is not None and _pl.supported(pad, pressure.dtype.itemsize):
            p = _pl.jacobi_pressure(pad_to(pressure, *pad), pad_to(div, *pad),
                                    iterations, true_shape=(h, w),
                                    prescale=prescale)
            return p[:h, :w]
    if prescale != 1.0:
        pressure = (pressure.astype(jnp.float32) * prescale).astype(pressure.dtype)
    return _jnp.jacobi_pressure(pressure, div, iterations)


def gradient_subtract(velocity, pressure):
    """Un-fused projection tail (the single-device step uses the fused
    project_and_self_advect; the sharded step needs the split)."""
    if _f16_staged(velocity.dtype):
        return gradient_subtract(velocity.astype(jnp.float32),
                                 pressure.astype(jnp.float32)
                                 ).astype(jnp.float16)
    h, w = velocity.shape[-2:]
    if _on_tpu() and _kernel_dtype(velocity.dtype):
        from tpufluid.ops.pallas import stencil as _pl

        pad = _padded_shape(h, w, "stencil", velocity.dtype.itemsize)
        if pad is not None and _pl.supported(pad, velocity.dtype.itemsize):
            out = _pl.gradient_subtract(pad_to(velocity, *pad),
                                        pad_to(pressure, *pad),
                                        true_shape=(h, w))
            return out[..., :h, :w]
    return _jnp.gradient_subtract(velocity, pressure)


def project_and_self_advect(velocity, pressure, dt, dissipation):
    """(vel - grad p) -> self-advection: a one-pass Pallas gradient subtract
    followed by the gather kernel reading the projected velocity straight
    from its ref (the round-1 fused project_advect kernel staged an f32 vel'
    window copy per tile and measured SLOWER on device at every size —
    out/jobs/80); falls back to the jnp chain."""
    if _f16_staged(velocity.dtype):
        # The projected velocity passes through f16 storage between the two
        # passes, like the reference's RG16F gradientSubtract target that
        # the advection pass then reads (script.js:1268-1285).
        vel = gradient_subtract(velocity, pressure)
        return advect(vel, vel, dt, dissipation)
    h, w = velocity.shape[-2:]
    if _on_tpu() and _kernel_dtype(velocity.dtype):
        from tpufluid.ops.pallas import advect as _pa
        from tpufluid.ops.pallas import stencil as _ps

        pad = _padded_shape(h, w, "advect", velocity.dtype.itemsize)
        if (pad is not None and _ps.supported(pad, velocity.dtype.itemsize)
                and _pa.supported((2,) + pad, velocity.dtype.itemsize)):
            vel_p = _ps.gradient_subtract(pad_to(velocity, *pad),
                                          pad_to(pressure, *pad),
                                          true_shape=(h, w))
            out = _pa.advect_pallas(vel_p, vel_p, dt, dissipation,
                                    true_shape=(h, w),
                                    max_disp_x=_MAX_DISP_SIM_TEXELS)
            return out[..., :h, :w]
    vel = gradient_subtract(velocity, pressure)
    return advect(vel, vel, dt, dissipation)


def display_base(dye_rgb, out_hw, shading: bool):
    """Shaded display center: the display shader's 5-tap dye sampling +
    diffuse term fused into one Pallas pass (ops/pallas/display.py), or None
    when unsupported (caller falls back to the jnp taps in ops/display.py)."""
    if _on_tpu():
        from tpufluid.ops.pallas import display as _pd

        if (dye_rgb.dtype == jnp.float32
                and _pd.supported(dye_rgb.shape, out_hw, shading)):
            return _pd.resample_shade_pallas(dye_rgb, out_hw, shading)
    return None


def bloom_chain(dye_rgb, base_hw, mip_sizes, threshold, soft_knee, intensity):
    """Bloom prefilter + mip pyramid + final as ONE VMEM-resident Pallas
    program (the XLA chain is fixed-overhead-bound on its tiny mips), or
    None when unsupported (jnp ops.bloom.apply_bloom path)."""
    if _on_tpu() and dye_rgb.dtype == jnp.float32:
        from tpufluid.ops.pallas import bloom as _pb

        if _pb.supported(tuple(base_hw), tuple(mip_sizes)):
            base = resample_bilinear(dye_rgb, base_hw)
            return _pb.bloom_pyramid_pallas(base, mip_sizes, threshold,
                                            soft_knee, intensity)
    return None


def display_full(dye_rgb, out_hw, shading: bool, bloom_tex, sunrays_tex,
                 dither_tex):
    """Whole display composite (taps + shading + sunrays multiply + dithered
    gamma bloom + alpha) in one Pallas pass -> (C+1, h, w) premultiplied
    RGBA, or None when unsupported (jnp composite path)."""
    if _on_tpu():
        from tpufluid.ops.pallas import display as _pd

        bl = None if bloom_tex is None else tuple(bloom_tex.shape[-2:])
        sr = None if sunrays_tex is None else tuple(sunrays_tex.shape[-2:])
        ok = (dye_rgb.dtype == jnp.float32
              and (bloom_tex is None or bloom_tex.dtype == jnp.float32)
              and (sunrays_tex is None or sunrays_tex.dtype == jnp.float32)
              and _pd.supported(dye_rgb.shape, out_hw, shading,
                                bloom_hw=bl, sunrays_hw=sr))
        if ok:
            return _pd.display_pallas(dye_rgb, out_hw, shading, bloom_tex,
                                      sunrays_tex, dither_tex)
    return None


def advect(velocity, source, dt, dissipation, splat_factors=None, quant=None):
    """Semi-Lagrangian advection; velocity (2,Hs,Ws), source (...,H,W).

    splat_factors: optional (gy (H,S), gx (S,W), amt (S,C)) separable splat
    bump added to the source before sampling — fused into the gather kernels
    as an MXU matmul over each window (exact: bilinear sampling of a
    separable bump equals the product of its 1-D bilinear samples), saving a
    full HBM splat pass over the source. Fallback paths pre-apply the bump.

    Cross-resolution (dye) advection resamples velocity to the source grid
    with the cheap separable path first (reference samples velocity bilinearly
    at dye uv, script.js:773-777 — identical math), RESCALES it to
    source-grid texels/second (the reference's displacement is dt * vel *
    simTexelSize in uv, script.js:1276 — i.e. dye-texel displacement scales
    by the dye/sim resolution ratio), then runs the same-grid gather kernel
    with a halo/gather-span sized for the scaled displacement bound.
    """
    h, w = source.shape[-2], source.shape[-1]
    hv, wv = velocity.shape[-2], velocity.shape[-1]
    if (hv, wv) != (h, w):
        vel = resample_bilinear(velocity, (h, w))
        # sim-texels/s -> source-texels/s (displacement scales by the ratio)
        vel = jnp.stack([vel[0] * (w / wv), vel[1] * (h / hv)])
    else:
        vel = velocity
    return advect_same_grid(vel, source, dt, dissipation,
                            _MAX_DISP_SIM_TEXELS * h / hv,
                            _MAX_DISP_SIM_TEXELS * w / wv,
                            splat_factors=splat_factors, quant=quant)


def _advect_f16_packed(velocity, source, dt, dissipation, max_disp_y,
                       max_disp_x):
    """Channel-packed float16 gather (round-4 verdict #1): f16 is the
    reference's LITERAL storage format (script.js:145-153), and its bits
    pack two 16-bit channels per uint32 gather lane exactly like bf16's —
    but Mosaic has no f16 refs, so the pack happens HERE (one fused XLA
    bitcast pass over the f16 state, splat bump already applied with f16
    rounding by the caller) and the kernel decodes IEEE half -> f32
    in-register (quant.f16_bits_to_f32, exact for every finite half). Same
    f32 math on the same values as the staged-f32 path it replaces, so
    results are BIT-IDENTICAL — with ceil(C/2) gathers per corner instead
    of C (the odd trailing channel column-pairs, skipping its x1 gather).
    Returns float32 (caller rounds to f16 at the pass boundary) or None
    when the geometry is unsupported (caller stages f32)."""
    if source.ndim != 3 or source.shape[0] < 2:
        return None
    c, h, w = source.shape
    from tpufluid.ops.pallas import advect as _pl
    from tpufluid.ops.quant import f16_pack_planes

    halo = _pl.halo_for_displacement(max_disp_y)
    span = _pl.group_span_for_displacement(max_disp_x)
    cp = (c + 1) // 2
    if halo > _pl.HALO:
        # Cross-resolution displacement bound (demo 8x dye/sim): the
        # HBM-segment kernel DMAs pre-packed uint32 segments on demand.
        from tpufluid.ops.pallas import advect_hbm as _hbm

        pad = _padded_shape(h, w, "advect", 4)
        if pad is None or not _hbm.supported((c,) + pad, 4, span):
            return None
        pk = f16_pack_planes(pad_to(source, *pad))
        vel_p = pad_to(velocity.astype(jnp.float32), *pad)
        out = _hbm.advect_pallas_hbm(vel_p, pk, dt, dissipation,
                                     true_shape=(h, w), span=span,
                                     max_disp_x=max_disp_x, f16c=c)
        return out[..., :h, :w]
    pad = _padded_shape(h, w, "advect", 4,
                        min_h=row_align(4) + 2 * round_up(halo, row_align(4)))
    if pad is None or not _pl.supported((cp,) + pad, 4, halo, span):
        return None
    pk = f16_pack_planes(pad_to(source, *pad))
    vel_p = pad_to(velocity.astype(jnp.float32), *pad)
    out = _pl.advect_pallas(vel_p, pk, dt, dissipation, true_shape=(h, w),
                            halo=halo, span=span, max_disp_x=max_disp_x,
                            f16c=c)
    return out[..., :h, :w]


def advect_same_grid(velocity, source, dt, dissipation, max_disp_y,
                     max_disp_x, splat_factors=None, quant=None):
    """Advection with the velocity ALREADY on the source grid in
    source-texels/second; max_disp_* bound the backtrace displacement in
    source texels (they size the gather halo/span — the shapes alone cannot,
    e.g. a shard's pre-resampled dye velocity). Used directly by the sharded
    step, which resamples per shard with global coordinates."""
    if _f16_staged(source.dtype):
        if splat_factors is not None:
            source = _apply_bump_rounded(source, splat_factors)
        out = _advect_f16_packed(velocity, source, dt, dissipation,
                                 max_disp_y, max_disp_x)
        if out is None:  # geometry unsupported: stage full f32 as before
            out = advect_same_grid(velocity.astype(jnp.float32),
                                   source.astype(jnp.float32), dt,
                                   dissipation, max_disp_y, max_disp_x)
        return out.astype(jnp.float16)
    # quant="rgb9e5" applies to 3-channel bfloat16 sources only. Every path
    # that runs with quant set honors it (kernels pack/unpack, the jnp
    # fallback quantizes before sampling); the per-channel kernel branch,
    # which cannot, is skipped in favor of the fallback when quant is set.
    if not (source.dtype == jnp.bfloat16 and source.ndim == 3
            and source.shape[0] == 3):
        quant = None
    h, w = source.shape[-2], source.shape[-1]
    it = source.dtype.itemsize
    if _on_tpu() and _kernel_dtype(source.dtype):
        from tpufluid.ops.pallas import advect as _pl

        halo = _pl.halo_for_displacement(max_disp_y)
        span = _pl.group_span_for_displacement(max_disp_x)
        c = source.shape[0] if source.ndim == 3 else 1

        def padded_splat(pad):
            if splat_factors is None:
                return None
            gy, gx, amt = splat_factors
            gy = jnp.pad(gy, ((0, pad[0] - h), (0, 0)), mode="edge")
            gx = jnp.pad(gx, ((0, 0), (0, pad[1] - w)), mode="edge")
            return gy, gx, amt

        if halo > _pl.HALO:
            # Large displacement bound (cross-resolution dye): worst-case row
            # windows would read ~(2*halo/rows)x the output — use the
            # HBM-resident kernel that DMAs only the rows actually reached.
            from tpufluid.ops.pallas import advect_hbm as _hbm

            pad = _padded_shape(h, w, "advect", it)
            if pad is not None and _hbm.supported((c,) + pad, it, span):
                out = _hbm.advect_pallas_hbm(pad_to(velocity, *pad),
                                             pad_to(source, *pad),
                                             dt, dissipation, true_shape=(h, w),
                                             span=span, splat=padded_splat(pad),
                                             max_disp_x=max_disp_x, quant=quant)
                return out[..., :h, :w]

        pad = _padded_shape(h, w, "advect", it,
                            min_h=row_align(it) + 2 * round_up(halo, row_align(it)))
        if pad is not None:
            all_ch = _pl.supported((c,) + pad, it, halo)
            per_ch = all_ch or _pl.supported((1,) + pad, it, halo)
            # The rgb9e5 pack spans channels, so per-channel launches cannot
            # honor quant — route that (VMEM-overflow halo x quant, which is
            # the bf16 DEFAULT since round 9) combination to the jnp fallback
            # below, which runs the IDENTICAL quantize-before-sample
            # procedure, instead of letting the quantization silently flip
            # with grid geometry. That fallback is a perf cliff vs the
            # per-channel kernel round 8 would have run, so surface it once
            # per geometry (pass DYE_RGB9E5=False to get the kernel back).
            if not all_ch and quant is not None:
                per_ch = False
                _warn_quant_fallback(source.shape, halo)
            if per_ch:
                vel_p = pad_to(velocity, *pad)
                src_p = pad_to(source, *pad)
                sp = padded_splat(pad)
                if all_ch:
                    out = _pl.advect_pallas(vel_p, src_p, dt, dissipation,
                                            true_shape=(h, w), halo=halo,
                                            span=span, splat=sp,
                                            max_disp_x=max_disp_x, quant=quant)
                elif source.ndim == 3:
                    # Large-halo windows don't fit VMEM with all channels live:
                    # one kernel launch per channel.
                    out = jnp.stack([
                        _pl.advect_pallas(
                            vel_p, src_p[ch], dt, dissipation,
                            true_shape=(h, w), halo=halo, span=span,
                            splat=None if sp is None else
                            (sp[0], sp[1], sp[2][:, ch:ch + 1]),
                            max_disp_x=max_disp_x)
                        for ch in range(c)])
                else:
                    out = _pl.advect_pallas(vel_p, src_p, dt, dissipation,
                                            true_shape=(h, w), halo=halo,
                                            span=span, splat=sp,
                                            max_disp_x=max_disp_x, quant=quant)
                return out[..., :h, :w]
    if splat_factors is not None:
        source = _apply_bump_rounded(source, splat_factors)
    return _jnp_advect_fn(velocity, source, dt, dissipation, quant=quant)
