"""Bilinear texture sampling — the TPU equivalent of GLSL ``texture2D``.

The reference leans on hardware LINEAR filtering with CLAMP_TO_EDGE wrap for
every cross-resolution read (velocity at dye uv, bloom mip up/down, sunrays,
display composite) and falls back to a manual 4-tap bilerp when the extension
is missing (/root/reference/script.js:758-770). This module *is* that bilerp,
vectorized: texel centers at (i + 0.5)/N, out-of-range taps clamped to the
edge texel (CLAMP_TO_EDGE, script.js:1051-1052) or wrapped (REPEAT, used only
by the dither texture, script.js:1133-1134).

Sampling compiles to an XLA gather; uv grids that are statically affine
(resampling) instead use take-based row/col gathers which XLA lowers well.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def _gather2d(tex: jnp.ndarray, iy: jnp.ndarray, ix: jnp.ndarray) -> jnp.ndarray:
    """tex (..., H, W) indexed at integer (iy, ix) of any broadcastable shape."""
    if tex.ndim == 2:
        return tex[iy, ix]
    return tex[..., iy, ix]  # leading channel dims broadcast


def sample_bilinear(tex: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Sample ``tex`` (..., H, W) at uv coords with LINEAR + CLAMP_TO_EDGE.

    Matches GLSL texture2D semantics and the reference's manual bilerp
    (script.js:758-770): st = uv * size - 0.5; corners at floor(st) and +1,
    each tap clamped to [0, N-1]; bilinear mix by fract(st).
    Returns shape (..., *u.shape).
    """
    h, w = tex.shape[-2], tex.shape[-1]
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0).astype(tex.dtype)
    fy = (y - y0).astype(tex.dtype)

    ix0 = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    ix1 = jnp.clip(x0.astype(jnp.int32) + 1, 0, w - 1)
    iy0 = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    iy1 = jnp.clip(y0.astype(jnp.int32) + 1, 0, h - 1)

    a = _gather2d(tex, iy0, ix0)
    b = _gather2d(tex, iy0, ix1)
    c = _gather2d(tex, iy1, ix0)
    d = _gather2d(tex, iy1, ix1)

    top = a + (b - a) * fx
    bot = c + (d - c) * fx
    return top + (bot - top) * fy


def sample_bilinear_repeat(tex: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Same as sample_bilinear but with REPEAT wrap (dither texture tiling)."""
    h, w = tex.shape[-2], tex.shape[-1]
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0).astype(tex.dtype)
    fy = (y - y0).astype(tex.dtype)

    ix0 = jnp.mod(x0.astype(jnp.int32), w)
    ix1 = jnp.mod(x0.astype(jnp.int32) + 1, w)
    iy0 = jnp.mod(y0.astype(jnp.int32), h)
    iy1 = jnp.mod(y0.astype(jnp.int32) + 1, h)

    a = _gather2d(tex, iy0, ix0)
    b = _gather2d(tex, iy0, ix1)
    c = _gather2d(tex, iy1, ix0)
    d = _gather2d(tex, iy1, ix1)

    top = a + (b - a) * fx
    bot = c + (d - c) * fx
    return top + (bot - top) * fy


def uv_grid(h: int, w: int, dtype=jnp.float32) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(u, v) arrays of shape (h, w) at texel centers: ((j+0.5)/w, (i+0.5)/h)."""
    u = (jnp.arange(w, dtype=dtype) + 0.5) / w
    v = (jnp.arange(h, dtype=dtype) + 0.5) / h
    return jnp.broadcast_to(u[None, :], (h, w)), jnp.broadcast_to(v[:, None], (h, w))


def affine_axis_plan(n_in: int, n_out: int, scale: float = 1.0,
                     off: float = 0.0, wrap: bool = False):
    """(i0, i1, f) for one separable affine bilinear stage at
    p = ((k+0.5)/n_out)*scale + off. The single source of these coordinates:
    the Pallas display kernel consumes this plan as data so its taps are
    bit-identical to the jnp path (in-kernel recomputation can differ by an
    ulp through FMA fusion, which a 1024-scale coordinate amplifies to ~1e-4
    in texel space)."""
    p = (jnp.arange(n_out, dtype=jnp.float32) + 0.5) / n_out * scale + off
    x = p * n_in - 0.5
    x0 = jnp.floor(x)
    f = x - x0
    i0 = x0.astype(jnp.int32)
    if wrap:
        i0, i1 = jnp.mod(i0, n_in), jnp.mod(i0 + 1, n_in)
    else:
        i0, i1 = jnp.clip(i0, 0, n_in - 1), jnp.clip(i0 + 1, 0, n_in - 1)
    return i0, i1, f


def sample_affine_axis(tex: jnp.ndarray, n_out: int, axis: int,
                       scale: float = 1.0, off: float = 0.0,
                       wrap: bool = False) -> jnp.ndarray:
    """One separable stage of an affine bilinear sample: take+lerp along
    ``axis`` (-1 = u/columns, -2 = v/rows) at p = ((k+0.5)/n_out)*scale + off.

    Exposed so callers with several taps that share one stage (the display
    shader's 5 neighbor taps, ops/display.py) can compute the shared stage
    once instead of per tap.
    """
    assert axis in (-1, -2)
    i0, i1, f = affine_axis_plan(tex.shape[axis], n_out, scale, off, wrap)
    f = f.astype(tex.dtype)
    if axis == -2:
        f = f[:, None]
    return (jnp.take(tex, i0, axis=axis) * (1 - f)
            + jnp.take(tex, i1, axis=axis) * f)


def sample_affine(tex: jnp.ndarray, out_hw: Tuple[int, int],
                  su: float = 1.0, ou: float = 0.0,
                  sv: float = 1.0, ov: float = 0.0,
                  wrap: bool = False) -> jnp.ndarray:
    """Bilinear-sample ``tex`` (..., H, W) at the AFFINE uv map
    u = su * u_out + ou, v = sv * v_out + ov over an (out_h, out_w) raster.

    Because the coordinate map is affine, the sample is separable: one
    row-take + one column-take with per-axis lerp weights — no per-element
    2-D gather (XLA's scalar-gather path). This covers every sampling pattern
    of the reference's render pipeline: resampling (identity map), shading /
    blur / bloom taps (pure offsets), the sunrays radial march (scale toward
    center: coord = uv*(1-k) + 0.5*k), and dither tiling (scale > 1 + REPEAT).
    CLAMP_TO_EDGE by default; wrap=True gives REPEAT (dither texture).
    """
    out_h, out_w = out_hw
    t = sample_affine_axis(tex, out_w, axis=-1, scale=su, off=ou, wrap=wrap)
    return sample_affine_axis(t, out_h, axis=-2, scale=sv, off=ov, wrap=wrap)


def resample_bilinear(tex: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Resample to (out_h, out_w) by sampling at the target's texel centers.

    This is the reference's resize-with-copy (copy shader through a LINEAR
    texture into a differently-sized FBO, script.js:1108-1126) and its bloom
    down/upsample geometry. Separable: one row gather + one column gather
    instead of a 2-D gather, which XLA lowers to cheap takes.
    """
    out_h, out_w = out_hw
    h, w = tex.shape[-2], tex.shape[-1]

    # Column (u) axis.
    x = (jnp.arange(out_w, dtype=jnp.float32) + 0.5) / out_w * w - 0.5
    x0 = jnp.floor(x)
    fx = (x - x0).astype(tex.dtype)
    ix0 = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    ix1 = jnp.clip(x0.astype(jnp.int32) + 1, 0, w - 1)
    t = jnp.take(tex, ix0, axis=-1) * (1 - fx) + jnp.take(tex, ix1, axis=-1) * fx

    # Row (v) axis.
    y = (jnp.arange(out_h, dtype=jnp.float32) + 0.5) / out_h * h - 0.5
    y0 = jnp.floor(y)
    fy = (y - y0).astype(tex.dtype)
    iy0 = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    iy1 = jnp.clip(y0.astype(jnp.int32) + 1, 0, h - 1)
    fy = fy.reshape((-1,) + (1,) * 0)
    a = jnp.take(t, iy0, axis=-2)
    b = jnp.take(t, iy1, axis=-2)
    fy = fy[:, None]
    return a * (1 - fy) + b * fy
