"""Display composite — the keyworded display Material of the reference
(displayShaderSource, /root/reference/script.js:549-612) plus the blend-mode
composition of render() (script.js:1296-1348).

The reference recompiles the shader per SHADING/BLOOM/SUNRAYS keyword set
(Material.setKeywords, script.js:360-377); here those flags are static config
so jit specializes the same way.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from tpufluid.ops.sampling import sample_affine, sample_affine_axis, uv_grid


def linear_to_gamma(color: jnp.ndarray) -> jnp.ndarray:
    """max(1.055 * c^(1/2.4) - 0.055, 0) (script.js:563-566)."""
    color = jnp.maximum(color, 0.0)
    return jnp.maximum(1.055 * jnp.power(color, 0.416666667) - 0.055, 0.0)


def shaded_base(dye_rgb: jnp.ndarray, out_hw: Tuple[int, int],
                shading: bool) -> jnp.ndarray:
    """The display's dye sampling: center tap, with SHADING multiplied by the
    diffuse term from the four 1-display-texel neighbor norms
    (script.js:571-584). jnp path — ops/pallas/display.py fuses the same
    math into one kernel; both share sampling.affine_axis_plan coordinates.
    """
    out_h, out_w = out_hw
    if not shading:
        return sample_affine(dye_rgb, out_hw)
    # The five taps share separable stages: l/r/center differ only in u, so
    # they share one row (v) pass; t/b differ only in v, so they share one
    # column (u) pass — 7 axis passes instead of 10.
    tx, ty = 1.0 / out_w, 1.0 / out_h
    rows = sample_affine_axis(dye_rgb, out_h, axis=-2)
    c = sample_affine_axis(rows, out_w, axis=-1)
    lc = sample_affine_axis(rows, out_w, axis=-1, off=-tx)
    rc = sample_affine_axis(rows, out_w, axis=-1, off=tx)
    cols = sample_affine_axis(dye_rgb, out_w, axis=-1)
    tc = sample_affine_axis(cols, out_h, axis=-2, off=ty)
    bc = sample_affine_axis(cols, out_h, axis=-2, off=-ty)
    norm = lambda x: jnp.sqrt(jnp.sum(x * x, axis=0))
    dx = norm(rc) - norm(lc)
    dy = norm(tc) - norm(bc)
    nz = jnp.sqrt(tx * tx + ty * ty)
    inv_len = 1.0 / jnp.sqrt(dx * dx + dy * dy + nz * nz)
    diffuse = jnp.clip(nz * inv_len + 0.7, 0.7, 1.0)
    return c * diffuse[None]


def display_composite(
    dye_rgb: jnp.ndarray,
    out_hw: Tuple[int, int],
    shading: bool,
    bloom_tex: Optional[jnp.ndarray],
    sunrays_tex: Optional[jnp.ndarray],
    dither_tex: Optional[jnp.ndarray],
    base: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """-> (4, h, w) premultiplied RGBA (alpha = max(r,g,b), script.js:608-609).

    All sources are sampled bilinearly at the display target's texel centers;
    SHADING neighbors are offset by one *display* texel (drawDisplay sets
    texelSize to 1/target size, script.js:1336-1340). ``base`` optionally
    supplies the (already shaded) center taps — the Pallas fused path.
    """
    out_h, out_w = out_hw
    c = shaded_base(dye_rgb, out_hw, shading) if base is None else base

    bloom = None
    if bloom_tex is not None:
        bloom = sample_affine(bloom_tex, out_hw)

    if sunrays_tex is not None:
        rays = sample_affine(sunrays_tex, out_hw)
        c = c * rays[None]
        if bloom is not None:
            bloom = bloom * rays[None]

    if bloom is not None:
        if dither_tex is not None:
            # uDithering sampled at uv * ditherScale with REPEAT wrap
            # (ditherScale = target/texture size, script.js:1626-1631).
            scale_x = out_w / dither_tex.shape[-1]
            scale_y = out_h / dither_tex.shape[-2]
            noise = sample_affine(dither_tex, out_hw, su=scale_x, sv=scale_y,
                                  wrap=True)
            bloom = bloom + (noise * 2.0 - 1.0)[None] / 255.0
        bloom = linear_to_gamma(bloom)
        c = c + bloom

    a = jnp.max(c, axis=0)
    return jnp.concatenate([c, a[None]], axis=0)


def checkerboard(out_hw: Tuple[int, int], aspect: float) -> jnp.ndarray:
    """Transparent-mode backdrop (checkerboardShader, script.js:531-547) -> (4,h,w)."""
    out_h, out_w = out_hw
    u, v = uv_grid(out_h, out_w)
    fu = jnp.floor(u * 25.0 * aspect)
    fv = jnp.floor(v * 25.0)
    val = jnp.mod(fu + fv, 2.0) * 0.1 + 0.8
    rgb = jnp.broadcast_to(val[None], (3, out_h, out_w))
    return jnp.concatenate([rgb, jnp.ones((1, out_h, out_w), rgb.dtype)], axis=0)


def blend_premultiplied(src_rgba: jnp.ndarray, dst_rgba: jnp.ndarray) -> jnp.ndarray:
    """GL blendFunc(ONE, ONE_MINUS_SRC_ALPHA): out = src + dst * (1 - src.a)."""
    a = src_rgba[3:4]
    return src_rgba + dst_rgba * (1.0 - a)
