"""Gaussian splat impulse (splatShader, /root/reference/script.js:726-744).

``out = base + exp(-||p||^2 / radius) * amount`` with p = (uv - point) and
p.x scaled by the canvas aspect ratio. One splat event writes the same
gaussian into the velocity grid (amount = (dx, dy)) and the dye grid
(amount = rgb) — reference splat(), script.js:1441-1455.

Splats enter the jitted step as a fixed-size (MAX_SPLATS, 8) array
[x, y, dx, dy, r, g, b, active] so interactive/trace input never triggers a
recompile — the deterministic-replay seam called out in SURVEY.md §3.4.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpufluid.ops.sampling import uv_grid

# Columns of a splat event row.
SPLAT_X, SPLAT_Y, SPLAT_DX, SPLAT_DY = 0, 1, 2, 3
SPLAT_R, SPLAT_G, SPLAT_B, SPLAT_ACTIVE = 4, 5, 6, 7
SPLAT_COLS = 8


def gaussian_splat(h: int, w: int, x, y, radius: float, aspect: float) -> jnp.ndarray:
    """exp(-||p||^2 / radius) over an (h, w) grid; p.x aspect-corrected."""
    u, v = uv_grid(h, w)
    px = (u - x) * aspect
    py = v - y
    return jnp.exp(-(px * px + py * py) / radius)


def splat_field(field: jnp.ndarray, x, y, amount, radius: float, aspect: float) -> jnp.ndarray:
    """Add one gaussian impulse to ``field`` (C, H, W); amount has shape (C,)."""
    h, w = field.shape[-2], field.shape[-1]
    g = gaussian_splat(h, w, x, y, radius, aspect).astype(field.dtype)
    return field + amount.astype(field.dtype)[:, None, None] * g[None]


def apply_splat_batch(velocity: jnp.ndarray, dye: jnp.ndarray, splats: jnp.ndarray,
                      radius: float, aspect: float):
    """Apply a (S, 8) batch of splat events to velocity (2,H,W) and dye (3,Hd,Wd).

    Inactive rows (active == 0) are masked to zero contribution. The loop is a
    fori_loop so S stays off the memory high-water mark (a broadcast (S, Hd, Wd)
    intermediate at dye resolution would be ~100 MB).
    """
    s = splats.shape[0]

    def body(i, carry):
        vel, d = carry
        row = splats[i]
        active = row[SPLAT_ACTIVE]
        vamt = jnp.stack([row[SPLAT_DX], row[SPLAT_DY]]) * active
        camt = row[SPLAT_R:SPLAT_B + 1] * active
        vel = splat_field(vel, row[SPLAT_X], row[SPLAT_Y], vamt, radius, aspect)
        d = splat_field(d, row[SPLAT_X], row[SPLAT_Y], camt, radius, aspect)
        return vel, d

    return jax.lax.fori_loop(0, s, body, (velocity, dye))


def make_splat_array(events, max_splats: int) -> jnp.ndarray:
    """Pack a python list of (x, y, dx, dy, (r, g, b)) into the (S, 8) format."""
    import numpy as np

    out = np.zeros((max_splats, SPLAT_COLS), dtype=np.float32)
    if len(events) > max_splats:
        raise ValueError(f"{len(events)} splat events > MAX_SPLATS={max_splats}")
    for i, (x, y, dx, dy, color) in enumerate(events):
        out[i] = [x, y, dx, dy, color[0], color[1], color[2], 1.0]
    return jnp.asarray(out)
