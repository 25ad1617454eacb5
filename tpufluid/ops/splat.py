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


def _splat_sum(field: jnp.ndarray, splats: jnp.ndarray, amounts: jnp.ndarray,
               radius: float, aspect: float) -> jnp.ndarray:
    """field (C, H, W) + sum over S splats of gauss_s * amount_s.

    TPU-native trick: the gaussian is separable —
      exp(-(px^2 + py^2)/r) = exp(-px^2/r) (x only) * exp(-py^2/r) (y only)
    so the S-splat batch is a rank-S update: per channel,
      field_c += Gy (H,S) @ diag(amount_sc) @ Gx (S,W),
    one einsum that XLA runs on the MXU with O(H+W) transcendentals per splat
    instead of O(H*W) — the reference pays one full-grid exp pass per splat
    (script.js:1443-1454).
    """
    h, w = field.shape[-2], field.shape[-1]
    u = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    v = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    px = (u[None, :] - splats[:, SPLAT_X][:, None]) * aspect   # (S, W)
    py = v[None, :] - splats[:, SPLAT_Y][:, None]              # (S, H)
    gx = jnp.exp(-(px * px) / radius)
    gy = jnp.exp(-(py * py) / radius)
    # (C,H,W) update: sum_s amounts[s,c] * gy[s,h] * gx[s,w]
    bump = jnp.einsum("sc,sh,sw->chw", amounts.astype(jnp.float32), gy, gx,
                      precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=jnp.float32)
    return (field.astype(jnp.float32) + bump).astype(field.dtype)


def splat_factors(splats: jnp.ndarray, h: int, w: int, radius: float,
                  aspect: float, amount_cols: slice, row0=0, h_total=None,
                  col0=0, w_total=None):
    """Separable factors of the splat batch for fusion into other kernels:
    (gy (H, S), gx (S, W), amt (S, C)) with inactive rows zeroed.

    row0/h_total (and col0/w_total): gy/gx for the GLOBAL rows [row0, row0+h)
    / columns [col0, col0+w) of an (h_total, w_total) grid (a shard's
    halo-padded block; offsets may be traced). Coordinates outside the grid
    clamp to the edge, matching the replicated ghosts a halo exchange
    produces at the global boundary."""
    if h_total is None:
        h_total = h
    if w_total is None:
        w_total = w
    rows = jnp.clip(row0 + jnp.arange(h, dtype=jnp.float32), 0, h_total - 1)
    cols = jnp.clip(col0 + jnp.arange(w, dtype=jnp.float32), 0, w_total - 1)
    u = (cols + 0.5) / w_total
    v = (rows + 0.5) / h_total
    px = (u[None, :] - splats[:, SPLAT_X][:, None]) * aspect
    py = v[None, :] - splats[:, SPLAT_Y][:, None]
    gx = jnp.exp(-(px * px) / radius)
    gy = jnp.exp(-(py * py) / radius).T
    amt = splats[:, amount_cols] * splats[:, SPLAT_ACTIVE:SPLAT_ACTIVE + 1]
    return gy, gx, amt


def apply_splat_batch(velocity: jnp.ndarray, dye: jnp.ndarray, splats: jnp.ndarray,
                      radius: float, aspect: float):
    """Apply a (S, 8) batch of splat events to velocity (2,H,W) and dye (3,Hd,Wd).

    Inactive rows (active == 0) are masked to zero contribution (amount * 0),
    matching the reference exactly for active rows (splat(), script.js:1441-1455).
    """
    active = splats[:, SPLAT_ACTIVE:SPLAT_ACTIVE + 1]
    vamt = splats[:, SPLAT_DX:SPLAT_DY + 1] * active
    camt = splats[:, SPLAT_R:SPLAT_B + 1] * active
    velocity = _splat_sum(velocity, splats, vamt, radius, aspect)
    dye = _splat_sum(dye, splats, camt, radius, aspect)
    return velocity, dye


def make_splat_array(events, max_splats: int) -> jnp.ndarray:
    """Pack a python list of (x, y, dx, dy, (r, g, b)) into the (S, 8) format."""
    import numpy as np

    out = np.zeros((max_splats, SPLAT_COLS), dtype=np.float32)
    if len(events) > max_splats:
        raise ValueError(f"{len(events)} splat events > MAX_SPLATS={max_splats}")
    for i, (x, y, dx, dy, color) in enumerate(events):
        out[i] = [x, y, dx, dy, color[0], color[1], color[2], 1.0]
    return jnp.asarray(out)
