"""Semi-Lagrangian advection (advectionShader, /root/reference/script.js:746-784).

For every target texel: backtrace ``coord = uv - dt * velocity(uv) * simTexel``
(velocity is always in *sim-grid texels per second* — even for dye advection
the displacement is scaled by the velocity grid's texel size,
script.js:1276,1288), bilinearly sample the source there, and apply the
reference's dissipation law ``result / (1 + dissipation * dt)``
(script.js:780-781 — rational decay, not exponential).

This is the one kernel that is a *gather* at computed coordinates rather than
a fixed stencil; the jnp version lowers to an XLA gather. A Pallas variant
exploiting the bounded displacement (velocity clamped to +/-1000,
script.js:863) lives in tpufluid.ops.pallas.
"""

from __future__ import annotations

import jax.numpy as jnp

from tpufluid.ops.sampling import sample_bilinear, uv_grid


def advect(velocity: jnp.ndarray, source: jnp.ndarray, dt, dissipation: float,
           quant=None) -> jnp.ndarray:
    """Advect ``source`` (..., H, W) through ``velocity`` (2, Hs, Ws).

    The target grid is the source grid. When the grids differ (dye advection)
    the velocity is sampled bilinearly at the target's texel centers — the
    hardware-LINEAR path of the reference (script.js:776-777); when they match
    (velocity self-advection) the texel-center sample is the texel itself.

    quant="rgb9e5" emulates shared-exponent RGB9E5 source storage (the
    packed-dye gather mode, ops/quant.py): the source quantizes through the
    format before sampling and the lerp runs in float32 — exactly the Pallas
    kernel's procedure (it packs the staged window and unpacks gathered
    corners with the same functions).
    """
    out_dtype = source.dtype
    if quant == "rgb9e5":
        from tpufluid.ops.quant import rgb9e5_roundtrip

        source = rgb9e5_roundtrip(source.astype(jnp.float32))
    h, w = source.shape[-2], source.shape[-1]
    sh, sw = velocity.shape[-2], velocity.shape[-1]
    u, v = uv_grid(h, w, dtype=jnp.float32)

    if (sh, sw) == (h, w):
        vel_u = velocity[0]
        vel_v = velocity[1]
    else:
        vel_u = sample_bilinear(velocity[0], u, v)
        vel_v = sample_bilinear(velocity[1], u, v)

    # Backtraced uv; sample clamps (CLAMP_TO_EDGE), no explicit coord clamp.
    # Coordinates stay float32 for EVERY storage dtype: the reference
    # computes them in highp shader precision regardless of the half-float
    # texture format (script.js:773-777), and the Pallas kernels do the
    # same — casting them to a 16-bit storage dtype would add ~0.25-texel
    # position noise that the reference does not have.
    coord_u = u - dt * vel_u.astype(jnp.float32) / sw
    coord_v = v - dt * vel_v.astype(jnp.float32) / sh
    result = sample_bilinear(source, coord_u, coord_v)
    decay = 1.0 + dissipation * dt
    return (result / decay).astype(out_dtype)
