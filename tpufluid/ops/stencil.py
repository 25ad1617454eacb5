"""5-point stencil kernels: curl, divergence, vorticity confinement, Jacobi, gradient subtract.

Pure-jnp implementations of the reference's stencil shaders
(/root/reference/script.js:786-913 and 835-866). They are the numerical spec
and test oracle; `tpufluid.ops.pallas` provides fused TPU kernels with the
same semantics.

Grid convention: arrays are (H, W) with row i = WebGL v axis (up), col j = u.
Neighbor reads go through CLAMP_TO_EDGE (out-of-range tap returns the edge
texel — the texture wrap set in script.js:1051-1052), so at a boundary
"neighbor" == "self". The one exception is the divergence shader's explicit
no-slip reflection: an out-of-range velocity tap contributes -center
(script.js:804-807).

Computation runs in the array dtype of the input; callers hold state in
float32 (or bfloat16 for scale runs) — both at or above the reference's
half-float/mediump fidelity.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def neighbors_clamped(f: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(L, R, T, B) of a (..., H, W) field with clamp-to-edge semantics.

    L/R shift along the u (col) axis, T/B along the v (row) axis; T is +v.
    One edge-pad + four slices — XLA fuses these into the consuming stencil.
    """
    pad = [(0, 0)] * (f.ndim - 2) + [(1, 1), (1, 1)]
    p = jnp.pad(f, pad, mode="edge")
    L = p[..., 1:-1, 0:-2]
    R = p[..., 1:-1, 2:]
    B = p[..., 0:-2, 1:-1]
    T = p[..., 2:, 1:-1]
    return L, R, T, B


def curl(velocity: jnp.ndarray) -> jnp.ndarray:
    """Vorticity = 0.5 * (R.y - L.y - T.x + B.x)  (curlShader, script.js:814-833)."""
    u, v = velocity[0], velocity[1]
    Lv, Rv, _, _ = neighbors_clamped(v)
    _, _, Tu, Bu = neighbors_clamped(u)
    return 0.5 * (Rv - Lv - Tu + Bu)


def vorticity_confinement(velocity: jnp.ndarray, curl_field: jnp.ndarray,
                          curl_strength: float, dt: jnp.ndarray) -> jnp.ndarray:
    """Vorticity confinement force (vorticityShader, script.js:835-866).

    force = 0.5 * (|T|-|B|, |R|-|L|) normalized (+1e-4), scaled by
    curl_strength * C, with force.y negated; velocity += force * dt, then
    clamped to +/-1000.
    """
    # The reference shader is highp (f32); compute f32, store in field dtype.
    cf = curl_field.astype(jnp.float32)
    L, R, T, B = neighbors_clamped(cf)
    fx = 0.5 * (jnp.abs(T) - jnp.abs(B))
    fy = 0.5 * (jnp.abs(R) - jnp.abs(L))
    inv_len = 1.0 / (jnp.sqrt(fx * fx + fy * fy) + 1e-4)
    scale = curl_strength * cf * inv_len
    fx = fx * scale
    fy = -(fy * scale)
    vel = velocity.astype(jnp.float32)
    out = jnp.stack([vel[0] + fx * dt, vel[1] + fy * dt])
    return jnp.clip(out, -1000.0, 1000.0).astype(velocity.dtype)


def divergence(velocity: jnp.ndarray) -> jnp.ndarray:
    """div = 0.5 * (R.x - L.x + T.y - B.y) with no-slip boundary reflection.

    divergenceShader (script.js:786-812): an out-of-range neighbor tap is
    replaced by -C (the negated center component), i.e. velocity reflects at
    the walls. Implemented by overwriting the clamped-edge tap on the border
    rows/cols.
    """
    u, v = velocity[0], velocity[1]
    Lu, Ru, _, _ = neighbors_clamped(u)
    _, _, Tv, Bv = neighbors_clamped(v)
    # Clamped edge tap returned C; the shader wants -C there.
    Lu = Lu.at[:, 0].set(-u[:, 0])
    Ru = Ru.at[:, -1].set(-u[:, -1])
    Bv = Bv.at[0, :].set(-v[0, :])
    Tv = Tv.at[-1, :].set(-v[-1, :])
    return 0.5 * (Ru - Lu + Tv - Bv)


def jacobi_pressure(pressure: jnp.ndarray, div: jnp.ndarray, iterations: int) -> jnp.ndarray:
    """``iterations`` Jacobi sweeps: p' = (L + R + B + T - div) * 0.25.

    pressureShader (script.js:868-890) run PRESSURE_ITERATIONS times
    (script.js:1259-1266). Clamp-to-edge neighbors give the Neumann boundary.
    The loop is a lax.fori_loop so the whole solve stays inside one XLA
    computation — the reference pays one GL draw call per sweep.
    """

    def body(_, p):
        L, R, T, B = neighbors_clamped(p)
        return (L + R + T + B - div) * 0.25

    return jax.lax.fori_loop(0, iterations, body, pressure, unroll=4)


def gradient_subtract(velocity: jnp.ndarray, pressure: jnp.ndarray) -> jnp.ndarray:
    """v -= (R - L, T - B) of pressure (gradientSubtractShader, script.js:892-913).

    Parity note: the reference omits the 0.5 on this central difference
    (GPU Gems ch.38 includes it), so the projection over-subtracts 2x and a
    single projection flips the sign of smooth divergence rather than
    zeroing it; stability comes from re-projecting every frame plus
    dissipation. Reproduced as-is for behavioral parity.
    """
    L, R, T, B = neighbors_clamped(pressure)
    return jnp.stack([velocity[0] - (R - L), velocity[1] - (T - B)])
