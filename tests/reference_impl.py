"""Independent NumPy oracle for every kernel — written straight from the math
documented in SURVEY.md §2.3 (the GLSL shader table), deliberately loop-based
and separate from the jnp implementations it validates.

Grid convention matches tpufluid: (H, W) arrays, row = v (up), col = u.
"""

from __future__ import annotations

import numpy as np


def _clamp_idx(i, n):
    return min(max(i, 0), n - 1)


def np_neighbors(f):
    """Clamp-to-edge L, R, T, B of an (H, W) field."""
    h, w = f.shape
    L = np.empty_like(f)
    R = np.empty_like(f)
    T = np.empty_like(f)
    B = np.empty_like(f)
    for i in range(h):
        for j in range(w):
            L[i, j] = f[i, _clamp_idx(j - 1, w)]
            R[i, j] = f[i, _clamp_idx(j + 1, w)]
            T[i, j] = f[_clamp_idx(i + 1, h), j]
            B[i, j] = f[_clamp_idx(i - 1, h), j]
    return L, R, T, B


def np_curl(vel):
    u, v = vel[0], vel[1]
    Lv, Rv, _, _ = np_neighbors(v)
    _, _, Tu, Bu = np_neighbors(u)
    return 0.5 * (Rv - Lv - Tu + Bu)


def np_divergence(vel):
    """0.5*(R.x-L.x+T.y-B.y) with -C reflection at walls."""
    u, v = vel[0], vel[1]
    h, w = u.shape
    out = np.zeros((h, w), dtype=u.dtype)
    for i in range(h):
        for j in range(w):
            L = -u[i, j] if j - 1 < 0 else u[i, j - 1]
            R = -u[i, j] if j + 1 >= w else u[i, j + 1]
            B = -v[i, j] if i - 1 < 0 else v[i - 1, j]
            T = -v[i, j] if i + 1 >= h else v[i + 1, j]
            out[i, j] = 0.5 * (R - L + T - B)
    return out


def np_vorticity(vel, curl_field, curl_strength, dt):
    L, R, T, B = np_neighbors(curl_field)
    C = curl_field
    fx = 0.5 * (np.abs(T) - np.abs(B))
    fy = 0.5 * (np.abs(R) - np.abs(L))
    norm = np.sqrt(fx * fx + fy * fy) + 1e-4
    fx = fx / norm * curl_strength * C
    fy = fy / norm * curl_strength * C
    fy = -fy
    out = np.stack([vel[0] + fx * dt, vel[1] + fy * dt])
    return np.clip(out, -1000.0, 1000.0)


def np_jacobi(p, div, iterations):
    for _ in range(iterations):
        L, R, T, B = np_neighbors(p)
        p = (L + R + T + B - div) * 0.25
    return p


def np_gradient_subtract(vel, p):
    L, R, T, B = np_neighbors(p)
    return np.stack([vel[0] - (R - L), vel[1] - (T - B)])


def np_sample_bilinear(tex, u, v):
    """texture2D LINEAR + CLAMP_TO_EDGE at scalar uv. tex (H, W) or (C, H, W)."""
    single = tex.ndim == 2
    if single:
        tex = tex[None]
    _, h, w = tex.shape
    x = u * w - 0.5
    y = v * h - 0.5
    x0, y0 = int(np.floor(x)), int(np.floor(y))
    fx, fy = x - x0, y - y0
    ix0, ix1 = _clamp_idx(x0, w), _clamp_idx(x0 + 1, w)
    iy0, iy1 = _clamp_idx(y0, h), _clamp_idx(y0 + 1, h)
    a = tex[:, iy0, ix0]
    b = tex[:, iy0, ix1]
    c = tex[:, iy1, ix0]
    d = tex[:, iy1, ix1]
    out = (a * (1 - fx) + b * fx) * (1 - fy) + (c * (1 - fx) + d * fx) * fy
    return out[0] if single else out


def np_advect(vel, source, dt, dissipation):
    """Semi-Lagrangian: coord = uv - dt*vel(uv)*simTexel; bilinear; /(1+k*dt)."""
    single = source.ndim == 2
    src = source[None] if single else source
    c, h, w = src.shape
    sh, sw = vel.shape[1], vel.shape[2]
    out = np.zeros_like(src)
    for i in range(h):
        for j in range(w):
            uu = (j + 0.5) / w
            vv = (i + 0.5) / h
            if (sh, sw) == (h, w):
                vel_u, vel_v = vel[0, i, j], vel[1, i, j]
            else:
                vel_u = np_sample_bilinear(vel[0], uu, vv)
                vel_v = np_sample_bilinear(vel[1], uu, vv)
            cu = uu - dt * vel_u / sw
            cv = vv - dt * vel_v / sh
            out[:, i, j] = np_sample_bilinear(src, cu, cv)
    out = out / (1.0 + dissipation * dt)
    return out[0] if single else out


def np_splat(field, x, y, amount, radius, aspect):
    c, h, w = field.shape
    out = field.copy()
    for i in range(h):
        for j in range(w):
            px = ((j + 0.5) / w - x) * aspect
            py = (i + 0.5) / h - y
            g = np.exp(-(px * px + py * py) / radius)
            out[:, i, j] += np.asarray(amount) * g
    return out
