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


def np_sample_bilinear_wrap(tex, u, v):
    """texture2D LINEAR + REPEAT wrap (the dither texture, script.js:1128-1158)."""
    h, w = tex.shape[-2], tex.shape[-1]
    x = u * w - 0.5
    y = v * h - 0.5
    x0, y0 = int(np.floor(x)), int(np.floor(y))
    fx, fy = x - x0, y - y0
    ix0, ix1 = x0 % w, (x0 + 1) % w
    iy0, iy1 = y0 % h, (y0 + 1) % h
    a = tex[..., iy0, ix0]
    b = tex[..., iy0, ix1]
    c = tex[..., iy1, ix0]
    d = tex[..., iy1, ix1]
    return (a * (1 - fx) + b * fx) * (1 - fy) + (c * (1 - fx) + d * fx) * fy


def _np_resample(tex, out_h, out_w, sampler=np_sample_bilinear):
    c = tex.shape[0] if tex.ndim == 3 else 1
    out = np.zeros(((c,) if tex.ndim == 3 else ()) + (out_h, out_w), np.float32)
    for i in range(out_h):
        for j in range(out_w):
            out[..., i, j] = sampler(tex, (j + 0.5) / out_w, (i + 0.5) / out_h)
    return out


def np_bloom_prefilter(dye, out_h, out_w, threshold, soft_knee):
    """bloomPrefilterShader (script.js:614-631)."""
    knee = threshold * soft_knee + 1e-4
    curve = (threshold - knee, knee * 2.0, 0.25 / knee)
    out = np.zeros((3, out_h, out_w), np.float32)
    for i in range(out_h):
        for j in range(out_w):
            c = np_sample_bilinear(dye, (j + 0.5) / out_w, (i + 0.5) / out_h)
            br = max(c[0], c[1], c[2])
            rq = min(max(br - curve[0], 0.0), curve[1])
            rq = curve[2] * rq * rq
            c = c * max(rq, br - threshold) / max(br, 1e-4)
            out[:, i, j] = c
    return out


def np_bloom_blur4(src, out_h, out_w):
    """bloomBlurShader: 4-tap cross at +/-1 SOURCE texel (script.js:633-652,
    texelSize bound to the source being read, script.js:1370)."""
    sh, sw = src.shape[-2], src.shape[-1]
    tx, ty = 1.0 / sw, 1.0 / sh
    out = np.zeros(src.shape[:-2] + (out_h, out_w), np.float32)
    for i in range(out_h):
        for j in range(out_w):
            u, v = (j + 0.5) / out_w, (i + 0.5) / out_h
            s = (np_sample_bilinear(src, u - tx, v)
                 + np_sample_bilinear(src, u + tx, v)
                 + np_sample_bilinear(src, u, v - ty)
                 + np_sample_bilinear(src, u, v + ty))
            out[..., i, j] = s * 0.25
    return out


def np_apply_bloom(dye, base_hw, mip_sizes, threshold, soft_knee, intensity,
                   q=lambda x: x):
    """applyBloom (script.js:1350-1394): prefilter -> down chain -> additive
    up chain -> final x intensity; zeros when < 2 mips.

    ``q`` quantizes each pass's output to its STORAGE format — identity for
    the f32 oracle, round-to-IEEE-half to emulate the reference's RGBA16F
    FBOs (every pass here writes one, script.js:1012-1032)."""
    bh, bw = base_hw
    if len(mip_sizes) < 2:
        return np.zeros((3, bh, bw), np.float32)
    last = q(np_bloom_prefilter(dye, bh, bw, threshold, soft_knee))
    mips = []
    for (mw, mh) in mip_sizes:
        last = q(np_bloom_blur4(last, mh, mw))
        mips.append(last)
    for i in range(len(mips) - 2, -1, -1):
        # additive ONE,ONE blend INTO the mip FBO: the sum itself lands in
        # half-float storage (script.js:1376-1386)
        mips[i] = q(mips[i] + np_bloom_blur4(last, *mips[i].shape[-2:]))
        last = mips[i]
    return q(np_bloom_blur4(last, bh, bw) * intensity)


def np_apply_sunrays(dye, out_h, out_w, weight, q=lambda x: x):
    """sunraysMask + 16-step march + 1x separable blur
    (script.js:676-724, 479-494, 1396-1419). ``q`` as in np_apply_bloom:
    the mask lands in dye.write (RGBA16F), the march and each blur pass in
    R16F FBOs (script.js:1034-1043)."""
    br = dye.max(axis=0)
    mask = q(1.0 - np.minimum(np.maximum(br * 20.0, 0.0), 0.8))
    density, decay0, exposure, iters = 0.3, 0.95, 0.7, 16
    rays = np.zeros((out_h, out_w), np.float32)
    for i in range(out_h):
        for j in range(out_w):
            u, v = (j + 0.5) / out_w, (i + 0.5) / out_h
            du = (u - 0.5) * (density / iters)
            dv = (v - 0.5) * (density / iters)
            cu, cv = u, v
            color = np_sample_bilinear(mask, u, v)
            decay = 1.0
            for _ in range(iters):
                cu -= du
                cv -= dv
                color += np_sample_bilinear(mask, cu, cv) * decay * weight
                decay *= decay0
            rays[i, j] = color * exposure
    rays = q(rays)
    # blurShader: separable 3-tap with 1.33333-texel linear taps, 1 iteration.
    off = 1.33333333
    tx, ty = off / out_w, off / out_h
    tmp = np.zeros_like(rays)
    for i in range(out_h):
        for j in range(out_w):
            u, v = (j + 0.5) / out_w, (i + 0.5) / out_h
            tmp[i, j] = (np_sample_bilinear(rays, u, v) * 0.29411764
                         + np_sample_bilinear(rays, u - tx, v) * 0.35294117
                         + np_sample_bilinear(rays, u + tx, v) * 0.35294117)
    tmp = q(tmp)
    out = np.zeros_like(rays)
    for i in range(out_h):
        for j in range(out_w):
            u, v = (j + 0.5) / out_w, (i + 0.5) / out_h
            out[i, j] = (np_sample_bilinear(tmp, u, v) * 0.29411764
                         + np_sample_bilinear(tmp, u, v - ty) * 0.35294117
                         + np_sample_bilinear(tmp, u, v + ty) * 0.35294117)
    return q(out)


def np_display(dye, out_h, out_w, shading, bloom, sunrays, dither):
    """displayShaderSource with SHADING/BLOOM/SUNRAYS keywords
    (script.js:549-612): RGBA out, alpha = max(r,g,b)."""
    def gamma(c):
        c = np.maximum(c, 0.0)
        return np.maximum(1.055 * np.power(c, 0.416666667) - 0.055, 0.0)

    out = np.zeros((4, out_h, out_w), np.float32)
    tx, ty = 1.0 / out_w, 1.0 / out_h
    for i in range(out_h):
        for j in range(out_w):
            u, v = (j + 0.5) / out_w, (i + 0.5) / out_h
            c = np_sample_bilinear(dye, u, v)
            if shading:
                lc = np.linalg.norm(np_sample_bilinear(dye, u - tx, v))
                rc = np.linalg.norm(np_sample_bilinear(dye, u + tx, v))
                tc = np.linalg.norm(np_sample_bilinear(dye, u, v + ty))
                bc = np.linalg.norm(np_sample_bilinear(dye, u, v - ty))
                dx = rc - lc
                dy = tc - bc
                n = np.array([dx, dy, np.sqrt(tx * tx + ty * ty)])
                n = n / np.linalg.norm(n)
                diffuse = np.clip(n[2] + 0.7, 0.7, 1.0)
                c = c * diffuse
            bl = None
            if bloom is not None:
                bl = np_sample_bilinear(bloom, u, v)
            if sunrays is not None:
                rays = np_sample_bilinear(sunrays, u, v)
                c = c * rays
                if bl is not None:
                    bl = bl * rays
            if bl is not None:
                if dither is not None:
                    scale_x = out_w / dither.shape[-1]
                    scale_y = out_h / dither.shape[-2]
                    noise = np_sample_bilinear_wrap(dither, u * scale_x, v * scale_y)
                    bl = bl + (noise * 2.0 - 1.0) / 255.0
                c = c + gamma(bl)
            out[:3, i, j] = c
            out[3, i, j] = max(c[0], c[1], c[2])
    return out


def quantize_f16(x):
    """Round-to-IEEE-half: the storage rounding every reference pass pays
    when writing its RGBA16F/RG16F/R16F FBO (script.js:145-153)."""
    return np.asarray(x).astype(np.float16).astype(np.float32)


def np_render(dye, config, dither, storage=None):
    """Full render(null) composition (script.js:1296-1348): bloom + sunrays +
    back color + display, blended ONE/ONE_MINUS_SRC_ALPHA.

    storage=quantize_f16 emulates the reference's HALF-FLOAT texture
    pipeline: the input dye and every intermediate pass output round to
    IEEE half exactly where the reference writes a 16F FBO. The default
    (None) is the f32 oracle."""
    q = storage or (lambda x: x)
    dye = q(dye)
    out_h, out_w = config.CANVAS_HEIGHT, config.CANVAS_WIDTH
    bloom = None
    if config.BLOOM:
        bw, bh = config.bloom_size
        bloom = np_apply_bloom(dye, (bh, bw), config.bloom_mip_sizes(),
                               config.BLOOM_THRESHOLD, config.BLOOM_SOFT_KNEE,
                               config.BLOOM_INTENSITY, q=q)
    sunrays = None
    if config.SUNRAYS:
        sw, sh = config.sunrays_size
        sunrays = np_apply_sunrays(dye, sh, sw, config.SUNRAYS_WEIGHT, q=q)
    disp = np_display(dye, out_h, out_w, config.SHADING, bloom, sunrays,
                      dither if config.BLOOM else None)
    r, g, b = config.BACK_COLOR
    back = np.stack([np.full((out_h, out_w), r / 255.0, np.float32),
                     np.full((out_h, out_w), g / 255.0, np.float32),
                     np.full((out_h, out_w), b / 255.0, np.float32),
                     np.ones((out_h, out_w), np.float32)])
    return disp + back * (1.0 - disp[3:4])


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
