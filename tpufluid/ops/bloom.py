"""Bloom: soft-knee prefilter + mip pyramid blur (reference applyBloom,
/root/reference/script.js:1350-1394, shaders 614-674).

Pipeline (sizes from FluidConfig.bloom_size / bloom_mip_sizes):
  1. prefilter: dye resampled to the bloom base, soft-knee thresholded
     (curve = (T - knee, 2*knee, 0.25/knee), knee = T*K + 1e-4).
  2. downsample: 4-tap cross blur (taps at +/-1 *source* texel, bilinear,
     averaged) into each successively halved mip.
  3. upsample: same 4-tap blur, additively blended (GL ONE,ONE) into the next
     larger mip.
  4. final: 4-tap blur of mip 0 into the base size, scaled by BLOOM_INTENSITY.

Skipped entirely when the chain has < 2 mips (script.js:1351-1352).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp

from tpufluid.ops.sampling import resample_bilinear, sample_affine


def bloom_prefilter(dye_rgb: jnp.ndarray, out_hw: Tuple[int, int],
                    threshold: float, soft_knee: float) -> jnp.ndarray:
    """Soft-knee threshold (bloomPrefilterShader, script.js:614-631)."""
    knee = threshold * soft_knee + 1e-4
    curve0 = threshold - knee
    curve1 = knee * 2.0
    curve2 = 0.25 / knee
    c = resample_bilinear(dye_rgb, out_hw)
    br = jnp.max(c, axis=0)
    rq = jnp.clip(br - curve0, 0.0, curve1)
    rq = curve2 * rq * rq
    scale = jnp.maximum(rq, br - threshold) / jnp.maximum(br, 1e-4)
    return c * scale[None]


def blur4(src: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """4-tap cross average at +/-1 source texel (bloomBlurShader, script.js:633-652).

    Target texel centers sample the source bilinearly at uv +/- (1/sw, 0) and
    uv +/- (0, 1/sh); the average of the four taps is the dual up/downsample
    filter of the reference's mip chain. Offsets are constant, so every tap
    is a separable affine sample (no 2-D gather).
    """
    sh, sw = src.shape[-2], src.shape[-1]
    tx, ty = 1.0 / sw, 1.0 / sh
    s = sample_affine(src, out_hw, ou=-tx)
    s = s + sample_affine(src, out_hw, ou=tx)
    s = s + sample_affine(src, out_hw, ov=-ty)
    s = s + sample_affine(src, out_hw, ov=ty)
    return s * 0.25


def apply_bloom(dye_rgb: jnp.ndarray, base_hw: Tuple[int, int],
                mip_sizes: Sequence[Tuple[int, int]], threshold: float,
                soft_knee: float, intensity: float) -> jnp.ndarray:
    """Full bloom chain -> (3, base_h, base_w), or zeros when < 2 mips."""
    if len(mip_sizes) < 2:
        return jnp.zeros((3,) + tuple(base_hw), dtype=dye_rgb.dtype)

    last = bloom_prefilter(dye_rgb, base_hw, threshold, soft_knee)

    mips = []
    for (mw, mh) in mip_sizes:
        last = blur4(last, (mh, mw))
        mips.append(last)

    # Additive upsample (GL blend ONE,ONE): dest += blur4(src) .
    for i in range(len(mips) - 2, -1, -1):
        mips[i] = mips[i] + blur4(last, mips[i].shape[-2:])
        last = mips[i]

    return blur4(last, base_hw) * intensity
