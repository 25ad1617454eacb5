"""Shared-exponent RGB9E5 packing for the dye gather (TPU-only lever; no
reference counterpart — the reference stores dye as RGBA16F,
/root/reference/script.js:145-153).

`tpu.dynamic_gather` is 32-bit-only, so the bf16 dye gather issues one
gather per 32 bits fetched: with 16-bit channels the 3-channel bilinear
x-corners (2 corners x 3 channels = six 16-bit values) cost 3 gathers per
trip — the information-theoretic floor AT 16-bit storage. Packing all three
channels into ONE uint32 with a shared 5-bit exponent (the OpenGL/WebGL
RGB9E5 texture format: three 9-bit unsigned mantissas, exponent bias 15)
fetches a full RGB texel per 32 bits: 2 gathers per trip, under that floor.

Fidelity: 9 mantissa bits per channel vs bfloat16's 8 — BETTER than bf16
for any channel within 2^9 of the texel max, and a channel smaller than
max/2^9 contributes <0.2% of the texel's brightness (invisible in the
display composite). Negative dye clamps to 0 (the format is unsigned; dye
is non-negative by construction — splats add positive colors, bilinear
lerps are convex, dissipation divides).

The functions are pure jnp bit math, usable identically inside Pallas
kernels (pack at window staging, unpack after each gather) and in the jnp
oracle (quantize the source field before sampling) — kernel-vs-oracle
equality stays exact because both sides run the same procedure. Packing is
re-derived from bf16 storage every step, so quantization error does NOT
accumulate: it is one extra rounding of the sampled source, the same class
of noise as the bf16 storage rounding it rides on.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

# Largest representable value: mantissa 511/512 at shared exponent 31-15=16.
MAX_RGB9E5 = (511.0 / 512.0) * float(1 << 16)  # 65408.0


def rgb9e5_pack(rgb: jnp.ndarray) -> jnp.ndarray:
    """(3, ...) float -> (...) uint32. Layout: m_r bits 0..8, m_g 9..17,
    m_b 18..26, biased shared exponent E bits 27..31; value of channel i is
    m_i * 2^(E - 24) (i.e. mantissa/512 * 2^(E-15))."""
    r = jnp.clip(rgb[0].astype(jnp.float32), 0.0, MAX_RGB9E5)
    g = jnp.clip(rgb[1].astype(jnp.float32), 0.0, MAX_RGB9E5)
    b = jnp.clip(rgb[2].astype(jnp.float32), 0.0, MAX_RGB9E5)
    maxc = jnp.maximum(r, jnp.maximum(g, b))
    # floor(log2(maxc)) from the f32 exponent field (denormal/zero maxc
    # yields e = -127 -> E = 0, mantissas 0 -> packed 0, correct).
    e = (lax.bitcast_convert_type(maxc, jnp.uint32) >> 23).astype(jnp.int32) - 127
    E = jnp.clip(e + 16, 0, 31)
    # scale = 2^(24 - E), assembled from exponent bits (151 - E in [120, 151]).
    scale = lax.bitcast_convert_type(
        jnp.left_shift(151 - E, 23).astype(jnp.uint32), jnp.float32)
    mr = jnp.floor(r * scale + 0.5).astype(jnp.int32)
    mg = jnp.floor(g * scale + 0.5).astype(jnp.int32)
    mb = jnp.floor(b * scale + 0.5).astype(jnp.int32)
    # Round-up overflow (maxc * scale in [511.5, 512)): re-round every
    # mantissa at the bumped exponent (scale/2 is exact) — floor-halving the
    # already-rounded mantissas would double the worst-case error to 2^-8.
    over = jnp.maximum(mr, jnp.maximum(mg, mb)) > 511
    half = scale * 0.5
    mr = jnp.where(over, jnp.floor(r * half + 0.5).astype(jnp.int32), mr)
    mg = jnp.where(over, jnp.floor(g * half + 0.5).astype(jnp.int32), mg)
    mb = jnp.where(over, jnp.floor(b * half + 0.5).astype(jnp.int32), mb)
    E = jnp.where(over, E + 1, E)
    packed = (mr | jnp.left_shift(mg, 9) | jnp.left_shift(mb, 18)
              | jnp.left_shift(E, 27))
    return packed.astype(jnp.uint32)


def rgb9e5_unpack(p: jnp.ndarray) -> jnp.ndarray:
    """(...) uint32 -> (3, ...) float32."""
    pi = p.astype(jnp.uint32)
    mask = jnp.uint32(0x1FF)
    m_r = (pi & mask).astype(jnp.int32).astype(jnp.float32)
    m_g = ((pi >> 9) & mask).astype(jnp.int32).astype(jnp.float32)
    m_b = ((pi >> 18) & mask).astype(jnp.int32).astype(jnp.float32)
    E = (pi >> 27).astype(jnp.int32)
    # scale = 2^(E - 24), assembled from exponent bits (E + 103 in [103, 134]).
    scale = lax.bitcast_convert_type(
        jnp.left_shift(E + 103, 23).astype(jnp.uint32), jnp.float32)
    return jnp.stack([m_r * scale, m_g * scale, m_b * scale])


def rgb9e5_roundtrip(rgb: jnp.ndarray) -> jnp.ndarray:
    """Quantize a (3, ...) field through RGB9E5 storage (float32 out)."""
    return rgb9e5_unpack(rgb9e5_pack(rgb))


# --- IEEE binary16 bit machinery for the channel-packed f16 gather --------
#
# float16 is the reference's LITERAL storage format (RGBA16F/RG16F/R16F,
# script.js:145-153). Mosaic has no f16 refs/vectors ("Unsupported type in
# mosaic dialect: f16", measured on device), but tpu.dynamic_gather is
# 32-bit-only anyway — so exactly like the bf16 kernels, two 16-bit channels
# ride one uint32 gather lane; the only difference is WHERE the bits
# pack/unpack: bf16 packs in-kernel from a native ref, f16 packs OUTSIDE
# (XLA bitcasts over the f16 state) and DECODES to f32 in-register after the
# gather. The decode below is exact for every finite half (subnormals take
# an integer path — no f32-subnormal arithmetic, so a flush-to-zero VPU
# cannot corrupt them) and fixes up inf/nan, so kernel results stay
# bit-identical to the staged-f32 path (XLA's convert_element_type).


def f16_bits_to_f32(bits: jnp.ndarray) -> jnp.ndarray:
    """uint32 whose LOW 16 bits hold an IEEE binary16 -> exact float32.
    Bits above 16 are ignored. Pure jnp bit math, Pallas-safe."""
    u = bits.astype(jnp.uint32)
    em = (u & jnp.uint32(0x7FFF)) << 13  # exp+mantissa in f32 position
    sign = (u & jnp.uint32(0x8000)) << 16
    # Normals: exponent rebias 127-15 is an integer add on the bit pattern.
    norm = em + jnp.uint32(112 << 23)
    # Subnormals (half exponent 0): value is m * 2^-24 exactly; int->float
    # convert is exact for m <= 1023 and the result is a NORMAL f32.
    m = (u & jnp.uint32(0x3FF)).astype(jnp.int32)
    sub = m.astype(jnp.float32) * jnp.float32(2.0 ** -24)
    mag = jnp.where(em < jnp.uint32(1 << 23),  # half exponent field == 0
                    sub,
                    lax.bitcast_convert_type(
                        # inf/nan (half exponent 31): force f32 exponent 255,
                        # keeping the shifted mantissa (nan payload).
                        jnp.where(em >= jnp.uint32(0x1F << 23),
                                  em + jnp.uint32(0xE0 << 23),
                                  norm),
                        jnp.float32))
    return lax.bitcast_convert_type(
        sign | lax.bitcast_convert_type(mag, jnp.uint32), jnp.float32)


def f16_pack(lo: jnp.ndarray, hi) -> jnp.ndarray:
    """Pack two float16 planes into one uint32 plane (lo in bits 0..15)."""
    b_lo = lax.bitcast_convert_type(lo, jnp.uint16).astype(jnp.uint32)
    if hi is None:
        return b_lo
    b_hi = lax.bitcast_convert_type(hi, jnp.uint16).astype(jnp.uint32)
    return b_lo | (b_hi << 16)


def f16_pack_xpair(v: jnp.ndarray) -> jnp.ndarray:
    """Pack the COLUMN pair (v[x], v[x+1]) of one f16 plane into uint32
    (v[x] low); the last lane pairs with itself — CLAMP_TO_EDGE's
    x1 = min(x0+1, edge). The f16 analog of the bf16 kernel's
    _pack_bf16_xpair: one gather yields BOTH bilinear x-corners of an odd
    trailing channel."""
    b = lax.bitcast_convert_type(v, jnp.uint16).astype(jnp.uint32)
    nxt = jnp.concatenate([b[..., 1:], b[..., -1:]], axis=-1)
    return b | (nxt << 16)


def f16_pack_planes(src: jnp.ndarray) -> jnp.ndarray:
    """(C, H, W) float16 -> (ceil(C/2), H, W) uint32 gather planes: full
    channel pairs share a plane (both channels at one bilinear corner per
    gather); an odd trailing channel packs its own column pair instead
    (both corners in one gather). Mirrors the bf16 kernels' in-kernel
    packing layout exactly (ops/pallas/advect._advect_kernel)."""
    c = src.shape[0]
    cp = (c + 1) // 2
    return jnp.stack([
        f16_pack(src[2 * k], src[2 * k + 1]) if 2 * k + 1 < c
        else f16_pack_xpair(src[2 * k])
        for k in range(cp)])
