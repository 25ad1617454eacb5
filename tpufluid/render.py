"""render(state) -> RGBA frame — reference render(target)
(/root/reference/script.js:1296-1348) as one pure jitted function.

Order (matching the reference exactly):
  bloom chain -> sunrays (mask, march, 1x blur) -> background (flat BACK_COLOR
  or checkerboard in transparent screen mode) -> display composite, blended
  premultiplied (ONE, ONE_MINUS_SRC_ALPHA) unless rendering an offscreen
  transparent capture (blend disabled, raw RGBA out).

Output is a float (4, H, W) RGBA array in [0, ~]; quantization to uint8 PNG
(clamp01 * 255 + vertical flip, reference normalizeTexture script.js:309-323)
happens in tpufluid.io.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from tpufluid.config import FluidConfig
from tpufluid.ops.bloom import apply_bloom
from tpufluid.ops.display import blend_premultiplied, checkerboard, display_composite
from tpufluid.ops.sunrays import apply_sunrays
from tpufluid.state import FluidState
from tpufluid.utils.bluenoise import blue_noise_64


def render_frame(
    state: FluidState,
    config: FluidConfig,
    out_hw: Optional[Tuple[int, int]] = None,
    to_screen: bool = True,
    dither: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Render the full display pipeline -> (4, out_h, out_w) float RGBA.

    to_screen=False is the offscreen-capture path (captureScreenshot,
    script.js:287-299): with TRANSPARENT it skips background and blending.
    """
    if out_hw is None:
        out_hw = (config.CANVAS_HEIGHT, config.CANVAS_WIDTH)
    dye = state.dye.astype(jnp.float32)

    bloom_tex = None
    if config.BLOOM:
        bw, bh = config.bloom_size
        mips = config.bloom_mip_sizes()
        if config.USE_PALLAS:
            from tpufluid.ops.pallas import dispatch as K
            bloom_tex = K.bloom_chain(
                dye, (bh, bw), mips, config.BLOOM_THRESHOLD,
                config.BLOOM_SOFT_KNEE, config.BLOOM_INTENSITY)
        if bloom_tex is None:
            bloom_tex = apply_bloom(
                dye, (bh, bw), mips,
                config.BLOOM_THRESHOLD, config.BLOOM_SOFT_KNEE,
                config.BLOOM_INTENSITY,
            )

    sunrays_tex = None
    if config.SUNRAYS:
        sw, sh = config.sunrays_size
        sunrays_tex = apply_sunrays(dye, (sh, sw), config.SUNRAYS_WEIGHT)

    if config.BLOOM and dither is None:
        dither = jnp.asarray(blue_noise_64())

    display = None
    if config.USE_PALLAS:
        from tpufluid.ops.pallas import dispatch as K
        display = K.display_full(dye, out_hw, config.SHADING, bloom_tex,
                                 sunrays_tex, dither if config.BLOOM else None)
    if display is None:
        base = (K.display_base(dye, out_hw, config.SHADING)
                if config.USE_PALLAS else None)
        display = display_composite(
            dye, out_hw,
            shading=config.SHADING,
            bloom_tex=bloom_tex,
            sunrays_tex=sunrays_tex,
            dither_tex=dither if config.BLOOM else None,
            base=base,
        )

    blend = to_screen or not config.TRANSPARENT  # script.js:1304-1310
    if not config.TRANSPARENT:
        r, g, b = config.BACK_COLOR
        back = jnp.concatenate([
            jnp.full((1,) + out_hw, r / 255.0, jnp.float32),
            jnp.full((1,) + out_hw, g / 255.0, jnp.float32),
            jnp.full((1,) + out_hw, b / 255.0, jnp.float32),
            jnp.ones((1,) + out_hw, jnp.float32),
        ])
    elif to_screen:
        back = checkerboard(out_hw, config.aspect_ratio)
    else:
        back = None

    if blend and back is not None:
        return blend_premultiplied(display, back)
    return display


@lru_cache(maxsize=None)
def make_render(config: FluidConfig, out_hw: Optional[Tuple[int, int]] = None,
                to_screen: bool = True):
    """Compile render(state, dither) for a given config/target size."""
    fn = partial(render_frame, config=config, out_hw=out_hw, to_screen=to_screen)

    def render(state: FluidState, dither: Optional[jnp.ndarray] = None):
        return fn(state, dither=dither)

    return jax.jit(render)


def capture_frame(state: FluidState, config: FluidConfig,
                  dither: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Offscreen capture at CAPTURE_RESOLUTION (captureScreenshot, script.js:287-299)."""
    cw, ch = config.capture_size
    return render_frame(state, config, out_hw=(ch, cw), to_screen=False, dither=dither)


@lru_cache(maxsize=None)
def make_step_and_render(config: FluidConfig,
                         out_hw: Optional[Tuple[int, int]] = None,
                         dither_path: Optional[str] = None):
    """One jitted dispatch per interactive frame: step + render + uint8
    quantize + vertical flip ON-DEVICE -> (state, (h, w, 3) uint8 top-down).

    The interactive server's frame rate is dispatch-bound on tunneled
    backends (~450 us per dispatch): fusing the reference's per-frame
    step(dt) + render(null) pair (script.js:1182-1184) into one dispatch and
    shipping 3-byte pixels instead of f32 RGBA cuts both the dispatch count
    and the device->host transfer.

    dither_path: optional external dither PNG (a PATH so this factory stays
    lru_cache-hashable) baked into the compiled frame as a constant — the
    analog of the reference's createTextureAsync'd LDR_LLL1_0.png
    (script.js:960,1128-1158)."""
    return jax.jit(tick_body(config, out_hw, dither_path), donate_argnums=0)


def tick_body(config: FluidConfig, out_hw: Optional[Tuple[int, int]] = None,
              dither_path: Optional[str] = None):
    """The UNJITTED per-frame body (step + render + uint8 quantize + flip):
    shared by the single-session server (jitted directly above) and the
    multi-tenant server (vmapped over sessions, serve_batch.make_batched_tick)
    so the two frame pipelines cannot drift apart."""
    from tpufluid.step import fluid_step

    def tick(state: FluidState, dt, splats):
        state = fluid_step(state, dt, splats, config)
        return state, frame_u8(state, config, out_hw=out_hw,
                               dither_path=dither_path)

    return tick


def frame_u8(state: FluidState, config: FluidConfig,
             out_hw: Optional[Tuple[int, int]] = None,
             dither_path: Optional[str] = None) -> jnp.ndarray:
    """Rendered frame in the servers' wire format, computed ON DEVICE:
    render + clip01*255 quantize + vertical flip -> (h, w, 3) uint8
    top-down. Shared by tick_body and the fast-forward substepped tick
    (serve_batch.make_substepped_tick), which renders ONCE after its K
    substeps rather than per substep."""
    dither = None
    if dither_path is not None:
        from tpufluid.io import load_dither

        dither = jnp.asarray(load_dither(dither_path))
    frame = render_frame(state, config, out_hw=out_hw, dither=dither)
    rgb = (jnp.clip(frame[:3], 0.0, 1.0) * 255.0).astype(jnp.uint8)
    return jnp.transpose(rgb, (1, 2, 0))[::-1]
