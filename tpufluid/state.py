"""FluidState — the functional replacement for the reference's FBO ping-pong.

The reference holds its fields in double-buffered GL textures
(createFBO/createDoubleFBO, /root/reference/script.js:1045-1106); here the
state is a pytree of arrays, and "swap" disappears: every op returns new
arrays and jit buffer donation lets XLA alias them in place.

Layout is channels-first (C, H, W): the trailing (H, W) dims map onto TPU
(sublane, lane) tiles so every stencil/elementwise op vectorizes on the VPU.
Row index i is the WebGL ``v`` axis (v = (i + 0.5) / H, bottom-up), column
index j is ``u``. Frames are flipped at PNG export exactly like the
reference's normalizeTexture (script.js:309-323).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from tpufluid.config import FluidConfig


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class FluidState:
    """Simulation fields.

    velocity: (2, H, W)  — channel 0 = u (x-component), 1 = v (y-component),
              in sim-grid texels/second (reference velocity RG16F texture).
    dye:      (3, Hd, Wd) — RGB density (reference dye RGBA16F texture).
    pressure: (H, W)      — scalar pressure (reference pressure R16F texture);
              carried across frames for the 0.8x warm start (script.js:1253-1257).
    """

    velocity: jax.Array
    dye: jax.Array
    pressure: jax.Array

    @property
    def sim_shape(self) -> Tuple[int, int]:
        return self.velocity.shape[-2:]

    @property
    def dye_shape(self) -> Tuple[int, int]:
        return self.dye.shape[-2:]


def init_state(config: FluidConfig) -> FluidState:
    """Allocate zeroed fields per config (reference initFramebuffers, script.js:982-1010)."""
    sw, sh = config.sim_size
    dw, dh = config.dye_size
    dt = config.dtype
    return FluidState(
        velocity=jnp.zeros((2, sh, sw), dtype=dt),
        dye=jnp.zeros((3, dh, dw), dtype=dt),
        pressure=jnp.zeros((sh, sw), dtype=dt),
    )


def resize_state(state: FluidState, config: FluidConfig) -> FluidState:
    """Resample a running state into the sizes demanded by ``config``.

    Mirrors initFramebuffers (script.js:982-1010): dye and velocity go through
    resizeDoubleFBO (script.js:1108-1126), so their *read* contents survive by
    GPU bilinear resample; divergence, curl AND pressure are *re-created*
    (createFBO/createDoubleFBO, script.js:1004-1006), so pressure restarts at
    zero — the next frame's 0.8x warm start multiplies a zeroed field.
    """
    from tpufluid.ops.sampling import resample_bilinear

    sw, sh = config.sim_size
    dw, dh = config.dye_size
    dt = config.dtype

    def maybe(field, h, w):
        if field.shape[-2:] == (h, w):
            return field.astype(dt)
        return resample_bilinear(field.astype(jnp.float32), (h, w)).astype(dt)

    return FluidState(
        velocity=maybe(state.velocity, sh, sw),
        dye=maybe(state.dye, dh, dw),
        pressure=jnp.zeros((sh, sw), dtype=dt),
    )


def state_bytes(state: FluidState) -> int:
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(state))
