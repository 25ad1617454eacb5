"""Frame export — reference captureScreenshot pipeline
(/root/reference/script.js:287-349) minus the browser.

``frame_to_uint8`` is normalizeTexture (script.js:309-323): clamp to [0, 1],
scale by 255, truncate to uint8, flip vertically (array row 0 is v=0/bottom;
PNGs are top-down). PNG writing uses Pillow; video export stitches PNGs or
emits raw frames for ffmpeg.
"""

from __future__ import annotations

import os
from typing import Iterable

import numpy as np


def frame_to_uint8(frame_rgba: np.ndarray) -> np.ndarray:
    """(4, H, W) or (3, H, W) float -> (H, W, C) uint8, vertically flipped.

    Already-quantized (H, W, C) uint8 frames (e.g. composited grids of
    per-sim frames) pass through untouched — no second flip/clamp."""
    if (isinstance(frame_rgba, np.ndarray) and frame_rgba.dtype == np.uint8
            and frame_rgba.ndim == 3 and frame_rgba.shape[-1] in (3, 4)):
        return frame_rgba
    arr = np.asarray(frame_rgba, dtype=np.float32)
    arr = np.clip(arr, 0.0, 1.0) * 255.0
    arr = arr.astype(np.uint8)
    arr = np.moveaxis(arr, 0, -1)  # (H, W, C)
    return arr[::-1]  # flip: row 0 becomes top (normalizeTexture, script.js:312)


def save_png(frame_rgba: np.ndarray, path: str) -> None:
    """Write a frame as PNG (reference downloads 'fluid.png', script.js:295-297)."""
    from PIL import Image

    arr = frame_to_uint8(frame_rgba)
    mode = "RGBA" if arr.shape[-1] == 4 else "RGB"
    Image.fromarray(arr, mode=mode).save(path)


def load_png(path: str) -> np.ndarray:
    """Read a PNG back to (C, H, W) float32 in [0,1], bottom-up rows."""
    from PIL import Image

    arr = np.asarray(Image.open(path), dtype=np.float32) / 255.0
    arr = arr[::-1]
    return np.moveaxis(arr, -1, 0).copy()


def save_video_frames(frames: Iterable[np.ndarray], out_dir: str,
                      prefix: str = "frame") -> int:
    """Dump a frame sequence as numbered PNGs (ffmpeg-ready). Returns count."""
    os.makedirs(out_dir, exist_ok=True)
    n = 0
    for i, f in enumerate(frames):
        save_png(f, os.path.join(out_dir, f"{prefix}_{i:06d}.png"))
        n += 1
    return n


def save_gif(frames: Iterable[np.ndarray], path: str, fps: float = 60.0) -> int:
    """Animated GIF export (no ffmpeg in the image; PNG sequence + save_gif
    cover the reference's screenshot/video capability, script.js:287-349)."""
    from PIL import Image

    imgs = [Image.fromarray(frame_to_uint8(f)[..., :3], mode="RGB") for f in frames]
    if not imgs:
        return 0
    imgs[0].save(path, save_all=True, append_images=imgs[1:],
                 duration=max(int(1000.0 / fps), 10), loop=0)
    return len(imgs)


def load_dither(path: str) -> np.ndarray:
    """Load a dither texture PNG -> (H, W) float32 in [0, 1].

    The reference ships a 64x64 blue-noise asset (LDR_LLL1_0.png, loaded by
    createTextureAsync, script.js:960,1128-1158) and its display shader
    samples only the RED channel (texture2D(uDithering, ...).r,
    script.js:602), normalized from 8-bit storage — so an arbitrary
    external PNG reduces to its R channel / 255. Rows keep PNG order (the
    same array orientation the GL acceptance harness uploads, so parity
    holds pixel-for-pixel)."""
    from PIL import Image

    arr = np.asarray(Image.open(path), dtype=np.float32)
    if arr.ndim == 3:
        arr = arr[..., 0]
    return arr / 255.0
