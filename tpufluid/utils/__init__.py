"""tpufluid.utils — color math, blue-noise generation, small helpers."""

from tpufluid.utils.color import hsv_to_rgb, generate_color_np, wrap
from tpufluid.utils.bluenoise import blue_noise_64
