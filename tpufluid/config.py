"""FluidConfig — every tunable of the reference, as a frozen (hashable) dataclass.

Mirrors the 24-knob ``config`` object of the reference
(/root/reference/script.js:59-85) plus TPU-specific policy fields (dtype, mesh
shape, canvas size — the reference gets canvas size from the DOM).

The config is *static* under jit: changing a knob recompiles the step/render
functions, which is the TPU-native analog of the reference's keyword-variant
shader recompilation (script.js:1160-1166) and uniform re-binds.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp

# Storage dtypes. The reference stores all fields as half-float textures
# (RGBA16F/RG16F/R16F, script.js:145-153). float32 exceeds that fidelity and is
# the default; bfloat16 matches the 16-bit-storage budget for large grids.
_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16, "float16": jnp.float16}

# The reference's dt ceiling is the LITERAL 0.016666 (calcDeltaTime,
# script.js:1191), not 1/60 = 0.01666667. At 60 fps the clamp always binds,
# so every reference frame steps at exactly this value; using 1/60 instead
# biases every clamped step by ~4e-5 relative dt. Single source of truth for
# step/trace/server clamps and the serving substep splitter. Note the Pallas
# displacement bounds (ops/pallas/advect.py) are derived from dt <= 1/60,
# which remains a strict upper bound of this clamp.
MAX_DT = 0.016666


@dataclasses.dataclass(frozen=True)
class FluidConfig:
    """All simulation/display tunables. Defaults == reference defaults."""

    # --- resolutions (script.js:60-62) ---
    SIM_RESOLUTION: int = 128
    DYE_RESOLUTION: int = 1024
    CAPTURE_RESOLUTION: int = 512

    # --- simulation (script.js:63-68) ---
    DENSITY_DISSIPATION: float = 1.0
    VELOCITY_DISSIPATION: float = 0.2
    PRESSURE: float = 0.8          # warm-start scale on previous pressure
    PRESSURE_ITERATIONS: int = 20  # Jacobi iterations
    CURL: float = 30.0             # vorticity confinement strength

    # --- splats (script.js:68-69) ---
    SPLAT_RADIUS: float = 0.25
    SPLAT_FORCE: float = 6000.0

    # --- display toggles (script.js:70-74) ---
    SHADING: bool = True
    COLORFUL: bool = True
    COLOR_UPDATE_SPEED: float = 10.0
    PAUSED: bool = False
    BACK_COLOR: Tuple[int, int, int] = (0, 0, 0)  # 0-255, normalized at draw
    TRANSPARENT: bool = False

    # --- bloom (script.js:76-81) ---
    BLOOM: bool = True
    BLOOM_ITERATIONS: int = 8
    BLOOM_RESOLUTION: int = 256
    BLOOM_INTENSITY: float = 0.8
    BLOOM_THRESHOLD: float = 0.6
    BLOOM_SOFT_KNEE: float = 0.7

    # --- sunrays (script.js:82-84) ---
    SUNRAYS: bool = True
    SUNRAYS_RESOLUTION: int = 196
    SUNRAYS_WEIGHT: float = 1.0

    # --- TPU-native policy (no reference equivalent) ---
    # Canvas size: the reference reads the DOM canvas (script.js:1196-1205);
    # headless we fix it. It drives every aspect-ratio-corrected quantity
    # (getResolution, correctRadius, correctDeltaX/Y).
    CANVAS_WIDTH: int = 1280
    CANVAS_HEIGHT: int = 720
    # Storage dtype for the fields ("float32" | "bfloat16" | "float16").
    DTYPE: str = "float32"
    # Max splat events injectable per step (static shape for jit).
    MAX_SPLATS: int = 16
    # Use fused Pallas kernels for the hot stencils where available.
    USE_PALLAS: bool = True
    # bfloat16-mode dye gather: pack all 3 dye channels into ONE uint32 with
    # a shared 5-bit exponent (the WebGL RGB9E5 texture format — 9 mantissa
    # bits per channel vs bf16's 8) so the gather issues 2 loads per trip
    # instead of 3 (ops/quant.py). Quantization is re-derived from bf16
    # storage every step (non-accumulating); negative dye clamps to 0.
    # DEFAULT ON since round 9: the device A/B measured +7.3% at the 1024^2
    # headline and +4.3% at 4096^2 (out/jobs/done/b69_rgb9e5_ab.py.log) with
    # step fidelity inside the bf16-vs-f32 tolerance class
    # (tests/test_tpu.py::test_rgb9e5_dye_on_device). Inert off bfloat16
    # (every consumer gates on dtype); set False for the unquantized
    # bf16 gather.
    DYE_RGB9E5: bool = True
    # Sharded step only: split each row-halo phase into an INTERIOR band
    # (no data dependency on the halo ppermutes — XLA's latency-hiding
    # scheduler can run it while the collectives fly) plus two thin
    # boundary strips computed from the arrived ghosts
    # (parallel/sharded_step._overlap_rows). Exact-equality-tested vs the
    # monolithic path on the virtual 8-device mesh. TRI-STATE: None
    # (default) auto-selects by the MEASURED single-chip crossover —
    # on for grids >= 8192 (+9.6% at 16K, +4.2% at 8192), off below
    # (-11% at 1024; docs/BENCH.md round-11 table, out/jobs/done/b72) —
    # via the ``overlap_halo`` property every consumer reads; True/False
    # force it (real ICI hides more latency, moving the real crossover
    # DOWN, so a multi-chip session may want True at smaller grids).
    OVERLAP_HALO: Optional[bool] = None

    # ---- derived helpers ----

    # Measured split-phase crossover on this slice (docs/BENCH.md): the
    # overlap's extra strip compute beats the monolithic padded block
    # from 8192^2 up, loses below.
    OVERLAP_CROSSOVER = 8192

    @property
    def overlap_halo(self) -> bool:
        """Effective split-phase-overlap switch (see OVERLAP_HALO): the
        explicit setting if given, else ON from the measured >= 8192
        crossover — so sharded users get the right default per grid size
        without hand flags."""
        if self.OVERLAP_HALO is not None:
            return self.OVERLAP_HALO
        return min(self.sim_size) >= self.OVERLAP_CROSSOVER

    @property
    def dtype(self):
        return _DTYPES[self.DTYPE]

    @property
    def aspect_ratio(self) -> float:
        return self.CANVAS_WIDTH / self.CANVAS_HEIGHT

    @property
    def sim_size(self) -> Tuple[int, int]:
        """(width, height) of the velocity/pressure grid."""
        return get_resolution(self.SIM_RESOLUTION, self.CANVAS_WIDTH, self.CANVAS_HEIGHT)

    @property
    def dye_size(self) -> Tuple[int, int]:
        return get_resolution(self.DYE_RESOLUTION, self.CANVAS_WIDTH, self.CANVAS_HEIGHT)

    @property
    def bloom_size(self) -> Tuple[int, int]:
        return get_resolution(self.BLOOM_RESOLUTION, self.CANVAS_WIDTH, self.CANVAS_HEIGHT)

    @property
    def sunrays_size(self) -> Tuple[int, int]:
        return get_resolution(self.SUNRAYS_RESOLUTION, self.CANVAS_WIDTH, self.CANVAS_HEIGHT)

    @property
    def capture_size(self) -> Tuple[int, int]:
        return get_resolution(self.CAPTURE_RESOLUTION, self.CANVAS_WIDTH, self.CANVAS_HEIGHT)

    def bloom_mip_sizes(self) -> Tuple[Tuple[int, int], ...]:
        """Sizes of the bloom mip chain below the base FBO.

        Reference initBloomFramebuffers (script.js:1012-1032): mip i is
        base >> (i+1), chain stops when either side drops below 2.
        """
        w, h = self.bloom_size
        sizes = []
        for i in range(self.BLOOM_ITERATIONS):
            mw, mh = w >> (i + 1), h >> (i + 1)
            if mw < 2 or mh < 2:
                break
            sizes.append((mw, mh))
        return tuple(sizes)

    def splat_radius_uv(self) -> float:
        """Aspect-corrected splat radius (reference correctRadius, script.js:1457-1462)."""
        radius = self.SPLAT_RADIUS / 100.0
        if self.aspect_ratio > 1:
            radius *= self.aspect_ratio
        return radius

    def validate(self) -> "FluidConfig":
        if self.DTYPE not in _DTYPES:
            raise ValueError(f"DTYPE must be one of {list(_DTYPES)}, got {self.DTYPE!r}")
        for name in ("SIM_RESOLUTION", "DYE_RESOLUTION", "BLOOM_RESOLUTION",
                     "SUNRAYS_RESOLUTION", "CANVAS_WIDTH", "CANVAS_HEIGHT",
                     "MAX_SPLATS"):
            if getattr(self, name) <= 0:
                raise ValueError(f"{name} must be positive")
        if self.PRESSURE_ITERATIONS < 0:
            raise ValueError("PRESSURE_ITERATIONS must be >= 0")
        return self


def get_resolution(resolution: int, canvas_w: int, canvas_h: int) -> Tuple[int, int]:
    """Aspect-fitted (width, height) for a scalar resolution.

    Reference getResolution (script.js:1612-1624): the shorter canvas side gets
    ``resolution`` texels, the longer side gets ``round(resolution * aspect)``.
    """
    aspect = canvas_w / canvas_h
    if aspect < 1:
        aspect = 1.0 / aspect
    lo = round(resolution)
    hi = round(resolution * aspect)
    if canvas_w > canvas_h:
        return (hi, lo)
    return (lo, hi)


# The demo's degraded configs (reference script.js:106-114), provided as presets.
def mobile_config(**overrides) -> FluidConfig:
    """Mobile preset: dye 1024 -> 512 (script.js:106-108)."""
    return FluidConfig(DYE_RESOLUTION=512, **overrides)


def low_capability_config(**overrides) -> FluidConfig:
    """No-linear-filtering preset: dye 512, shading/bloom/sunrays off (script.js:110-114)."""
    return FluidConfig(DYE_RESOLUTION=512, SHADING=False, BLOOM=False,
                       SUNRAYS=False, **overrides)
