"""tpufluid — a TPU-native stable-fluids framework (JAX/XLA/Pallas).

Built from scratch with the capabilities of PavelDoGreat/WebGL-Fluid-Simulation
(reference mounted at /root/reference): semi-Lagrangian advection, vorticity
confinement, Jacobi pressure projection, deterministic splat impulses, and the
full display pipeline (shading, soft-knee bloom mip pyramid, radial sunrays,
blue-noise dithering, gamma composite) — all as pure functions over a pytree
state, fused into single jitted steps with donated buffers, with Pallas kernels
on the hot stencils and mesh-sharded grids with halo exchange for scale.

Public API:
    FluidConfig         — all tunables (reference script.js:59-85 equivalents)
    FluidState          — velocity/dye/pressure pytree
    init_state          — allocate fields (reference initFramebuffers)
    make_step           — jitted step(state, dt, splats) (reference step())
    make_render         — jitted render(state) -> RGBA float frame
    splat / multiple_splats — impulse injection (reference splat())
"""

from tpufluid.batch import (
    init_batch,
    make_batched_multi_step,
    make_batched_render,
    make_batched_step,
    stack_states,
    unstack_state,
)
from tpufluid.config import FluidConfig, get_resolution
from tpufluid.state import FluidState, init_state, resize_state
from tpufluid.step import make_step, fluid_step, apply_splats
from tpufluid.render import make_render, render_frame
from tpufluid.trace import (
    Pointer,
    PointerTracer,
    generate_color,
    random_splats,
    Trace,
)

__version__ = "0.1.0"

__all__ = [
    "FluidConfig",
    "FluidState",
    "init_batch",
    "make_batched_step",
    "make_batched_multi_step",
    "make_batched_render",
    "stack_states",
    "unstack_state",
    "init_state",
    "resize_state",
    "make_step",
    "fluid_step",
    "apply_splats",
    "make_render",
    "render_frame",
    "Pointer",
    "PointerTracer",
    "generate_color",
    "random_splats",
    "Trace",
    "__version__",
]
