"""tpufluid.ops — the kernel library.

Each module is the TPU-native equivalent of one (or a fused group) of the 20
GLSL shaders embedded in the reference (/root/reference/script.js:440-913).
Pure-jnp implementations live here and double as the test oracle; fused Pallas
TPU kernels for the hot paths live in ``tpufluid.ops.pallas``.
"""

from tpufluid.ops.sampling import sample_bilinear, sample_bilinear_repeat, resample_bilinear
from tpufluid.ops.stencil import (
    curl,
    divergence,
    vorticity_confinement,
    jacobi_pressure,
    gradient_subtract,
)
from tpufluid.ops.advect import advect
from tpufluid.ops.splat import splat_field, gaussian_splat
