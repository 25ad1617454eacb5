# Generate the bf16 DEVICE golden (tests/golden_frame_tpu_bf16.npz): locks
# the compiled Mosaic path UNDER THE NEW bf16 DEFAULT (rgb9e5 packed dye,
# round 9) — 30 swirl-trace steps + full render, same shape as the f32
# device golden (tests/test_tpu.py::test_golden_frame_pallas_on_device).
# Config must stay IDENTICAL to test_golden_frame_pallas_on_device_bf16.
import numpy as np
import jax
import jax.numpy as jnp

from tpufluid import FluidConfig, init_state
from tpufluid.render import render_frame
from tpufluid.step import fluid_step
from tpufluid.trace import swirl_trace

cfg = FluidConfig(SIM_RESOLUTION=128, DYE_RESOLUTION=256, CANVAS_WIDTH=256,
                  CANVAS_HEIGHT=256, BLOOM_RESOLUTION=64,
                  SUNRAYS_RESOLUTION=64, MAX_SPLATS=8,
                  DTYPE="bfloat16").validate()
assert cfg.DYE_RGB9E5  # the round-9 default this golden locks
step = jax.jit(lambda s, dt, sp: fluid_step(s, dt, sp, cfg))
trace = swirl_trace(cfg, 30, seed=77)
s = init_state(cfg)
dt = jnp.float32(trace.dt)
for t in range(30):
    s = step(s, dt, jnp.asarray(trace.batches[t]))
frame = np.asarray(render_frame(s, cfg), dtype=np.float32)
assert np.isfinite(frame).all()
np.savez_compressed("tests/golden_frame_tpu_bf16.npz", frame=frame)
print("wrote tests/golden_frame_tpu_bf16.npz", frame.shape,
      float(frame.min()), float(frame.max()))
