# e04: why does tools/long_horizon.py measure ~9 steps/s at 4096^2 while
# bench config 4 measures ~85? A/B the two loop styles in ONE process.
import time

import numpy as np
import jax
import jax.numpy as jnp

np.asarray(jnp.ones((8, 128)))

from tpufluid import FluidConfig, init_state
from tpufluid.metrics import MetricsLogger
from tpufluid.step import make_multi_step
from tpufluid.trace import swirl_trace

cfg = FluidConfig(SIM_RESOLUTION=4096, DYE_RESOLUTION=4096,
                  CANVAS_WIDTH=4096, CANVAS_HEIGHT=4096,
                  PRESSURE_ITERATIONS=20, DTYPE="bfloat16",
                  MAX_SPLATS=8).validate()
multi = make_multi_step(cfg)
trace = swirl_trace(cfg, 50, seed=42)
batches = jnp.asarray(trace.batches)
dt = jnp.float32(1.0 / 60.0)
state = init_state(cfg)
# bench-style: warm 1, reuse the same batches
state = multi(state, dt, batches)
float(jnp.sum(jnp.abs(state.velocity.astype(jnp.float32))))
t0 = time.perf_counter()
for _ in range(2):
    state = multi(state, dt, batches)
float(jnp.sum(jnp.abs(state.velocity.astype(jnp.float32))))
print("bench-style:", 100 / (time.perf_counter() - t0), "steps/s", flush=True)

# lh-style A: fresh np chunk each call + pressure-slice scalar sync
tr500 = swirl_trace(cfg, 150, seed=11)
bat = np.asarray(tr500.batches, np.float32)
t0 = time.perf_counter()
for k in range(2):
    chunk = bat[k * 50:(k + 1) * 50]
    state = multi(state, dt, jnp.asarray(chunk))
    float(jnp.sum(state.pressure[:1, :8]))
print("lh-style (np chunk + slice sync):",
      100 / (time.perf_counter() - t0), "steps/s", flush=True)

# lh-style B: + MetricsLogger per chunk (timed separately)
logger = MetricsLogger("/tmp/e04_metrics.jsonl")
t0 = time.perf_counter()
for k in range(2):
    state = multi(state, dt, jnp.asarray(bat[(k + 2) * 50:(k + 3) * 50]))
    float(jnp.sum(state.pressure[:1, :8]))
    ta = time.perf_counter()
    logger.log(k, state, cfg)
    print("  diag", time.perf_counter() - ta, flush=True)
print("lh-style + metrics:", 100 / (time.perf_counter() - t0), "steps/s",
      flush=True)
logger.close()
