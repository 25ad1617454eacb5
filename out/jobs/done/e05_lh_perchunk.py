# e05: per-chunk compute timings of the EXACT long_horizon loop shape, 10
# chunks — does the rate degrade chunk-over-chunk (program reload /
# dispatch-latency decay), or is it a constant multiplier?
import time

import numpy as np
import jax
import jax.numpy as jnp

np.asarray(jnp.ones((8, 128)))

from tpufluid import FluidConfig, init_state
from tpufluid.metrics import MetricsLogger, contract_warning
from tpufluid.step import make_multi_step
from tpufluid.trace import swirl_trace

cfg = FluidConfig(SIM_RESOLUTION=4096, DYE_RESOLUTION=4096,
                  CANVAS_WIDTH=4096, CANVAS_HEIGHT=4096,
                  PRESSURE_ITERATIONS=20, DTYPE="bfloat16",
                  MAX_SPLATS=8).validate()
multi = make_multi_step(cfg)
trace = swirl_trace(cfg, 500, seed=11)
bat = np.asarray(trace.batches, np.float32)
dt = jnp.float32(1.0 / 60.0)
state = init_state(cfg)
logger = MetricsLogger("/tmp/e05_metrics.jsonl")
for k in range(10):
    chunk = bat[k * 50:(k + 1) * 50]
    ta = time.perf_counter()
    state = multi(state, dt, jnp.asarray(chunk))
    float(jnp.sum(state.pressure[:1, :8]))
    tb = time.perf_counter()
    rec = logger.log((k + 1) * 50, state, cfg)
    tc = time.perf_counter()
    print(f"chunk {k}: compute {tb - ta:6.2f}s diag {tc - tb:5.2f}s",
          flush=True)
logger.close()
