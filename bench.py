"""Headline benchmark: sim steps/sec at 1024^2 with 20 Jacobi iterations.

North star (BASELINE.json): >= 10,000 steps/sec on one TPU chip, vs the
reference WebGL demo's vsync-bound 60 steps/sec (script.js:1185,1191).

Runs the full fluid step (splats + curl + vorticity + divergence + warm-start
+ 20 Jacobi + gradient subtract + self-advect + dye advect at 1024^2 for both
grids) as a lax.scan of steps (the trace-replay execution mode), with a
deterministic recorded splat stream.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from tpufluid import FluidConfig, init_state
    from tpufluid.step import make_multi_step
    from tpufluid.trace import swirl_trace

    config = FluidConfig(
        SIM_RESOLUTION=1024,
        DYE_RESOLUTION=1024,
        CANVAS_WIDTH=1024,
        CANVAS_HEIGHT=1024,
        PRESSURE_ITERATIONS=20,
        MAX_SPLATS=8,
    ).validate()

    chunk = 100
    trace = swirl_trace(config, chunk, seed=42)
    batches = jnp.asarray(trace.batches)
    dt = jnp.float32(1.0 / 60.0)

    multi = make_multi_step(config)
    state = init_state(config)

    # Warm up: compile + first run. The scalar read forces a REAL device
    # sync (block_until_ready alone has proven unreliable on tunneled
    # backends before the first device->host transfer).
    state = multi(state, dt, batches)
    float(jnp.sum(jnp.abs(state.velocity.astype(jnp.float32))))

    # Timed: several chunks; each chunk is one dispatch of `chunk` steps.
    # The closing scalar read is the synchronization point.
    n_chunks = 5
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        state = multi(state, dt, batches)
    checksum = float(jnp.sum(jnp.abs(state.velocity.astype(jnp.float32))))
    elapsed = time.perf_counter() - t0

    steps = n_chunks * chunk
    value = steps / elapsed

    # Sanity: state must stay finite (guards against benchmarking garbage).
    assert np.isfinite(checksum), "velocity field went non-finite during bench"

    print(json.dumps({
        "metric": "sim steps/sec, 1024^2 velocity+dye, 20 Jacobi iters, fp32, trace replay",
        "value": round(value, 1),
        "unit": "steps/sec",
        "vs_baseline": round(value / 60.0, 1),
    }))


if __name__ == "__main__":
    main()
