# p01: packed-serving-layout upside proxy.
# Question: if B=64 small-grid sims were lane-packed side by side into ONE
# wide array (zero 128-lane pad waste), would the kernels run at the
# ~1.2 Gtexel/s envelope measured at 384^2+?  Proxy: a single sim at the
# packed geometry (H=r, W=64*r), bench.py's exact 100-step-chunk protocol.
# Compare: vmapped serving @288^2 B=64 = 10,940 aggregate = 170.9
# equivalent wide steps/s (0.91 G/s true texels); envelope would be ~228.
import time, json
import numpy as np
import jax.numpy as jnp
from tpufluid.config import FluidConfig
from tpufluid import init_state
from tpufluid.step import make_multi_step
from tpufluid.trace import swirl_trace

out = []
for r, packw in [(288, 18432), (320, 20480)]:
    cfg = FluidConfig(SIM_RESOLUTION=r, DYE_RESOLUTION=r,
                      CANVAS_WIDTH=packw, CANVAS_HEIGHT=r,
                      PRESSURE_ITERATIONS=20, MAX_SPLATS=8,
                      DTYPE="bfloat16").validate()
    print(f"[p01] r={r} sim={cfg.sim_size} dye={cfg.dye_size}", flush=True)
    chunk, chunks = 100, 3
    trace = swirl_trace(cfg, chunk, seed=42)
    batches = jnp.asarray(trace.batches)
    dt = jnp.float32(1.0 / 60.0)
    multi = make_multi_step(cfg)
    state = init_state(cfg)
    t0 = time.perf_counter()
    for _ in range(3):   # compile + discard lazy-load executions
        state = multi(state, dt, batches)
    float(jnp.sum(jnp.abs(state.velocity.astype(jnp.float32))))
    print(f"[p01] r={r} warm {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(chunks):
        state = multi(state, dt, batches)
    cs = float(jnp.sum(jnp.abs(state.velocity.astype(jnp.float32))))
    el = time.perf_counter() - t0
    assert np.isfinite(cs)
    rate = chunks * chunk / el
    texel = rate * cfg.sim_size[0] * cfg.sim_size[1] / 1e9
    row = {"r": r, "packw": packw, "steps_per_s": round(rate, 2),
           "gtexel_per_s": round(texel, 3),
           "equiv_aggregate_64": round(rate * 64, 1)}
    print("[p01]", json.dumps(row), flush=True)
    out.append(row)
with open("out/packed_proxy.json", "w") as f:
    json.dump(out, f, indent=1)
print("[p01] done", flush=True)
