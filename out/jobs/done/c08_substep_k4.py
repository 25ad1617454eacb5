# Fast-forward cost model, K=4 point (SPEED_MAX's largest program):
# frames/s of one K=4 substepped dispatch (4 steps + 1 render) vs four
# single ticks, B=16 @ 256^2 bf16 — completes c06's K=2 measurement.
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpufluid import FluidConfig
from tpufluid.batch import init_batch
from tpufluid.ops.splat import SPLAT_COLS
from tpufluid.serve_batch import make_batched_tick, make_substepped_tick

dt = 1.0 / 60.0
cfg = FluidConfig(SIM_RESOLUTION=256, DYE_RESOLUTION=256, CANVAS_WIDTH=256,
                  CANVAS_HEIGHT=256, MAX_SPLATS=8, DTYPE="bfloat16").validate()
B = 16
sub = make_substepped_tick(cfg)
tick = make_batched_tick(cfg)
sp = jnp.zeros((B, cfg.MAX_SPLATS, SPLAT_COLS), jnp.float32)
dts4 = jnp.full((4, B), dt, jnp.float32)
dt1 = jnp.full((B,), dt, jnp.float32)


def run(fn, s0, n, *args):
    s = s0
    for _ in range(3):
        s, f = fn(s, *args)
    float(jnp.sum(f.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        s, f = fn(s, *args)
    chk = float(jnp.sum(f.astype(jnp.float32)))
    el = time.perf_counter() - t0
    assert np.isfinite(chk)
    return n / el


N = 60
fps4 = run(sub, init_batch(cfg, B), N, dts4, sp)
fps1 = run(tick, init_batch(cfg, B), N, dt1, sp)
print(f"B={B} @256^2 bf16: substepped K=4 {fps4:.1f} frames/s "
      f"({4 * B * fps4:.0f} agg steps/s) vs single tick {fps1:.1f} frames/s "
      f"({B * fps1:.0f} agg steps/s); 4x-speed frame cost = "
      f"{fps1 / fps4:.2f}x a 1x frame (four full ticks would be 4.00x)")
print("c08 OK")
