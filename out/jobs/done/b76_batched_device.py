# Batched serving mode (tpufluid/batch.py) on device:
# 1) Mosaic compiles the vmapped Pallas kernel suite (pallas_call's batching
#    rule adds a leading grid dimension — interpret-mode equality is pinned
#    by tests/test_batch.py; this certifies the COMPILED path).
# 2) Per-sim equality: batched step vs B unbatched steps on device.
# 3) Throughput A/B: aggregate sim-steps/s, batched (one vmapped scan
#    dispatch) vs serial (per-sim scan dispatches), B=16 @ 256^2 bf16 and
#    B=64 @ 128^2 bf16 — the regimes where one sim underfills the chip.
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpufluid import FluidConfig, init_state
from tpufluid.batch import (init_batch, make_batched_multi_step,
                            make_batched_step, stack_states, unstack_state)
from tpufluid.step import fluid_step, make_multi_step
from tpufluid.trace import swirl_trace

dt = jnp.float32(1 / 60)

# ---- equality on the compiled kernel path (B=2 @ 256^2) ----
cfg = FluidConfig(SIM_RESOLUTION=256, DYE_RESOLUTION=256, CANVAS_WIDTH=256,
                  CANVAS_HEIGHT=256, MAX_SPLATS=8, DTYPE="bfloat16").validate()
B = 2
splats = jnp.stack([jnp.asarray(swirl_trace(cfg, 1, seed=3 + i).batches[0])
                    for i in range(B)])
states = [init_state(cfg) for _ in range(B)]
out = make_batched_step(cfg)(stack_states(states), dt, splats)
single = jax.jit(lambda s, sp: fluid_step(s, dt, sp, cfg))
worst = 0.0
for i in range(B):
    ref = single(states[i], splats[i])
    for name in ("velocity", "dye", "pressure"):
        a = np.asarray(getattr(unstack_state(out, i), name), np.float32)
        b = np.asarray(getattr(ref, name), np.float32)
        assert np.isfinite(a).all(), f"nonfinite {name}"
        worst = max(worst, float(np.abs(a - b).max()))
print(f"compiled batched-vs-single worst abs err over {B} sims: {worst:.3e}")


def bench_batched(cfg, batch, chunk, chunks):
    splats_seq = jnp.stack(
        [jnp.asarray(swirl_trace(cfg, chunk, seed=42 + i).batches)
         for i in range(batch)], axis=1)
    multi = make_batched_multi_step(cfg)
    s = init_batch(cfg, batch)
    for _ in range(2):
        s = multi(s, dt, splats_seq)
    float(jnp.sum(jnp.abs(s.velocity.astype(jnp.float32))))
    t0 = time.perf_counter()
    for _ in range(chunks):
        s = multi(s, dt, splats_seq)
    chk = float(jnp.sum(jnp.abs(s.velocity.astype(jnp.float32))))
    el = time.perf_counter() - t0
    assert np.isfinite(chk)
    return chunks * chunk * batch / el


def bench_serial(cfg, batch, chunk, chunks):
    multi = make_multi_step(cfg)
    batches = [jnp.asarray(swirl_trace(cfg, chunk, seed=42 + i).batches)
               for i in range(batch)]
    ss = [init_state(cfg) for _ in range(batch)]
    for _ in range(2):
        ss = [multi(s, dt, batches[i]) for i, s in enumerate(ss)]
    float(jnp.sum(jnp.abs(ss[0].velocity.astype(jnp.float32))))
    t0 = time.perf_counter()
    for _ in range(chunks):
        ss = [multi(s, dt, batches[i]) for i, s in enumerate(ss)]
    chk = float(jnp.sum(jnp.abs(ss[-1].velocity.astype(jnp.float32))))
    el = time.perf_counter() - t0
    assert np.isfinite(chk)
    return chunks * chunk * batch / el


# ---- batched render compiles + matches per-sim render on device ----
from tpufluid.batch import make_batched_render
from tpufluid.render import make_render

frames = make_batched_render(cfg)(out)
ref_render = make_render(cfg)
worst_r = 0.0
for i in range(B):
    fr = np.asarray(frames[i], np.float32)
    rf = np.asarray(ref_render(unstack_state(out, i)), np.float32)
    assert np.isfinite(fr).all()
    worst_r = max(worst_r, float(np.abs(fr - rf).max()))
print(f"compiled batched render worst abs err: {worst_r:.3e} "
      f"(1/255 = 3.9e-3 display quantum)")

for size, batch in ((256, 16), (128, 64)):
    c = FluidConfig(SIM_RESOLUTION=size, DYE_RESOLUTION=size,
                    CANVAS_WIDTH=size, CANVAS_HEIGHT=size, MAX_SPLATS=8,
                    DTYPE="bfloat16").validate()
    agg_b = bench_batched(c, batch, chunk=100, chunks=3)
    agg_s = bench_serial(c, batch, chunk=100, chunks=3)
    print(f"{size}^2 B={batch}: batched {agg_b:.0f} vs serial {agg_s:.0f} "
          f"aggregate sim-steps/s ({agg_b / agg_s:.2f}x)")
