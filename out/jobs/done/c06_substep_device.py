# Fast-forward substepped tick (serve_batch.make_substepped_tick) on device:
# 1) Mosaic compiles the K-substep program (scan of the vmapped Pallas
#    kernel suite + one vmapped render) at serving shapes, bf16.
# 2) BIT-exact masking on the compiled path: two sessions with identical
#    state/splats and the same two active dts, zero row in different
#    positions ([d, d', 0] vs [d, 0, d']) — equal iff a masked (dt=0)
#    scan iteration preserves the carry bit-for-bit (the same-program
#    property tests/test_serve_batch.py pins on the jnp oracle).
# 3) Semantic equality vs iterated make_batched_tick frames/state at the
#    bf16 step-noise class (cross-structure: scan body vs direct dispatch).
# 4) Cost model: frames/s of one K=2 substepped dispatch vs TWO single
#    ticks at B=16 @ 256^2 bf16 (fast-forward should cost <= 2 ticks: it
#    renders once, not twice).
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpufluid import FluidConfig
from tpufluid.batch import init_batch
from tpufluid.ops.splat import SPLAT_COLS
from tpufluid.serve_batch import make_batched_tick, make_substepped_tick
from tpufluid.trace import swirl_trace

dt = 1.0 / 60.0
cfg = FluidConfig(SIM_RESOLUTION=256, DYE_RESOLUTION=256, CANVAS_WIDTH=256,
                  CANVAS_HEIGHT=256, MAX_SPLATS=8, DTYPE="bfloat16").validate()
B, K = 2, 3
subtick = make_substepped_tick(cfg)
tick = make_batched_tick(cfg)

splats = np.zeros((B, cfg.MAX_SPLATS, SPLAT_COLS), np.float32)
for b in range(B):
    splats[b, :4] = np.asarray(swirl_trace(cfg, 1, seed=3 + b).batches[0])[:4]

# distinct warm state via one lock-step substepped frame (also the K=1
# compile check), keep an undonated copy
state, _ = subtick(init_batch(cfg, B), jnp.full((1, B), dt, jnp.float32),
                   jnp.asarray(splats))
keep = jax.tree.map(jnp.copy, state)

# ---- (2) bit-exact masking, same compiled program ----
pair0 = jax.tree.map(lambda x: jnp.stack([x[0], x[0]]), keep)
psplat = np.stack([splats[0], splats[0]])
perm = np.array([[dt, dt], [0.5 * dt, 0.0], [0.0, 0.5 * dt]], np.float32)
got, frames = subtick(pair0, jnp.asarray(perm), jnp.asarray(psplat))
for name in ("velocity", "dye", "pressure"):
    a = np.asarray(getattr(got, name).astype(jnp.float32))
    assert np.isfinite(a).all(), f"nonfinite {name}"
    assert np.array_equal(a[0], a[1]), f"masked no-op not bit-exact: {name}"
assert np.array_equal(np.asarray(frames[0]), np.asarray(frames[1])), "frames"
print("permuted-zero-row masking BIT-exact on compiled Mosaic path")

# ---- (3) semantic equality vs iterated single ticks ----
n_sub = np.array([1, 2])
subs = np.array([0.5 * dt, dt], np.float32)
dts_kb = np.where(np.arange(K)[:, None] < n_sub[None, :],
                  subs[None, :], 0.0).astype(np.float32)
got3, gf3 = subtick(jax.tree.map(jnp.copy, keep), jnp.asarray(dts_kb),
                    jnp.asarray(splats))
ref = jax.tree.map(jnp.copy, keep)
zero = np.zeros_like(splats)
for i in range(int(n_sub.max())):
    # session b's i-th substep dt (0 past its count -> time frozen, but a
    # dt=0 TICK still projects; mirror by comparing only dye there)
    row = np.where(i < n_sub, subs, 0.0).astype(np.float32)
    ref, rf = tick(ref, jnp.asarray(row), jnp.asarray(splats if i == 0 else zero))
worst = {}
for name in ("velocity", "dye", "pressure"):
    a = np.asarray(getattr(got3, name).astype(jnp.float32))
    r = np.asarray(getattr(ref, name).astype(jnp.float32))
    # session 0's masked substeps are exact no-ops in subtick but real
    # dt=0 projections in the iterated tick -> compare dye for it, all
    # fields for session 1 (fully active rows).
    err = float(np.abs(a[1] - r[1]).max())
    if name == "dye":
        err = max(err, float(np.abs(a[0] - r[0]).max()))
    worst[name] = err
print(f"substepped-vs-iterated worst abs err (bf16): {worst}")
assert all(v < 0.05 for v in worst.values()), worst
fe = int(np.abs(np.asarray(gf3[1], np.int32) - np.asarray(rf[1], np.int32)).max())
print(f"frame worst count diff (session 1): {fe}")
assert fe <= 2, fe

# ---- (4) cost model: K=2 substepped dispatch vs two single ticks ----
cfgp = FluidConfig(SIM_RESOLUTION=256, DYE_RESOLUTION=256, CANVAS_WIDTH=256,
                   CANVAS_HEIGHT=256, MAX_SPLATS=8, DTYPE="bfloat16").validate()
Bp = 16
sub2 = make_substepped_tick(cfgp)
tick2 = make_batched_tick(cfgp)
sp = jnp.zeros((Bp, cfgp.MAX_SPLATS, SPLAT_COLS), jnp.float32)
dts2 = jnp.full((2, Bp), dt, jnp.float32)
dt1 = jnp.full((Bp,), dt, jnp.float32)


def run(fn, s0, n, *args):
    s = s0
    for _ in range(3):  # discard lazy-program-load executions
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
fps_sub = run(sub2, init_batch(cfgp, Bp), N, dts2, sp)  # 2 substeps + 1 render
fps_one = run(tick2, init_batch(cfgp, Bp), N, dt1, sp)  # 1 step + 1 render
print(f"B={Bp} @256^2 bf16: substepped K=2 {fps_sub:.1f} frames/s "
      f"({2 * Bp * fps_sub:.0f} agg steps/s) vs single tick {fps_one:.1f} "
      f"frames/s ({Bp * fps_one:.0f} agg steps/s); "
      f"2x-speed frame cost = {fps_one / fps_sub:.2f}x a 1x frame "
      f"(two full ticks would be 2.00x)")
print("c06 OK")
