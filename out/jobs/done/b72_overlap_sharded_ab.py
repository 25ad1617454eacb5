# Split-phase overlap A/B on the 1-device mesh (VERDICT r3 #6/#7): the
# OVERLAP_HALO step's interior bands run on UNPADDED power-of-two block
# heights (16384 = 2^14 -> big kernel tiles; the monolithic padded height
# 16448 = 64*257 collapses the tile pickers to 64-row blocks) and the
# Jacobi mirror no longer materializes full-field takes. Baselines:
# 16K sharded 4.54 fresh (r6), 1024^2 sharded 866 fresh.
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpufluid import FluidConfig, init_state
from tpufluid.parallel import make_mesh, shard_state
from tpufluid.parallel.sharded_step import make_sharded_multi_step
from tpufluid.trace import swirl_trace

dt = jnp.float32(1 / 60)
mesh = make_mesh()


def bench(cfg, chunk, chunks, discard=2):
    tr = swirl_trace(cfg, chunk, seed=42)
    batches = jnp.asarray(tr.batches)
    multi = make_sharded_multi_step(cfg, mesh)
    s = shard_state(init_state(cfg), mesh)
    for _ in range(1 + discard):  # compile + lazy program load
        s = multi(s, dt, batches)
    float(jnp.sum(jnp.abs(s.velocity.astype(jnp.float32))))
    t0 = time.perf_counter()
    for _ in range(chunks):
        s = multi(s, dt, batches)
    chk = float(jnp.sum(jnp.abs(s.velocity.astype(jnp.float32))))
    el = time.perf_counter() - t0
    assert np.isfinite(chk)
    return chunks * chunk / el, chk


for res, chunk, chunks in [(1024, 100, 3), (8192, 20, 2), (16384, 10, 2)]:
    kw = dict(SIM_RESOLUTION=res, DYE_RESOLUTION=res, CANVAS_WIDTH=res,
              CANVAS_HEIGHT=res, MAX_SPLATS=8, DTYPE="bfloat16")
    for overlap in (False, True):
        cfg = FluidConfig(OVERLAP_HALO=overlap, **kw).validate()
        rate, chk = bench(cfg, chunk, chunks)
        print(f"{res}^2 sharded overlap={overlap}: {rate:.2f} steps/s "
              f"(chk {chk:.6g})", flush=True)
