# RGB9E5 packed-dye A/B on device (VERDICT r2 #2): same-process scan-chunk
# comparison of the bf16 headline config with DYE_RGB9E5 off vs on, at the
# headline 1024^2 and at 4096^2 (where the dye gather dominates harder).
# Decision rule (docs/BENCH.md round 7): flip the bf16 default if the win
# is real and the device fidelity probe (tests/test_tpu.py rgb9e5 case,
# run in b70) stays in the bf16 noise class.
import time

import jax.numpy as jnp
import numpy as np

from tpufluid import FluidConfig, init_state
from tpufluid.step import make_multi_step
from tpufluid.trace import swirl_trace

dt = jnp.float32(1 / 60)


def bench(cfg, chunk, chunks, discard=1):
    tr = swirl_trace(cfg, chunk, seed=42)
    batches = jnp.asarray(tr.batches)
    multi = make_multi_step(cfg)
    s = init_state(cfg)
    for _ in range(1 + discard):
        s = multi(s, dt, batches)
    float(jnp.sum(jnp.abs(s.velocity.astype(jnp.float32))))
    t0 = time.perf_counter()
    for _ in range(chunks):
        s = multi(s, dt, batches)
    chk = float(jnp.sum(jnp.abs(s.velocity.astype(jnp.float32))))
    el = time.perf_counter() - t0
    assert np.isfinite(chk)
    return chunks * chunk / el, chk


for res, chunk, chunks in [(1024, 100, 5), (4096, 30, 3)]:
    kw = dict(SIM_RESOLUTION=res, DYE_RESOLUTION=res, CANVAS_WIDTH=res,
              CANVAS_HEIGHT=res, MAX_SPLATS=8, DTYPE="bfloat16")
    for rgb9e5 in (False, True):
        cfg = FluidConfig(DYE_RGB9E5=rgb9e5, **kw).validate()
        rate, chk = bench(cfg, chunk, chunks)
        print(f"{res}^2 bf16 rgb9e5={rgb9e5}: {rate:.2f} steps/s "
              f"(chk {chk:.6g})", flush=True)
