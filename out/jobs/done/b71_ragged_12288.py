# Ragged / very-large geometry device check: non-power-of-two and
# non-square grids through the full Pallas step (tile pickers, scoped-VMEM
# caps, lane-window plans all exercised off the friendly sizes), plus the
# 12288^2 point between the 8192 (24.3) and 16384 (6.4) bf16 rows.
import time

import jax.numpy as jnp
import numpy as np

from tpufluid import FluidConfig, init_state
from tpufluid.step import make_multi_step
from tpufluid.trace import swirl_trace

dt = jnp.float32(1 / 60)


def bench(res_w, res_h, chunk, chunks):
    cfg = FluidConfig(SIM_RESOLUTION=min(res_w, res_h),
                      DYE_RESOLUTION=min(res_w, res_h),
                      CANVAS_WIDTH=res_w, CANVAS_HEIGHT=res_h,
                      MAX_SPLATS=8, DTYPE="bfloat16").validate()
    tr = swirl_trace(cfg, chunk, seed=42)
    batches = jnp.asarray(tr.batches)
    multi = make_multi_step(cfg)
    s = init_state(cfg)
    for _ in range(2):
        s = multi(s, dt, batches)
    float(jnp.sum(jnp.abs(s.velocity.astype(jnp.float32))))
    t0 = time.perf_counter()
    for _ in range(chunks):
        s = multi(s, dt, batches)
    chk = float(jnp.sum(jnp.abs(s.velocity.astype(jnp.float32))))
    el = time.perf_counter() - t0
    assert np.isfinite(chk), (res_w, res_h)
    print(f"{res_w}x{res_h} bf16: {chunks * chunk / el:.2f} steps/s "
          f"(chk {chk:.6g})", flush=True)


bench(1280, 720, 100, 2)     # demo canvas aspect, ragged
bench(1920, 1080, 60, 2)     # 1080p
bench(3000, 3000, 30, 2)     # ragged square, non-multiple-of-256
bench(12288, 12288, 10, 2)   # between the 8192 and 16384 rows
