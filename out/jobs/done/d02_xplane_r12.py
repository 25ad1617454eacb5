# Fresh device xplane of the scanned headline step at round-12b HEAD
# (replaces the round-10 citation: out/jaxtrace_r10 was lost to the VM
# reset before its commit landed files). 100 scanned steps at 1024^2
# bf16, rgb9e5 default; writes out/jaxtrace_r12 + a per-kernel summary.
import glob
import json
import os
import re
import shutil

import jax
import jax.numpy as jnp
import numpy as np

from tpufluid import FluidConfig, init_state
from tpufluid.step import make_multi_step
from tpufluid.trace import swirl_trace

cfg = FluidConfig(SIM_RESOLUTION=1024, DYE_RESOLUTION=1024,
                  CANVAS_WIDTH=1024, CANVAS_HEIGHT=1024,
                  PRESSURE_ITERATIONS=20, MAX_SPLATS=8,
                  DTYPE="bfloat16").validate()
dt = jnp.float32(1.0 / 60.0)
STEPS = 100
multi = make_multi_step(cfg)
tr = swirl_trace(cfg, STEPS, seed=42)
batches = jnp.asarray(tr.batches)
s = init_state(cfg)
s = multi(s, dt, batches)  # compile + warm
float(jnp.sum(jnp.abs(s.velocity.astype(jnp.float32))))

out_dir = "out/jaxtrace_r12"
shutil.rmtree(out_dir, ignore_errors=True)
with jax.profiler.trace(out_dir):
    s = multi(s, dt, batches)
    chk = float(jnp.sum(jnp.abs(s.velocity.astype(jnp.float32))))
assert np.isfinite(chk)

from tensorflow.tsl.profiler.protobuf import xplane_pb2

path = sorted(glob.glob(os.path.join(out_dir, "**", "*.xplane.pb"),
                        recursive=True))[-1]
xs = xplane_pb2.XSpace()
with open(path, "rb") as f:
    xs.ParseFromString(f.read())
agg = {}
for plane in xs.planes:
    if "TPU" not in plane.name:
        continue
    for line in plane.lines:
        for ev in line.events:
            name = plane.event_metadata[ev.metadata_id].name
            agg[name] = agg.get(name, 0) + ev.duration_ps
sig = {
    "dye_gather": re.compile(r"= bf16\[3,1024,1024\][^=]*custom-call\("),
    "velocity_gather": re.compile(r"= bf16\[2,1024,1024\][^=]*custom-call\("),
    "jacobi": re.compile(r"= bf16\[1024,1024\][^=]*custom-call\("),
    "stencil": re.compile(r"= \(bf16\[2,1024,1024\][^=]*custom-call\("),
}
buckets = {k: 0.0 for k in sig}
other = 0.0
for name, ps in agg.items():
    us = ps / 1e6 / STEPS
    if name.startswith("jit_") or "Module" in name:
        continue
    for key, pat in sig.items():
        if "custom-call" in name and pat.search(name):
            buckets[key] += us
            break
    else:
        other += us
summary = {k: round(v, 1) for k, v in buckets.items()}
summary["other_device_us"] = round(other, 1)
summary["in_scan_step_us"] = round(sum(buckets.values()) + other, 1)
summary["steps"] = STEPS
with open(os.path.join(out_dir, "summary.json"), "w") as f:
    json.dump(summary, f, indent=1)
print(json.dumps(summary, indent=1), flush=True)
print("WROTE", out_dir, flush=True)
