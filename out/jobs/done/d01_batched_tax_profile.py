# Attribute the batched-serving vmap tax at the headline grid (round 12c).
# Measured: config 7 B=1 @1024^2 = 850.5 aggregate vs config 3 single-sim
# 1095.5 (out/bench_r11.jsonl) — a 22% overhead for a leading batch dim
# of ONE. Hypotheses: (a) pallas_call batching-rule grid dim changes
# kernel time; (b) batched XLA glue (quant staging, slices) loses layouts
# /fusions; (c) scan/dispatch protocol diff (chunk 25 vs 100).
# Protocol: steady scan rates at matched chunk sizes, then per-call
# profiled per-op attribution of both step programs.
import glob
import json
import os
import re
import tempfile
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpufluid import FluidConfig, init_state
from tpufluid.batch import init_batch, make_batched_multi_step, \
    make_batched_step
from tpufluid.step import make_multi_step, make_step
from tpufluid.trace import swirl_trace

cfg = FluidConfig(SIM_RESOLUTION=1024, DYE_RESOLUTION=1024,
                  CANVAS_WIDTH=1024, CANVAS_HEIGHT=1024,
                  PRESSURE_ITERATIONS=20, MAX_SPLATS=8,
                  DTYPE="bfloat16").validate()
dt = jnp.float32(1.0 / 60.0)
CHUNK = 50
res = {}


def rate_single(chunks=4):
    multi = make_multi_step(cfg)
    tr = swirl_trace(cfg, CHUNK, seed=42)
    batches = jnp.asarray(tr.batches)
    s = init_state(cfg)
    for _ in range(2):
        s = multi(s, dt, batches)
    float(jnp.sum(jnp.abs(s.velocity.astype(jnp.float32))))
    t0 = time.perf_counter()
    for _ in range(chunks):
        s = multi(s, dt, batches)
    chk = float(jnp.sum(jnp.abs(s.velocity.astype(jnp.float32))))
    el = time.perf_counter() - t0
    assert np.isfinite(chk)
    return chunks * CHUNK / el


def rate_batched(b, chunks=4):
    multi = make_batched_multi_step(cfg)
    splats_seq = jnp.stack(
        [jnp.asarray(swirl_trace(cfg, CHUNK, seed=42 + i).batches)
         for i in range(b)], axis=1)
    s = init_batch(cfg, b)
    for _ in range(2):
        s = multi(s, dt, splats_seq)
    float(jnp.sum(jnp.abs(s.velocity.astype(jnp.float32))))
    t0 = time.perf_counter()
    for _ in range(chunks):
        s = multi(s, dt, splats_seq)
    chk = float(jnp.sum(jnp.abs(s.velocity.astype(jnp.float32))))
    el = time.perf_counter() - t0
    assert np.isfinite(chk)
    return chunks * CHUNK * b / el


res["single_steps_s"] = round(rate_single(), 1)
res["b1_agg_steps_s"] = round(rate_batched(1), 1)
res["b2_agg_steps_s"] = round(rate_batched(2), 1)
print("rates:", res, flush=True)


def profile(step_fn, s0, mk_splat, steps=30):
    """Per-op device time of a per-call step program; returns
    {op_name: us_per_step} plus kernel-bucket sums."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    s = step_fn(s0, dt, mk_splat(0))
    float(jnp.sum(jnp.abs(s.velocity.astype(jnp.float32))))
    tdir = tempfile.mkdtemp(prefix="tax_")
    with jax.profiler.trace(tdir):
        for t in range(steps):
            s = step_fn(s, dt, mk_splat(t))
        float(jnp.sum(jnp.abs(s.velocity.astype(jnp.float32))))
    path = sorted(glob.glob(os.path.join(tdir, "**", "*.xplane.pb"),
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
    out = {}
    for name, ps in agg.items():
        us = ps / 1e6 / steps
        if name.startswith("jit_") or "Module" in name:
            continue
        out[name] = round(us, 1)
    return out


sig = {
    "dye_gather": re.compile(r"= bf16\[(1,)?3,1024,1024\][^=]*custom-call\("),
    "velocity_gather": re.compile(
        r"= bf16\[(1,)?2,1024,1024\][^=]*custom-call\("),
    "jacobi": re.compile(r"= bf16\[(1,)?1024,1024\][^=]*custom-call\("),
    "stencil": re.compile(r"= \(bf16\[(1,)?2,1024,1024\][^=]*custom-call\("),
}


def bucket(ops):
    b = {k: 0.0 for k in sig}
    other = {}
    for name, us in ops.items():
        for key, pat in sig.items():
            if "custom-call" in name and pat.search(name):
                b[key] += us
                break
        else:
            other[name] = us
    b = {k: round(v, 1) for k, v in b.items()}
    b["other_total"] = round(sum(other.values()), 1)
    b["top_other"] = sorted(other.items(), key=lambda kv: -kv[1])[:12]
    return b


tr = swirl_trace(cfg, 40, seed=7)
single_splats = jnp.asarray(tr.batches)
s_single = init_state(cfg)
ops_single = profile(make_step(cfg), s_single, lambda t: single_splats[t])
res["single"] = bucket(ops_single)
print("single:", json.dumps(res["single"], indent=1), flush=True)

b_splats = single_splats[:, None]  # (T, 1, MAX_SPLATS, 8)
s_b1 = init_batch(cfg, 1)
ops_b1 = profile(make_batched_step(cfg), s_b1, lambda t: b_splats[t])
res["b1"] = bucket(ops_b1)
print("b1:", json.dumps(res["b1"], indent=1), flush=True)

with open("out/batched_tax_b1.json", "w") as f:
    json.dump(res, f, indent=1)
print("WROTE out/batched_tax_b1.json", flush=True)
