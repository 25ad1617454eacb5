"""Per-kernel attribution of the 16K sharded tax (BENCH.md round 12).

The bench's `sharded_overhead` decomposition proves the residual sharded
tax is NOT communication or overcompute (0.31% mean overcompute, 0 send
bytes on the 1-device mesh). This tool shows where the kernel-rate loss
actually lives: it profiles the SAME 16K bf16 config through the
unsharded multi_step and the sharded (shard_map) multi_step, aggregates
per-step TPU device-op time from the xplane, classifies every op into
kernel-family buckets (dye gather / velocity ops / jacobi / fusions /
async DMA), and prints the diff.

Kernel result shapes differ between the two paths (the sharded kernels
run on halo-padded blocks: rows = 16384 + ghosts), so classification
matches row counts within the ghost budget instead of exact shapes.

Usage:
  TPUFLUID_DEVICE=tpu python tools/sharded_tax.py [--steps 10] \
      [--res 16384] [--out out/sharded_tax_16k.json]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _profile(multi, state, dt, batches, steps: int, warmups: int):
    import jax
    import jax.numpy as jnp

    for _ in range(warmups):
        state = multi(state, dt, batches)
    float(jnp.sum(jnp.abs(state.velocity.astype(jnp.float32))))

    tdir = tempfile.mkdtemp(prefix="tpufluid_tax_")
    t0 = time.perf_counter()
    with jax.profiler.trace(tdir):
        state = multi(state, dt, batches)
        float(jnp.sum(jnp.abs(state.velocity.astype(jnp.float32))))
    wall_us = (time.perf_counter() - t0) * 1e6 / steps

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    path = sorted(glob.glob(os.path.join(tdir, "**", "*.xplane.pb"),
                            recursive=True))[-1]
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    agg: dict = {}
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        for line in plane.lines:
            for ev in line.events:
                name = plane.event_metadata[ev.metadata_id].name
                agg[name] = agg.get(name, 0) + ev.duration_ps
    return {n: ps / 1e6 / steps for n, ps in agg.items()}, wall_us, state


def _classify(name: str, res: int) -> str:
    """Bucket an HLO op-name row. Row counts are matched within the halo
    ghost budget (sharded blocks are halo-padded: rows in
    [res, res + 64])."""
    if (name.startswith("jit_") or "Module" in name
            or re.match(r"%?(while|conditional)", name)):
        return "framework"  # aggregate/wrapper rows (a while's duration
        # includes its children); excluded from op totals
    def _rows_ok(r: int) -> bool:
        return res <= r <= res + 64
    if "custom-call" in name:
        m = re.search(r"= \(?\w+\[3,(\d+),", name)
        if m and _rows_ok(int(m.group(1))):
            return "dye_gather_kernel"
        m = re.search(r"= \(?\w+\[2,(\d+),", name)
        if m and _rows_ok(int(m.group(1))):
            return "velocity_kernels"  # gather + fused stencil families
        m = re.search(r"= \(?\w+\[(\d+),\d+\]", name)
        if m and _rows_ok(int(m.group(1))):
            return "jacobi_kernel"
        return "other_custom_call"
    if "copy-start" in name or "slice-start" in name or "copy-done" in name \
            or "slice-done" in name or "dynamic-update-slice-start" in name \
            or "dynamic-update-slice-done" in name:
        return "async_dma"
    if "fusion" in name:
        return "xla_fusion"
    if "collective" in name or "all-reduce" in name or "permute" in name:
        return "collectives"
    return "misc"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--res", type=int, default=16384)
    ap.add_argument("--out", default="out/sharded_tax_16k.json")
    args = ap.parse_args()

    import jax.numpy as jnp

    from tpufluid import init_state
    from tpufluid.config import FluidConfig
    from tpufluid.step import make_multi_step
    from tpufluid.trace import swirl_trace

    cfg = FluidConfig(SIM_RESOLUTION=args.res, DYE_RESOLUTION=args.res,
                      CANVAS_WIDTH=args.res, CANVAS_HEIGHT=args.res,
                      DTYPE="bfloat16")
    trace = swirl_trace(cfg, args.steps, seed=42)
    batches = jnp.asarray(trace.batches)
    dt = jnp.float32(1.0 / 60.0)

    report: dict = {"res": args.res, "steps": args.steps, "modes": {}}
    for mode in ("unsharded", "sharded"):
        if mode == "sharded":
            from tpufluid.parallel import make_mesh, shard_state
            from tpufluid.parallel.sharded_step import make_sharded_multi_step

            mesh = make_mesh()
            multi = make_sharded_multi_step(cfg, mesh)
            state = shard_state(init_state(cfg), mesh)
            warmups = 3  # lazy program load: discard >= 2 executions
            report["modes"][mode] = {"mesh": list(mesh.devices.shape)}
        else:
            multi = make_multi_step(cfg)
            state = init_state(cfg)
            warmups = 2
            report["modes"][mode] = {}

        ops, wall_us, state = _profile(multi, state, dt, batches,
                                       args.steps, warmups)
        buckets: dict = {}
        for name, us in ops.items():
            b = _classify(name, args.res)
            if b == "framework":
                continue
            buckets[b] = buckets.get(b, 0.0) + us
        top = sorted(((n, us) for n, us in ops.items()
                      if _classify(n, args.res) != "framework"),
                     key=lambda kv: -kv[1])[:10]
        report["modes"][mode].update(
            wall_us_per_step=round(wall_us, 1),
            buckets={k: round(v, 1) for k, v in
                     sorted(buckets.items(), key=lambda kv: -kv[1])},
            top_ops=[{"op": n[:140], "us": round(us, 1)} for n, us in top],
        )
        del state, multi
        print(json.dumps({mode: report["modes"][mode]["buckets"],
                          "wall_us": report["modes"][mode]
                          ["wall_us_per_step"]}), flush=True)

    u, s = (report["modes"]["unsharded"], report["modes"]["sharded"])
    report["tax"] = {
        "wall_delta_us": round(s["wall_us_per_step"] - u["wall_us_per_step"], 1),
        "bucket_delta_us": {
            k: round(s["buckets"].get(k, 0.0) - u["buckets"].get(k, 0.0), 1)
            for k in sorted(set(u["buckets"]) | set(s["buckets"]))},
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report["tax"]))


if __name__ == "__main__":
    main()
