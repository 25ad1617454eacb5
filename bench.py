"""Benchmark matrix — one BASELINE.md config per run, one JSON line out.

  python bench.py             # headline (config 3): 1024^2, 20 Jacobi,
                              #   bfloat16 (the reference stores half-float
                              #   — the parity-faithful mode)
  python bench.py --config 1  # demo default: 128 sim / 1024-scale dye @ 1280x720
  python bench.py --config 2  # render: 1280x720 full display pipeline fps
  python bench.py --config 3  # headline (the driver's default)
  python bench.py --config 4  # 4096^2 bfloat16 long-horizon step
  python bench.py --config 5  # 16384^2 bfloat16 (single chip; the sharded
                              #   path is validated by dryrun_multichip)
  python bench.py --config 7  # serving mode: --batch N independent 256^2
                              #   sims per vmapped dispatch, aggregate
                              #   sim-steps/s (tpufluid/batch.py)

North star (BASELINE.json): >= 10,000 steps/sec at 1024^2 on one v5p chip,
vs the reference WebGL demo's vsync-bound 60 steps/sec (script.js:1185,1191).
All sim configs run the FULL fluid step (splat replay + curl + vorticity +
divergence + Jacobi + projection + both advections) as a lax.scan of steps
(the trace-replay execution mode) with a deterministic recorded splat stream.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def probe_backend(retries: int = 3, backoff_s: float = 30.0) -> str:
    """First device touch with a bounded retry, BEFORE any benchmark work.

    The axon tunnel can be transiently down (round 2 lost its entire perf
    record to an unretried `RuntimeError: Unable to initialize backend`).
    A tiny transfer forces backend init + the first device->host hop; on
    persistent failure the last error propagates to main()'s structured
    JSON error line so the driver artifact parses either way."""
    import jax
    import jax.numpy as jnp

    last: Exception | None = None
    for attempt in range(retries):
        try:
            float(jnp.zeros((), jnp.float32) + 1.0)
            return jax.default_backend()
        except Exception as e:  # noqa: BLE001 — backend init raises RuntimeError
            last = e
            if attempt < retries - 1:
                time.sleep(backoff_s)
    assert last is not None
    raise last


def measure_dispatch_latency_us(n: int = 50) -> float:
    """Per-dispatch latency of a trivial jitted op through this process's
    backend path. Fresh tunneled processes run ~450 us; long-lived warm
    workers degrade to ~7 ms (CLAUDE.md) — so this number, recorded in
    every bench line, tells a reader whether a headline was taken in a
    healthy process. Closed with a scalar read (block_until_ready is
    unreliable pre-first-transfer on the axon tunnel)."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8, 128), jnp.float32)
    float(jnp.sum(f(x)))  # compile + sync
    t0 = time.perf_counter()
    for _ in range(n):
        x = f(x)
    float(jnp.sum(x))
    return (time.perf_counter() - t0) / n * 1e6


_WORKER_STOPPED_AT_START = False


def stop_warm_worker() -> bool:
    """SIGTERM a live tools/tpu_worker.py (out/worker.pid) and wait <= 10 s.

    The round-3 driver headline regressed 12% because a warm worker was
    left sharing the one tunneled chip (per-dispatch latency degrades
    ~15x); the driver invokes bench.py directly, so the bench defends
    its own measurement instead of trusting the host to be clean. Only
    the pid recorded in out/worker.pid is ever signalled."""
    global _WORKER_STOPPED_AT_START
    import os
    import signal

    pid_file = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "out", "worker.pid")
    try:
        pid = int(open(pid_file).read().strip())
        os.kill(pid, signal.SIGTERM)
    except Exception:  # noqa: BLE001 — no pid file / stale pid / no perm
        return False
    _WORKER_STOPPED_AT_START = True
    for _ in range(100):
        try:
            os.kill(pid, 0)
        except OSError:
            break
        time.sleep(0.1)
    return True


def provenance() -> dict:
    """Environment provenance for every bench line (VERDICT round 3: the
    986-vs-1116 driver headline gap was undiagnosable because the JSON
    recorded nothing about the process environment). Records whether the
    committed warm worker (tools/tpu_worker.py) was alive DURING the
    bench — the workflow requires stopping it first, since a second
    process sharing the one tunneled chip contends for it — plus any
    other live python processes, and the per-dispatch latency probe."""
    import os

    import jax

    prov = {
        "backend": jax.default_backend(),
        "jax_version": jax.__version__,
        "time_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "dispatch_latency_us": round(measure_dispatch_latency_us(), 1),
    }
    pid_file = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "out", "worker.pid")
    worker = False
    try:
        pid = int(open(pid_file).read().strip())
        os.kill(pid, 0)  # signal 0: existence check only
        worker = True
    except Exception:  # noqa: BLE001 — no pid file / stale pid / no perm
        worker = False
    prov["warm_worker_running"] = worker
    if _WORKER_STOPPED_AT_START:
        prov["warm_worker_stopped_at_start"] = True
    others = 0
    try:
        me = os.getpid()
        for p in os.listdir("/proc"):
            if not p.isdigit() or int(p) == me:
                continue
            try:
                with open(f"/proc/{p}/cmdline", "rb") as f:
                    cmd = f.read().decode(errors="replace")
            except OSError:
                continue
            if "python" in cmd:
                others += 1
    except OSError:
        others = -1  # /proc unavailable (non-linux)
    prov["other_python_processes"] = others
    return prov


def measure_hbm_bandwidth_gbps() -> float:
    """Achieved HBM bandwidth on THIS device (the roofline denominator):
    a lax.scan of elementwise adds over a 256 MB carry — every iteration
    reads and writes the full array and scan iterations cannot fuse
    together, so bytes/time is the streaming copy bandwidth."""
    import time

    import jax
    import jax.numpy as jnp
    from jax import lax

    x = jnp.ones((64, 1024, 1024), jnp.float32)
    nbytes = x.size * x.dtype.itemsize

    @jax.jit
    def f(x):
        def body(c, _):
            return c + 1.0, ()
        return lax.scan(body, x, None, length=20)[0]

    float(jnp.sum(f(x)))  # compile + real sync (axon tunnel)
    t0 = time.perf_counter()
    float(jnp.sum(f(x)))
    elapsed = time.perf_counter() - t0
    return 2 * nbytes * 20 / elapsed / 1e9


def modeled_hbm_bytes_per_step(config) -> int:
    """Algorithmic HBM floor for one full step: every field element read and
    written exactly as the fused pass structure requires, zero overcompute.

    Pass structure (tpufluid/step.py): fused splat+curl+vorticity+divergence
    (read vel, write vel+div), VMEM-resident 20-sweep Jacobi (read p+div,
    write p), gradient-subtract (read vel+p, write vel), velocity self-advect
    gather (read vel as operand + as source, write vel), dye advection
    (same-grid: read vel+dye, write dye; cross-resolution: separable velocity
    resample materializes a dye-res velocity, then the gather reads it)."""
    import numpy as np

    sw, sh = config.sim_size
    dw, dh = config.dye_size
    B = np.dtype(config.DTYPE).itemsize
    sim, dye = sw * sh, dw * dh
    b = (2 + 2 + 1) * sim        # pre-pressure fused pass
    # Jacobi (p + div in, p out), once per 20-sweep VMEM-resident chunk
    b += 3 * sim * max(1, -(-config.PRESSURE_ITERATIONS // 20))
    b += (2 + 1 + 2) * sim       # gradient subtract
    b += 3 * 2 * sim             # velocity self-advect gather
    if (sw, sh) == (dw, dh):
        b += (2 + 3 + 3) * sim   # same-grid dye advect
    else:
        b += 2 * sim + 2 * dye   # separable velocity resample to dye grid
        b += (2 + 3 + 3) * dye   # dye gather
    return b * B


def _bench_steps(config, chunks: int, chunk: int, sharded: bool = False):
    import jax.numpy as jnp

    from tpufluid import init_state
    from tpufluid.step import make_multi_step
    from tpufluid.trace import swirl_trace

    trace = swirl_trace(config, chunk, seed=42)
    batches = jnp.asarray(trace.batches)
    dt = jnp.float32(1.0 / 60.0)
    if sharded:
        from tpufluid.parallel import make_mesh, shard_state
        from tpufluid.parallel.sharded_step import make_sharded_multi_step

        mesh = make_mesh()
        multi = make_sharded_multi_step(config, mesh)
        state = shard_state(init_state(config), mesh)
    else:
        multi = make_multi_step(config)
        state = init_state(config)

    # Warm up: compile + first runs. The scalar read forces a REAL device
    # sync (block_until_ready alone has proven unreliable on tunneled
    # backends before the first device->host transfer). shard_map programs
    # need >= 2 discarded executions (lazy program load, docs/BENCH.md).
    for _ in range(3 if sharded else 1):
        state = multi(state, dt, batches)
    float(jnp.sum(jnp.abs(state.velocity.astype(jnp.float32))))

    t0 = time.perf_counter()
    for _ in range(chunks):
        state = multi(state, dt, batches)
    checksum = float(jnp.sum(jnp.abs(state.velocity.astype(jnp.float32))))
    elapsed = time.perf_counter() - t0
    assert np.isfinite(checksum), "velocity went non-finite during bench"
    return chunks * chunk / elapsed, state


def _bench_batched_steps(config, batch: int, chunks: int, chunk: int,
                         per_sim_dt: bool = False):
    """Serving-mode throughput: ``batch`` independent sims advance in ONE
    vmapped scan dispatch (tpufluid/batch.py). Returns AGGREGATE
    sim-steps/s = batch * steps / wall. Each sim replays its own seeded
    trace, so the batch is not a degenerate replicated workload.
    ``per_sim_dt`` benches the (T, B) dt-vector program (tenants on their
    own wall clocks — the batched (1,1) SMEM dt) instead of the lock-step
    scalar-dt program; dts spread over [1/90, 1/60] so the batched SMEM
    operand is genuinely non-uniform."""
    import jax.numpy as jnp

    from tpufluid.batch import init_batch, make_batched_multi_step
    from tpufluid.trace import swirl_trace

    splats_seq = jnp.stack(
        [jnp.asarray(swirl_trace(config, chunk, seed=42 + i).batches)
         for i in range(batch)], axis=1)  # (T, B, MAX_SPLATS, 8)
    if per_sim_dt:
        per_sim = jnp.linspace(1.0 / 90.0, 1.0 / 60.0, batch,
                               dtype=jnp.float32)
        dt = jnp.broadcast_to(per_sim, (chunk, batch))
    else:
        dt = jnp.float32(1.0 / 60.0)
    multi = make_batched_multi_step(config)
    state = init_batch(config, batch)

    # Discard >= 2 EXECUTIONS after compile, like the sharded path:
    # vmapped scan programs show the same lazy-program-load slowness on
    # first executions as shard_map programs (the r11 knee table's 22%
    # B=1 deficit at 1024^2 was exactly this — kernel times and steady
    # rates are IDENTICAL single vs vmapped-B=1 once warmed,
    # out/batched_tax_b1.json).
    for _ in range(3):
        state = multi(state, dt, splats_seq)
    float(jnp.sum(jnp.abs(state.velocity.astype(jnp.float32))))

    t0 = time.perf_counter()
    for _ in range(chunks):
        state = multi(state, dt, splats_seq)
    checksum = float(jnp.sum(jnp.abs(state.velocity.astype(jnp.float32))))
    elapsed = time.perf_counter() - t0
    assert np.isfinite(checksum), "velocity went non-finite during bench"
    return chunks * chunk * batch / elapsed, state


def _bench_packed_steps(config, batch: int, chunks: int, chunk: int):
    """Lane-packed fleet serving (tpufluid/batch_packed.py): the B sims
    live side by side in LANES of one (C, H, B*W) array — zero 128-lane
    pad waste at small grids (a 288-wide sim alone pads to 384 = +33%
    dead lanes) and one deep grid instead of B shallow ones. Same
    protocol as _bench_batched_steps (per-sim seeded traces, lock-step
    dt); per-sim dts are the vmapped mode's job."""
    import jax.numpy as jnp

    from tpufluid.batch_packed import (init_packed, make_packed_multi_step,
                                       packed_supported)
    from tpufluid.trace import swirl_trace

    if not packed_supported(config, batch):
        raise ValueError(
            f"packed mode unsupported for {config.sim_size} x{batch} "
            f"{config.DTYPE} (needs sim==dye grid, f32/bf16, (B*W)%128==0, "
            f"kernel-friendly unpadded geometry) — drop --packed for the "
            f"vmapped mode")
    splats_seq = jnp.stack(
        [jnp.asarray(swirl_trace(config, chunk, seed=42 + i).batches)
         for i in range(batch)], axis=1)  # (T, B, MAX_SPLATS, 8)
    dt = jnp.float32(1.0 / 60.0)
    multi = make_packed_multi_step(config, batch)
    state = init_packed(config, batch)
    for _ in range(3):  # compile + discard lazy-load executions
        state = multi(state, dt, splats_seq)
    float(jnp.sum(jnp.abs(state.velocity.astype(jnp.float32))))

    t0 = time.perf_counter()
    for _ in range(chunks):
        state = multi(state, dt, splats_seq)
    checksum = float(jnp.sum(jnp.abs(state.velocity.astype(jnp.float32))))
    elapsed = time.perf_counter() - t0
    assert np.isfinite(checksum), "velocity went non-finite during bench"
    return chunks * chunk * batch / elapsed, state


def _bench_render(config, frames: int = 200):
    import jax
    import jax.numpy as jnp

    from tpufluid import init_state
    from tpufluid.render import make_render
    from tpufluid.step import make_multi_step
    from tpufluid.trace import swirl_trace

    trace = swirl_trace(config, 60, seed=42)
    multi = make_multi_step(config)
    state = multi(init_state(config), jnp.float32(1 / 60),
                  jnp.asarray(trace.batches))
    render = make_render(config)
    f = render(state)
    float(jnp.sum(f[:, :8, :128].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(frames):
        f = render(state)
    float(jnp.sum(f[:, :8, :128].astype(jnp.float32)))
    return frames / (time.perf_counter() - t0)


def main() -> None:
    """Parse args, run the selected config, and print the full JSON result
    line followed by a compact (<= 500 char) JSON summary as the LAST stdout
    line. The full line carries roofline/floors payloads; the summary
    repeats the headline fields so any bounded TAIL capture of the output
    still parses a headline (round-4 verdict: BENCH_r04's 2000-char tail
    kept the floors payload but truncated the "value" field away). Errors
    also produce both lines ({"error": ..., "value": null}) — never a bare
    traceback (the driver parses stdout into BENCH_r*)."""
    args = _parse_args()
    try:
        out = _run(args)
    except Exception as e:  # noqa: BLE001 — parseable lines, always
        s = f"{type(e).__name__}: {e}"
        unavailable = ("Unable to initialize backend" in s
                       or "UNAVAILABLE" in s or "DEADLINE_EXCEEDED" in s)
        out = {
            "error": ("tpu backend unavailable" if unavailable
                      else "bench failed"),
            "detail": s[:500],
            "metric": f"config {args.config} ({args.dtype or 'default'})",
            "value": None,
            "unit": "steps/sec" if args.config != 2 else "frames/sec",
            "vs_baseline": None,
        }
    print(json.dumps(out))
    print(json.dumps(_summary_line(out)))


def _summary_line(out: dict) -> dict:
    """The <= 500-char tail-survivable headline: metric/value/unit/
    vs_baseline (+ error, north-star flag, kernel-time coverage when
    present), nothing else."""
    s = {"summary": True,
         "metric": str(out.get("metric", ""))[:200],
         "value": out.get("value"),
         "unit": out.get("unit"),
         "vs_baseline": out.get("vs_baseline")}
    if out.get("error"):
        s["error"] = out["error"]
        # An outage tail capture must retain the cause, not just the label.
        s["detail"] = str(out.get("detail", ""))[:150]
    floors = out.get("floors") or {}
    star = floors.get("north_star") or {}
    if "north_star_10k_reachable_projected" in star:
        s["north_star_10k_projected"] = star[
            "north_star_10k_reachable_projected"]
    if "step_coverage" in floors:
        s["step_coverage"] = floors["step_coverage"]
    assert len(json.dumps(s)) <= 500, "summary line must survive tail capture"
    return s


def _parse_args() -> argparse.Namespace:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", type=int, default=3,
                   choices=[1, 2, 3, 4, 5, 6, 7])
    p.add_argument("--batch", type=int, default=16,
                   help="config 7 (serving mode): number of independent "
                        "sims advanced per vmapped dispatch "
                        "(tpufluid/batch.py)")
    p.add_argument("--serve-res", type=int, default=256,
                   help="config 7: per-sim grid resolution (default 256; "
                        "--serve-res 1024 benches batched serving AT THE "
                        "HEADLINE GRID — the measured-today path past the "
                        "10k aggregate steps/s north star, and where "
                        "VMEM pressure / gather floors decide the "
                        "batching knee)")
    p.add_argument("--per-sim-dt", action="store_true",
                   help="config 7: bench the (T, B) per-sim dt-vector "
                        "program (tenants on their own wall clocks) "
                        "instead of the lock-step scalar-dt program")
    p.add_argument("--packed", action="store_true",
                   help="config 7: lane-packed fleet mode "
                        "(tpufluid/batch_packed.py) — B sims side by side "
                        "in lanes of ONE array, zero 128-lane pad waste "
                        "at small grids; lock-step dt only")
    p.add_argument("--dtype", choices=["float32", "bfloat16", "float16"],
                   default=None,
                   help="state dtype override: configs 1-2 default to float32, "
                        "3-5 to bfloat16 — the parity-faithful mode (the "
                        "reference stores 16-bit half-float textures, "
                        "script.js:145-153; f32 EXCEEDS reference fidelity); "
                        "float16 is the exact IEEE-half storage mode")
    p.add_argument("--jacobi-iters", type=int, default=None,
                   help="override PRESSURE_ITERATIONS (default: each "
                        "config's 20, matching the reference default and "
                        "the north-star spec; BASELINE.json's config-3 text "
                        "also names a 60-iter variant — run it with 60)")
    p.add_argument("--rgb9e5", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="bfloat16 configs: pack the 3-channel dye into one "
                        "uint32 per texel for the gather (shared-exponent "
                        "RGB9E5, ops/quant.py) — 2 gathers/trip instead of 3. "
                        "ON by default since round 9 (device A/B b69: +7.3%% "
                        "headline); --no-rgb9e5 benches the unquantized "
                        "gather")
    p.add_argument("--overlap", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="with --sharded: split-phase interior/boundary step "
                        "(config.OVERLAP_HALO) — interior bands carry no "
                        "collective dependency AND run on unpadded "
                        "power-of-two block heights (better kernel tiles "
                        "at 16K than the monolithic padded blocks). "
                        "Default: auto by the measured crossover (ON from "
                        "8192^2 up, config.overlap_halo); --overlap / "
                        "--no-overlap force it")
    p.add_argument("--sharded", action="store_true",
                   help="run the shard_map step (2-D mesh over all visible "
                        "devices, halo-exchange collectives, the SAME Pallas "
                        "kernel suite) instead of the single-device step; "
                        "sim configs only")
    return p.parse_args()


def _run(args: argparse.Namespace) -> dict:
    stop_warm_worker()
    probe_backend()

    from tpufluid import FluidConfig

    dtype = args.dtype or ("bfloat16" if args.config in (3, 4, 5, 6, 7)
                           else "float32")
    if args.config == 7 and args.sharded:
        raise ValueError("config 7 benches the single-chip batched path; "
                         "batch DP over a mesh is covered by "
                         "tpufluid.batch.make_batch_sharded_multi_step "
                         "(tests/test_batch.py)")

    def mkcfg(**kw):
        if args.rgb9e5 is not None:  # None = the config default (on for bf16)
            kw["DYE_RGB9E5"] = args.rgb9e5
        return FluidConfig(OVERLAP_HALO=args.overlap, **kw).validate()
    it = args.jacobi_iters
    tag = {"float32": "fp32", "bfloat16": "bfloat16", "float16": "fp16"}[dtype]

    if args.config == 1:
        cfg = mkcfg(SIM_RESOLUTION=128, DYE_RESOLUTION=1024,
                          CANVAS_WIDTH=1280, CANVAS_HEIGHT=720,
                          PRESSURE_ITERATIONS=it or 20, MAX_SPLATS=8,
                          DTYPE=dtype)
        value, state = _bench_steps(cfg, chunks=3, chunk=100, sharded=args.sharded)
        metric = f"sim steps/sec, demo default (128 sim / 1024-scale dye @1280x720, 20 Jacobi, {tag})"
    elif args.config == 2:
        cfg = mkcfg(SIM_RESOLUTION=128, DYE_RESOLUTION=1024,
                          CANVAS_WIDTH=1280, CANVAS_HEIGHT=720,
                          MAX_SPLATS=8, DTYPE=dtype)
        value = _bench_render(cfg)
        metric = "render frames/sec, 1280x720 full display pipeline (bloom mips + sunrays + shading + dither)"
    elif args.config == 3:
        cfg = mkcfg(SIM_RESOLUTION=1024, DYE_RESOLUTION=1024,
                          CANVAS_WIDTH=1024, CANVAS_HEIGHT=1024,
                          PRESSURE_ITERATIONS=it or 20, MAX_SPLATS=8,
                          DTYPE=dtype)
        value, state = _bench_steps(cfg, chunks=5, chunk=100, sharded=args.sharded)
        metric = f"sim steps/sec, 1024^2 velocity+dye, {it or 20} Jacobi iters, {tag}, trace replay"
    elif args.config == 4:
        cfg = mkcfg(SIM_RESOLUTION=4096, DYE_RESOLUTION=4096,
                          CANVAS_WIDTH=4096, CANVAS_HEIGHT=4096,
                          PRESSURE_ITERATIONS=it or 20, MAX_SPLATS=8,
                          DTYPE=dtype)
        value, state = _bench_steps(cfg, chunks=2, chunk=50, sharded=args.sharded)
        metric = f"sim steps/sec, 4096^2 {tag}, {it or 20} Jacobi iters, trace replay"
    elif args.config == 7:
        r = args.serve_res
        cfg = mkcfg(SIM_RESOLUTION=r, DYE_RESOLUTION=r,
                          CANVAS_WIDTH=r, CANVAS_HEIGHT=r,
                          PRESSURE_ITERATIONS=it or 20, MAX_SPLATS=8,
                          DTYPE=dtype)
        # Scan-amortized with 100-step chunks like every sim config.
        # (r14 measured the old 25-step chunks at 1024^2 understating B=1
        # by ~27% — pure per-dispatch protocol overhead, not vmap cost:
        # the d01 profile pinned the vmapped program rate-identical to
        # the single step once warmed, out/batched_tax_b1.json.)
        chunk = 100
        if args.packed:
            if args.per_sim_dt:
                raise ValueError("--packed is lock-step only (per-sim dts "
                                 "run the vmapped mode)")
            value, state = _bench_packed_steps(cfg, batch=args.batch,
                                               chunks=3, chunk=chunk)
        else:
            value, state = _bench_batched_steps(cfg, batch=args.batch,
                                                chunks=3, chunk=chunk,
                                                per_sim_dt=args.per_sim_dt)
        dt_kind = "per-sim dt" if args.per_sim_dt else "lock-step dt"
        pack_kind = "lane-packed fleet" if args.packed else "batched"
        metric = (f"aggregate sim steps/sec, {args.batch} {pack_kind} "
                  f"{r}^2 sims per dispatch (serving mode, {dt_kind}), "
                  f"{it or 20} Jacobi iters, {tag}")
        out_extra = {"per_sim_steps_per_s": round(value / args.batch, 2)}
    elif args.config == 6:
        cfg = mkcfg(SIM_RESOLUTION=8192, DYE_RESOLUTION=8192,
                          CANVAS_WIDTH=8192, CANVAS_HEIGHT=8192,
                          PRESSURE_ITERATIONS=it or 20, MAX_SPLATS=8,
                          DTYPE=dtype)
        value, state = _bench_steps(cfg, chunks=2, chunk=20, sharded=args.sharded)
        metric = f"sim steps/sec, 8192^2 {tag}, {it or 20} Jacobi iters, trace replay"
    else:
        cfg = mkcfg(SIM_RESOLUTION=16384, DYE_RESOLUTION=16384,
                          CANVAS_WIDTH=16384, CANVAS_HEIGHT=16384,
                          PRESSURE_ITERATIONS=it or 20, MAX_SPLATS=8,
                          DTYPE=dtype)
        value, state = _bench_steps(cfg, chunks=1, chunk=20, sharded=args.sharded)
        metric = f"sim steps/sec, 16384^2 {tag} single chip, {it or 20} Jacobi iters"

    # Label from the EFFECTIVE config, not the CLI flag: DYE_RGB9E5 defaults
    # True for bf16 since round 9, so a plain bf16 run IS packed (and
    # --rgb9e5 on a float32 run is inert — quant is bf16-gated in step.py).
    if cfg.DYE_RGB9E5 and dtype == "bfloat16" and args.config != 2:
        metric += ", rgb9e5-packed dye"
    if args.sharded and args.config != 2:
        metric += ", sharded (shard_map mesh over visible devices)"
        if cfg.overlap_halo:  # effective value: explicit flag or auto
            metric += (", split-phase overlap"
                       + ("" if args.overlap is not None else " (auto)"))
    out = {
        "metric": metric,
        "value": round(value, 2),
        "unit": "steps/sec" if args.config != 2 else "frames/sec",
        "vs_baseline": round(value / 60.0, 2),
        # Environment provenance (round-3 verdict: the 986-vs-1116 driver
        # gap was undiagnosable without it).
        "provenance": provenance(),
    }
    if args.config == 7:
        out.update(out_extra)
    if args.sharded and args.config != 2:
        # Static overhead decomposition (VERDICT: make a future real-slice
        # run predictable): per-phase overcompute + collective send bytes.
        from tpufluid.parallel.mesh import make_mesh as _mm
        from tpufluid.parallel.sharded_step import overhead_report

        m = _mm()
        out["sharded_overhead"] = overhead_report(cfg, m.devices.shape)
    if args.config != 2:
        # Roofline-utilization fields: the modeled algorithmic HBM floor per
        # step vs this device's measured streaming bandwidth. Utilization
        # << 1 on gather-heavy configs means the limiter is the
        # dynamic_gather ISA issue rate, not HBM (docs/BENCH.md).
        bw = measure_hbm_bandwidth_gbps()
        bytes_step = modeled_hbm_bytes_per_step(cfg)
        achieved = bytes_step * value / 1e9
        out.update({
            "hbm_bytes_per_step": bytes_step,
            "achieved_gbps": round(achieved, 1),
            "device_bw_gbps": round(bw, 1),
            "hbm_utilization": round(achieved / bw, 3),
        })
        # Per-kernel evidence table (the step is gather-issue bound, not
        # HBM bound, so hbm_utilization alone cannot certify "at the
        # floor"): profiled in-step kernel times, achieved rates vs
        # reduced-structure reference rates, and the stencil HBM floor
        # (tpufluid/ops/pallas/floors.py). Headline config only — the
        # profile + microbench compiles add ~3 min to a fresh process.
        if not args.sharded and args.config == 3:
            try:
                import jax

                if jax.default_backend() == "tpu":
                    from tpufluid.ops.pallas.floors import floor_report

                    out["floors"] = floor_report(cfg, state, 1.0 / 60.0,
                                                 bw, value)
            except Exception as e:  # floors must never sink the headline
                out["floors_error"] = f"{type(e).__name__}: {e}"
    return out


if __name__ == "__main__":
    main()
