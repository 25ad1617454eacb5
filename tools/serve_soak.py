#!/usr/bin/env python3
"""Multi-tenant serving soak with a HARD latency SLO: drive a live
BatchFluidServer with concurrent random event streams, frame polls, fleet
resizes and checkpoints for a fixed wall-time, then write a
machine-readable robustness summary (out/serve_soak/summary.json) and
FAIL (exit 1) unless every bar below holds.

What it certifies (the production-serving robustness + latency spec):
- the sim loop survives the whole soak (server.error stays None);
- steps keep advancing (no deadlock between events/resize/checkpoint
  locks and the loop);
- every event POST-equivalent completes;
- final fleet state is finite and consistent (sessions == len(speeds));
- HARD SLO, asserted (in-process calls, so the numbers measure LOCK
  waits and serving-path work, not HTTP stack noise):
    events     p99 <= 250 ms   (reference bar: every input lands within
                                one 16.7 ms frame, script.js:1185)
    resize     p99 <= 5 s      (two-phase: bookkeeping only; the
                                reconciler compiles/swap off-path)
    checkpoint p99 <= 1 s      (round 5: AOT async device copy under the
                                locks; forcing + transfer + serialization
                                outside them — bounded independent of tick
                                duration and fleet size)
    frame      p99 <= 250 ms   (lazy JPEG encode + lock reads)
  and >= 10 resizes actually executed during the soak.

The SLO holds from a COLD compile cache by design (no XLA compile ever
runs under a lock — tpufluid/serve_batch.py's AOT reconciler); the JAX
persistent compilation cache (on by default, out/jax_cache) additionally
makes reruns/restarts load every program from disk.

  TPUFLUID_DEVICE=cpu python tools/serve_soak.py --seconds 600 \
      --out out/serve_soak/summary.json
"""
import argparse
import json
import os
import random
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SLO_MS = {"events": 250.0, "resize": 5000.0, "checkpoint": 1000.0,
          "frame": 250.0}
MIN_RESIZES = 10


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seconds", type=float, default=600.0)
    p.add_argument("--sessions", type=int, default=3)
    p.add_argument("--max-resize", type=int, default=5)
    p.add_argument("--out", default="out/serve_soak/summary.json")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--compile-cache", default="out/jax_cache",
                   help="JAX persistent compilation cache dir ('' to "
                        "disable); the SLO must hold even cold, the cache "
                        "just makes reruns cheap")
    args = p.parse_args()

    if os.environ.get("TPUFLUID_DEVICE", "cpu").lower() == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    if args.compile_cache:
        from tpufluid.compilecache import enable_compile_cache

        enable_compile_cache(args.compile_cache)
    import numpy as np

    from tpufluid import FluidConfig
    from tpufluid.serve_batch import BatchFluidServer

    cfg = FluidConfig(SIM_RESOLUTION=32, DYE_RESOLUTION=64, CANVAS_WIDTH=96,
                      CANVAS_HEIGHT=64, MAX_SPLATS=4,
                      USE_PALLAS=False).validate()
    srv = BatchFluidServer(cfg, sessions=args.sessions, seed=args.seed,
                           prewarm="all")
    loop = threading.Thread(target=srv.run, daemon=True)
    loop.start()
    while srv.frames is None and srv.error is None:
        time.sleep(0.1)
    assert srv.error is None, srv.error

    stop_at = time.time() + args.seconds
    lat = {"events": [], "resize": [], "checkpoint": [], "frame": []}
    failures = []

    def timed(kind, fn, sid_call=False):
        t0 = time.time()
        try:
            fn()
        except ValueError:
            # Out-of-range sid after a concurrent shrink is DEFINED
            # behavior for sid-taking calls only; a ValueError from
            # resize/checkpoint on valid input is a real failure.
            if not sid_call:
                failures.append((kind, "unexpected ValueError"))
        except Exception as e:  # noqa: BLE001
            failures.append((kind, repr(e)))
        lat[kind].append(time.time() - t0)

    def worker(kind, seed):
        rng = random.Random(seed)
        while time.time() < stop_at:
            if kind == "events":
                # Valid sids only (the fleet never exceeds max_resize, so
                # sid == max_resize would always fast-fail and skew the
                # lock-wait percentiles); concurrent shrinks still make
                # some of these racily out-of-range — that path is the
                # defined ValueError.
                sid = rng.randrange(args.max_resize)
                # speed spans [0, SPEED_MAX+0.5): slow motion, the 1x
                # lock-step fast path, FAST-FORWARD (> 1 makes the loop
                # request K-substep programs, racing the resizes), and
                # beyond-cap values exercising the clamp.
                evs = [{"k": "down", "x": rng.random(), "y": rng.random()},
                       {"k": "move", "x": rng.random(), "y": rng.random()},
                       {"k": "up"}, {"k": "speed", "v": rng.random() * 4.5}]
                timed(kind, lambda: srv.handle_events(evs, sid),
                      sid_call=True)
            elif kind == "resize":
                # Adversarial cadence: resizes land while the reconciler
                # is mid-compile / mid-swap, including cross-padded-bucket
                # flips (1..5 spans padded sizes 1, 2, 4, 8).
                n = rng.randrange(1, args.max_resize + 1)
                timed(kind, lambda: srv.resize_fleet(n))
                time.sleep(max(2.0, args.seconds / 60.0))
            elif kind == "checkpoint":
                timed(kind, lambda: srv.checkpoint_bytes())
                time.sleep(2.0)
            else:
                sid = rng.randrange(args.max_resize)
                timed(kind, lambda: srv.frame_jpeg(sid), sid_call=True)
            time.sleep(0.02)

    kinds = ["events", "events", "resize", "checkpoint", "frame", "frame"]
    threads = [threading.Thread(target=worker, args=(k, 100 + i))
               for i, k in enumerate(kinds)]
    t0_steps = srv.steps_done
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    steps = srv.steps_done - t0_steps
    srv.stop()
    loop.join(timeout=30)
    loop_exited = not loop.is_alive()

    def pct(xs, q):
        if not xs:
            return None
        xs = sorted(xs)
        return round(xs[min(len(xs) - 1, int(len(xs) * q))] * 1e3, 2)

    # Bounded acquire: if the loop is hung HOLDING the lock (the deadlock
    # class this soak exists to catch), report it instead of hanging the
    # reporter too.
    locked = srv.lock.acquire(timeout=30)
    try:
        consistent = srv.sessions == len(srv.speeds) == len(srv.tracers)
        finite = locked and all(
            bool(np.isfinite(np.asarray(getattr(srv.state, name),
                                        np.float32)).all())
            for name in ("velocity", "dye", "pressure"))
        prog_errors = dict(srv._prog_errors) if locked else {}
    finally:
        if locked:
            srv.lock.release()
    latency = {k: {"n": len(v), "p50": pct(v, 0.50), "p99": pct(v, 0.99),
                   "max": pct(v, 1.0), "slo_p99_ms": SLO_MS[k]}
               for k, v in lat.items()}
    slo_violations = [
        f"{k} p99 {latency[k]['p99']} ms > SLO {SLO_MS[k]} ms"
        for k in SLO_MS
        if latency[k]["p99"] is not None and latency[k]["p99"] > SLO_MS[k]]
    if len(lat["resize"]) < MIN_RESIZES:
        slo_violations.append(
            f"only {len(lat['resize'])} resizes executed (< {MIN_RESIZES})")
    summary = {
        "seconds": args.seconds,
        "steps_during_soak": steps,
        "loop_error": srv.error,
        "loop_exited_cleanly": loop_exited,
        "lock_acquirable_after_soak": locked,
        "call_failures": failures[:20],
        "n_failures": len(failures),
        "final_sessions": srv.sessions,
        "fleet_consistent": consistent,
        "state_finite": finite,
        "program_compile_errors": {str(k): v[-400:]
                                   for k, v in prog_errors.items()},
        "latency_ms": latency,
        "slo_violations": slo_violations,
    }
    ok = (srv.error is None and not failures and steps > 0 and consistent
          and finite and loop_exited and locked and not prog_errors
          and not slo_violations)
    summary["ok"] = ok
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))
    sys.stdout.flush()
    # _exit, not sys.exit: the reconciler (daemon) may still be inside an
    # XLA compile; interpreter teardown cancelling it mid-condition-wait
    # aborts the process ("FATAL: exception not rethrown") AFTER the
    # summary is written, making the exit code lie. Skipping teardown
    # reports the soak's actual verdict.
    os._exit(0 if ok else 1)


if __name__ == "__main__":
    main()
