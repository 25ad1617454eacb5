#!/usr/bin/env python3
"""Warm TPU worker: one long-lived process attached to the tunneled TPU
backend, executing job files dropped into out/jobs/*.py in-process.

Why: the first device->host transfer per process on the axon tunnel costs
80-320 s (see CLAUDE.md), so a single warm process amortizes it across many
device jobs.  This file is COMMITTED (round 3 lesson: the previous copy
lived untracked in out/ and was lost to a VM reset).

Protocol:
- ``python tools/tpu_worker.py`` (background it; pid written to
  out/worker.pid -- stop with ``kill $(cat out/worker.pid)``, never by
  process-name pattern).
- Drop a python file into out/jobs/; the worker runs the alphabetically
  first pending job in-process with a fresh tpufluid/tests module cache,
  writes combined stdout+stderr (+traceback on failure) to ``<job>.log``,
  then moves both into out/jobs/done/.
- Jobs that need pytest must spawn it via subprocess (pytest cannot be
  re-run in-process); see out/jobs/done/b77_batched_device_test.py.
- NEVER delete a queued job file -- the worker may already be executing it.
"""
import contextlib
import io
import os
import shutil
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
JOBS = os.path.join(REPO, "out", "jobs")
DONE = os.path.join(JOBS, "done")


def main():
    os.makedirs(DONE, exist_ok=True)
    os.chdir(REPO)
    if REPO not in sys.path:
        sys.path.insert(0, REPO)
    with open(os.path.join(REPO, "out", "worker.pid"), "w") as f:
        f.write(str(os.getpid()))
    os.environ["TPUFLUID_DEVICE"] = "tpu"
    import jax

    t0 = time.time()
    print(f"[worker] devices: {jax.devices()} ({time.time() - t0:.1f}s)",
          flush=True)
    import jax.numpy as jnp

    t0 = time.time()
    x = float(jnp.sum(jnp.ones((128, 128))))
    print(f"[worker] first transfer: {x} in {time.time() - t0:.1f}s",
          flush=True)
    while True:
        jobs = sorted(f for f in os.listdir(JOBS) if f.endswith(".py"))
        if not jobs:
            time.sleep(2.0)
            continue
        job = jobs[0]
        path = os.path.join(JOBS, job)
        log_path = path + ".log"
        print(f"[worker] running {job}", flush=True)
        buf = io.StringIO()
        t0 = time.time()
        ok = True
        # Purge the repo's module cache so each job sees current code.
        for name in [m for m in sys.modules
                     if m.split(".")[0] in ("tpufluid", "tests", "bench",
                                            "tools")]:
            del sys.modules[name]
        try:
            with open(path) as f:
                src = f.read()
            code = compile(src, path, "exec")
            glb = {"__name__": "__main__", "__file__": path}
            with contextlib.redirect_stdout(buf), \
                    contextlib.redirect_stderr(buf):
                exec(code, glb)
        except KeyboardInterrupt:
            raise
        except BaseException:
            ok = False
            buf.write(traceback.format_exc())
        dt = time.time() - t0
        buf.write(f"\n[worker] {'OK' if ok else 'FAIL'} in {dt:.1f}s\n")
        with open(log_path, "w") as f:
            f.write(buf.getvalue())
        shutil.move(path, os.path.join(DONE, job))
        shutil.move(log_path, os.path.join(DONE, job + ".log"))
        print(f"[worker] {'OK' if ok else 'FAIL'} {job} in {dt:.1f}s",
              flush=True)


if __name__ == "__main__":
    main()
