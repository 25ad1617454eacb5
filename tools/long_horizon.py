"""BASELINE config #4 long-horizon stability / energy-decay artifact.

Runs the full fluid step for --steps steps (splat input for the first
--splat-steps, then free decay), logging diagnostics every --chunk steps
(scan-chunked: per-step dispatch would dominate on both the CPU and the
tunneled TPU), and writes:

  <out>/metrics.jsonl   one diagnostics record per chunk
  <out>/summary.json    the stability claims, checked:
      nonfinite == 0 throughout; backtrace_speed inside
      halo_contract_speed (no silent gather clamping, ever); kinetic
      energy decaying strongly post-input with bounded transient upticks
      (vorticity confinement is an anti-dissipation term by design, so
      strict monotonicity is NOT the physics — the 512^2 CPU artifact
      measured <= 3.2% upticks per 50-step window inside a 256x overall
      decay); div_rms bounded. max_component_speed is REPORTED, not
      asserted at 1000: the reference's +/-1000 clamp applies
      pre-projection and the un-halved gradient kick is never re-clamped
      (script.js:863,892-913), so the stored field can transiently exceed
      it (measured peak 1016 = +1.6%) — faithful behavior, and the
      contract check above is the one that guards the gather.

  python tools/long_horizon.py --res 512 --dtype float32 --out out/lh512
  python tools/long_horizon.py --res 4096 --dtype bfloat16 \
      --out out/long_horizon_4096   # the BASELINE #4 device artifact
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main(argv=None) -> dict:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--res", type=int, default=512)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--steps", type=int, default=5000)
    p.add_argument("--splat-steps", type=int, default=500)
    p.add_argument("--chunk", type=int, default=50)
    p.add_argument("--jacobi-iters", type=int, default=20)
    p.add_argument("--out", default="out/long_horizon")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (jax.config; the env var is "
                        "overridden by the axon sitecustomize)")
    args = p.parse_args(argv)

    if args.cpu:
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    import jax.numpy as jnp
    import numpy as np

    from tpufluid import FluidConfig, init_state
    from tpufluid.metrics import MetricsLogger, contract_warning
    from tpufluid.step import make_multi_step
    from tpufluid.trace import swirl_trace

    cfg = FluidConfig(SIM_RESOLUTION=args.res, DYE_RESOLUTION=args.res,
                      CANVAS_WIDTH=args.res, CANVAS_HEIGHT=args.res,
                      PRESSURE_ITERATIONS=args.jacobi_iters,
                      DTYPE=args.dtype, MAX_SPLATS=8).validate()
    os.makedirs(args.out, exist_ok=True)
    trace = swirl_trace(cfg, args.splat_steps, seed=11)
    batches = np.asarray(trace.batches, np.float32)
    none_batch = np.zeros_like(batches[:args.chunk])
    multi = make_multi_step(cfg)
    state = init_state(cfg)
    dt = jnp.float32(1.0 / 60.0)

    logger = MetricsLogger(os.path.join(args.out, "metrics.jsonl"))
    records = []
    t0 = time.time()
    step = 0
    warned = 0
    # Rate accounting (round-4 verdict weak #6): the wall rate divides by
    # EVERYTHING, but each chunk also runs a dozen whole-field diagnostic
    # reductions + host pulls over the (slow) tunnel — at 4096^2 those
    # pulls explained an apparent 2x "regression" vs bench config 4.
    # Split the clock: compute_seconds closes each chunk with one scalar
    # read (block_until_ready alone may return early on tunneled
    # backends, CLAUDE.md); diagnostics_seconds is logger.log.
    compute_s = 0.0
    diag_s = 0.0
    chunk_secs = []  # per-chunk compute (chunk 0 carries the compile)
    while step < args.steps:
        n = min(args.chunk, args.steps - step)
        if step < args.splat_steps:
            chunk = batches[step:step + n]
            if len(chunk) < n:  # input tail shorter than the chunk
                chunk = np.concatenate([chunk, none_batch[:n - len(chunk)]])
        else:
            chunk = none_batch[:n]
        ta = time.time()
        state = multi(state, dt, jnp.asarray(chunk))
        float(jnp.sum(state.pressure[:1, :8]))  # close the compute timing
        tb = time.time()
        step += n
        rec = logger.log(step, state, cfg)
        diag_s += time.time() - tb
        compute_s += tb - ta
        chunk_secs.append(tb - ta)
        records.append(rec)
        if contract_warning(rec):
            warned += 1
        if step % (args.chunk * 10) == 0 or step == args.steps:
            print(f"step {step}/{args.steps}: max|v|={rec['max_speed']:.1f} "
                  f"E={rec['kinetic_energy']:.4g} div_rms={rec['div_rms']:.3g} "
                  f"nonfinite={rec['nonfinite']:.0f}", flush=True)
    elapsed = time.time() - t0
    logger.close()

    # ---- the stability claims ----
    post = [r for r in records if r["step"] > args.splat_steps]
    energies = [r["kinetic_energy"] for r in post]
    upticks = [max(0.0, b - a) / max(a, 1e-9)
               for a, b in zip(energies, energies[1:])]
    summary = {
        "config": {"res": args.res, "dtype": args.dtype, "steps": args.steps,
                   "splat_steps": args.splat_steps,
                   "jacobi_iters": args.jacobi_iters},
        "steps_per_s": round(args.steps / elapsed, 2),
        # Reconciles with bench config 4: the MEDIAN chunk's compute rate
        # (steady-state kernel rate, what the bench times) — total compute
        # seconds do NOT reconcile because chunk 0 carries the XLA compile
        # and the tunneled runtime's per-dispatch latency DEGRADES
        # monotonically as a process ages (measured e05: 0.56 -> 0.84 s per
        # 50-step chunk over 10 chunks at 4096^2; the CLAUDE.md "450 us
        # fresh -> 7 ms in long-lived workers" pathology, accelerated by
        # the ~15 diagnostic dispatches each chunk issues). An environment
        # artifact of the axon tunnel, not a kernel regression — bench
        # config 4 measures the same program at its 2nd-4th executions.
        "steps_per_s_compute_median": round(
            args.chunk / float(np.median(chunk_secs[1:] or chunk_secs)), 2),
        "steps_per_s_compute": round(args.steps / max(compute_s, 1e-9), 2),
        "compute_seconds": round(compute_s, 2),
        "first_chunk_seconds": round(chunk_secs[0], 2),  # compile + load
        "tunnel_decay_x": round(
            float(np.mean(chunk_secs[-max(1, len(chunk_secs) // 4):])
                  / max(np.mean(chunk_secs[1:1 + max(1, len(chunk_secs)
                                                     // 4)]), 1e-9)), 2)
        if len(chunk_secs) > 2 else None,
        "diagnostics_seconds": round(diag_s, 2),
        "rate_accounting": ("wall = compile (first_chunk_seconds) + chunk "
                            "compute (degrading per-dispatch tunnel latency "
                            "as the process ages; tunnel_decay_x = last/first "
                            "quartile) + per-chunk diagnostics; compare "
                            "steps_per_s_compute_median with bench "
                            "--config 4"),
        "nonfinite_total": sum(r["nonfinite"] for r in records),
        "max_component_speed_peak": max(r["max_component_speed"]
                                        for r in records),
        "backtrace_speed_peak": max(r["backtrace_speed"] for r in records),
        "halo_contract_speed": records[-1]["halo_contract_speed"],
        "contract_warnings": warned,
        "energy_at_input_stop": energies[0] if energies else None,
        "energy_final": energies[-1] if energies else None,
        "energy_decay_ratio": (energies[-1] / energies[0]
                               if energies and energies[0] else None),
        "energy_max_uptick_frac": max(upticks) if upticks else 0.0,
        "div_rms_final": records[-1]["div_rms"],
        "div_rms_peak": max(r["div_rms"] for r in records),
        "dye_max_final": records[-1]["dye_max"],
    }
    # No post-input records (--steps <= --splat-steps) -> the decay claim is
    # unverifiable: mark not-ok rather than crash AFTER the expensive run
    # (energy_final is None there) and still write summary.json.
    decayed = (summary["energy_final"] is not None
               and summary["energy_at_input_stop"]
               and summary["energy_final"]
               < 0.25 * summary["energy_at_input_stop"])
    summary["ok"] = bool(
        summary["nonfinite_total"] == 0
        and summary["backtrace_speed_peak"]
        <= summary["halo_contract_speed"]
        and decayed
        and summary["energy_max_uptick_frac"] < 0.10)
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
