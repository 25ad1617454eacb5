"""Fidelity drift curves: 16-bit storage modes vs the f32 truth over time.

Single-step error bounds (docs/PARITY.md "Half-float fidelity") say what one
step costs; this tool answers the longer question serving cares about: over
hundreds of chaotic steps, do the 16-bit modes drift from the f32 truth like
PRECISION NOISE (the same exponential decorrelation any 1-ulp perturbation
suffers — the butterfly effect sets the clock, storage merely seeds it) or
like a systematic BIAS (energy drain / extra diffusion that a butterfly
baseline would not show)?

Method: advance the same seeded trace in five variants on CPU (jnp oracle;
the kernels match it by the interpret/device equality tests):

  * f32          — truth;
  * f32+eps      — f32 with a one-time 1e-6 relative velocity perturbation
                   at step 50 (once the flow is nonzero — at step 0 the
                   fields are all zeros and a multiplicative perturbation
                   would vanish): the BUTTERFLY BASELINE (pure chaos, no
                   precision difference);
  * bfloat16     — with the round-9 default rgb9e5 packed-dye gather;
  * bfloat16 -q  — DYE_RGB9E5=False (unquantized gather);
  * float16      — the reference's exact IEEE-half storage
                   (script.js:145-153).

Per record step: relative L2 velocity/dye error vs truth, plus the relative
kinetic-energy and dye-mass DIFFERENCE vs truth (signed — a bias detector:
decorrelation randomizes fields but integral quantities track the truth
unless the mode adds real diffusion).

Writes out/fidelity_drift/{drift.jsonl,summary.json}. CPU, ~minutes.
"""

from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from tpufluid import FluidConfig, init_state  # noqa: E402
from tpufluid.step import make_step  # noqa: E402
from tpufluid.trace import swirl_trace  # noqa: E402

OUT = pathlib.Path(__file__).resolve().parent.parent / "out" / "fidelity_drift"
STEPS = 400
RECORD_EVERY = 10
SIM, DYE = 256, 256


PERTURB_AT = 50


def run_variant(name: str, cfg: FluidConfig, trace, perturb: bool = False):
    step = make_step(cfg)
    s = init_state(cfg)
    out = {}
    for t in range(STEPS):
        if perturb and t == PERTURB_AT:
            key = jax.random.PRNGKey(0)
            noise = 1.0 + 1e-6 * jax.random.normal(key, s.velocity.shape,
                                                   jnp.float32)
            s = type(s)(velocity=(s.velocity.astype(jnp.float32) * noise
                                  ).astype(cfg.dtype),
                        dye=s.dye, pressure=s.pressure)
        s = step(s, jnp.float32(trace.dt), jnp.asarray(trace.batches[t]))
        if (t + 1) % RECORD_EVERY == 0:
            out[t + 1] = dict(
                velocity=np.asarray(s.velocity, np.float32),
                dye=np.asarray(s.dye, np.float32),
            )
    return out


def rel_l2(a: np.ndarray, b: np.ndarray) -> float:
    denom = float(np.linalg.norm(b.ravel())) or 1.0
    return float(np.linalg.norm((a - b).ravel())) / denom


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    base = dict(SIM_RESOLUTION=SIM, DYE_RESOLUTION=DYE, CANVAS_WIDTH=DYE,
                CANVAS_HEIGHT=DYE, MAX_SPLATS=8, USE_PALLAS=False)
    cfg32 = FluidConfig(DTYPE="float32", **base).validate()
    trace = swirl_trace(cfg32, STEPS, seed=42)

    variants = {
        "f32_eps": (cfg32, True),
        "bf16_rgb9e5": (FluidConfig(DTYPE="bfloat16", **base).validate(),
                        False),
        "bf16_plain": (FluidConfig(DTYPE="bfloat16", DYE_RGB9E5=False,
                                   **base).validate(), False),
        "f16": (FluidConfig(DTYPE="float16", **base).validate(), False),
    }

    truth = run_variant("f32", cfg32, trace)
    records = []
    summary = {}
    for name, (cfg, perturb) in variants.items():
        snaps = run_variant(name, cfg, trace, perturb=perturb)
        rows = []
        for t, ref in truth.items():
            got = snaps[t]
            ke_ref = float(np.sum(ref["velocity"].astype(np.float64) ** 2))
            ke_got = float(np.sum(got["velocity"].astype(np.float64) ** 2))
            dm_ref = float(np.sum(ref["dye"].astype(np.float64))) or 1.0
            dm_got = float(np.sum(got["dye"].astype(np.float64)))
            row = dict(
                variant=name, step=t,
                vel_rel_l2=round(rel_l2(got["velocity"], ref["velocity"]), 6),
                dye_rel_l2=round(rel_l2(got["dye"], ref["dye"]), 6),
                ke_rel_diff=round((ke_got - ke_ref) / (ke_ref or 1.0), 6),
                dye_mass_rel_diff=round((dm_got - dm_ref) / dm_ref, 6),
            )
            rows.append(row)
            records.append(row)
        summary[name] = dict(
            final=rows[-1],
            vel_rel_l2_at_100=next(r["vel_rel_l2"] for r in rows
                                   if r["step"] == 100),
            max_abs_ke_rel_diff=max(abs(r["ke_rel_diff"]) for r in rows),
            max_abs_dye_mass_rel_diff=max(abs(r["dye_mass_rel_diff"])
                                          for r in rows),
        )
        print(name, json.dumps(summary[name]))

    with open(OUT / "drift.jsonl", "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")
    with open(OUT / "summary.json", "w") as f:
        json.dump(dict(steps=STEPS, record_every=RECORD_EVERY, sim=SIM,
                       dye=DYE, trace_seed=42, variants=summary), f, indent=1)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
