"""Run metrics & observability (SURVEY.md §5.5).

The reference has no metrics beyond console.trace on shader errors; this
module provides the structured per-run counters the TPU build needs:
steps/sec, max |v|, post-projection divergence, kinetic energy, dye mass,
frame checksums — logged as JSONL. All diagnostics are computed device-side
in one jitted function (a single scalar transfer per report).
"""

from __future__ import annotations

import json
import time
from functools import lru_cache
from typing import IO, Optional

import jax
import jax.numpy as jnp

from tpufluid.config import FluidConfig
from tpufluid.ops import stencil
from tpufluid.state import FluidState


def halo_contract_speed(config) -> float:
    """Per-AXIS velocity (texels/s) the advection gather halo covers at the
    dt<=1/60 clamp: displacement beyond it backtraces CLAMP silently
    (ops/pallas/advect.HALO: the reference's own +/-1000 clamp is applied
    pre-projection and the gradient kick is never re-clamped, so this is
    the one observable contract edge — compare max_component_speed)."""
    from tpufluid.ops.pallas.advect import HALO
    from tpufluid.ops.pallas.common import round_up, row_align

    # float16 stages each pass through f32 compute (dispatch._f16_staged),
    # so its kernels carry the 4-byte halo.
    itemsize = jnp.dtype(config.dtype).itemsize
    if jnp.dtype(config.dtype) == jnp.float16:
        itemsize = 4
    halo = round_up(HALO, row_align(itemsize))
    # halo_for_displacement: halo >= ceil(disp) + 2 (bilinear corner +
    # roundoff margin) => covered displacement = halo - 2 texels/step.
    return (halo - 2) * 60.0


@lru_cache(maxsize=None)
def _make_diagnostics(config: FluidConfig):
    # Grid-size normalizers so records are comparable across resolutions
    # (config also keys the lru cache: a reconfigure re-specializes the jit).
    sw, sh = config.sim_size
    dw, dh = config.dye_size
    sim_cells = float(sw * sh)
    dye_cells = float(dw * dh)
    contract = halo_contract_speed(config)

    def diag(state: FluidState):
        v = state.velocity.astype(jnp.float32)
        d = state.dye.astype(jnp.float32)
        div = stencil.divergence(v)
        # TRUE contract quantity: the NEXT step's advection gathers backtrace
        # with clamp±1000(v + confinement·dt) − ∇̃p, and the un-halved gradient
        # kick is never re-clamped by the reference (script.js:892-913) — so
        # max|v| on the stored field only bounds the pre-kick part. Re-run the
        # pre-advection chain at the dt=1/60 clamp (worst case; splats are
        # omitted — vorticity re-clamps them to ±1000 before divergence, so
        # they only enter through the same clamp) and measure the kicked field
        # the gather will actually consume. See docs/ARCHITECTURE.md
        # "The displacement contract" for why no a-priori kick bound exists.
        vb = stencil.vorticity_confinement(v, stencil.curl(v), config.CURL,
                                           jnp.float32(1.0 / 60.0))
        pb = stencil.jacobi_pressure(
            state.pressure.astype(jnp.float32) * config.PRESSURE,
            stencil.divergence(vb), config.PRESSURE_ITERATIONS)
        vb = stencil.gradient_subtract(vb, pb)
        return {
            "max_speed": jnp.max(jnp.sqrt(v[0] ** 2 + v[1] ** 2)),
            # Per-component max: the number the advection gather's halo
            # contract actually bounds (halo-dependent — (halo-2)*60
            # texels/s per AXIS at dt=1/60: 1320 for the f32 24-row halo,
            # 1800 for bf16's 32-row halo; the magnitude above can exceed
            # it by sqrt(2) without any violation).
            "max_component_speed": jnp.max(jnp.abs(v)),
            "backtrace_speed": jnp.max(jnp.abs(vb)),
            "halo_contract_speed": jnp.float32(contract),
            "kinetic_energy": jnp.sum(v * v) * 0.5,
            "energy_per_cell": jnp.sum(v * v) * 0.5 / sim_cells,
            "dye_mass": jnp.sum(d),
            "dye_mean": jnp.sum(d) / dye_cells,
            "dye_max": jnp.max(d),
            "div_rms": jnp.sqrt(jnp.mean(div * div)),
            "div_max": jnp.max(jnp.abs(div)),
            "vel_checksum": jnp.sum(jnp.abs(v)),
            "nonfinite": jnp.sum(~jnp.isfinite(v)) + jnp.sum(~jnp.isfinite(d)),
        }

    return jax.jit(diag)


def diagnostics(state: FluidState, config: FluidConfig) -> dict:
    """Device-side diagnostics -> host dict of python floats."""
    out = _make_diagnostics(config)(state)
    return {k: float(v) for k, v in out.items()}


def contract_warning(rec: dict) -> Optional[str]:
    """Warning text when a diagnostics record shows the kick-inclusive
    backtrace speed exceeding the gather-halo contract, else None.
    Out-of-contract backtraces clamp at the kernel's window edge (bounded-
    sampler semantics, pinned by tests/test_pallas.py's windowed-oracle
    test); surface the exceedance rather than hide it. backtrace_speed is
    the quantity the gather actually consumes (the pre-advection chain
    re-run, including the un-clamped gradient kick), not the stored-field
    proxy max_component_speed."""
    if rec["backtrace_speed"] > rec["halo_contract_speed"]:
        return (f"backtrace speed {rec['backtrace_speed']:.0f} texels/s "
                f"exceeds the gather-halo contract "
                f"({rec['halo_contract_speed']:.0f}); backtraces beyond it "
                "clamp at the gather window edge (docs/ARCHITECTURE.md "
                "displacement contract)")
    return None


class MetricsLogger:
    """JSONL metrics stream. Each record: step index, wall time, diagnostics."""

    def __init__(self, path: Optional[str] = None, stream: Optional[IO] = None):
        self._own = False
        if stream is not None:
            self.stream = stream
        elif path is not None:
            self.stream = open(path, "a")
            self._own = True
        else:
            self.stream = None
        self.t0 = time.time()

    def log(self, step: int, state: FluidState, config: FluidConfig, **extra) -> dict:
        rec = {"step": step, "wall_s": round(time.time() - self.t0, 3)}
        rec.update(diagnostics(state, config))
        rec.update(extra)
        if self.stream is not None:
            self.stream.write(json.dumps(rec) + "\n")
            self.stream.flush()
        return rec

    def close(self):
        if self._own and self.stream is not None:
            self.stream.close()
            self.stream = None
