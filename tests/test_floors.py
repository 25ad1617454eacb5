"""Floor-model sanity (tpufluid/ops/pallas/floors.py): the microbenchmark
kernels execute under interpret mode, and the static gather-row/sweep models
match hand-computed counts for known geometries. The measured rates and the
profiled step are device-only (bench.py attaches them on TPU runs)."""

from unittest import mock

import jax.numpy as jnp
import numpy as np
import pytest

import tpufluid.ops.pallas.floors as fl
from tpufluid import FluidConfig


def _interp(module):
    orig = module.pl.pallas_call
    return mock.patch.object(module.pl, "pallas_call",
                             lambda *a, **k: orig(*a, interpret=True, **k))


def test_taa_rate_kernel_runs_interpret():
    with _interp(fl):
        assert fl.measure_taa_row_rate(planes=2, n_idx=2, reps=2,
                                       trips=2) > 0


def test_roll_rate_kernel_runs_interpret():
    with _interp(fl):
        assert fl.measure_roll_rate(2, 96, 384, trips=2) > 0


def test_sweep_rate_kernel_runs_interpret():
    with _interp(fl):
        assert fl.measure_sweep_rate(chunks=1, sweeps=2) > 0


def test_gather_rows_zero_velocity_bf16():
    """Hand count at the headline geometry: zero velocity => every tile's
    backtrace row-offset range is {0}, so trips = ceil(2/unroll) = 1 per
    tile. Tiles are (64, 128) => 128 tiles; bf16 velocity packs 2 channels
    into 1 uint32 plane (2 corner gathers), dye packs ch0+ch1 into one
    plane (2 corner gathers) and column-pairs ch2 (ONE gather serves both
    corners) => 3 gathers/offset; the tight lane plan spans 2 groups; each
    trip serves unroll=4 offsets x 64 rows."""
    cfg = FluidConfig(SIM_RESOLUTION=1024, DYE_RESOLUTION=1024,
                      CANVAS_WIDTH=1024, CANVAS_HEIGHT=1024,
                      DTYPE="bfloat16").validate()
    vel = jnp.zeros((2, 1024, 1024), jnp.bfloat16)
    gathers = fl.gather_rows_per_step(cfg, vel, 1.0 / 60.0)
    assert len(gathers) == 2
    (vel_rows, vel_trips, vel_planes, _, _, _), \
        (dye_rows, dye_trips, dye_planes, _, _, _) = gathers
    n_tiles = (1024 // 64) * (1024 // 128)
    assert vel_planes == 1 and dye_planes == 2
    assert vel_trips == n_tiles and dye_trips == n_tiles
    assert vel_rows == n_tiles * 1 * 4 * 2 * 2 * 64
    assert dye_rows == n_tiles * 1 * 4 * 2 * 3 * 64


def test_gather_rows_scale_with_velocity_range():
    """A fast uniform +y velocity shifts every backtrace by the same offset
    => still a single-trip range; a velocity GRADIENT across each tile
    widens the per-tile range and must increase the modeled rows."""
    cfg = FluidConfig(SIM_RESOLUTION=512, DYE_RESOLUTION=512,
                      CANVAS_WIDTH=512, CANVAS_HEIGHT=512,
                      DTYPE="float32").validate()
    calm = jnp.zeros((2, 512, 512), jnp.float32)
    rows_calm = sum(g[0] for g in
                    fl.gather_rows_per_step(cfg, calm, 1.0 / 60.0))
    grad = jnp.stack([jnp.zeros((512, 512)),
                      jnp.linspace(-900.0, 900.0, 512)[:, None]
                      * jnp.ones((1, 512))]).astype(jnp.float32)
    rows_grad = sum(g[0] for g in
                    fl.gather_rows_per_step(cfg, grad, 1.0 / 60.0))
    assert rows_grad > rows_calm


def test_jacobi_cell_sweeps_headline():
    """bf16 1024^2: halo 32, full-width 256-row blocks (the standalone
    scoped-VMEM cap rejects 512-row windows, jacobi._SCOPED_CEILING) =>
    4 windows of (256 + 64) x 1024, 20 sweeps."""
    cfg = FluidConfig(SIM_RESOLUTION=1024, DYE_RESOLUTION=1024,
                      CANVAS_WIDTH=1024, CANVAS_HEIGHT=1024,
                      PRESSURE_ITERATIONS=20, DTYPE="bfloat16").validate()
    assert fl.jacobi_cell_sweeps(cfg) == 4 * (256 + 64) * 1024 * 20


def test_jacobi_cell_sweeps_multi_chunk():
    cfg = FluidConfig(SIM_RESOLUTION=1024, DYE_RESOLUTION=1024,
                      CANVAS_WIDTH=1024, CANVAS_HEIGHT=1024,
                      PRESSURE_ITERATIONS=45, DTYPE="bfloat16").validate()
    one = FluidConfig(SIM_RESOLUTION=1024, DYE_RESOLUTION=1024,
                      CANVAS_WIDTH=1024, CANVAS_HEIGHT=1024,
                      PRESSURE_ITERATIONS=20, DTYPE="bfloat16").validate()
    assert fl.jacobi_cell_sweeps(cfg) * 20 == fl.jacobi_cell_sweeps(one) * 45


def test_north_star_projection_round6_numbers():
    """The issue-rate north-star derivation pinned at the committed round-6
    measurements (docs/BENCH.md per-kernel table, out/jobs/b59): the
    projection must reproduce the documented predicted headline — ~4.8k on
    a full v5e, >= 10k on a v5p under the conservative x2-TensorCore VPU
    scaling — and the rgb9e5 variant must only help. The round-6
    measurements predate the packed-dye default, so the pinned config runs
    DYE_RGB9E5=False; a second config with the round-9 default checks the
    variant field is SUPPRESSED when the measured step already includes
    the lever (re-applying 2/3 would double-count it)."""
    cfg = FluidConfig(SIM_RESOLUTION=1024, DYE_RESOLUTION=1024,
                      CANVAS_WIDTH=1024, CANVAS_HEIGHT=1024,
                      DTYPE="bfloat16", MAX_SPLATS=8,
                      DYE_RGB9E5=False).validate()
    floors = {
        "velocity_gather": {"measured_us": 340.0, "taa_rows": 100000},
        "dye_gather": {"measured_us": 542.0, "taa_rows": 200000},
        "jacobi": {"measured_us": 105.8},
        "kernel_total_us": 1026.0, "step_us": 1083.0,
    }
    p = fl.north_star_projection(floors, 245.0, 36.0, cfg)
    assert abs(p["slice_compute_fraction_of_v5e"] - 36.0 / 197.0) < 1e-3
    assert 4000 < p["predicted_v5e_steps_per_s"] < 6000
    cons = p["predicted_v5p_steps_per_s_conservative"]
    opt = p["predicted_v5p_steps_per_s_optimistic"]
    assert 9000 < cons < opt < 14000
    assert p["rgb9e5_included"] is False
    assert p["predicted_v5p_steps_per_s_conservative_rgb9e5"] > cons
    assert p["north_star_10k_reachable_projected"] is True
    assert "projection only" in p["north_star_basis"]
    assert p["gather_taa_rows_per_step"] == 300000
    # monotonicity: a slower slice (bigger fraction of the chip already
    # used) predicts a SMALLER speedup headroom
    p2 = fl.north_star_projection(floors, 245.0, 72.0, cfg)
    assert p2["predicted_v5e_steps_per_s"] < p["predicted_v5e_steps_per_s"]
    # Round-9 default (DYE_RGB9E5 x bf16): the measured dye time already
    # runs packed — no separate variant field, no double count.
    cfg_def = FluidConfig(SIM_RESOLUTION=1024, DYE_RESOLUTION=1024,
                          CANVAS_WIDTH=1024, CANVAS_HEIGHT=1024,
                          DTYPE="bfloat16", MAX_SPLATS=8).validate()
    floors_def = dict(floors, dye_gather={"measured_us": 384.4,
                                          "taa_rows": 200000})
    p3 = fl.north_star_projection(floors_def, 245.0, 36.0, cfg_def)
    assert p3["rgb9e5_included"] is True
    assert "predicted_v5p_steps_per_s_conservative_rgb9e5" not in p3
    assert p3["north_star_10k_reachable_projected"] is True
