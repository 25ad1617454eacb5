"""Auxiliary subsystems: checkpoint/resume, metrics, resize-preserves-fields,
trace record/replay, app CLI smoke (SURVEY.md §5)."""

import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

from tpufluid import FluidConfig, init_state, make_step
from tpufluid.checkpoint import load_state, save_state
from tpufluid.metrics import MetricsLogger, diagnostics
from tpufluid.ops.splat import splat_field
from tpufluid.state import resize_state
from tpufluid.trace import PointerTracer, Trace, swirl_trace

CFG = FluidConfig(SIM_RESOLUTION=32, DYE_RESOLUTION=64, CANVAS_WIDTH=128,
                  CANVAS_HEIGHT=64, MAX_SPLATS=4, USE_PALLAS=False).validate()


def _some_state(cfg=CFG):
    s = init_state(cfg)
    s.dye = splat_field(s.dye, 0.4, 0.6, jnp.asarray([0.5, 0.2, 0.9]), 0.01, cfg.aspect_ratio)
    s.velocity = splat_field(s.velocity, 0.4, 0.6, jnp.asarray([40.0, -20.0]), 0.01, cfg.aspect_ratio)
    return s


def test_checkpoint_roundtrip(tmp_path):
    s = _some_state()
    p = str(tmp_path / "ck.npz")
    save_state(p, s, CFG, step=123, extra={"note": "hi"})
    s2, cfg2, step, extra = load_state(p)
    assert cfg2 == CFG and step == 123 and extra == {"note": "hi"}
    np.testing.assert_array_equal(np.asarray(s.dye), np.asarray(s2.dye))
    np.testing.assert_array_equal(np.asarray(s.velocity), np.asarray(s2.velocity))


def test_checkpoint_roundtrip_16bit_dtypes(tmp_path):
    """bfloat16 (ml_dtypes — np.load hands back void '|V2' without the
    uint16 bit-view) and float16 (numpy-native) both round-trip
    bit-exactly with their dtypes restored from the config."""
    import dataclasses as dc

    for dt_name in ("bfloat16", "float16"):
        cfg = dc.replace(CFG, DTYPE=dt_name).validate()
        s = init_state(cfg)
        s.dye = (s.dye + jnp.linspace(0, 1, s.dye.size).reshape(s.dye.shape)
                 ).astype(cfg.dtype)
        s.velocity = (s.velocity + 3.25).astype(cfg.dtype)
        p = str(tmp_path / f"ck_{dt_name}.npz")
        save_state(p, s, cfg, step=7)
        s2, cfg2, step, _ = load_state(p)
        assert cfg2 == cfg and step == 7
        for name in ("velocity", "dye", "pressure"):
            a, b = getattr(s, name), getattr(s2, name)
            assert b.dtype == cfg.dtype, (dt_name, name, b.dtype)
            np.testing.assert_array_equal(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                err_msg=f"{dt_name} {name}")


def test_resume_continues_identically(tmp_path):
    """Stop at step 10, resume, and land bit-identical with the straight run."""
    cfg = CFG
    trace = swirl_trace(cfg, 20, seed=5)
    step = make_step(cfg)
    dt = jnp.float32(trace.dt)

    s = init_state(cfg)
    for t in range(10):
        s = step(s, dt, jnp.asarray(trace.batches[t]))
    p = str(tmp_path / "mid.npz")
    save_state(p, s, cfg, step=10)
    for t in range(10, 20):
        s = step(s, dt, jnp.asarray(trace.batches[t]))

    s2, cfg2, at, _ = load_state(p)
    for t in range(at, 20):
        s2 = step(s2, dt, jnp.asarray(trace.batches[t]))
    np.testing.assert_array_equal(np.asarray(s.dye), np.asarray(s2.dye))
    np.testing.assert_array_equal(np.asarray(s.velocity), np.asarray(s2.velocity))


def test_resize_preserves_fields():
    """Resolution change resamples the running fields (script.js:1108-1126)."""
    s = _some_state()
    cfg2 = FluidConfig(**{**CFG.__dict__, "SIM_RESOLUTION": 64, "DYE_RESOLUTION": 32})
    s2 = resize_state(s, cfg2)
    assert s2.velocity.shape[-2:] == (cfg2.sim_size[1], cfg2.sim_size[0])
    assert s2.dye.shape[-2:] == (cfg2.dye_size[1], cfg2.dye_size[0])
    # Total dye mass approximately preserved by bilinear resampling.
    m1 = float(jnp.sum(s.dye)) / s.dye[0].size
    m2 = float(jnp.sum(s2.dye)) / s2.dye[0].size
    assert abs(m1 - m2) < 0.1 * abs(m1) + 1e-6


def test_resize_zeroes_pressure():
    """initFramebuffers RE-CREATES pressure/divergence/curl on a resolution
    change (createDoubleFBO not resizeDoubleFBO, script.js:1004-1006): only
    dye and velocity survive; pressure restarts at zero."""
    s = _some_state()
    s.pressure = s.pressure + 0.7
    cfg2 = FluidConfig(**{**CFG.__dict__, "SIM_RESOLUTION": 64, "DYE_RESOLUTION": 32})
    s2 = resize_state(s, cfg2)
    assert float(jnp.abs(s2.pressure).max()) == 0.0
    assert float(jnp.abs(s2.velocity).max()) > 0.0  # velocity resampled, not zeroed


def test_metrics_logger(tmp_path):
    s = _some_state()
    path = str(tmp_path / "m.jsonl")
    lg = MetricsLogger(path)
    rec = lg.log(7, s, CFG, phase="test")
    lg.close()
    assert rec["step"] == 7 and rec["nonfinite"] == 0 and rec["max_speed"] > 0
    lines = [json.loads(l) for l in open(path)]
    assert lines[0]["phase"] == "test"


def test_diagnostics_detects_nonfinite():
    s = _some_state()
    s.velocity = s.velocity.at[0, 0, 0].set(jnp.nan)
    assert diagnostics(s, CFG)["nonfinite"] >= 1


def test_halo_contract_speed_per_dtype():
    """Per-axis velocity the advection gather halo covers at dt=1/60:
    f32 halo 24 -> 1320 texels/s; bf16 halo 32 -> 1800; float16 stages
    through f32 compute so it carries the f32 halo."""
    from tpufluid.metrics import halo_contract_speed

    mk = lambda d: FluidConfig(**{**CFG.__dict__, "DTYPE": d})
    assert halo_contract_speed(mk("float32")) == (24 - 2) * 60.0
    assert halo_contract_speed(mk("bfloat16")) == (32 - 2) * 60.0
    assert halo_contract_speed(mk("float16")) == (24 - 2) * 60.0
    rec = diagnostics(_some_state(), CFG)
    assert rec["halo_contract_speed"] == halo_contract_speed(CFG)
    assert rec["max_component_speed"] <= rec["max_speed"] + 1e-6


def test_backtrace_speed_is_kick_inclusive():
    """`backtrace_speed` measures the velocity the NEXT step's gather actually
    consumes: clamp±1000(v + confinement·dt) − un-halved ∇p (the reference
    never re-clamps the kick, script.js:892-913). It must equal re-running
    the jnp pre-advection chain, and on a divergent state it must EXCEED the
    stored-field proxy max_component_speed (the kick is real)."""
    from tpufluid.ops import stencil

    s = _some_state()
    # The kick dominates when a large low-frequency warm-start pressure meets
    # a small velocity: 20 averaging sweeps barely decay the lowest mode, and
    # the un-halved (R-L) gradient of 500*sin(2*pi*x/w) far exceeds the ~40
    # texels/s splat velocity in _some_state.
    h, w = s.pressure.shape[-2:]
    xx = jnp.arange(w, dtype=jnp.float32)[None, :]
    s.pressure = jnp.broadcast_to(500.0 * jnp.sin(2 * jnp.pi * xx / w),
                                  (h, w)).astype(s.pressure.dtype)
    rec = diagnostics(s, CFG)

    v = s.velocity.astype(jnp.float32)
    vb = stencil.vorticity_confinement(v, stencil.curl(v), CFG.CURL,
                                       jnp.float32(1.0 / 60.0))
    pb = stencil.jacobi_pressure(s.pressure.astype(jnp.float32) * CFG.PRESSURE,
                                 stencil.divergence(vb),
                                 CFG.PRESSURE_ITERATIONS)
    vb = stencil.gradient_subtract(vb, pb)
    expect = float(jnp.max(jnp.abs(vb)))
    assert abs(rec["backtrace_speed"] - expect) <= 1e-3 * max(expect, 1.0)
    assert rec["backtrace_speed"] > rec["max_component_speed"]


def test_trace_roundtrip(tmp_path):
    tr = swirl_trace(CFG, 30, seed=2)
    p = str(tmp_path / "t.npz")
    tr.save(p)
    tr2 = Trace.load(p)
    assert tr2.num_steps == 30 and tr2.dt == tr.dt
    np.testing.assert_array_equal(tr.batches, tr2.batches)


def test_pointer_aspect_corrections():
    """correctDeltaX/Y (script.js:1553-1563): wide canvas divides dy by aspect."""
    cfg = FluidConfig(CANVAS_WIDTH=200, CANVAS_HEIGHT=100, USE_PALLAS=False)
    tr = PointerTracer(cfg, seed=0)
    tr.feed("down", pid=0, x=100, y=50)
    tr.feed("move", pid=0, x=120, y=40)
    events = tr.drain_step(1 / 60)
    assert len(events) == 1
    x, y, dx, dy, color = events[0]
    assert x == pytest.approx(0.6) and y == pytest.approx(0.6)
    assert dx == pytest.approx(0.1 * cfg.SPLAT_FORCE)          # no x correction (aspect>1)
    assert dy == pytest.approx(0.1 / 2.0 * cfg.SPLAT_FORCE)    # dy /= aspect


def test_pointer_tall_canvas_corrects_dx():
    cfg = FluidConfig(CANVAS_WIDTH=100, CANVAS_HEIGHT=200, USE_PALLAS=False)
    tr = PointerTracer(cfg, seed=0)
    tr.feed("down", pid=0, x=50, y=100)
    tr.feed("move", pid=0, x=60, y=100)
    (x, y, dx, dy, _), = tr.drain_step(1 / 60)
    assert dx == pytest.approx(0.1 * 0.5 * cfg.SPLAT_FORCE)    # dx *= aspect (0.5)
    assert dy == pytest.approx(0.0)


def test_burst_matches_reference_random_splat_semantics():
    """multipleSplats: n events, colors 10x-brightened 0.15*HSV, vel in +/-500."""
    from tpufluid.trace import random_splats

    rng = np.random.default_rng(0)
    ev = random_splats(rng, 20)
    assert len(ev) == 20
    for x, y, dx, dy, c in ev:
        assert 0 <= x <= 1 and 0 <= y <= 1
        assert -500 <= dx <= 500 and -500 <= dy <= 500
        assert max(c) <= 1.5 + 1e-9  # 0.15 * 10
        assert max(c) >= 1.5 - 1e-6 - 1.5 * 1e-6 or max(c) > 0  # hue channel saturates


def test_burst_spills_over_max_splats():
    """A spacebar burst larger than MAX_SPLATS (reference fires 5..24 in one
    frame, script.js:1522-1524) spills its overflow into subsequent steps;
    pointer splats keep their slot every step."""
    cfg = FluidConfig(CANVAS_WIDTH=100, CANVAS_HEIGHT=100, MAX_SPLATS=4,
                      USE_PALLAS=False)
    tr = PointerTracer(cfg, seed=0)
    tr.feed("burst", n=10)
    tr.feed("down", pid=0, x=50, y=50)
    counts, burst_total = [], 0
    for t in range(6):
        tr.feed("move", pid=0, x=55 + t, y=50)  # keeps the pointer splatting
        ev = tr.drain_step(1 / 60)
        assert len(ev) <= cfg.MAX_SPLATS
        counts.append(len(ev))
        burst_total += len(ev) - 1  # one slot per step is the pointer splat
    assert burst_total == 10
    assert counts == [4, 4, 4, 2, 1, 1]  # 3+3+3+1 burst rows + pointer each step


def test_trace_v2_per_step_dt(tmp_path):
    """Trace v2 records per-step dt (calcDeltaTime, script.js:1188-1194) and
    clamps at the reference's LITERAL 0.016666 (script.js:1191 — just below
    1/60, so a 60 Hz frame always clamps); v1 scalar-dt files still load."""
    from tpufluid.config import MAX_DT

    batches = np.zeros((4, 2, 8), np.float32)
    dts = [1 / 120, 1 / 90, 0.5, 1 / 60]  # 0.5 s hitch AND 1/60 -> clamped
    tr = Trace(batches, dts)
    assert tr.dts[2] == pytest.approx(MAX_DT)
    assert tr.dts[3] == pytest.approx(MAX_DT)  # 1/60 > 0.016666 clamps too
    p = str(tmp_path / "v2.npz")
    tr.save(p)
    tr2 = Trace.load(p)
    np.testing.assert_allclose(tr2.dts, tr.dts)
    # v1 compatibility: scalar dt key only.
    p1 = str(tmp_path / "v1.npz")
    np.savez_compressed(p1, batches=batches, dt=np.float64(1 / 60))
    tr3 = Trace.load(p1)
    assert tr3.dts.shape == (4,) and tr3.dt == pytest.approx(MAX_DT)


def test_variable_dt_replay_deterministic():
    """Same variable-dt trace => bit-identical state (record/replay seam)."""
    from tpufluid.step import make_multi_step

    tr = swirl_trace(CFG, 8, seed=3)
    dts = np.linspace(1 / 200, 1 / 60, 8).astype(np.float32)
    multi = make_multi_step(CFG)
    a = multi(init_state(CFG), jnp.asarray(dts), jnp.asarray(tr.batches))
    b = multi(init_state(CFG), jnp.asarray(dts), jnp.asarray(tr.batches))
    np.testing.assert_array_equal(np.asarray(a.dye), np.asarray(b.dye))
    # and variable dt actually differs from constant-dt replay
    c = multi(init_state(CFG), jnp.float32(1 / 60), jnp.asarray(tr.batches))
    assert float(jnp.abs(c.dye - a.dye).max()) > 0


def test_tracer_state_roundtrip_deterministic():
    """An interactive session resumed from PointerTracer.state_dict must
    continue EXACTLY like the uninterrupted one: burst RNG cursor, color
    cycling RNG + timer, pointer machines, pending spill — all of it
    (the SURVEY §5.4 'RNG cursor' claim, made real)."""
    t1 = PointerTracer(CFG, seed=5)
    t1.feed("burst", n=9)  # > MAX_SPLATS: leaves spill behind
    t1.feed("down", pid=0, x=40.0, y=20.0)
    pre = [t1.drain_step(1 / 60)]
    # snapshot mid-session, through a JSON roundtrip (= checkpoint storage)
    snap = json.loads(json.dumps(t1.state_dict()))
    t2 = PointerTracer(CFG, seed=999)  # wrong seed: must not matter
    t2.load_state_dict(snap)
    # identical event feeds from here on
    for tr in (t1, t2):
        tr.feed("move", pid=0, x=70.0, y=30.0)
        tr.feed("burst", n=3)  # exercises the burst RNG cursor
    for k in range(4):
        a = t1.drain_step(0.03)  # 0.03*10 accumulates a color re-roll
        b = t2.drain_step(0.03)
        assert a == b, f"step {k}: resumed tracer diverged"
    assert pre  # session really had pre-snapshot activity


def test_checkpoint_carries_tracer_state(tmp_path):
    tracer = PointerTracer(CFG, seed=7)
    tracer.feed("burst", n=6)
    tracer.drain_step(1 / 60)
    s = _some_state()
    p = str(tmp_path / "ck.npz")
    save_state(p, s, CFG, step=9, tracer=tracer)
    _, _, step, extra = load_state(p)
    assert step == 9 and "tracer" in extra
    t2 = PointerTracer(CFG, seed=0)
    t2.load_state_dict(extra["tracer"])
    assert t2.drain_step(1 / 60) == tracer.drain_step(1 / 60)


def test_bench_hbm_model():
    """bench.py's roofline byte model: algorithmic floor, monotone in grid
    size and dtype width; same-grid steps skip the resample traffic."""
    import bench

    mk = lambda sim, dye, d: FluidConfig(
        SIM_RESOLUTION=sim, DYE_RESOLUTION=dye, CANVAS_WIDTH=dye,
        CANVAS_HEIGHT=dye, DTYPE=d, MAX_SPLATS=4).validate()
    same = bench.modeled_hbm_bytes_per_step(mk(256, 256, "float32"))
    cross = bench.modeled_hbm_bytes_per_step(mk(128, 256, "float32"))
    assert same > 0 and cross > 0
    # f32 is exactly twice the bf16 bytes at the same geometry
    assert same == 2 * bench.modeled_hbm_bytes_per_step(mk(256, 256, "bfloat16"))
    big = bench.modeled_hbm_bytes_per_step(mk(512, 512, "float32"))
    assert big > same


def test_contract_warning_fires_past_the_edge():
    """Drive a state PAST the gather-halo displacement contract and assert
    the observable chain works end to end: diagnostics' kick-inclusive
    backtrace_speed exceeds halo_contract_speed, contract_warning returns
    the warning the app prints, and a full step on that state degrades
    gracefully (finite — the kernel-side window clamp is pinned separately
    by tests/test_pallas.py's windowed-oracle test).

    The state: a LINEAR warm-start pressure ramp of slope A. Linear fields
    are discrete-harmonic, so 20 Jacobi sweeps preserve the 0.8x-scaled ramp,
    and the reference's un-halved gradient kick (script.js:892-913) is then
    exactly 0.8 * 2A — no a-priori bound caps it (docs/ARCHITECTURE.md),
    which is why the contract is an observable, not an invariant."""
    from tpufluid.metrics import contract_warning
    from tpufluid.step import fluid_step

    cfg = FluidConfig(SIM_RESOLUTION=64, DYE_RESOLUTION=64, CANVAS_WIDTH=64,
                      CANVAS_HEIGHT=64, MAX_SPLATS=4, USE_PALLAS=False).validate()
    s = init_state(cfg)
    h, w = s.pressure.shape
    ramp = 1000.0 * (np.arange(w, dtype=np.float32) - w / 2)
    s.pressure = jnp.asarray(np.broadcast_to(ramp, (h, w)).copy())
    rec = diagnostics(s, cfg)
    # 0.8 warm start * 2A un-halved kick = 1600 > the f32 contract's 1320
    assert rec["backtrace_speed"] > rec["halo_contract_speed"]
    assert abs(rec["backtrace_speed"] - 1600.0) < 1.0
    warn = contract_warning(rec)
    assert warn is not None and "contract" in warn
    assert contract_warning({**rec, "backtrace_speed": 0.0}) is None
    # graceful degradation: the full step stays finite and bounded
    s2 = fluid_step(s, jnp.float32(1 / 60),
                    jnp.zeros((cfg.MAX_SPLATS, 8), jnp.float32), cfg)
    for f in (s2.velocity, s2.dye, s2.pressure):
        assert np.isfinite(np.asarray(f)).all()


def test_bench_error_line_is_json(monkeypatch, capsys):
    """bench.py must ALWAYS emit one parseable JSON line — a backend outage
    (round 2 lost its whole perf record to a bare traceback) produces a
    structured error record, not a stack trace."""
    import json as _json
    import sys

    import bench

    def boom(*a, **kw):
        raise RuntimeError(
            "Unable to initialize backend 'axon': UNAVAILABLE: "
            "TPU backend setup/compile error (Unavailable).")

    monkeypatch.setattr(bench, "probe_backend", boom)
    monkeypatch.setattr(sys, "argv", ["bench.py", "--config", "3"])
    bench.main()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    rec = _json.loads(line)
    assert rec["error"] == "tpu backend unavailable"
    assert rec["value"] is None and rec["unit"] == "steps/sec"
    assert "UNAVAILABLE" in rec["detail"]


def test_bench_probe_backend_retries(monkeypatch):
    """probe_backend retries the first device touch with backoff and
    re-raises the LAST error after the bounded attempts."""
    import bench

    calls = []
    monkeypatch.setattr(bench.time, "sleep", lambda s: calls.append(s))

    real_zeros = jnp.zeros

    class FlakyZeros:
        def __init__(self, fail_times):
            self.left = fail_times

        def __call__(self, *a, **kw):
            if self.left > 0:
                self.left -= 1
                raise RuntimeError("UNAVAILABLE: transient")
            return real_zeros(*a, **kw)

    # probe_backend imports jax.numpy locally — same module object as here.
    monkeypatch.setattr(jnp, "zeros", FlakyZeros(2))
    assert isinstance(bench.probe_backend(retries=3, backoff_s=0.01), str)
    assert len(calls) == 2

    monkeypatch.setattr(jnp, "zeros", FlakyZeros(99))
    try:
        bench.probe_backend(retries=2, backoff_s=0.01)
        raised = False
    except RuntimeError:
        raised = True
    finally:
        monkeypatch.setattr(jnp, "zeros", real_zeros)
    assert raised


def test_app_cli_smoke(tmp_path):
    from tpufluid.app import main

    out = str(tmp_path / "run")
    main(["--steps", "12", "--sim-res", "24", "--dye-res", "24", "--canvas", "48x48",
          "--render-every", "6", "--metrics-every", "6", "--ckpt-every", "12",
          "--out", out, "--jacobi-iters", "4"])
    files = os.listdir(out)
    assert "metrics.jsonl" in files
    assert any(f.startswith("frame_") for f in files)
    assert any(f.startswith("ckpt_") for f in files)


def test_multitouch_pointers():
    """Multiple simultaneous pointers (reference multitouch, script.js:1485-1507):
    each touch id gets its own pointer and contributes its own splat."""
    cfg = FluidConfig(CANVAS_WIDTH=100, CANVAS_HEIGHT=100, USE_PALLAS=False)
    tr = PointerTracer(cfg, seed=0)
    tr.feed("down", pid=1, x=20, y=20)
    tr.feed("down", pid=2, x=80, y=80)
    tr.feed("move", pid=1, x=30, y=20)
    tr.feed("move", pid=2, x=80, y=70)
    events = tr.drain_step(1 / 60)
    assert len(events) == 2
    xs = sorted(e[0] for e in events)
    assert xs[0] == pytest.approx(0.3) and xs[1] == pytest.approx(0.8)
    # one lifted, the other keeps splatting
    tr.feed("up", pid=1)
    tr.feed("move", pid=1, x=40, y=20)   # ignored: not down
    tr.feed("move", pid=2, x=80, y=60)
    events = tr.drain_step(1 / 60)
    assert len(events) == 1


def test_cli_all_gui_knobs(tmp_path):
    """Every dat.GUI knob has a CLI flag and reaches the config."""
    from tpufluid.app import build_argparser

    args = build_argparser().parse_args([
        "--density-dissipation", "2", "--velocity-dissipation", "0.5",
        "--pressure", "0.6", "--vorticity", "50", "--splat-radius", "0.5",
        "--bloom-intensity", "1.2", "--bloom-threshold", "0.3",
        "--sunrays-weight", "0.7", "--back-color", "10,20,30", "--transparent",
        "--no-colorful",
    ])
    assert args.vorticity == 50 and args.back_color == "10,20,30"
    assert args.transparent and args.no_colorful
