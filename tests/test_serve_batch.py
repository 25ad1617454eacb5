"""Multi-tenant serving server (tpufluid/serve_batch.py): one batched
dispatch advances all sessions; sessions are structurally isolated (vmap
cannot mix batch rows). identical_seeds starts every session bit-identical,
so the isolation spec is sharp: an event to session 1 must change session 1
and ONLY session 1 — untouched sessions stay byte-identical to each other.
"""

import json
import threading
import time
import urllib.request

import pytest

from tpufluid import FluidConfig
from tpufluid.serve_batch import BatchFluidServer, make_handler

CFG = FluidConfig(SIM_RESOLUTION=32, DYE_RESOLUTION=64, CANVAS_WIDTH=96,
                  CANVAS_HEIGHT=64, BLOOM=False, SUNRAYS=False, SHADING=False,
                  MAX_SPLATS=4, USE_PALLAS=False).validate()
B = 3

_SRV = {}


@pytest.fixture(scope="module")
def server_url():
    from http.server import ThreadingHTTPServer

    server = BatchFluidServer(CFG, sessions=B, seed=0, quality=70,
                              identical_seeds=True)
    _SRV["s"] = server
    threading.Thread(target=server.run, daemon=True).start()
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(server))
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{httpd.server_port}"
    for _ in range(600):
        try:
            urllib.request.urlopen(url + "/frame?sid=0", timeout=1).read()
            break
        except Exception:
            time.sleep(0.1)
    yield url
    server.stop()
    httpd.shutdown()


def _frame(url, sid):
    r = urllib.request.urlopen(f"{url}/frame?sid={sid}", timeout=5)
    return r.read(), int(r.headers["X-Step"])


def _same_step_frames(url, sids, tries=200):
    """Frames for every sid taken at ONE sim step (retry across ticks)."""
    for _ in range(tries):
        got = [_frame(url, s) for s in sids]
        if len({step for _, step in got}) == 1:
            return [data for data, _ in got]
        time.sleep(0.005)
    raise AssertionError("could not catch all sessions at one step")


def _post(url, sid, events):
    req = urllib.request.Request(f"{url}/events?sid={sid}",
                                 data=json.dumps(events).encode(),
                                 method="POST")
    return urllib.request.urlopen(req, timeout=5).status


def test_dashboard_stats_and_frames(server_url):
    page = urllib.request.urlopen(server_url + "/", timeout=5).read()
    assert b"sessions" in page
    stats = json.loads(urllib.request.urlopen(server_url + "/stats",
                                              timeout=5).read())
    assert stats["sessions"] == B and stats["steps"] > 0
    for sid in range(B):
        data, step = _frame(server_url, sid)
        assert data[:2] == b"\xff\xd8", f"sid {sid}: not a JPEG"
        assert step > 0
    # out-of-range session -> 404
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(server_url + f"/frame?sid={B}", timeout=5)
    assert e.value.code == 404


def test_identical_seed_sessions_stay_identical(server_url):
    frames = _same_step_frames(server_url, range(B))
    assert frames[0] == frames[1] == frames[2], \
        "identical-seed untouched sessions diverged"


def test_event_isolation(server_url):
    # A drag on session 1 only: session 1 diverges, 0 and 2 stay identical.
    drag = ([{"k": "down", "x": 0.3, "y": 0.3}]
            + [{"k": "move", "x": 0.3 + 0.04 * i, "y": 0.3 + 0.03 * i}
               for i in range(1, 8)]
            + [{"k": "up"}])
    assert _post(server_url, 1, drag) == 204
    deadline = time.time() + 90
    while time.time() < deadline:
        f0, f1, f2 = _same_step_frames(server_url, range(B))
        if f1 != f0:
            break
        time.sleep(0.05)
    assert f1 != f0, "session 1 did not react to its events"
    assert f0 == f2, "untouched sessions 0 and 2 diverged (isolation broken)"


def test_per_session_speed(server_url):
    """A session's clock-rate knob: setting speed on session 2 switches the
    loop to the (B,) per-sim dt vector (batch.py's compiled shape) and
    diverges session 2 from untouched session 0; /stats reports it.
    (Runs after test_event_isolation, which already diverged session 1.)"""
    assert _post(server_url, 2, [{"k": "speed", "v": 0.5}]) == 204
    deadline = time.time() + 90
    while time.time() < deadline:
        stats = json.loads(urllib.request.urlopen(server_url + "/stats",
                                                  timeout=5).read())
        if stats["speeds"][2] == 0.5:
            break
        time.sleep(0.05)
    assert stats["speeds"] == [1.0, 1.0, 0.5]
    # The loop DEGRADES per-sim clocks to lock-step until the reconciler
    # finishes compiling the "vector" program for the current padded size
    # (serve_batch._run) — in a long pytest process that compile can take
    # tens of seconds, so wait for the program table instead of racing it.
    deadline = time.time() + 120
    while time.time() < deadline:
        stats = json.loads(urllib.request.urlopen(server_url + "/stats",
                                                  timeout=5).read())
        assert not stats["program_errors"], stats["program_errors"]
        if f"({stats['padded_batch']}, 'vector')" in stats["programs"]:
            break
        time.sleep(0.2)
    else:
        raise AssertionError(
            f"vector program never compiled: {stats['programs']}")
    # Feed sessions 0 and 2 IDENTICAL event streams: with identical seeds
    # and identical inputs, only the clock rate differs — divergence is
    # then attributable to the per-sim dt alone (and stays visible even if
    # the startup dye has already decayed to background by this point).
    drag = ([{"k": "down", "x": 0.5, "y": 0.5}]
            + [{"k": "move", "x": 0.5 + 0.05 * i, "y": 0.5} for i in
               range(1, 5)]
            + [{"k": "up"}, {"k": "burst", "n": 6}])
    for sid in (0, 2):
        assert _post(server_url, sid, drag) == 204
    deadline = time.time() + 90
    while time.time() < deadline:
        f0, _, f2 = _same_step_frames(server_url, range(B))
        if f2 != f0:
            break
        time.sleep(0.05)
    assert f2 != f0, "session 2 at half speed did not diverge from session 0"
    # Out-of-range speeds clamp to SPEED_MAX (bounds the per-frame compute
    # multiplier and jit-cache growth an unauthenticated knob can demand),
    # then restore 1.0 so later tests see the lock-step fleet.
    from tpufluid.serve_batch import SPEED_MAX

    assert _post(server_url, 2, [{"k": "speed", "v": 99.0}]) == 204
    deadline = time.time() + 45
    while time.time() < deadline:
        stats = json.loads(urllib.request.urlopen(server_url + "/stats",
                                                  timeout=5).read())
        if stats["speeds"][2] == SPEED_MAX:
            break
        time.sleep(0.05)
    assert stats["speeds"][2] == SPEED_MAX
    assert _post(server_url, 2, [{"k": "speed", "v": 1.0}]) == 204
    deadline = time.time() + 45
    while time.time() < deadline:
        stats = json.loads(urllib.request.urlopen(server_url + "/stats",
                                                  timeout=5).read())
        if stats["speeds"][2] == 1.0:
            break
        time.sleep(0.05)
    assert stats["speeds"][2] == 1.0


def test_fast_forward_substepping(server_url):
    """speed > 1 is fast-forward: the loop serves single clamped steps
    until the background warm of the K-substep program lands, then runs
    ceil(max speed) masked substeps per frame (/stats "substeps" flips to
    2), and returns to the single-step program when the speed drops back —
    all without a sim-loop error (the compile never blocks the loop)."""
    def stats():
        return json.loads(urllib.request.urlopen(server_url + "/stats",
                                                 timeout=5).read())

    assert _post(server_url, 1, [{"k": "speed", "v": 2.0}]) == 204
    deadline = time.time() + 120
    subs = 1
    while time.time() < deadline:
        st = stats()
        assert st["error"] is None, st["error"]
        subs = st["substeps"]
        if subs >= 2:
            break
        time.sleep(0.1)
    assert subs == 2, "fast-forward program never engaged"
    # Frames keep flowing while substepping.
    data, step = _frame(server_url, 1)
    assert data[:2] == b"\xff\xd8" and step > 0
    assert _post(server_url, 1, [{"k": "speed", "v": 1.0}]) == 204
    deadline = time.time() + 90
    while time.time() < deadline:
        st = stats()
        if st["substeps"] == 1 and st["speeds"][1] == 1.0:
            break
        time.sleep(0.05)
    assert st["substeps"] == 1 and st["error"] is None


def test_substepped_tick_exactness():
    """The K-substep tick's numerical contract, per sim: (a) a session
    whose row holds n equal dts matches n iterated single ticks at that dt
    (tight tolerance: the scanned substeps compile with a different fp
    association than the direct single-tick dispatch — same scan-vs-direct
    boundary the multi-step benches live with — while a session with NO
    scanned substep matches BIT-exactly); (b) zero-padded substeps are
    BIT-exact no-ops — crucial because a dt=0 fluid_step is NOT an
    identity (the projection still runs) — pinned WITHIN one program by
    permuting the zero row's position between two sessions of the same
    call; (c) splats land on substep 0 even for a fully-frozen (all-zero
    dt) session. The masked select sits outside the kernels, so the jnp
    oracle pins the mechanism; the vmapped kernel path is pinned per-sim
    by tests/test_batch.py."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpufluid.batch import init_batch
    from tpufluid.ops.splat import SPLAT_COLS
    from tpufluid.render import make_step_and_render
    from tpufluid.serve_batch import make_substepped_tick

    B, K = 3, 3
    dt = 1.0 / 60.0
    splats = np.zeros((B, CFG.MAX_SPLATS, SPLAT_COLS), np.float32)
    for b in range(B):  # one distinct splat per session
        splats[b, 0] = [0.25 + 0.2 * b, 0.5, 80.0 * (b - 1), 40.0,
                        0.4, 0.2 + 0.2 * b, 0.6, 1.0]
    # n substeps per session: [1, 2, 3]; session 0 also gets a SMALLER dt
    # than the others to exercise a genuinely per-sim dt row.
    n_sub = np.array([1, 2, 3])
    subs = np.array([0.5 * dt, dt, dt], np.float32)
    dts_kb = np.where(np.arange(K)[:, None] < n_sub[None, :],
                      subs[None, :], 0.0).astype(np.float32)

    state0 = init_batch(CFG, B)
    # Distinct starting fields: one warmup tick with the per-sim splats.
    subtick = make_substepped_tick(CFG)
    state0, _ = subtick(state0, jnp.full((1, B), dt, jnp.float32),
                        jnp.asarray(splats))
    keep = jax.tree.map(jnp.copy, state0)  # subtick donates its input

    got_state, got_frames = subtick(state0, jnp.asarray(dts_kb),
                                    jnp.asarray(splats))

    single = make_step_and_render(CFG)
    for b in range(B):
        s = jax.tree.map(lambda x: jnp.copy(x[b]), keep)
        for i in range(int(n_sub[b])):
            sp = splats[b] if i == 0 else np.zeros_like(splats[b])
            s, frame = single(s, jnp.float32(subs[b]), jnp.asarray(sp))
        exact = n_sub[b] == 1  # no scanned substep -> same fp order
        for name in ("velocity", "dye", "pressure"):
            a = np.asarray(getattr(got_state, name)[b])
            d = np.asarray(getattr(s, name))
            if exact:
                np.testing.assert_array_equal(a, d,
                                              err_msg=f"sid {b}: {name}")
            else:
                np.testing.assert_allclose(a, d, rtol=1e-4, atol=1e-4,
                                           err_msg=f"sid {b}: {name}")
        fa = np.asarray(got_frames[b]).astype(np.int32)
        fd = np.asarray(frame).astype(np.int32)
        if exact:
            np.testing.assert_array_equal(fa, fd, err_msg=f"sid {b}")
        else:  # uint8 quantize: fp-order noise is at most one count
            assert np.abs(fa - fd).max() <= 1, f"sid {b}: frame"

    # (b) BIT-exact masking, same program: two sessions with IDENTICAL
    # state/splats whose rows hold the same two active dts with the zero
    # row in a different position ([d, d', 0] vs [d, 0, d']). The scan
    # body is one compiled program for every iteration, so the results can
    # only be bit-identical if a masked (dt=0) iteration preserves the
    # carried state bit-for-bit.
    pair0 = jax.tree.map(lambda x: jnp.stack([x[2], x[2]]), keep)
    psplat = np.stack([splats[2], splats[2]])
    perm = np.array([[dt, dt],
                     [0.5 * dt, 0.0],
                     [0.0, 0.5 * dt]], np.float32)
    got_pair, pair_frames = subtick(pair0, jnp.asarray(perm),
                                    jnp.asarray(psplat))
    for name in ("velocity", "dye", "pressure"):
        arr = np.asarray(getattr(got_pair, name))
        np.testing.assert_array_equal(arr[0], arr[1], err_msg=name)
    np.testing.assert_array_equal(np.asarray(pair_frames[0]),
                                  np.asarray(pair_frames[1]))

    # (c) frozen session: all-zero dt rows still land splats (substep 0 is
    # unmasked) but advance no time — the result equals ONE single tick at
    # dt=0 (bit-exact: substep 0 is outside the scan).
    frozen_dts = np.zeros((K, B), np.float32)
    got2, _ = subtick(jax.tree.map(jnp.copy, keep),
                      jnp.asarray(frozen_dts), jnp.asarray(splats))
    for b in range(B):
        s = jax.tree.map(lambda x: jnp.copy(x[b]), keep)
        s, _ = single(s, jnp.float32(0.0), jnp.asarray(splats[b]))
        np.testing.assert_array_equal(np.asarray(got2.dye[b]),
                                      np.asarray(s.dye), err_msg=f"sid {b}")
    assert not np.array_equal(np.asarray(got2.dye), np.asarray(keep.dye)), \
        "frozen-session splats did not land"


def test_bad_sid_events_rejected(server_url):
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server_url, B + 5, [{"k": "burst", "n": 3}])
    assert e.value.code == 400


def test_nonfinite_speed_rejected(server_url):
    """json.loads accepts the NaN/Infinity literals; a NaN speed surviving
    the clamp would turn the loop's n_sub into INT64_MIN and kill the sim
    loop permanently (remote DoS via the unauthenticated knob). The knob
    must 400 non-finite values and the loop must keep ticking."""
    for lit in ("NaN", "Infinity", "-Infinity"):
        req = urllib.request.Request(
            f"{server_url}/events?sid=0",
            data=f'[{{"k": "speed", "v": {lit}}}]'.encode(), method="POST")
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=5)
        assert e.value.code == 400, lit
    # The loop survived: steps keep advancing and no error is recorded.
    s0 = json.loads(urllib.request.urlopen(server_url + "/stats",
                                           timeout=5).read())
    deadline = time.time() + 90
    while time.time() < deadline:
        s1 = json.loads(urllib.request.urlopen(server_url + "/stats",
                                               timeout=5).read())
        if s1["steps"] > s0["steps"]:
            break
        time.sleep(0.05)
    assert s1["steps"] > s0["steps"], "sim loop died after NaN speed POST"
    assert s1["error"] is None
    import numpy as np

    assert np.isfinite(s1["speeds"]).all()


def test_elastic_fleet_resize(server_url):
    """POST /sessions resizes the fleet live: growth brings fresh tenants
    up at the new high sids (zeroed fields + startup burst), shrink drops
    the high sids, and untouched identical-seed sessions stay
    byte-identical THROUGH the recompile (concatenate/slice on the batch
    axis cannot mix rows). Restores size B before the checkpoint test."""
    def post_n(n):
        # 60 s: this endpoint synchronously pre-warms two programs at the
        # new batch shape (fresh XLA compiles on first sight of a size).
        req = urllib.request.Request(
            f"{server_url}/sessions", data=json.dumps({"n": n}).encode(),
            method="POST")
        return urllib.request.urlopen(req, timeout=60).status

    assert post_n(B + 2) == 204
    # New sids B, B+1 serve frames once the resized tick lands.
    deadline = time.time() + 60
    got = None
    while time.time() < deadline:
        try:
            got = _frame(server_url, B + 1)
            break
        except urllib.error.HTTPError:
            time.sleep(0.1)
    assert got is not None and got[0][:2] == b"\xff\xd8"
    stats = json.loads(urllib.request.urlopen(server_url + "/stats",
                                              timeout=5).read())
    assert stats["sessions"] == B + 2 and len(stats["speeds"]) == B + 2
    # The two NEW tenants share the fixture's identical seed and joined at
    # the same tick, so they must be bit-identical to each other — fresh
    # rows cannot have mixed with the old ones through the recompile.
    # (Old sessions 1 and 2 were deliberately diverged by earlier tests.)
    fa, fb = _same_step_frames(server_url, [B, B + 1])
    assert fa == fb, "fresh identical-seed tenants diverged after resize"
    # Shrink back: the high sid disappears (404), survivors keep serving.
    assert post_n(B) == 204
    deadline = time.time() + 60
    while time.time() < deadline:
        try:
            _frame(server_url, 0)
            break
        except urllib.error.HTTPError:
            time.sleep(0.1)
    with pytest.raises(urllib.error.HTTPError) as e:
        _frame(server_url, B)
    assert e.value.code == 404
    # Bounds: >= 1, <= MAX_SESSIONS (caps unauthenticated allocation),
    # integers only (2.7 must not silently truncate).
    for bad in (0, BatchFluidServer.MAX_SESSIONS + 1, 2.7):
        with pytest.raises(urllib.error.HTTPError) as e2:
            post_n(bad)
        assert e2.value.code == 400, bad


def test_fleet_checkpoint_resume(server_url, tmp_path):
    """Download /checkpoint.npz mid-run, build a NEW fleet from it: batched
    state, session count, per-session speeds, and every tracer's session
    state carry over (the whole-fleet deterministic-resume seam)."""
    import numpy as np

    # leave pending tracer state on session 0 and a non-default speed on
    # session 2, then checkpoint
    assert _post(server_url, 0, [{"k": "down", "x": 0.4, "y": 0.5},
                                 {"k": "burst", "n": 7}]) == 204
    assert _post(server_url, 2, [{"k": "speed", "v": 0.25}]) == 204
    deadline = time.time() + 45
    while time.time() < deadline:
        stats = json.loads(urllib.request.urlopen(server_url + "/stats",
                                                  timeout=5).read())
        if stats["speeds"][2] == 0.25:
            break
        time.sleep(0.05)
    data = urllib.request.urlopen(server_url + "/checkpoint.npz",
                                  timeout=30).read()
    p = tmp_path / "fleet.npz"
    p.write_bytes(data)

    src = _SRV["s"]
    resumed = BatchFluidServer(CFG, resume=str(p))
    assert resumed.sessions == B
    assert resumed.steps_done > 0
    assert resumed.config == src.config
    assert resumed.speeds.tolist()[2] == 0.25  # set just before checkpoint
    assert 0 in resumed.tracers[0].pointers  # pointer machine carried over
    # The checkpoint itself holds exactly B rows (pad rows never leave the
    # server); the resumed server re-pads to its power-of-two batch.
    with np.load(p, allow_pickle=False) as d:
        assert d["velocity"].shape[0] == B
    assert resumed.state.velocity.shape[0] == resumed._pb >= B
    # Loaded batched fields: expected dtype, finite. (Do NOT touch
    # src.state here: the live sim thread donates those buffers every
    # tick, so reading them races 'Array has been deleted'.)
    del src
    for name in ("velocity", "dye", "pressure"):
        arr = np.asarray(getattr(resumed.state, name))
        assert arr.dtype == CFG.dtype
        assert np.isfinite(arr.astype(np.float32)).all()

    # Tampered checkpoint speeds must not bypass the SPEED_MAX clamp
    # (it bounds per-frame compute and jit-cache growth: speed >> 4 would
    # background-compile an arbitrarily large K-substep program). Rewrite
    # the meta with out-of-range + NaN speeds and resume again.
    with np.load(p, allow_pickle=False) as d:
        arrays = {k: d[k] for k in d.files}
    meta = json.loads(str(arrays.pop("meta")))
    meta["extra"]["speeds"] = [float("nan"), 1e9, -5.0][:B]
    p2 = tmp_path / "tampered.npz"
    np.savez_compressed(p2, meta=json.dumps(meta), **arrays)
    from tpufluid.serve_batch import SPEED_MAX

    tampered = BatchFluidServer(CFG, resume=str(p2))
    sp = np.asarray(tampered.speeds)
    assert np.isfinite(sp).all()
    assert (sp >= 0.0).all() and (sp <= SPEED_MAX).all(), sp


def test_shrink_bumps_generation():
    """Round-4 advisor (high): a tick in flight when a shrink lands must not
    publish — its pre-shrink live count would raise the _frames_live
    watermark back over evicted rows (cross-tenant pixel leak on a
    shrink-then-regrow at the same padded size). resize_fleet must bump
    _gen whenever it lowers _live_rows, exactly like _apply_swap does."""
    srv = BatchFluidServer(CFG, sessions=3, seed=0)
    try:
        gen0 = srv._gen
        srv.resize_fleet(1)  # shrink: evicts rows 1..2
        assert srv._gen == gen0 + 1
        assert srv._live_rows == 1 and not srv._tail_clean
        # Grow-within-padded-batch (no eviction) must NOT fence ticks.
        srv2 = BatchFluidServer(CFG, sessions=2, seed=0)
        try:
            g = srv2._gen
            srv2.resize_fleet(3)  # grow inside pb=4, tail clean
            assert srv2._gen == g
        finally:
            srv2.stop()
    finally:
        srv.stop()


def test_reconciler_skips_terminally_failed_programs():
    """Round-4 advisor (medium): a key in _prog_errors is terminal — the
    reconciler must never return an apply task ('zero_tail'/'swap') whose
    executable can never exist (it would spin hot, grabbing both locks and
    starving the sim loop), and /stats surfaces the wedged objective."""
    srv = BatchFluidServer(CFG, sessions=2, seed=0, prewarm="off")
    try:
        with srv.lock:
            pb = srv._pb
            # Pretend every immediately-needed program is warm.
            srv._progs[(pb, "scalar")] = object()
            srv._progs[(pb, "vector")] = object()
            # Wedge privacy zeroing: zerotail compile failed terminally.
            srv._tail_clean = False
            srv._prog_errors[("zerotail", pb)] = "boom\nzerotail failed"
            task = srv._next_task()
            assert task != ("zero_tail",), task
            # With a dirty tail, activation stays blocked too.
            assert task is None or task[0] == "compile", task
            stuck = srv.stuck_tasks()
            assert any(s["task"] == "zero_tail" for s in stuck), stuck
            # Now wedge a padded-size swap instead.
            srv._tail_clean = True
            srv._prog_errors.clear()
            srv.sessions = pb + 1  # target padded size != pb
            target = pb * 2
            srv._progs[(target, "scalar")] = object()
            srv._progs[(target, "vector")] = object()
            srv._prog_errors[("resize", pb, target)] = "boom\nresize failed"
            task = srv._next_task()
            assert task is None or task[0] != "swap", task
            stuck = srv.stuck_tasks()
            assert any(s["task"] == "swap" for s in stuck), stuck
            # Healthy deps => the swap IS returned (fix must not over-skip).
            srv._prog_errors.clear()
            srv._progs[("resize", pb, target)] = object()
            assert srv._next_task() == ("swap", pb, target)
    finally:
        srv.stop()


def test_checkpoint_rolling_snapshot_respects_resize():
    """Regression (flaked in full-suite runs as resumed.sessions == 5 != 3):
    a checkpoint taken after an ACKed shrink, while a tick is in flight so
    the ROLLING snapshot path serves the fields, must carry the post-ACK
    bookkeeping (sessions, speeds) — and must never serialize the evicted
    tenants' stale field copies out of the snapshot (the /checkpoint.npz
    analog of the frame-path _gen fence)."""
    import io as _io
    from unittest import mock

    import numpy as np

    from tpufluid.checkpoint import load_state

    srv = BatchFluidServer(CFG, sessions=5, seed=0)
    try:
        # Plant a stale 5-session rolling snapshot whose soon-to-be-evicted
        # rows hold sentinel data.
        st = srv._host_state()
        for name in ("velocity", "dye", "pressure"):
            a = np.asarray(getattr(st, name)).copy()
            a[3:] = 7.0
            setattr(st, name, a)
        with srv.out_lock:
            srv._snap = (12, st)
            srv._snap_time = time.time()
            srv._snap_floor = 5
        srv.resize_fleet(3)          # ACKed shrink: sids 3,4 evicted
        srv.speeds[2] = 0.25         # post-snapshot bookkeeping change

        class _NotReady:
            def is_ready(self):
                return False

        # Force the rolling path: pretend a tick is in flight.
        with mock.patch("jax.tree.leaves", return_value=[_NotReady()]):
            data = srv.checkpoint_bytes()
        state, cfg, step, extra = load_state(_io.BytesIO(data))
        assert extra["sessions"] == 3          # post-ACK, not the snap's 5
        assert extra["speeds"][2] == pytest.approx(0.25)
        assert step == 12                      # fields are the snap's cut
        assert state.velocity.shape[0] == 3    # evicted rows never leave
        assert not np.any(np.asarray(state.velocity) == 7.0)

        # Shrink-then-grow inside the staleness window: the reused sids
        # must serialize as ZERO rows (the fresh-tenant contract), not as
        # the evicted tenants' snapshot fields.
        srv.resize_fleet(5)
        with mock.patch("jax.tree.leaves", return_value=[_NotReady()]):
            data2 = srv.checkpoint_bytes()
        state2, _, _, extra2 = load_state(_io.BytesIO(data2))
        assert extra2["sessions"] == 5
        v2 = np.asarray(state2.velocity)
        assert v2.shape[0] == 5
        assert not np.any(v2 == 7.0)
        assert np.all(v2[3:] == 0.0)
    finally:
        srv.stop()
