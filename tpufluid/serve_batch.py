"""Multi-tenant interactive serving: N sessions, ONE chip, ONE dispatch/frame.

The single-session server (tpufluid/server.py) mirrors the reference's page:
one sim, one canvas. Production serving multiplexes MANY interactive users
onto one accelerator — this module is that deployment shape, built on
tpufluid/batch.py: every frame, all sessions' pointer events drain into one
(B, MAX_SPLATS, 8) splat tensor and one fused vmapped dispatch advances AND
renders every session (per-sim results bit-exact vs the single-sim step on
the compiled kernel path — tests/test_tpu.py, out/jobs/done/b76). Each
session has its own clock RATE: a per-session ``speed`` multiplier scales
the shared wall dt — slow motion below 1, fast-forward above 1 via masked
substepping (every individual step dt stays at the reference's 1/60
ceiling, script.js:1191, which also preserves the kernels' displacement
contract) — and the batched dispatch takes the resulting (B,) or (K, B)
per-sim dts on the compiled kernel path (batch.py: the (1, 1) SMEM dt
batches). With every
speed at 1.0 the server passes a scalar dt instead — lock-step, ONE shared
clock exactly like the reference's single requestAnimationFrame feeding its
one sim (script.js:1182-1194) — so the common case stays a single compiled
program.

Session isolation is structural: sims only meet inside vmap, which cannot
mix batch rows. JPEG encoding is lazy (per-session, cached per step), so B
sessions cost one device dispatch plus encodes only for frames actually
polled.

Endpoints (sid = session id, 0..B-1):
  GET  /            dashboard page: a grid of all sessions' live frames
  GET  /frame?sid=N latest JPEG for session N (X-Step header = sim step)
  GET  /stats       {"steps", "sessions", "paused", "speeds", "error"}
  GET  /checkpoint.npz  whole-fleet checkpoint (batched state + config +
                        per-session speeds/tracers); resume with --resume
  POST /sessions     {"n": N}: elastic fleet resize — grow appends fresh
                     zeroed tenants (new high sids, startup burst each),
                     shrink drops the high sids; the next tick pays one
                     recompile for the new batch shape (then cached)
  POST /events?sid=N  same JSON event schema as the single-session server
                      (down/move/up/burst/pause — pause is global), plus
                      {"k": "speed", "v": S}: session N's clock rate,
                      S in [0, SPEED_MAX]. S < 1 is slow motion (0
                      freezes the session's time while its splats still
                      land, like painting into frozen fluid); S > 1 is
                      FAST-FORWARD — the loop splits the session's larger
                      per-frame time advance into ceil(S) substeps of
                      <= 1/60 each, run as masked rows of one fused
                      K-substep dispatch (make_substepped_tick; the loop
                      serves single clamped steps until that program's
                      background warm lands, so the knob never stalls
                      event handling; /stats "substeps" shows the switch)

Geometry/config is uniform across sessions by construction (one compiled
program); per-tenant quality knobs belong on separate server processes.
"""

from __future__ import annotations

import io
import json
import math
import threading
import time
from functools import lru_cache
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional
from urllib.parse import parse_qs, urlparse

import numpy as np

MAX_DT = 1.0 / 60.0

# Per-session clock-rate ceiling. Speeds in (1, SPEED_MAX] are FAST-FORWARD:
# the loop runs ceil(speed) masked substeps per frame (one fused dispatch,
# make_substepped_tick), each substep's dt still <= the reference's 1/60
# ceiling (script.js:1191 — also the kernels' displacement contract). The
# cap bounds both the per-frame compute multiplier an unauthenticated knob
# can demand and jit-cache growth (at most ceil(SPEED_MAX)-1 extra substep
# programs per batch size).
SPEED_MAX = 4.0


@lru_cache(maxsize=None)
def make_batched_tick(config):
    """One fused dispatch per frame for the WHOLE batch: vmapped step +
    vmapped render + uint8 quantize + vertical flip on device ->
    (state, (B, H, W, 3) uint8). The batched analog of
    render.make_step_and_render (same dispatch-tax rationale)."""
    import jax

    from tpufluid.render import tick_body

    one = tick_body(config)

    def tick(state, dt, splats):
        # Scalar dt (all speeds 1.0) maps in_axes=None: the shared server
        # clock stays ONE unbatched SMEM operand. A (B,) dt (per-session
        # speeds) is vmapped — the kernels' (1, 1) SMEM dt batches to
        # (B, 1, 1), which Mosaic lowers (batch.py docstring). The ndim
        # switch is static per aval, so each shape is its own jit program.
        axes = (0, 0 if jax.numpy.ndim(dt) else None, 0)
        return jax.vmap(one, in_axes=axes)(state, dt, splats)

    return jax.jit(tick, donate_argnums=0)


@lru_cache(maxsize=None)
def make_substepped_tick(config):
    """Fast-forward tick: K masked substeps + ONE render, one dispatch.

    ``dts`` is (K, B): session b advances ``sum(dts[:, b])`` this frame,
    split by the serving loop into equal substeps each <= 1/60, so the
    reference's dt ceiling (script.js:1191) — and the kernels'
    displacement contract — hold per SUBSTEP, not per frame. Substep 0
    always executes (splats land even at dt=0: the frozen-fluid speed-0
    semantics); substeps 1..K-1 are EXACT no-ops for sims whose dt entry
    is 0 — a masked select, because a dt=0 ``fluid_step`` is NOT an
    identity (the projection still runs: divergence + warm-started Jacobi
    + gradient subtract keep tightening the field). The select sits
    outside the kernels, so exactness is kernel-agnostic
    (tests/test_serve_batch.py pins it on the jnp oracle; the vmapped
    kernel path is pinned per-sim by tests/test_batch.py / test_tpu.py).
    K is static per program (shape-derived); the loop only ever uses
    K = ceil(max speed) <= ceil(SPEED_MAX)."""
    import jax

    return jax.jit(_substepped_body(config), donate_argnums=0)


def _substepped_body(config):
    """The UNJITTED K-substep body (see make_substepped_tick's contract):
    shared by the single-chip jit above and the batch-DP shard_map
    (make_batch_sharded_substepped_tick) so the two cannot drift."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    from tpufluid.render import frame_u8
    from tpufluid.step import fluid_step

    vstep = jax.vmap(partial(fluid_step, config=config),
                     in_axes=(0, 0, 0))

    def tick(state, dts, splats):
        state = vstep(state, dts[0], splats)
        if dts.shape[0] > 1:
            zero_splats = jnp.zeros_like(splats)

            def body(s, dt_row):
                stepped = vstep(s, dt_row, zero_splats)
                active = dt_row > 0.0

                def sel(new, old):
                    return jnp.where(
                        active.reshape((-1,) + (1,) * (new.ndim - 1)),
                        new, old)

                return jax.tree.map(sel, stepped, s), None

            state, _ = jax.lax.scan(body, state, dts[1:])
        frames = jax.vmap(lambda s: frame_u8(s, config))(state)
        return state, frames

    return tick


@lru_cache(maxsize=None)
def make_batch_sharded_substepped_tick(config, mesh):
    """Multi-chip fast-forward serving: the K-substep masked tick with the
    batch axis sharded over ``mesh`` — each device advances AND renders
    its own B/n sims' substeps with the same body as the single-chip tick.
    ZERO collectives by construction (pure batch DP, tpufluid/batch.py
    docstring: sims never touch a mesh axis), so fleet fast-forward
    scales linearly over chips. ``dts`` is (K, B) with the B axis
    sharded; per-sim results are bit-exact vs the unsharded tick
    (tests/test_batch.py; certified each round by the driver dryrun)."""
    import jax
    from jax.sharding import PartitionSpec as P

    from tpufluid.batch import batch_specs
    from tpufluid.parallel.mesh import COL_AXIS, ROW_AXIS

    specs = batch_specs()
    bp = P((ROW_AXIS, COL_AXIS))
    body = _substepped_body(config)

    def tick(state, dts, splats):
        b = splats.shape[0]
        if b % mesh.size:
            raise ValueError(
                f"batch {b} not divisible by mesh size {mesh.size}")
        sharded = jax.shard_map(
            body, mesh=mesh,
            in_specs=(specs, P(None, (ROW_AXIS, COL_AXIS)), bp),
            out_specs=(specs, bp), check_vma=False)
        return sharded(state, dts, splats)

    return jax.jit(tick, donate_argnums=0)


class BatchFluidServer:
    """Owns the batched sim loop; per-session tracers + lazy JPEG frames."""

    MAX_SESSIONS = 64  # resize_fleet ceiling: caps state alloc + jit-cache growth

    def __init__(self, config, sessions: int = 4, seed: int = 0,
                 quality: int = 80, identical_seeds: bool = False,
                 resume: Optional[str] = None):
        from tpufluid.batch import init_batch
        from tpufluid.trace import PointerTracer

        self.steps_done = 0
        self._seed = int(seed)
        self._identical_seeds = bool(identical_seeds)
        if resume:
            # Whole-fleet deterministic resume: the checkpoint carries the
            # batched field state, config, step count, per-session speeds,
            # seeding policy, and EVERY session's tracer state (RNG
            # cursors, pointer machines, pending bursts) —
            # tpufluid.checkpoint, with the per-session parts in ``extra``
            # (the batched analog of FluidServer(resume=...)).
            from tpufluid.checkpoint import load_state

            self.state, config, self.steps_done, extra = load_state(resume)
            self.config = config
            self.sessions = int(extra["sessions"])
            # Seeding policy comes from the checkpoint, so tenants added
            # to a RESUMED fleet seed exactly as they would have on the
            # original server (deterministic-resume for the resize path).
            self._seed = int(extra.get("seed", seed))
            self._identical_seeds = bool(
                extra.get("identical_seeds", identical_seeds))
            self.tracers = []
            for d in extra["tracers"]:
                tr = PointerTracer(config, seed=self._seed)
                tr.load_state_dict(d)
                self.tracers.append(tr)
            # Clamp on load: a hand-edited/corrupted checkpoint must not
            # bypass the SPEED_MAX bound (it caps per-frame compute and
            # jit-cache growth — a speed >> 4 would background-compile an
            # arbitrarily large K-substep program). NaNs map to 0.
            speeds = np.asarray(extra["speeds"], np.float32)
            self._resume_speeds = np.clip(
                np.nan_to_num(speeds, nan=0.0, posinf=SPEED_MAX, neginf=0.0),
                0.0, SPEED_MAX)
        else:
            self.config = config
            self.sessions = int(sessions)
            # identical_seeds starts every session bit-identical (the
            # isolation test shape: untouched sessions must STAY
            # identical); the default gives each tenant its own seeded
            # startup burst like the reference's multipleSplats(random)
            # (script.js:1170).
            self.tracers = [self._new_tracer(i)
                            for i in range(self.sessions)]
            self.state = init_batch(config, self.sessions)
            self._resume_speeds = None
        self.quality = quality
        self.tick = make_batched_tick(config)
        self.subtick = make_substepped_tick(config)
        # Fast-forward program warm state, keyed by (batch, K): the sim
        # loop only switches to the K-substep program once a background
        # warm has landed, so a speed > 1 knob never stalls the loop (or
        # every POST /events behind self.lock) on a compile.
        self._substep_warmed: set = set()
        self._substep_warming: set = set()
        self._last_substeps = 1
        # Per-session clock rate: dt_b = min(wall_dt * speed_b, 1/60).
        # All-ones keeps the lock-step scalar-dt program (module docstring).
        self.speeds = (np.ones(self.sessions, np.float32)
                       if self._resume_speeds is None
                       else self._resume_speeds)
        self.paused = False
        self.lock = threading.Lock()
        # Owns self.state's DEVICE BUFFERS (the tick donates them, so any
        # reader must exclude an in-flight tick). Acquisition order is
        # strictly lock -> state_lock (resize/checkpoint nest them; the
        # sim loop acquires state_lock INSIDE lock, then releases lock
        # before dispatching) — so the loop does NOT hold the event lock
        # during the tick itself, and a compile storm blocking the tick
        # (JAX's per-function compile lock during a concurrent pre-warm,
        # see docs/TODO.md) stalls only state readers, never POST /events.
        self.state_lock = threading.Lock()
        self.out_lock = threading.Lock()
        self.frames: Optional[np.ndarray] = None  # (B, H, W, 3) uint8
        self._jpeg_cache: dict[int, tuple[int, bytes]] = {}
        self._stop = threading.Event()
        self.error: Optional[str] = None  # sim-loop crash, shown in /stats
        # Fleet generation, bumped by resize_fleet: a tick that started
        # BEFORE a resize must not publish its (stale-fleet) frames after
        # it — shape checks alone can't catch shrink-then-regrow reuse.
        self._gen = 0

    def _new_tracer(self, i: int):
        """Tracer for global session index ``i`` under the fleet's seeding
        policy, with the reference's load-time startup burst
        (multipleSplats(random), script.js:1170) pre-queued — shared by
        __init__ and resize_fleet so the two cannot drift."""
        from tpufluid.trace import PointerTracer

        tr = PointerTracer(self.config,
                           seed=self._seed if self._identical_seeds
                           else self._seed + i)
        tr.splat_stack.append(int(tr.rng.integers(5, 25)))
        return tr

    def handle_events(self, events, sid: int) -> None:
        w, h = self.config.CANVAS_WIDTH, self.config.CANVAS_HEIGHT
        with self.lock:
            # Range check under the lock: a concurrent shrink can retire
            # the sid between an unlocked check and the tracer access.
            if not 0 <= sid < self.sessions:
                raise ValueError(
                    f"sid {sid} out of range 0..{self.sessions - 1}")
            tr = self.tracers[sid]
            for e in events:
                k = e.get("k")
                pid = int(e.get("id", 0))
                if k == "down":
                    tr.feed("down", pid=pid, x=e["x"] * w, y=e["y"] * h)
                elif k == "move":
                    tr.feed("move", pid=pid, x=e["x"] * w, y=e["y"] * h)
                elif k == "up":
                    tr.feed("up", pid=pid)
                elif k == "burst":
                    tr.feed("burst", n=int(e.get("n", 12)))
                elif k == "pause":
                    self.paused = bool(e["v"]) if "v" in e else not self.paused
                elif k == "speed":
                    # Clock-rate knob, clamped to [0, SPEED_MAX]. Below 1
                    # it scales the shared wall dt down (slow motion; 0
                    # freezes time while splats still land). Above 1 it is
                    # FAST-FORWARD: the loop splits the session's larger
                    # time advance into ceil(speed) substeps of <= 1/60
                    # each, run as masked rows of ONE fused substepped
                    # dispatch (make_substepped_tick) — degrading to a
                    # single clamped step until that program's background
                    # warm lands (_spawn_substep_warm).
                    v = float(e["v"])
                    # json.loads accepts NaN/Infinity literals, and
                    # np.clip(NaN, ...) returns NaN — which would make
                    # n_sub = ceil(NaN).astype(int64) = INT64_MIN in the
                    # sim loop and kill it permanently (a remote DoS via
                    # the unauthenticated knob). Reject at the edge ->
                    # the handler's existing 400 path.
                    if not math.isfinite(v):
                        raise ValueError(f"speed must be finite, got {v!r}")
                    self.speeds[sid] = float(np.clip(v, 0.0, SPEED_MAX))

    def _spawn_substep_warm(self, b: int, k: int) -> None:
        """Background-compile the K-substep program for batch size ``b``.

        Called by the sim loop (under self.lock) the first time a frame
        wants K > 1 substeps at this batch size; until the warm lands the
        loop keeps serving single clamped steps (speeds effectively capped
        at 1 for those frames), so neither the loop nor event handling
        ever blocks on the compile. A failed warm leaves its key in
        _substep_warming (never _substep_warmed): the server stays in the
        degraded-but-serving state instead of retrying a broken compile
        every frame."""
        key = (b, k)
        if key in self._substep_warming:
            return
        self._substep_warming.add(key)

        def warm():
            import traceback

            import jax
            import jax.numpy as jnp

            from tpufluid.batch import init_batch
            from tpufluid.ops.splat import SPLAT_COLS

            try:
                out = self.subtick(
                    init_batch(self.config, b),
                    jnp.zeros((k, b), jnp.float32),
                    jnp.zeros((b, self.config.MAX_SPLATS, SPLAT_COLS),
                              jnp.float32))
                jax.block_until_ready(out)
            except Exception:
                traceback.print_exc()
                return
            with self.lock:
                self._substep_warmed.add(key)

        threading.Thread(target=warm, daemon=True).start()

    def resize_fleet(self, n: int) -> None:
        """Elastic multi-tenancy: grow or shrink the fleet LIVE.

        The batch size is a compiled shape, so the next tick after a
        resize pays one jit retrace/compile for the new B (then cached —
        growing back to a previously-seen size is instant). Growth
        appends zeroed sims with fresh seeded tracers + startup bursts
        (sids B..n-1, like the reference's load-time multipleSplats);
        shrink drops the HIGHEST sids (sid identity is positional —
        0..n-1 always remain themselves). Untouched sessions' fields are
        untouched: concatenate/slice on the batch axis cannot mix rows,
        so isolation holds across resizes (tests/test_serve_batch.py)."""
        import jax
        import jax.numpy as jnp

        from tpufluid.batch import init_batch
        from tpufluid.ops.splat import SPLAT_COLS

        if not isinstance(n, int) or isinstance(n, bool):
            raise ValueError(f"fleet size must be an integer, got {n!r}")
        if not 1 <= n <= self.MAX_SESSIONS:
            raise ValueError(
                f"fleet size must be in [1, {self.MAX_SESSIONS}], got {n} "
                f"(the cap bounds state allocation and jit-cache growth "
                f"from unauthenticated POST /sessions)")
        # Pre-warm BOTH dt-shape programs (scalar lock-step + (n,)
        # per-sim) for the new batch size OUTSIDE the lock, on dummy
        # state: the first tick at an unseen shape otherwise compiles
        # while holding self.lock, stalling every event POST for seconds
        # (measured as client timeouts in the chaos soak). Warmed
        # UNCONDITIONALLY: gating on an unlocked self.sessions read can
        # skip the warm when a concurrent resize changes the size between
        # the check and the apply; a cache-hit warm costs two dummy ticks.
        dummy_splats = jnp.zeros((n, self.config.MAX_SPLATS,
                                  SPLAT_COLS), jnp.float32)
        for dt in (jnp.float32(MAX_DT),
                   jnp.full((n,), MAX_DT, jnp.float32)):
            out = self.tick(init_batch(self.config, n), dt, dummy_splats)
            jax.block_until_ready(out)
        with self.lock:
            b = self.sessions
            if n == b:
                return
            # state_lock nested inside lock (the global acquisition
            # order): excludes an in-flight tick, whose donation would
            # otherwise free the buffers this concatenate/slice reads.
            with self.state_lock:
                if n < b:
                    self.tracers = self.tracers[:n]
                    self.speeds = self.speeds[:n].copy()
                    self.state = jax.tree.map(lambda x: x[:n], self.state)
                else:
                    self.tracers += [self._new_tracer(i)
                                     for i in range(b, n)]
                    self.speeds = np.concatenate(
                        [self.speeds, np.ones(n - b, np.float32)])
                    zeros = init_batch(self.config, n - b)
                    self.state = jax.tree.map(
                        lambda a, z: jnp.concatenate([a, z]),
                        self.state, zeros)
                self.sessions = n
            self._gen += 1  # in-flight pre-resize ticks must not publish
        with self.out_lock:
            # Frames/caches are the OLD batch shape; drop them so
            # frame_jpeg 503s until the first resized tick lands.
            self.frames = None
            self._jpeg_cache.clear()

    def checkpoint_bytes(self) -> bytes:
        """Whole-fleet checkpoint (.npz): batched field state + config +
        step count + per-session speeds and tracer states — resumable via
        BatchFluidServer(config, resume=path)."""
        import jax
        import jax.numpy as jnp

        from tpufluid.checkpoint import save_state

        with self.lock:
            # steps_done is written under out_lock just after the state
            # swap; nesting (the sim loop never nests, so no deadlock
            # order) keeps the label within one step of the held state.
            with self.out_lock:
                step = self.steps_done
            extra = {"sessions": self.sessions,
                     "speeds": [float(s) for s in self.speeds],
                     # Seeding policy, so tenants added to a RESUMED
                     # fleet seed as the original fleet would have.
                     "seed": self._seed,
                     "identical_seeds": self._identical_seeds,
                     "tracers": [tr.state_dict() for tr in self.tracers]}
            # Device-side copy under state_lock (nested inside lock, the
            # global order): the next tick DONATES self.state's buffers,
            # so the copy must exclude an in-flight tick. The host
            # transfer + deflate happen outside both locks, so B
            # sessions' sim loop and event handling never stall on
            # serialization.
            with self.state_lock:
                state = jax.tree.map(jnp.copy, self.state)
        buf = io.BytesIO()
        save_state(buf, state, self.config, step=step, extra=extra)
        return buf.getvalue()

    def frame_jpeg(self, sid: int) -> Optional[tuple[bytes, int]]:
        """(JPEG bytes, sim step) for one session — encoded lazily, cached
        per step, so unpolled sessions never pay the encode."""
        from PIL import Image

        if not 0 <= sid < self.sessions:
            raise ValueError(f"sid {sid} out of range")
        with self.out_lock:
            # frames can briefly be None or the OLD batch shape around a
            # resize_fleet (a pre-resize tick's frames may land after the
            # resize cleared them) — 503 until the resized tick arrives.
            if self.frames is None or sid >= self.frames.shape[0]:
                return None
            step = self.steps_done
            hit = self._jpeg_cache.get(sid)
            if hit and hit[0] == step:
                return hit[1], step
            arr = np.array(self.frames[sid])
        buf = io.BytesIO()
        Image.fromarray(arr, "RGB").save(buf, "JPEG", quality=self.quality)
        data = buf.getvalue()
        with self.out_lock:
            if self.steps_done == step:
                self._jpeg_cache[sid] = (step, data)
        return data, step

    def run(self):
        """Sim-loop thread entry; a crash is recorded for /stats instead of
        silently 503-ing every frame request forever (daemon threads die
        unseen — this bit during the per-session-speed build)."""
        try:
            self._run()
        except Exception:
            import traceback

            with self.out_lock:
                self.error = traceback.format_exc()
            traceback.print_exc()

    def _run(self):
        import jax.numpy as jnp

        from tpufluid.ops.splat import SPLAT_COLS

        last = time.time()
        while not self._stop.is_set():
            t_frame = time.time()
            dt_wall = min(t_frame - last, MAX_DT)
            last = t_frame
            with self.lock:
                paused = self.paused
            if paused:
                # Sleep OUTSIDE the lock: holding it would starve
                # POST /events — including the unpause event itself.
                time.sleep(MAX_DT)
                continue
            with self.lock:
                max_s = self.config.MAX_SPLATS
                batch = np.zeros((self.sessions, max_s, SPLAT_COLS),
                                 np.float32)
                # Per-session clocks: the shared wall dt scaled by each
                # session's speed. Speeds <= 1 keep each dt under the
                # reference's 1/60 ceiling (script.js:1191 — also the
                # kernels' displacement contract); speeds above 1 advance
                # MORE than 1/60 of sim time per frame, split into
                # n = ceil(t / MAX_DT) equal substeps so the ceiling holds
                # per SUBSTEP (the frame's K = max over sessions).
                t_total = dt_wall * self.speeds
                n_sub = np.maximum(
                    np.ceil(t_total / MAX_DT - 1e-9), 1.0).astype(np.int64)
                k = int(n_sub.max())
                if k > 1 and ((self.sessions, k)
                              not in self._substep_warmed):
                    # The K-substep program isn't compiled yet: kick off a
                    # background warm and serve this frame at the capped
                    # single-step rate (compiling here would hold
                    # self.lock for seconds, starving every POST /events —
                    # the resize_fleet pre-warm lesson).
                    self._spawn_substep_warm(self.sessions, k)
                    k = 1
                if k == 1:
                    t_total = np.minimum(t_total, MAX_DT)
                # Each tracer drains at ITS OWN advanced time, so color
                # cycling and burst pacing follow the session clock too.
                for b, tr in enumerate(self.tracers):
                    for i, (x, y, dx, dy, color) in enumerate(
                            tr.drain_step(float(t_total[b]))[:max_s]):
                        batch[b, i] = [x, y, dx, dy,
                                       color[0], color[1], color[2], 1.0]
                if k == 1:
                    # All speeds 1.0 (the common case): scalar dt -> the
                    # lock-step program with ONE unbatched SMEM clock.
                    dt_arg = (jnp.float32(dt_wall)
                              if bool(np.all(self.speeds == 1.0))
                              else jnp.asarray(t_total, jnp.float32))
                else:
                    # (K, B) substep dts: session b runs n_sub[b] equal
                    # substeps of t_total[b]/n_sub[b] (each <= MAX_DT by
                    # construction), zero-padded to K — zero rows are
                    # exact no-ops inside make_substepped_tick.
                    sub = (t_total / n_sub).astype(np.float32)
                    dt_arg = jnp.asarray(np.where(
                        np.arange(k)[:, None] < n_sub[None, :],
                        sub[None, :], 0.0).astype(np.float32))
                gen = self._gen
                # Take ownership of the state buffers BEFORE releasing the
                # event lock (lock -> state_lock order): a resize cannot
                # swap the fleet between this frame's drain and its tick,
                # yet the tick itself runs with the event lock FREE — a
                # tick stalled on a compile storm (docs/TODO.md) no longer
                # starves POST /events.
                self.state_lock.acquire()
            try:
                tick = self.tick if k == 1 else self.subtick
                self.state, frames = tick(self.state, dt_arg,
                                          jnp.asarray(batch))
                frames = np.asarray(frames)
            finally:
                self.state_lock.release()
            with self.out_lock:
                # Publish ONLY if no resize happened since this tick was
                # computed: after a shrink-then-regrow to the SAME size,
                # stale frames would pass frame_jpeg's shape guard and
                # leak evicted tenants' pixels to new tenants at reused
                # sids — the generation counter closes that window.
                if gen == self._gen:
                    self.frames = frames
                    self.steps_done += 1
                    self._last_substeps = k
            left = MAX_DT - (time.time() - t_frame)
            if left > 0:
                time.sleep(left)

    def stop(self):
        self._stop.set()


_DASH = """<!doctype html><meta charset=utf-8><title>tpufluid sessions</title>
<style>body{background:#000;color:#9ab;font:13px monospace;margin:12px}
.g{display:flex;flex-wrap:wrap;gap:10px}.c{text-align:center}
img{display:block;border:1px solid #345;cursor:crosshair}</style>
<h3>tpufluid — %B% sessions, one chip, one dispatch/frame</h3>
<div class=g id=g></div>
<script>
const B=%B%;const g=document.getElementById('g');
for(let s=0;s<B;s++){const d=document.createElement('div');d.className='c';
 d.innerHTML=`<img id=f${s} width=256><br>session ${s} · speed
  <input id=v${s} type=range min=0 max=4 step=0.125 value=1
   style="width:90px;vertical-align:middle">
  <span id=l${s}>1</span>x`;g.appendChild(d);
 const sl=d.querySelector(`#v${s}`);
 sl.oninput=()=>{document.getElementById('l'+s).textContent=sl.value;
  fetch(`/events?sid=${s}`,{method:'POST',
   body:JSON.stringify([{k:'speed',v:+sl.value}])})};
 const img=d.querySelector('img');let down=false;
 // Send the RAW top-down pixel fraction: Pointer.on_down/on_move apply
 // the reference's texcoord flip (1 - y/H) themselves — pre-flipping
 // here would double-flip (the single-session page does the same).
 const send=(k,e)=>{const r=img.getBoundingClientRect();
  fetch(`/events?sid=${s}`,{method:'POST',body:JSON.stringify([{k,
   x:(e.clientX-r.left)/r.width,y:(e.clientY-r.top)/r.height}])})};
 img.onmousedown=e=>{down=true;send('down',e)};
 img.onmousemove=e=>{if(down)send('move',e)};
 img.onmouseup=e=>{down=false;fetch(`/events?sid=${s}`,{method:'POST',
  body:JSON.stringify([{k:'up'}])})};}
setInterval(()=>{for(let s=0;s<B;s++){const i=document.getElementById('f'+s);
 i.src=`/frame?sid=${s}&t=${Date.now()}`;}},100);
</script>"""


def make_handler(server: BatchFluidServer):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def handle_one_request(self):
            try:
                super().handle_one_request()
            except (BrokenPipeError, ConnectionResetError):
                self.close_connection = True

        def _sid(self) -> int:
            q = parse_qs(urlparse(self.path).query)
            return int(q.get("sid", ["0"])[0])

        def do_GET(self):
            if self.path.startswith("/frame"):
                try:
                    got = server.frame_jpeg(self._sid())
                except ValueError:
                    self.send_response(404)
                    self.end_headers()
                    return
                if got is None:
                    self.send_response(503)
                    self.end_headers()
                    return
                data, step = got
                self.send_response(200)
                self.send_header("Content-Type", "image/jpeg")
                self.send_header("Cache-Control", "no-store")
                self.send_header("X-Step", str(step))
                self.end_headers()
                self.wfile.write(data)
            elif self.path.startswith("/checkpoint.npz"):
                data = server.checkpoint_bytes()
                self.send_response(200)
                self.send_header("Content-Type", "application/octet-stream")
                self.end_headers()
                self.wfile.write(data)
            elif self.path.startswith("/stats"):
                # sessions/speeds/paused mutate under server.lock (resize
                # replaces both arrays); steps/error publish under
                # out_lock — read each group under ITS lock so a resize
                # can never produce a torn view (sessions != len(speeds)).
                with server.lock:
                    sessions = server.sessions
                    paused = server.paused
                    speeds = [float(s) for s in server.speeds]
                with server.out_lock:
                    out = {"steps": server.steps_done,
                           "sessions": sessions,
                           "paused": paused,
                           "speeds": speeds,
                           # substeps of the LAST published tick: 1 on the
                           # single-step program, ceil(max speed) once a
                           # fast-forward program is warm and engaged.
                           "substeps": server._last_substeps,
                           "error": server.error}
                body = json.dumps(out).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(body)
            else:
                body = _DASH.replace("%B%", str(server.sessions)).encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.end_headers()
                self.wfile.write(body)

        def do_POST(self):
            if self.path.startswith("/events"):
                n = int(self.headers.get("Content-Length", 0))
                try:
                    events = json.loads(self.rfile.read(n) or b"[]")
                    server.handle_events(events, self._sid())
                    self.send_response(204)
                except Exception:
                    self.send_response(400)
                self.end_headers()
            elif self.path.startswith("/sessions"):
                # Elastic multi-tenancy: {"n": N} sets the fleet size live
                # (grow = fresh zeroed tenants at the new high sids,
                # shrink = drop the high sids; one recompile per new B).
                n = int(self.headers.get("Content-Length", 0))
                try:
                    body = json.loads(self.rfile.read(n) or b"{}")
                    server.resize_fleet(body["n"])
                    self.send_response(204)
                except Exception:
                    self.send_response(400)
                self.end_headers()
            else:
                self.send_response(404)
                self.end_headers()

    return Handler


def main(argv=None):
    import argparse
    import os

    if os.environ.get("TPUFLUID_DEVICE", "").lower() == "cpu":
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass

    from tpufluid import FluidConfig

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--port", type=int, default=8001)
    p.add_argument("--sessions", type=int, default=4)
    p.add_argument("--sim-res", type=int, default=128)
    p.add_argument("--dye-res", type=int, default=256)
    p.add_argument("--canvas", default="256x256")
    p.add_argument("--dtype", default="float32")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--identical-seeds", action="store_true",
                   help="start every session bit-identical (same seed + "
                        "same startup burst)")
    p.add_argument("--quality", type=int, default=80)
    p.add_argument("--resume", type=str, default=None,
                   help="resume a whole fleet from a /checkpoint.npz "
                        "download (config, sessions, speeds and tracer "
                        "states come from the checkpoint)")
    args = p.parse_args(argv)
    w, h = (int(v) for v in args.canvas.split("x"))
    cfg = FluidConfig(SIM_RESOLUTION=args.sim_res, DYE_RESOLUTION=args.dye_res,
                      CANVAS_WIDTH=w, CANVAS_HEIGHT=h,
                      DTYPE=args.dtype).validate()
    server = BatchFluidServer(cfg, sessions=args.sessions, seed=args.seed,
                              quality=args.quality, resume=args.resume,
                              identical_seeds=args.identical_seeds)
    sim = threading.Thread(target=server.run, daemon=True)
    sim.start()
    httpd = ThreadingHTTPServer(("0.0.0.0", args.port), make_handler(server))
    print(f"serving {args.sessions} sessions on http://localhost:{args.port}")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.stop()


if __name__ == "__main__":
    main()
