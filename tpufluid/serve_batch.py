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
batches). With every speed at 1.0 the server passes a scalar dt instead —
lock-step, ONE shared clock exactly like the reference's single
requestAnimationFrame feeding its one sim (script.js:1182-1194) — so the
common case stays a single compiled program.

Latency SLO design (the round-4 rework — the reference's bar is that every
input is served within one 16.7 ms frame, script.js:1185,1219-1229):

- **No XLA compile ever runs while holding a lock.** All programs are
  AOT-compiled (``jit.lower(...).compile()``) by ONE background reconciler
  thread, each (batch, kind) as its OWN compiled executable — so a compile
  in flight can never block the live tick through jit's per-function cache
  lock (the round-3 soak's 92-second event p99, docs/TODO.md).
- **Batch shapes are padded to powers of two** (``_padded``): the compiled
  program matrix is bounded (7 sizes up to MAX_SESSIONS=64 x a handful of
  dt kinds), pad rows are exactly inert (zero state + zero splats stay
  zero under fluid_step at any dt), and most fleet resizes change no
  compiled shape at all.
- **Resize is two-phase and non-blocking**: POST /sessions applies the
  bookkeeping (sessions/tracers/speeds) in milliseconds and returns; the
  reconciler compiles whatever the new padded shape needs, swaps the state
  tensor at a tick boundary, zeroes evicted rows (privacy: a shrink's
  tenants must not leak into later grows), and only then activates the new
  rows. Until activation the new sids' frames 503 — events to them queue
  in their tracers and land on the first activated tick.
- A missing per-sim-dt ("vector") program degrades those frames to the
  lock-step clock (speeds read as 1x) instead of stalling the loop; the
  reconciler compiles it within seconds, once per padded size ever — and
  the JAX persistent compilation cache (tpufluid.compilecache) makes even
  that a disk hit across restarts.

Session isolation is structural: sims only meet inside vmap, which cannot
mix batch rows. JPEG encoding is lazy (per-session, cached per step), so B
sessions cost one device dispatch plus encodes only for frames actually
polled.

Endpoints (sid = session id, 0..B-1):
  GET  /            dashboard page: a grid of all sessions' live frames
  GET  /frame?sid=N latest JPEG for session N (X-Step header = sim step)
  GET  /stats       {"steps", "sessions", "paused", "speeds", "error", ...}
  GET  /checkpoint.npz  whole-fleet checkpoint (batched state + config +
                        per-session speeds/tracers); resume with --resume
  POST /sessions     {"n": N}: elastic fleet resize — grow appends fresh
                     zeroed tenants (new high sids, startup burst each),
                     shrink drops the high sids; returns immediately (the
                     reconciler applies any state reshape off-path)
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
                      serves single clamped steps until the reconciler's
                      warm lands, so the knob never stalls event handling;
                      /stats "substeps" shows the switch)

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

# calcDeltaTime clamp: the reference's LITERAL 0.016666, not 1/60
# (script.js:1191). Keep equal to tpufluid.config.MAX_DT (not imported here:
# module import stays jax-free until a fleet is constructed).
MAX_DT = 0.016666

# Per-session clock-rate ceiling. Speeds in (1, SPEED_MAX] are FAST-FORWARD:
# the loop runs ceil(speed) masked substeps per frame (one fused dispatch,
# make_substepped_tick), each substep's dt still <= the reference's 1/60
# ceiling (script.js:1191 — also the kernels' displacement contract). The
# cap bounds both the per-frame compute multiplier an unauthenticated knob
# can demand and the compiled-program matrix (at most ceil(SPEED_MAX)-1
# substep programs per padded batch size).
SPEED_MAX = 4.0
_K_MAX = math.ceil(SPEED_MAX)


def _padded(n: int) -> int:
    """Smallest power of two >= n: the only batch sizes ever compiled.

    Pad rows are exactly inert — zero state with zero splats stays zero
    under fluid_step at any dt (advection/projection/dissipation of the
    zero field are zero; the vorticity normalizer is eps-guarded) — so a
    fleet of S sessions runs correctly inside any padded B >= S, and the
    program matrix stays bounded (tests/test_serve_batch.py pins the
    inertness via isolation across resizes)."""
    return 1 << max(0, (n - 1)).bit_length()


def _batched_tick_body(config):
    """Unjitted batched tick: vmapped step + vmapped render + uint8
    quantize + vertical flip on device -> (state, (B, H, W, 3) uint8).
    The batched analog of render.make_step_and_render (same dispatch-tax
    rationale); jitted by make_batched_tick and AOT-compiled per padded
    batch size by make_tick_program."""
    import jax

    from tpufluid.render import tick_body

    one = tick_body(config)

    def tick(state, dt, splats):
        # Scalar dt (all speeds 1.0) maps in_axes=None: the shared server
        # clock stays ONE unbatched SMEM operand. A (B,) dt (per-session
        # speeds) is vmapped — the kernels' (1, 1) SMEM dt batches to
        # (B, 1, 1), which Mosaic lowers (batch.py docstring). The ndim
        # switch is static per aval, so each shape is its own program.
        axes = (0, 0 if jax.numpy.ndim(dt) else None, 0)
        return jax.vmap(one, in_axes=axes)(state, dt, splats)

    return tick


@lru_cache(maxsize=None)
def make_batched_tick(config):
    """One fused dispatch per frame for the WHOLE batch (shared jit
    instance — the test/dryrun entry point; the server uses per-shape
    AOT executables from make_tick_program instead)."""
    import jax

    return jax.jit(_batched_tick_body(config), donate_argnums=0)


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
    shared by the single-chip jit above, the per-shape AOT executables
    (make_tick_program) and the batch-DP shard_map
    (make_batch_sharded_substepped_tick) so they cannot drift."""
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


def _batch_shapes(config, pb: int):
    """(state, splats) ShapeDtypeStructs for padded batch ``pb`` — the
    AOT lowering avals (no device allocation: jax.eval_shape)."""
    import jax
    import jax.numpy as jnp

    from tpufluid.batch import init_batch
    from tpufluid.ops.splat import SPLAT_COLS

    state_sd = jax.eval_shape(lambda: init_batch(config, pb))
    splat_sd = jax.ShapeDtypeStruct(
        (pb, config.MAX_SPLATS, SPLAT_COLS), jnp.float32)
    return state_sd, splat_sd


@lru_cache(maxsize=None)
def make_tick_program(config, pb: int, kind):
    """ONE AOT-compiled serving executable for padded batch ``pb``.

    kind: 'scalar' (lock-step shared clock), 'vector' ((pb,) per-sim dts),
    or an int K >= 2 (the K-substep fast-forward tick, dts (K, pb)).

    Every (pb, kind) is its OWN ``jax.jit(...).lower(...).compile()``
    executable: a reconciler compile at one shape can never block the live
    tick's dispatch at another through jit's per-function compile lock —
    the mechanism behind the round-3 soak's 92-second event p99
    (docs/TODO.md 'Fast-forward' notes). State is donated, exactly like
    the shared-jit paths."""
    import jax
    import jax.numpy as jnp

    state_sd, splat_sd = _batch_shapes(config, pb)
    if kind == "scalar":
        body, dt_sd = (_batched_tick_body(config),
                       jax.ShapeDtypeStruct((), jnp.float32))
    elif kind == "vector":
        body, dt_sd = (_batched_tick_body(config),
                       jax.ShapeDtypeStruct((pb,), jnp.float32))
    else:
        k = int(kind)
        if k < 2:
            raise ValueError(f"substep kind must be >= 2, got {kind!r}")
        body, dt_sd = (_substepped_body(config),
                       jax.ShapeDtypeStruct((k, pb), jnp.float32))
    fn = jax.jit(body, donate_argnums=0)
    return fn.lower(state_sd, dt_sd, splat_sd).compile()


@lru_cache(maxsize=None)
def make_zero_tail(config, pb: int):
    """AOT executable zeroing rows >= ``live`` of a padded-``pb`` state:
    (state, keep (pb,) bool) -> state with non-kept rows exactly zero.
    jnp.where, not mask-multiply: 0 * NaN would leak a broken evicted
    tenant's non-finites into the pad rows' inertness invariant."""
    import jax
    import jax.numpy as jnp

    state_sd, _ = _batch_shapes(config, pb)

    def zero_tail(state, keep):
        def f(x):
            return jnp.where(
                keep.reshape((-1,) + (1,) * (x.ndim - 1)),
                x, jnp.zeros((), x.dtype))

        return jax.tree.map(f, state)

    fn = jax.jit(zero_tail, donate_argnums=0)
    keep_sd = jax.ShapeDtypeStruct((pb,), jnp.bool_)
    return fn.lower(state_sd, keep_sd).compile()


@lru_cache(maxsize=None)
def make_state_resize(config, pb_from: int, pb_to: int):
    """AOT executable reshaping the padded batch axis on DEVICE (no
    host round-trip — at production grids the fleet state is hundreds of
    MB): grow concatenates zero rows, shrink slices. NOT donated — XLA
    cannot alias across a batch-axis reshape (grow outputs are larger,
    shrink outputs are partial buffers), so donation would only warn."""
    import jax
    import jax.numpy as jnp

    state_sd, _ = _batch_shapes(config, pb_from)

    def resize(state):
        def f(x):
            if pb_to > pb_from:
                pad = jnp.zeros((pb_to - pb_from,) + x.shape[1:], x.dtype)
                return jnp.concatenate([x, pad])
            return x[:pb_to]

        return jax.tree.map(f, state)

    return jax.jit(resize).lower(state_sd).compile()


class BatchFluidServer:
    """Owns the batched sim loop; per-session tracers + lazy JPEG frames.

    Concurrency architecture (the latency-SLO invariants):
      - lock       guards fleet bookkeeping (sessions/tracers/speeds/
                   program table/pending flags). Held only for O(ms)
                   bookkeeping — NEVER across a compile. (The reconciler's
                   rare resize-apply steps hold it across ONE pre-compiled
                   zero/reshape dispatch; the storms were compiles.)
      - state_lock owns the state tensor's device buffers (ticks donate
                   them). Acquired only while holding (or having just
                   held) lock — global order lock -> state_lock.
      - out_lock   guards published frames/steps/caches.
    All XLA compiles happen in the reconciler thread OUTSIDE every lock,
    each into its own executable (make_tick_program), so the worst-case
    event wait is one bookkeeping critical section."""

    MAX_SESSIONS = 64  # resize ceiling: caps state alloc + program matrix

    def __init__(self, config, sessions: int = 4, seed: int = 0,
                 quality: int = 80, identical_seeds: bool = False,
                 resume: Optional[str] = None, prewarm: str = "neighbors"):
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

            state, config, self.steps_done, extra = load_state(resume)
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
            # the compiled-program matrix — a speed >> 4 would demand an
            # arbitrarily large K-substep program). NaNs map to 0.
            speeds = np.asarray(extra["speeds"], np.float32)
            self.speeds = np.clip(
                np.nan_to_num(speeds, nan=0.0, posinf=SPEED_MAX,
                              neginf=0.0), 0.0, SPEED_MAX)
            # Pad the checkpointed rows up to the padded batch in numpy
            # (no compiles in __init__; bf16 travels as ml_dtypes arrays).
            self._pb = _padded(self.sessions)
            arrs = [np.asarray(x) for x in
                    (state.velocity, state.dye, state.pressure)]
            import jax.numpy as jnp

            from tpufluid.state import FluidState

            def pad(a):
                if a.shape[0] == self._pb:
                    return jnp.asarray(a)
                z = np.zeros((self._pb - a.shape[0],) + a.shape[1:],
                             a.dtype)
                return jnp.asarray(np.concatenate([a, z]))

            self.state = FluidState(velocity=pad(arrs[0]), dye=pad(arrs[1]),
                                    pressure=pad(arrs[2]))
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
            self._pb = _padded(self.sessions)
            self.state = init_batch(config, self._pb)
            self.speeds = np.ones(self.sessions, np.float32)
        self.quality = quality
        self.prewarm = prewarm  # "off" | "neighbors" | "all"
        # Rows [0, _live_rows) are ticked, drained and published. Invariant
        # (_tail_clean): rows >= _live_rows of self.state are exactly zero
        # — so activating them (grow) starts fresh tenants from the zero
        # field, and no evicted tenant's pixels can leak into a reused row.
        self._live_rows = min(self.sessions, self._pb)
        self._tail_clean = True
        # AOT program table: (pb, kind) -> compiled executable. Compiled
        # ONLY by the reconciler thread (never under a lock); a failed
        # compile lands in _prog_errors and is never retried (the server
        # stays in its degraded-but-serving state instead of storming).
        self._progs: dict = {}
        self._prog_errors: dict = {}
        self._want: set = set()  # loop-requested (pb, K) fast-forward keys
        self._last_substeps = 1
        self.paused = False
        self.lock = threading.Lock()
        self.state_lock = threading.Lock()
        self.out_lock = threading.Lock()
        self.frames: Optional[np.ndarray] = None  # (pb, H, W, 3) uint8
        self._frames_live = 0  # rows of self.frames that are live tenants
        self._jpeg_cache: dict[int, tuple[int, bytes]] = {}
        self._stop = threading.Event()
        self.error: Optional[str] = None  # sim-loop crash, shown in /stats
        # Fleet generation, bumped by state swaps: a tick that started
        # BEFORE a swap must not publish its (stale-fleet) frames after
        # it — shape checks alone can't catch shrink-then-regrow reuse.
        self._gen = 0
        self._reconcile = threading.Event()
        self._reconciler_thread: Optional[threading.Thread] = None
        # Rolling post-tick host snapshot (step, numpy FluidState),
        # refreshed by the sim loop at tick boundaries (see
        # _maybe_refresh_snapshot): checkpoints serve its FIELDS when the
        # live state is an in-flight tick's future, so checkpoint latency
        # is bounded by a memcpy even while a compile storm stretches
        # ticks to seconds. Bookkeeping (sessions/speeds/tracers) always
        # comes from the live server, never the snapshot — a checkpoint
        # taken after an ACKed resize must reflect it. _snap_floor is the
        # min live-row count since the snapshot was captured: snapshot
        # rows at or above it are evicted tenants' stale fields (or
        # pending zeros) and must serialize as zeros, never as data.
        # All three guarded by out_lock.
        self._snap = None
        self._snap_time = 0.0
        self._snap_floor = self._live_rows
        # Set by _fleet_and_state spinners; the sim loop parks (holding
        # neither lock) while it's up, so a checkpoint/swap waiter gets
        # its both-locks window within one tick instead of starving.
        self._yield_loop = threading.Event()

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
                    # dispatch — degrading to a single clamped step until
                    # the reconciler's program warm lands.
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

    # ----- reconciler: the ONLY thread that compiles -----

    def _ensure_reconciler(self):
        if self._reconciler_thread is None:
            self._reconciler_thread = threading.Thread(
                target=self._reconcile_loop, daemon=True)
            self._reconciler_thread.start()

    def _prewarm_keys(self, pb: int):
        """Speculative compile targets, lowest reconciler priority.

        'neighbors' (default): everything the CURRENT padded size can ask
        for at runtime (per-sim dts + every fast-forward K) plus the
        adjacent padded sizes' lock-step programs, so a one-notch resize
        never waits on a compile. 'all' covers the full power-of-two
        matrix up to MAX_SESSIONS — deploy-time warm for production
        fleets (the soak uses it). 'off' compiles strictly on demand."""
        if self.prewarm == "off":
            return []
        keys = [(pb, k) for k in range(2, _K_MAX + 1)]
        if self.prewarm == "all":
            sizes = []
            s = 1
            while s <= _padded(self.MAX_SESSIONS):
                sizes.append(s)
                s *= 2
        else:
            sizes = [p for p in (pb * 2, pb // 2)
                     if 1 <= p <= _padded(self.MAX_SESSIONS)]
        for p in sizes:
            keys.append((p, "scalar"))
            keys.append((p, "vector"))
        if self.prewarm == "all":
            for p in sizes:
                keys.extend((p, k) for k in range(2, _K_MAX + 1))
        return keys

    def _next_task(self):
        """Pick the reconciler's next unit of work, under self.lock.

        Priority: programs the loop needs NOW (current padded size's
        lock-step, then per-sim-dt, then requested fast-forward Ks) >
        privacy zeroing of evicted rows > pending padded-size swap >
        activating pending grown tenants > speculative prewarm."""
        pb = self._pb
        target = _padded(self.sessions)

        def missing(key):
            return key not in self._progs and key not in self._prog_errors

        for key in [(pb, "scalar"), (pb, "vector")]:
            if missing(key):
                return ("compile", key)
        for key in sorted(self._want):
            if missing(key):
                return ("compile", key)
        if not self._tail_clean:
            zt = ("zerotail", pb)
            if missing(zt):
                return ("compile", zt)
            if zt in self._progs:
                return ("zero_tail",)
            # Terminal: the zerotail compile failed (_prog_errors entries
            # are never retried). Returning ("zero_tail",) anyway would
            # make the reconciler spin hot on a no-op apply — grabbing
            # both locks each cycle and starving the sim loop. Privacy
            # zeroing (and with it swaps/activation, which require a
            # clean tail) is wedged; surface it via stuck_tasks() and
            # keep serving the live rows.
        elif target != pb:
            dep_error = False
            for key in [(target, "scalar"), (target, "vector"),
                        ("resize", pb, target)]:
                if key in self._prog_errors:
                    dep_error = True  # terminal — see stuck_tasks()
                elif key not in self._progs:
                    return ("compile", key)
            if not dep_error:
                return ("swap", pb, target)
            # A swap dependency failed terminally: the padded-size swap
            # is wedged (surfaced via stuck_tasks()); fall through so
            # tenants that fit the CURRENT padded size still activate.
        if (self._tail_clean
                and self._live_rows < min(self.sessions, pb)):
            return ("activate",)
        for key in self._prewarm_keys(pb):
            if missing(key):
                return ("compile", key)
        return None

    def stuck_tasks(self) -> list:
        """Terminally wedged reconciler objectives (a required program's
        compile failed; failures are never retried). Call under self.lock.
        Shown in /stats so an operator sees WHY a resize never completes
        instead of inferring it from program_errors keys."""
        stuck = []
        pb = self._pb
        target = _padded(self.sessions)
        if not self._tail_clean and ("zerotail", pb) in self._prog_errors:
            stuck.append({"task": "zero_tail", "padded_batch": pb,
                          "blocked": "privacy zeroing, swaps, activation"})
        if target != pb:
            deps = [k for k in [(target, "scalar"), (target, "vector"),
                                ("resize", pb, target)]
                    if k in self._prog_errors]
            if deps:
                stuck.append({"task": "swap", "from": pb, "to": target,
                              "failed_deps": [str(k) for k in deps],
                              "blocked": "padded-size resize"})
        return stuck

    def _compile(self, key) -> None:
        """Compile ONE executable, outside every lock, then publish it
        into the program table. Failures are recorded once and never
        retried (degraded-but-serving beats a compile storm)."""
        import traceback

        try:
            if key[0] == "zerotail":
                prog = make_zero_tail(self.config, key[1])
            elif key[0] == "resize":
                prog = make_state_resize(self.config, key[1], key[2])
            else:
                prog = make_tick_program(self.config, key[0], key[1])
        except Exception:
            with self.lock:
                self._prog_errors[key] = traceback.format_exc()
            return
        with self.lock:
            self._progs[key] = prog

    def _reconcile_loop(self):
        # Serving QoS: compiles are background work BY DEFINITION, but
        # XLA/LLVM codegen is CPU-bound and, on a small host, time-shares
        # against the live tick — measured on the 1-CPU soak host: ticks
        # stretched from ~100 ms to 10-20 s while the prewarm matrix
        # compiled, blowing the checkpoint SLO (any tick-consistent
        # snapshot waits on the in-flight tick). Deprioritize this thread
        # (Linux per-thread nice; helper threads LLVM spawns inherit it)
        # so the sim loop keeps the core whenever it has work.
        try:
            import os as _os

            _os.setpriority(_os.PRIO_PROCESS, threading.get_native_id(), 19)
        except (OSError, AttributeError):  # non-Linux / not permitted
            pass
        while not self._stop.is_set():
            with self.lock:
                task = self._next_task()
            if task is None:
                self._reconcile.wait(timeout=0.25)
                self._reconcile.clear()
                continue
            if task[0] == "compile":
                self._compile(task[1])
            elif task[0] == "zero_tail":
                self._apply_zero_tail()
            elif task[0] == "swap":
                self._apply_swap(task[1], task[2])
            else:  # activate
                with self.lock:
                    if self._tail_clean:
                        self._live_rows = min(self.sessions, self._pb)

    def _fleet_and_state(self):
        """Acquire lock AND state_lock together WITHOUT ever holding the
        event lock while waiting for an in-flight tick (the round-3
        residual: a waiter holding the event lock turns one slow tick
        into an event-latency stall for every POST /events). Spins on a
        non-blocking state_lock attempt, releasing the event lock between
        tries; respects the global lock -> state_lock order. Returns True
        with BOTH locks held, or False if the server is stopping.

        The ``_yield_loop`` flag closes the spin's starvation hole: on a
        busy host the loop cycles drain(lock)->tick(state_lock) almost
        back-to-back, so the both-free window a spinner needs is
        microseconds per frame (the first 10-minute soak measured a
        54-SECOND checkpoint because of it). While the flag is set the
        sim loop parks before its next drain — holding neither lock — so
        the spinner wins within one tick."""
        while not self._stop.is_set():
            # Re-set each try: a concurrent spinner's _release_both may
            # have cleared the flag while this one is still waiting.
            self._yield_loop.set()
            self.lock.acquire()
            if self.state_lock.acquire(blocking=False):
                return True  # _release_both clears the flag
            self.lock.release()
            time.sleep(0.001)
        self._yield_loop.clear()
        return False

    def _release_both(self):
        self._yield_loop.clear()
        self.state_lock.release()
        self.lock.release()

    def _apply_zero_tail(self):
        """Zero rows >= _live_rows on device (privacy after a shrink +
        the pad-row inertness invariant). Executes a pre-compiled
        program; execution only, never a compile, so the hold is one
        small dispatch."""
        if not self._fleet_and_state():
            return
        try:
            pb = self._pb
            prog = self._progs.get(("zerotail", pb))
            if prog is None or self._tail_clean:
                return
            keep = np.arange(pb) < self._live_rows
            self.state = prog(self.state, keep)
            self._tail_clean = True
        finally:
            self._release_both()

    def _apply_swap(self, pb_from: int, pb_to: int):
        """Swap the state tensor to a new padded batch size on device.
        Pre-conditions (enforced by _next_task ordering): tail is clean,
        target programs + the resize executable are compiled. Re-validated
        under the lock — a concurrent resize may have moved the target."""
        if not self._fleet_and_state():
            return
        try:
            if (self._pb != pb_from or _padded(self.sessions) != pb_to
                    or not self._tail_clean):
                return  # stale plan; _next_task will re-derive
            prog = self._progs.get(("resize", pb_from, pb_to))
            if prog is None:
                return
            self.state = prog(self.state)
            self._pb = pb_to
            self._live_rows = min(self._live_rows, pb_to)
            # Tail stays clean: grow appended zeros; shrink sliced
            # away rows that the clean invariant already had zero.
            self._gen += 1  # in-flight pre-swap ticks must not publish
        finally:
            self._release_both()

    def resize_fleet(self, n: int) -> None:
        """Elastic multi-tenancy: grow or shrink the fleet LIVE, in O(ms).

        Two-phase: this call applies only bookkeeping — tracers, speeds,
        the session count (growth appends fresh seeded tracers + startup
        bursts at sids B..n-1, like the reference's load-time
        multipleSplats; shrink drops the HIGHEST sids — sid identity is
        positional, 0..n-1 always remain themselves) — and returns. The
        reconciler then (a) zeroes evicted rows on device (privacy), (b)
        swaps the padded state shape if the power-of-two bucket changed
        (compiling anything it needs OUTSIDE the locks first), and (c)
        activates pending grown rows. Until activation, new sids' frames
        503 while their events queue in their tracers. Untouched
        sessions' fields are untouched throughout: concatenate/slice on
        the batch axis cannot mix rows (tests/test_serve_batch.py)."""
        if not isinstance(n, int) or isinstance(n, bool):
            raise ValueError(f"fleet size must be an integer, got {n!r}")
        if not 1 <= n <= self.MAX_SESSIONS:
            raise ValueError(
                f"fleet size must be in [1, {self.MAX_SESSIONS}], got {n} "
                f"(the cap bounds state allocation and program-matrix "
                f"growth from unauthenticated POST /sessions)")
        with self.lock:
            b = self.sessions
            if n == b:
                return
            if n < b:
                self.tracers = self.tracers[:n]
                self.speeds = self.speeds[:n].copy()
                self.sessions = n
                if n < self._live_rows:
                    # Evicted rows hold real tenant data until the
                    # reconciler zeroes them; nothing may publish or
                    # reactivate them before that. Fence IN-FLIGHT ticks
                    # too: a tick that captured the pre-shrink live count
                    # must not publish (it would raise _frames_live back
                    # over the evicted rows after a shrink-then-regrow at
                    # the same padded size — a cross-tenant pixel leak).
                    self._live_rows = n
                    self._tail_clean = False
                    self._gen += 1
            else:
                self.tracers += [self._new_tracer(i) for i in range(b, n)]
                self.speeds = np.concatenate(
                    [self.speeds, np.ones(n - b, np.float32)])
                self.sessions = n
                if self._tail_clean and n <= self._pb:
                    # Common case: the new tenants fit inside the current
                    # padded batch and their rows are known-zero —
                    # activate instantly, zero compiles, zero swaps.
                    self._live_rows = n
        self._reconcile.set()
        with self.out_lock:
            # Cached encodes may belong to retired sids; drop them. Live
            # frames stay valid (per-row gating via _frames_live).
            self._jpeg_cache.clear()
            # A shrink evicts rows >= n: the rolling snapshot's copies of
            # them are now another (departed) tenant's fields — fence them
            # out of checkpoints until the next refresh.
            if n < b:
                self._snap_floor = min(self._snap_floor, n)

    # Rolling-snapshot refresh cadence: at least this often, further
    # throttled so the memcpy costs <= ~2% of a 200 MB/s-memcpy core at
    # any fleet size (interval >= fleet_bytes / 200 MB/s * 50).
    _SNAP_MIN_INTERVAL_S = 0.25

    def _snapshot_meta(self) -> dict:
        """Bookkeeping half of a checkpoint cut. Call under self.lock."""
        return {"sessions": self.sessions,
                "speeds": [float(s) for s in self.speeds],
                # Seeding policy, so tenants added to a RESUMED fleet
                # seed as the original fleet would have.
                "seed": self._seed,
                "identical_seeds": self._identical_seeds,
                "tracers": [tr.state_dict() for tr in self.tracers]}

    def _host_state(self) -> "FluidState":
        """Host memcpy of self.state. Call with state_lock held and the
        state MATERIALIZED (never compiles; never forces device work)."""
        from tpufluid.state import FluidState

        return FluidState(velocity=np.asarray(self.state.velocity),
                          dye=np.asarray(self.state.dye),
                          pressure=np.asarray(self.state.pressure))

    def _maybe_refresh_snapshot(self) -> None:
        """Refresh the rolling post-tick snapshot. Called by the sim loop
        right after publishing a tick (state materialized — frames were
        just forced — and this thread owns the buffers until its next
        dispatch). Throttled by wall time AND fleet bytes so steady-state
        overhead stays negligible at any fleet size."""
        now = time.time()
        nbytes = sum(x.size * x.dtype.itemsize
                     for x in (self.state.velocity, self.state.dye,
                               self.state.pressure))
        if nbytes > 64 * 1024 * 1024:
            # Huge fleets: the refresh memcpy itself would hold the locks
            # long enough to hurt the event SLO. Skip the rolling snapshot
            # (checkpoints use the fresh path — on hardware where such
            # fleets run, ticks are sub-ms and the state is ready).
            return
        interval = max(self._SNAP_MIN_INTERVAL_S, nbytes / 200e6 * 50.0)
        if now - self._snap_time < interval:
            return
        self.lock.acquire()
        try:
            # Rows valid in THIS capture: live, non-pending tenants.
            floor0 = min(self.sessions, self._live_rows)
            # lock -> state_lock order; the hold is one bounded memcpy
            # (zero_tail donates the buffers, so the copy cannot move
            # outside the lock).
            self.state_lock.acquire()
            try:
                st = self._host_state()
            finally:
                self.state_lock.release()
        finally:
            self.lock.release()
        with self.out_lock:
            self._snap = (self.steps_done, st)
            self._snap_time = now
            # Reset the since-capture floor — folding in the current
            # bookkeeping (plain int reads) so a shrink that lands in the
            # capture-to-publish gap can never raise it back up.
            self._snap_floor = min(floor0, self.sessions, self._live_rows)

    def checkpoint_bytes(self) -> bytes:
        """Whole-fleet checkpoint (.npz): batched field state + config +
        step count + per-session speeds and tracer states — resumable via
        BatchFluidServer(config, resume=path). Saves exactly ``sessions``
        rows (pad rows never leave the server); a pending grown tenant
        that hasn't activated yet is saved as its zero field — which is
        precisely its state."""
        import jax
        import jax.numpy as jnp

        from tpufluid.checkpoint import save_state
        from tpufluid.state import FluidState

        # Bounded-latency cut (round-4 verdict #2, checkpoint p99 <= 1 s
        # independent of fleet size). BOOKKEEPING (sessions, speeds,
        # tracer cursors) is always the live, post-ACK truth — a client
        # that resized or set a speed and then checkpointed must get what
        # it was ACKed (the rolling path once served a pre-shrink session
        # count here: evicted tenants resurrected into the npz). FIELDS
        # come from one of two O(memcpy) cuts:
        #   fresh  — the live state is materialized (true whenever no tick
        #            is mid-flight; _fleet_and_state's _yield_loop parking
        #            makes this the steady-state case): host memcpy NOW —
        #            no XLA compile, no device wait.
        #   rolling — a tick is in flight (its futures are not ready).
        #            Waiting for it is unbounded under a compile storm
        #            (XLA:CPU codegen starves execution; measured 4-20 s
        #            ticks on the 1-CPU soak host — the round-4 4.4 s
        #            p99's real mechanism), so serve the loop-maintained
        #            post-tick snapshot's fields instead (staleness <= one
        #            tick + the refresh throttle). Only before the first
        #            snapshot (startup) does the fresh path force the
        #            in-flight first tick.
        # Either way, rows at or above the row floor — evicted tenants'
        # stale copies (rolling, _snap_floor) or un-zeroed/pending rows
        # (fresh, _live_rows) — serialize as ZEROS, never as field data.
        if not self._fleet_and_state():
            raise RuntimeError("server is stopping")
        try:
            ready = all(getattr(x, "is_ready", lambda: True)()
                        for x in jax.tree.leaves(self.state))
            with self.out_lock:
                snap = self._snap
                snap_floor = self._snap_floor
                step = self.steps_done
            sessions = self.sessions
            extra = self._snapshot_meta()
            if ready or snap is None:
                floor = min(sessions, self._live_rows)
                state = self._host_state()
            else:
                step, state = snap
                floor = snap_floor
        finally:
            self._release_both()
        rows = min(sessions, floor, state.velocity.shape[0])

        def take(x):
            a = np.asarray(x)[:rows]
            if rows < sessions:  # pending grown tenants: zero by contract
                a = np.concatenate(
                    [a, np.zeros((sessions - rows,) + a.shape[1:],
                                 a.dtype)])
            return a

        state = FluidState(velocity=take(state.velocity),
                           dye=take(state.dye),
                           pressure=take(state.pressure))
        buf = io.BytesIO()
        # Uncompressed npz: the soak measured DEFLATE's single-core tail
        # at 5-8 s/checkpoint on large fleets (p99 above the 5 s SLO);
        # uncompressed serialization is a memcpy + CRC.
        save_state(buf, state, self.config, step=step, extra=extra,
                   compress=False)
        return buf.getvalue()

    def frame_jpeg(self, sid: int) -> Optional[tuple[bytes, int]]:
        """(JPEG bytes, sim step) for one session — encoded lazily, cached
        per step, so unpolled sessions never pay the encode."""
        from PIL import Image

        if not 0 <= sid < self.sessions:
            raise ValueError(f"sid {sid} out of range")
        with self.out_lock:
            # Frames can briefly be missing rows for this sid around a
            # resize (pending activation, or a pre-swap tick's frames) —
            # 503 until the first tick covering it lands. _frames_live is
            # the row count that was LIVE when self.frames was published.
            if self.frames is None or sid >= self._frames_live:
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

        self._ensure_reconciler()
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
            if self._yield_loop.is_set():
                # A checkpoint/swap spinner needs lock+state_lock
                # together; park (holding neither) so it wins within one
                # frame instead of starving against the drain->tick cycle.
                time.sleep(0.002)
                continue
            with self.lock:
                pb = self._pb
                if ((pb, "scalar") not in self._progs
                        and (pb, "scalar") not in self._prog_errors):
                    wait = True
                elif (pb, "scalar") in self._prog_errors:
                    raise RuntimeError(
                        "lock-step program failed to compile:\n"
                        + self._prog_errors[(pb, "scalar")])
                else:
                    wait = False
            if wait:
                # The reconciler is still compiling this padded size's
                # first program (startup, or a swap target raced us);
                # nothing to dispatch yet — events flow, frames wait.
                self._reconcile.set()
                time.sleep(0.05)
                continue
            with self.lock:
                pb = self._pb
                live = self._live_rows
                max_s = self.config.MAX_SPLATS
                batch = np.zeros((pb, max_s, SPLAT_COLS), np.float32)
                # Per-session clocks over the PADDED batch: live rows use
                # their session's speed, pad/pending rows read 1.0 (their
                # zero state is inert at any dt, see _padded). Speeds <= 1
                # keep each dt under the reference's 1/60 ceiling
                # (script.js:1191 — also the kernels' displacement
                # contract); speeds above 1 advance MORE than 1/60 of sim
                # time per frame, split into n = ceil(t / MAX_DT) equal
                # substeps so the ceiling holds per SUBSTEP.
                speeds_p = np.ones(pb, np.float32)
                speeds_p[:live] = self.speeds[:live]
                t_total = dt_wall * speeds_p
                n_sub = np.maximum(
                    np.ceil(t_total / MAX_DT - 1e-9), 1.0).astype(np.int64)
                k = int(n_sub.max())
                if k > 1 and (pb, k) not in self._progs:
                    # Fast-forward program not compiled yet: request it
                    # and serve this frame at the capped single-step rate
                    # (compiling here would hold self.lock for seconds,
                    # starving every POST /events).
                    if (pb, k) not in self._prog_errors:
                        self._want.add((pb, k))
                        self._reconcile.set()
                    k = 1
                if k == 1:
                    t_total = np.minimum(t_total, MAX_DT)
                # Pick the program AND the dt it will apply BEFORE
                # draining tracers: a degrade (below) replaces the
                # per-session clocks with the shared one, and splat
                # pacing / color cycling must advance at the dt the sim
                # actually steps — draining first would land inputs at
                # inconsistent sim times during a compile window.
                if k == 1:
                    lockstep = bool(np.all(speeds_p == 1.0))
                    if not lockstep and (pb, "vector") not in self._progs:
                        # Per-sim-dt program still compiling (first
                        # seconds at a fresh padded size, once ever):
                        # degrade those frames to the shared clock rather
                        # than stall the loop — the reconciler has it as
                        # its next-priority task.
                        lockstep = True
                        self._reconcile.set()
                    if lockstep:
                        prog = self._progs[(pb, "scalar")]
                        dt_arg = np.float32(dt_wall)
                        # The scalar program steps EVERY live row at
                        # dt_wall; drain at that same clock.
                        t_total = np.full(pb, dt_wall, np.float32)
                    else:
                        prog = self._progs[(pb, "vector")]
                        dt_arg = jnp.asarray(t_total, jnp.float32)
                else:
                    # (K, B) substep dts: session b runs n_sub[b] equal
                    # substeps of t_total[b]/n_sub[b] (each <= MAX_DT by
                    # construction), zero-padded to K — zero rows are
                    # exact no-ops inside the substepped body.
                    prog = self._progs[(pb, k)]
                    sub = (t_total / n_sub).astype(np.float32)
                    dt_arg = jnp.asarray(np.where(
                        np.arange(k)[:, None] < n_sub[None, :],
                        sub[None, :], 0.0).astype(np.float32))
                # Each tracer drains at ITS OWN applied time (t_total now
                # reflects the program that WILL dispatch, including any
                # degrade), so color cycling and burst pacing follow the
                # session clock the sim actually advances by. Pending
                # (not-yet-activated) tenants are NOT drained: their
                # events queue until their zeroed row is live, so their
                # startup burst cannot land on a stale field.
                for b in range(live):
                    for i, (x, y, dx, dy, color) in enumerate(
                            self.tracers[b].drain_step(
                                float(t_total[b]))[:max_s]):
                        batch[b, i] = [x, y, dx, dy,
                                       color[0], color[1], color[2], 1.0]
                gen = self._gen
                # Take ownership of the state buffers BEFORE releasing the
                # event lock (lock -> state_lock order): a swap cannot
                # replace the fleet between this frame's drain and its
                # tick, yet the tick itself runs with the event lock FREE.
                self.state_lock.acquire()
            try:
                # DISPATCH under state_lock (donation of the old buffers +
                # publication of the result futures is the atomic part);
                # the device chews through the tick with BOTH locks free.
                self.state, frames = prog(self.state, dt_arg,
                                          jnp.asarray(batch))
            finally:
                self.state_lock.release()
            # Force OUTSIDE the lock: checkpoint/swap spinners no longer
            # wait a whole tick for state_lock (the round-4 checkpoint p99
            # was this wait, measured: lock_wait p99 395 ms vs serialize
            # 19 ms on the soak config) — they enqueue/read after the
            # in-flight tick in device order instead.
            frames = np.asarray(frames)
            with self.out_lock:
                # Publish ONLY if no swap OR shrink happened since this
                # tick was computed (both bump _gen): after a
                # shrink-then-regrow to the SAME padded size, stale frames
                # would pass shape guards — and a stale ``live`` would
                # raise the _frames_live watermark — leaking evicted
                # tenants' pixels to new tenants at reused sids. The
                # generation counter closes both windows.
                if gen == self._gen:
                    self.frames = frames
                    self._frames_live = live
                    self.steps_done += 1
                    self._last_substeps = k
            # Post-tick boundary: state is materialized (frames forced) —
            # refresh the rolling checkpoint snapshot (throttled inside).
            self._maybe_refresh_snapshot()
            left = MAX_DT - (time.time() - t_frame)
            if left > 0:
                time.sleep(left)

    def stop(self, join_timeout: float = 60.0):
        """Stop the loops. Joins the reconciler (bounded): a daemon
        thread still inside an XLA compile at interpreter teardown aborts
        the process with glibc heap corruption ('corrupted size vs.
        prev_size' — observed at pytest exit), so owners should let the
        in-flight compile finish before the process dies."""
        self._stop.set()
        self._reconcile.set()
        t = self._reconciler_thread
        if t is not None and t is not threading.current_thread():
            t.join(timeout=join_timeout)


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
        # Socket timeout on every connection (reads AND writes): a
        # stalled client frees its handler thread instead of holding it
        # forever (same backpressure contract as tpufluid/server.py).
        timeout = 15

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
                    live = server._live_rows
                    padded = server._pb
                    warm = len(server._progs)
                    failed = len(server._prog_errors)
                    progs = sorted(str(k) for k in server._progs)
                    prog_errors = {str(k): v.splitlines()[-1]
                                   for k, v in server._prog_errors.items()}
                    stuck = server.stuck_tasks()
                with server.out_lock:
                    out = {"steps": server.steps_done,
                           "sessions": sessions,
                           "paused": paused,
                           "speeds": speeds,
                           # substeps of the LAST published tick: 1 on the
                           # single-step program, ceil(max speed) once a
                           # fast-forward program is warm and engaged.
                           "substeps": server._last_substeps,
                           # Serving-plane observability: rows currently
                           # ticked+published vs the padded batch, and the
                           # AOT program table's health.
                           "live_rows": live,
                           "padded_batch": padded,
                           "programs_warm": warm,
                           "programs_failed": failed,
                           # Explicit table keys so a client (or test) can
                           # wait for a SPECIFIC program instead of racing
                           # the reconciler: the loop silently degrades
                           # per-sim clocks to lock-step until the
                           # "vector" program for the current padded size
                           # is warm (see _run).
                           "programs": progs,
                           "program_errors": prog_errors,
                           # Wedged objectives (failed compiles are
                           # terminal): the reconciler skips these rather
                           # than spinning on an apply that can never run.
                           "stuck": stuck,
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
                # shrink = drop the high sids). Returns in O(ms); the
                # reconciler applies any state reshape off-path.
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
    p.add_argument("--prewarm", default="neighbors",
                   choices=["off", "neighbors", "all"],
                   help="speculative AOT program warm policy (see "
                        "BatchFluidServer._prewarm_keys)")
    p.add_argument("--compile-cache", default=None, metavar="DIR",
                   help="enable the JAX persistent compilation cache at "
                        "DIR: programs compile once per machine, then "
                        "every restart/soak loads them from disk "
                        "(tpufluid.compilecache)")
    p.add_argument("--resume", type=str, default=None,
                   help="resume a whole fleet from a /checkpoint.npz "
                        "download (config, sessions, speeds and tracer "
                        "states come from the checkpoint)")
    args = p.parse_args(argv)
    if args.compile_cache:
        from tpufluid.compilecache import enable_compile_cache

        enable_compile_cache(args.compile_cache)
    w, h = (int(v) for v in args.canvas.split("x"))
    cfg = FluidConfig(SIM_RESOLUTION=args.sim_res, DYE_RESOLUTION=args.dye_res,
                      CANVAS_WIDTH=w, CANVAS_HEIGHT=h,
                      DTYPE=args.dtype).validate()
    server = BatchFluidServer(cfg, sessions=args.sessions, seed=args.seed,
                              quality=args.quality, resume=args.resume,
                              identical_seeds=args.identical_seeds,
                              prewarm=args.prewarm)
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
