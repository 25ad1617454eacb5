"""Pointer traces: the deterministic record/replay seam.

The reference turns mouse/touch events into per-frame splat calls through a
pointer state machine (/root/reference/script.js:87-98, 1464-1563) and a
queued random-splat stack (splatStack / multipleSplats, script.js:1219-1229,
1427-1439). Here that machinery is headless and deterministic:

  * ``Pointer`` reproduces the texcoord / aspect-corrected-delta math
    (updatePointerDownData/MoveData, correctDeltaX/Y).
  * ``PointerTracer`` consumes (step, kind, x, y) events in *pixel* space and
    emits per-step splat batches — exactly what applyInputs + splatPointer
    would have injected.
  * ``random_splats`` reproduces multipleSplats: n splats, 10x brightened
    random colors, velocity U(-500, 500), from a seeded RNG.
  * ``Trace`` serializes to .npz for replay benchmarks (BASELINE config #3).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from tpufluid.config import MAX_DT, FluidConfig
from tpufluid.ops.splat import SPLAT_COLS
from tpufluid.utils.color import generate_color_np, wrap


@dataclasses.dataclass
class Pointer:
    """Reference pointerPrototype (script.js:87-98)."""

    id: int = -1
    texcoord_x: float = 0.0
    texcoord_y: float = 0.0
    prev_texcoord_x: float = 0.0
    prev_texcoord_y: float = 0.0
    delta_x: float = 0.0
    delta_y: float = 0.0
    down: bool = False
    moved: bool = False
    color: Tuple[float, float, float] = (30.0, 0.0, 300.0)

    def on_down(self, pid: int, pos_x: float, pos_y: float, config: FluidConfig,
                color: Tuple[float, float, float]) -> None:
        """updatePointerDownData (script.js:1527-1537). pos in canvas pixels."""
        self.id = pid
        self.down = True
        self.moved = False
        self.texcoord_x = pos_x / config.CANVAS_WIDTH
        self.texcoord_y = 1.0 - pos_y / config.CANVAS_HEIGHT
        self.prev_texcoord_x = self.texcoord_x
        self.prev_texcoord_y = self.texcoord_y
        self.delta_x = 0.0
        self.delta_y = 0.0
        self.color = color

    def on_move(self, pos_x: float, pos_y: float, config: FluidConfig) -> None:
        """updatePointerMoveData (script.js:1539-1547) + correctDeltaX/Y."""
        if not self.down:
            return
        aspect = config.aspect_ratio
        self.prev_texcoord_x = self.texcoord_x
        self.prev_texcoord_y = self.texcoord_y
        self.texcoord_x = pos_x / config.CANVAS_WIDTH
        self.texcoord_y = 1.0 - pos_y / config.CANVAS_HEIGHT
        dx = self.texcoord_x - self.prev_texcoord_x
        dy = self.texcoord_y - self.prev_texcoord_y
        if aspect < 1:
            dx *= aspect  # correctDeltaX (script.js:1553-1557)
        if aspect > 1:
            dy /= aspect  # correctDeltaY (script.js:1559-1563)
        self.delta_x = dx
        self.delta_y = dy
        self.moved = abs(dx) > 0 or abs(dy) > 0

    def on_up(self) -> None:
        self.down = False

    def drain(self, config: FluidConfig) -> Optional[Tuple]:
        """splatPointer (script.js:1421-1425): one splat if moved, clears flag."""
        if not self.moved:
            return None
        self.moved = False
        return (
            self.texcoord_x,
            self.texcoord_y,
            self.delta_x * config.SPLAT_FORCE,
            self.delta_y * config.SPLAT_FORCE,
            self.color,
        )


def random_splats(rng: np.random.Generator, n: int) -> List[Tuple]:
    """multipleSplats(n) (script.js:1427-1439): random pos, 10x color, +/-500 vel."""
    events = []
    for _ in range(n):
        r, g, b = generate_color_np(rng)
        color = (r * 10.0, g * 10.0, b * 10.0)
        x = float(rng.random())
        y = float(rng.random())
        dx = 1000.0 * (float(rng.random()) - 0.5)
        dy = 1000.0 * (float(rng.random()) - 0.5)
        events.append((x, y, dx, dy, color))
    return events


class ColorCycler:
    """Seeded color cycling (updateColors, script.js:1207-1217): every
    1/COLOR_UPDATE_SPEED accumulated sim-seconds, re-roll pointer colors."""

    def __init__(self, seed: int = 0):
        self.rng = np.random.default_rng(seed)
        self.timer = 0.0

    def tick(self, dt: float, config: FluidConfig, pointers: Sequence[Pointer]) -> None:
        if not config.COLORFUL:
            return
        self.timer += dt * config.COLOR_UPDATE_SPEED
        if self.timer >= 1.0:
            self.timer = wrap(self.timer, 0.0, 1.0)
            for p in pointers:
                p.color = generate_color_np(self.rng)


class PointerTracer:
    """Replays pixel-space pointer events into per-step splat batches.

    Events: (step, kind, pointer_id, x, y) with kind in {"down","move","up"},
    plus (step, "burst", n) for the spacebar random-splat stack
    (script.js:1522-1524). Deterministic given the seed.
    """

    def __init__(self, config: FluidConfig, seed: int = 0):
        self.config = config
        self.rng = np.random.default_rng(seed)
        self.pointers: Dict[int, Pointer] = {}
        self.cycler = ColorCycler(seed + 1)
        self.splat_stack: List[int] = []
        self._spill: List[Tuple] = []  # burst overflow carried to later steps

    def _pointer(self, pid: int) -> Pointer:
        if pid not in self.pointers:
            self.pointers[pid] = Pointer()
        return self.pointers[pid]

    def feed(self, kind: str, pid: int = -1, x: float = 0.0, y: float = 0.0,
             n: int = 0) -> None:
        if kind == "down":
            self._pointer(pid).on_down(pid, x, y, self.config, generate_color_np(self.rng))
        elif kind == "move":
            self._pointer(pid).on_move(x, y, self.config)
        elif kind == "up":
            self._pointer(pid).on_up()
        elif kind == "burst":
            self.splat_stack.append(n)
        else:
            raise ValueError(f"unknown event kind {kind!r}")

    def state_dict(self) -> dict:
        """Serializable snapshot of the FULL input-side session state: both
        RNG cursors (burst splats + color cycling), the color-cycle timer,
        every pointer's state machine, the pending splat stack and burst
        spill — everything ``drain_step`` reads. Restoring it makes an
        interactive session deterministic across a checkpoint boundary
        (SURVEY.md §5.4's 'trace cursor + RNG cursor')."""
        return {
            "rng": self.rng.bit_generator.state,
            "cycler_rng": self.cycler.rng.bit_generator.state,
            "cycler_timer": self.cycler.timer,
            "pointers": {str(pid): dataclasses.asdict(p)
                         for pid, p in self.pointers.items()},
            "splat_stack": list(self.splat_stack),
            "spill": [[x, y, dx, dy, list(c)]
                      for (x, y, dx, dy, c) in self._spill],
        }

    def load_state_dict(self, d: dict) -> None:
        self.rng.bit_generator.state = d["rng"]
        self.cycler.rng.bit_generator.state = d["cycler_rng"]
        self.cycler.timer = float(d["cycler_timer"])
        self.pointers = {}
        for pid, pd in d["pointers"].items():
            p = Pointer(**{**pd, "color": tuple(pd["color"])})
            self.pointers[int(pid)] = p
        self.splat_stack = [int(n) for n in d["splat_stack"]]
        self._spill = [(e[0], e[1], e[2], e[3], tuple(e[4])) for e in d["spill"]]

    def drain_step(self, dt: float) -> List[Tuple]:
        """applyInputs (script.js:1219-1229): pop one burst + drain moved pointers.

        The reference fires the whole burst inside one frame (multipleSplats);
        our per-step batch holds MAX_SPLATS rows, so a spacebar burst of up to
        24 (script.js:1522-1524) spills its overflow into the following steps
        (pointer splats keep their own slots each step).
        """
        self.cycler.tick(dt, self.config, list(self.pointers.values()))
        events: List[Tuple] = list(self._spill)
        self._spill = []
        if self.splat_stack:
            events.extend(random_splats(self.rng, self.splat_stack.pop()))
        pointer_events: List[Tuple] = []
        for p in self.pointers.values():
            e = p.drain(self.config)
            if e is not None:
                pointer_events.append(e)
        budget = self.config.MAX_SPLATS - len(pointer_events)
        if len(events) > budget:
            self._spill = events[budget:]
            events = events[:budget]
        return events + pointer_events


class Trace:
    """A recorded splat stream: (T, MAX_SPLATS, 8) float32, .npz-serializable.

    v2 records a per-step dt array ``dts`` (T,) — the reference recomputes
    dt = min(wall-elapsed, 1/60) every frame (calcDeltaTime, script.js:
    1188-1194), so a faithful interactive recording must carry frame jitter.
    v1 files (one scalar dt) load as a constant dts array.
    """

    def __init__(self, batches: np.ndarray, dt):
        assert batches.ndim == 3 and batches.shape[-1] == SPLAT_COLS
        self.batches = batches.astype(np.float32)
        dts = np.asarray(dt, np.float32).reshape(-1)
        if dts.size == 1:
            dts = np.full((self.batches.shape[0],), dts[0], np.float32)
        if dts.shape[0] != self.batches.shape[0]:
            raise ValueError(f"dts length {dts.shape[0]} != steps {self.batches.shape[0]}")
        # The reference clamps at record time too (script.js:1191) — at the
        # literal 0.016666, not 1/60 (config.MAX_DT).
        self.dts = np.minimum(dts, np.float32(MAX_DT))

    @property
    def num_steps(self) -> int:
        return self.batches.shape[0]

    @property
    def dt(self) -> float:
        """First-step dt (v1 compatibility: constant-rate traces)."""
        return float(self.dts[0]) if self.dts.size else 1.0 / 60.0

    def save(self, path: str) -> None:
        np.savez_compressed(path, batches=self.batches, dts=self.dts,
                            version=np.int32(2))

    @classmethod
    def load(cls, path: str) -> "Trace":
        data = np.load(path)
        if "dts" in data:
            return cls(data["batches"], data["dts"])
        return cls(data["batches"], float(data["dt"]))  # v1

    @classmethod
    def from_events(cls, per_step_events: Sequence[List[Tuple]], dt,
                    max_splats: int) -> "Trace":
        """``dt``: scalar (constant rate) or per-step sequence of seconds."""
        t = len(per_step_events)
        out = np.zeros((t, max_splats, SPLAT_COLS), dtype=np.float32)
        for i, events in enumerate(per_step_events):
            if len(events) > max_splats:
                raise ValueError(f"step {i}: {len(events)} events > MAX_SPLATS")
            for j, (x, y, dx, dy, color) in enumerate(events):
                out[i, j] = [x, y, dx, dy, color[0], color[1], color[2], 1.0]
        return cls(out, dt)


def generate_color(rng: np.random.Generator) -> Tuple[float, float, float]:
    """Public alias of the reference generateColor (script.js:1565-1571)."""
    return generate_color_np(rng)


def swirl_trace(config: FluidConfig, num_steps: int, dt: float = 1.0 / 60.0,
                seed: int = 0) -> Trace:
    """A canonical deterministic trace: one pointer swirling an ellipse plus a
    burst at step 0 — used by the replay benchmark (BASELINE config #3) and
    golden-frame tests."""
    tracer = PointerTracer(config, seed=seed)
    w, h = config.CANVAS_WIDTH, config.CANVAS_HEIGHT
    tracer.feed("burst", n=min(8, config.MAX_SPLATS - 1))
    tracer.feed("down", pid=0, x=w * 0.5, y=h * 0.5)
    per_step = []
    for t in range(num_steps):
        ang = 2.0 * np.pi * (t / 120.0)
        x = w * (0.5 + 0.3 * np.cos(ang))
        y = h * (0.5 + 0.3 * np.sin(2 * ang))
        tracer.feed("move", pid=0, x=x, y=y)
        per_step.append(tracer.drain_step(dt))
    return Trace.from_events(per_step, dt, config.MAX_SPLATS)
