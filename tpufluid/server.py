"""Interactive browser demo — the reference's index.html experience, served
by the TPU/CPU simulator.

The reference is a browser app: mouse/touch drags splat dye, space queues a
random burst, P pauses, and a dat.GUI panel tunes the config
(/root/reference/index.html, script.js:1464-1563, 208-281). This module
reproduces that loop headlessly: a background thread runs ONE fused
step+render dispatch per frame (tpufluid.render.make_step_and_render) and
JPEG-encodes the result; a tiny HTTP server streams frames to a canvas page
that posts pointer/keyboard/panel events back into the same pointer state
machine used for trace replay (tpufluid.trace.PointerTracer) — so an
interactive session can be recorded and replayed deterministically, with the
per-frame wall-clock dt (reference calcDeltaTime, script.js:1188-1194).

The served page carries the dat.GUI-equivalent control panel
(script.js:208-281): quality/sim-res dropdowns, dissipation / pressure /
vorticity / splat-radius sliders, shading/colorful toggles, Bloom and
Sunrays folders, background color + transparent, "Random splats", pause,
and "Take screenshot" (server-side captureScreenshot -> fluid.png download,
script.js:237,287-299).

Run:  python -m tpufluid.server --port 8000 --sim-res 128 --dye-res 512
"""

from __future__ import annotations

import argparse
import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

_PAGE = """<!DOCTYPE html>
<html><head><title>tpufluid</title><style>
html,body{margin:0;background:#000;height:100%;overflow:hidden;font:12px monospace}
img{width:100vw;height:100vh;object-fit:fill;cursor:crosshair;-webkit-user-drag:none;user-select:none}
#hud{position:fixed;top:8px;left:8px;color:#8f8;background:rgba(0,0,0,.5);padding:4px 8px}
#panel{position:fixed;top:8px;right:8px;width:240px;background:rgba(16,16,16,.88);color:#eee;
 padding:8px;border-radius:4px;max-height:95vh;overflow-y:auto}
#panel h4{margin:6px 0 2px;color:#7cf;border-bottom:1px solid #333;cursor:pointer}
#panel label{display:flex;justify-content:space-between;align-items:center;margin:3px 0}
#panel input[type=range]{width:120px}
#panel select{width:126px;background:#222;color:#eee;border:1px solid #444}
#panel button{width:100%;margin:3px 0;background:#234;color:#eee;border:1px solid #456;
 padding:4px;cursor:pointer;border-radius:3px}
#panel .val{color:#8f8;min-width:34px;text-align:right}
</style></head><body>
<img id="view" draggable="false"><div id="hud">tpufluid</div>
<div id="panel"></div>
<script>
const img = document.getElementById('view');
const hud = document.getElementById('hud');
let events = [];
function post() {
  if (events.length) {
    fetch('/events', {method: 'POST', body: JSON.stringify(events)});
    events = [];
  }
}
function setCfg(k, v) {
  const body = {}; body[k] = v;
  return fetch('/config', {method: 'POST', body: JSON.stringify(body)});
}
function xy(e) {
  const r = img.getBoundingClientRect();
  return [(e.clientX - r.left) / r.width, (e.clientY - r.top) / r.height];
}
let down = false;
img.addEventListener('mousedown', e => { down = true; const [x,y]=xy(e); events.push({k:'down',x,y}); post(); });
img.addEventListener('mousemove', e => { if(!down) return; const [x,y]=xy(e); events.push({k:'move',x,y}); });
window.addEventListener('mouseup', () => { down = false; events.push({k:'up'}); post(); });
img.addEventListener('touchstart', e => { e.preventDefault();
  for (const t of e.changedTouches) { const r = img.getBoundingClientRect();
    events.push({k:'down', id:t.identifier, x:(t.clientX-r.left)/r.width, y:(t.clientY-r.top)/r.height}); } post(); }, {passive:false});
img.addEventListener('touchmove', e => { e.preventDefault();
  for (const t of e.changedTouches) { const r = img.getBoundingClientRect();
    events.push({k:'move', id:t.identifier, x:(t.clientX-r.left)/r.width, y:(t.clientY-r.top)/r.height}); } }, {passive:false});
window.addEventListener('touchend', e => {
  for (const t of e.changedTouches) events.push({k:'up', id:t.identifier}); post(); });
window.addEventListener('keydown', e => {
  if (e.code === 'KeyP') events.push({k:'pause'});
  if (e.key === ' ') events.push({k:'burst'});
  post();
});
setInterval(post, 33);

// ---- control panel (the dat.GUI analog, script.js:208-281) ----
const panel = document.getElementById('panel');
function folder(name, open=true) {
  const h = document.createElement('h4'); h.textContent = name;
  const box = document.createElement('div');
  if (!open) box.style.display = 'none';
  h.onclick = () => box.style.display = box.style.display === 'none' ? '' : 'none';
  panel.appendChild(h); panel.appendChild(box);
  return box;
}
function slider(box, label, key, min, max, step, value) {
  const l = document.createElement('label');
  l.innerHTML = label + ' <input type="range" min="'+min+'" max="'+max+'" step="'+step+
    '" value="'+value+'"><span class="val">'+value+'</span>';
  const inp = l.querySelector('input'), val = l.querySelector('.val');
  inp.oninput = () => val.textContent = inp.value;
  inp.onchange = () => setCfg(key, parseFloat(inp.value));
  box.appendChild(l);
}
function toggle(box, label, key, value, fn) {
  const l = document.createElement('label');
  l.innerHTML = label + ' <input type="checkbox"' + (value ? ' checked' : '') + '>';
  const inp = l.querySelector('input');
  inp.onchange = () => fn ? fn(inp.checked) : setCfg(key, inp.checked);
  box.appendChild(l);
}
function dropdown(box, label, key, options, value, str) {
  const l = document.createElement('label');
  l.innerHTML = label + ' <select>' + options.map(o =>
    '<option value="'+o[1]+'"'+(o[1]===value?' selected':'')+'>'+o[0]+'</option>').join('') + '</select>';
  l.querySelector('select').onchange = e => setCfg(key, str ? e.target.value : parseInt(e.target.value));
  box.appendChild(l);
}
function button(box, label, fn) {
  const b = document.createElement('button'); b.textContent = label; b.onclick = fn;
  box.appendChild(b);
}
fetch('/config').then(r => r.json()).then(cfg => {
  const main = folder('tpufluid');
  dropdown(main, 'quality', 'DYE_RESOLUTION',
    [['high',1024],['medium',512],['low',256],['very low',128]], cfg.DYE_RESOLUTION);
  dropdown(main, 'sim resolution', 'SIM_RESOLUTION',
    [['32',32],['64',64],['128',128],['256',256]], cfg.SIM_RESOLUTION);
  slider(main, 'density diffusion', 'DENSITY_DISSIPATION', 0, 4, 0.01, cfg.DENSITY_DISSIPATION);
  slider(main, 'velocity diffusion', 'VELOCITY_DISSIPATION', 0, 4, 0.01, cfg.VELOCITY_DISSIPATION);
  slider(main, 'pressure', 'PRESSURE', 0, 1, 0.01, cfg.PRESSURE);
  slider(main, 'vorticity', 'CURL', 0, 50, 1, cfg.CURL);
  slider(main, 'splat radius', 'SPLAT_RADIUS', 0.01, 1, 0.01, cfg.SPLAT_RADIUS);
  toggle(main, 'shading', 'SHADING', cfg.SHADING);
  toggle(main, 'colorful', 'COLORFUL', cfg.COLORFUL);
  toggle(main, 'paused', null, false, v => { events.push({k:'pause', v:v}); post(); });
  button(main, 'Random splats', () => { events.push({k:'burst'}); post(); });
  const bloom = folder('Bloom');
  toggle(bloom, 'enabled', 'BLOOM', cfg.BLOOM);
  slider(bloom, 'intensity', 'BLOOM_INTENSITY', 0.1, 2, 0.01, cfg.BLOOM_INTENSITY);
  slider(bloom, 'threshold', 'BLOOM_THRESHOLD', 0, 1, 0.01, cfg.BLOOM_THRESHOLD);
  const rays = folder('Sunrays');
  toggle(rays, 'enabled', 'SUNRAYS', cfg.SUNRAYS);
  slider(rays, 'weight', 'SUNRAYS_WEIGHT', 0.3, 1, 0.01, cfg.SUNRAYS_WEIGHT);
  // TPU storage knobs (no dat.GUI counterpart: the reference's half-float
  // format is fixed at startup; here dtype + packed-dye are live-switchable).
  const st = folder('Storage', false);
  dropdown(st, 'dtype', 'DTYPE',
    [['float32','float32'],['bfloat16','bfloat16'],['float16','float16']], cfg.DTYPE, true);
  toggle(st, 'rgb9e5 dye (bf16)', 'DYE_RGB9E5', cfg.DYE_RGB9E5);
  const cap = folder('Capture');
  const l = document.createElement('label');
  l.innerHTML = 'background <input type="color" value="#000000">';
  l.querySelector('input').onchange = e => {
    const v = e.target.value;
    setCfg('BACK_COLOR', [parseInt(v.slice(1,3),16), parseInt(v.slice(3,5),16), parseInt(v.slice(5,7),16)]);
  };
  cap.appendChild(l);
  toggle(cap, 'transparent', 'TRANSPARENT', cfg.TRANSPARENT);
  button(cap, 'Take screenshot', () => {
    const a = document.createElement('a');
    a.href = '/screenshot?' + Date.now(); a.download = 'fluid.png'; a.click();
  });
});

// ---- live canvas resize (reference resizeCanvas, script.js:1178-1179,
// 1196-1205: on size change, FBOs re-init with the fields GPU-resampled).
// The sim canvas tracks the window proportionally (the streaming-bandwidth
// analog of devicePixelRatio scaling); debounced so a drag-resize lands as
// one reconfigure, which runs resize_state live on the server.
let baseW = window.innerWidth, baseH = window.innerHeight, rsTimer = null;
window.addEventListener('resize', () => {
  clearTimeout(rsTimer);
  rsTimer = setTimeout(() => {
    const sw = window.innerWidth / baseW, sh = window.innerHeight / baseH;
    if (Math.abs(sw - 1) < 0.02 && Math.abs(sh - 1) < 0.02) return;
    fetch('/config').then(r => r.json()).then(cfg => {
      const w = Math.max(64, Math.round(cfg.CANVAS_WIDTH * sw));
      const h = Math.max(64, Math.round(cfg.CANVAS_HEIGHT * sh));
      baseW = window.innerWidth; baseH = window.innerHeight;
      fetch('/config', {method: 'POST',
        body: JSON.stringify({CANVAS_WIDTH: w, CANVAS_HEIGHT: h})});
    });
  }, 250);
});

let frames = 0, t0 = performance.now();
function tick() {
  const next = new Image();
  next.onload = () => {
    img.src = next.src; frames++;
    const dt = performance.now() - t0;
    if (dt > 1000) { hud.textContent = 'tpufluid  ' + (frames*1000/dt).toFixed(0) + ' fps'; frames = 0; t0 = performance.now(); }
    requestAnimationFrame(tick);
  };
  next.onerror = () => setTimeout(tick, 200);
  next.src = '/frame?' + Date.now();
}
tick();
</script></body></html>"""

# calcDeltaTime clamp: the reference's LITERAL 0.016666, not 1/60
# (script.js:1191). Keep equal to tpufluid.config.MAX_DT (not imported here:
# module import stays jax-free until a server is constructed).
MAX_DT = 0.016666


class FluidServer:
    """Owns the sim loop; thread-safe event queue + latest JPEG frame.

    Backpressure contract (round-4): the sim loop can never be stopped by
    clients. Handlers that need the sim lock acquire it with a BOUNDED
    wait (EVENT_LOCK_TIMEOUT_S) and fail fast (503) if a slow tick — e.g.
    a live-reconfigure recompile — holds it; at most MAX_INFLIGHT_EVENTS
    event posts may queue on the lock at once (the bounded event queue —
    excess posts 503 immediately instead of stacking handler threads);
    and every connection carries a socket timeout (make_handler), so a
    deliberately stalled client wedges only its own connection. The
    reference's loop has the same property for free — browser input events
    never block the rAF loop (script.js:1176-1186)."""

    # Bounded wait for the sim lock in client-facing paths: longer than
    # any healthy drain/tick hold (ms), far shorter than a recompile.
    EVENT_LOCK_TIMEOUT_S = 2.0
    # Bounded event queue: concurrent /events posts allowed to WAIT on the
    # lock; beyond this the handler 503s instead of growing a thread pile.
    MAX_INFLIGHT_EVENTS = 32

    def __init__(self, config, seed: int = 0, quality: int = 80,
                 resume: Optional[str] = None,
                 dither_path: Optional[str] = None):
        from tpufluid import init_state
        from tpufluid.render import make_render, make_step_and_render
        from tpufluid.trace import PointerTracer

        self.state = None
        self._resume_state = None
        self.steps_done = 0
        if resume:
            # Deterministic interactive resume: the checkpoint carries the
            # field state AND the tracer session state (both RNG cursors,
            # pointer machines, pending bursts) — tpufluid.checkpoint.
            from tpufluid.checkpoint import load_state

            self._resume_state, config, self.steps_done, extra = load_state(resume)
            self.config = config
            self.tracer = PointerTracer(config, seed=seed)
            if "tracer" in extra:
                self.tracer.load_state_dict(extra["tracer"])
        else:
            self.config = config
            self.tracer = PointerTracer(config, seed=seed)
        self._init_state = init_state
        # Optional external dither texture (the reference's LDR_LLL1_0.png
        # analog, script.js:960): a PATH, baked into the compiled frame.
        self.dither_path = dither_path
        self._dither = None
        if dither_path is not None:
            import jax.numpy as jnp

            from tpufluid.io import load_dither

            self._dither = jnp.asarray(load_dither(dither_path))
        # One fused step+render+quantize dispatch per frame.
        self.tick = make_step_and_render(config, dither_path=dither_path)
        self.render = make_render(config)
        self.quality = quality
        self.paused = False
        self.lock = threading.Lock()
        # The sim thread holds self.lock for the WHOLE tick (the fused step
        # donates buffers), so latency-sensitive read-only endpoints
        # (/frame, /stats) use this separate lock, which only ever guards
        # sub-millisecond attribute swaps — a slow or contended tick can no
        # longer stall frame polling (round-2 verdict: parallel test runs
        # timed those handlers out).
        self.out_lock = threading.Lock()
        self.frame_bytes: Optional[bytes] = None
        # Per-step splat batches + wall dts for Trace v2 export; capped at
        # ~10 minutes of session so a long server doesn't grow unbounded.
        self.recorded = []
        self.recorded_dts = []
        self.max_recorded = 36000
        self._mobile_applied = False
        self._stop = threading.Event()
        # Admission control for /events (see class docstring): counts
        # handlers currently queued on self.lock.
        self._event_slots = threading.BoundedSemaphore(
            self.MAX_INFLIGHT_EVENTS)

    def _acquire_or_503(self):
        """Bounded sim-lock acquire for client-facing paths; raises
        TimeoutError (mapped to 503 by the handlers) when a slow tick —
        e.g. a reconfigure recompile — holds the lock past the bound, so
        handler threads never stack up behind it indefinitely."""
        if not self.lock.acquire(timeout=self.EVENT_LOCK_TIMEOUT_S):
            raise TimeoutError(
                f"sim lock not acquired within {self.EVENT_LOCK_TIMEOUT_S}s "
                f"(tick or reconfigure in progress)")

    def maybe_mobile_downgrade(self, user_agent: Optional[str]) -> bool:
        """Auto-apply the mobile preset when a mobile client loads the page —
        the reference detects mobile at startup and drops DYE_RESOLUTION to
        512 (isMobile() /Mobi|Android/i, script.js:283-285, applied
        script.js:106-108). Applied at most once per server session (the
        reference applies it once, before any dat.GUI interaction) and only
        downward, so a desktop user's deliberate setting is never raised."""
        import re

        if self._mobile_applied or not re.search(r"Mobi|Android",
                                                 user_agent or "", re.I):
            return False
        if self.config.DYE_RESOLUTION > 512:
            try:
                self.reconfigure({"DYE_RESOLUTION": 512})
            except TimeoutError:
                # Sim lock busy past the bound: serve the page anyway and
                # leave the downgrade armed for the next mobile page load.
                return False
        self._mobile_applied = True
        return True

    def reconfigure(self, updates: dict) -> dict:
        """Live config change — the dat.GUI behavior (script.js:208-281):
        resolution changes rebuild the fields (initFramebuffers: dye/velocity
        resampled, pressure re-created), toggles re-specialize the jitted
        functions (updateKeywords). Returns the new config as a dict."""
        import dataclasses

        from tpufluid import FluidConfig
        from tpufluid.render import make_render, make_step_and_render
        from tpufluid.state import resize_state

        self._acquire_or_503()
        try:
            cfg = dataclasses.replace(self.config, **updates).validate()
            new_tick = make_step_and_render(cfg, dither_path=self.dither_path)
            new_render = make_render(cfg)
            if self.state is not None:
                self.state = resize_state(self.state, cfg)
            if cfg.MAX_SPLATS != self.config.MAX_SPLATS:
                self.recorded = []  # trace batches are shape-homogeneous
                self.recorded_dts = []
            self.config = cfg
            self.tracer.config = cfg
            self.tick = new_tick
            self.render = new_render
            return dataclasses.asdict(cfg)
        finally:
            self.lock.release()

    def handle_events(self, events) -> None:
        # Bounded event queue + bounded lock wait (class docstring): a
        # stalled tick turns excess event posts into fast 503s instead of
        # an unbounded handler-thread pile — raises TimeoutError for the
        # handler's 503 path.
        if not self._event_slots.acquire(blocking=False):
            raise TimeoutError(
                f"more than {self.MAX_INFLIGHT_EVENTS} event posts queued")
        try:
            self._acquire_or_503()
            try:
                w, h = self.config.CANVAS_WIDTH, self.config.CANVAS_HEIGHT
                for e in events:
                    k = e.get("k")
                    pid = int(e.get("id", 0))  # multitouch: one per id
                    if k == "down":
                        self.tracer.feed("down", pid=pid,
                                         x=e["x"] * w, y=e["y"] * h)
                    elif k == "move":
                        self.tracer.feed("move", pid=pid,
                                         x=e["x"] * w, y=e["y"] * h)
                    elif k == "up":
                        self.tracer.feed("up", pid=pid)
                    elif k == "burst":
                        self.tracer.feed(
                            "burst",
                            n=int(np.random.default_rng().integers(5, 25)))
                    elif k == "pause":
                        # absolute set from the panel checkbox, toggle
                        # from 'P'
                        self.paused = (bool(e["v"]) if "v" in e
                                       else not self.paused)
            finally:
                self.lock.release()
        finally:
            self._event_slots.release()

    def screenshot_png(self) -> Optional[bytes]:
        """Server-side captureScreenshot (script.js:237,287-299) -> PNG bytes,
        or None before the sim thread produced its first state."""
        from tpufluid.io import frame_to_uint8
        from tpufluid.render import capture_frame

        from PIL import Image

        self._acquire_or_503()
        try:
            state, cfg = self.state, self.config
            if state is None:
                return None
            frame = np.asarray(capture_frame(state, cfg, dither=self._dither))
        finally:
            self.lock.release()
        arr = frame_to_uint8(frame)
        buf = io.BytesIO()
        Image.fromarray(arr, "RGBA" if arr.shape[-1] == 4 else "RGB").save(buf, "PNG")
        return buf.getvalue()

    def checkpoint_bytes(self) -> Optional[bytes]:
        """Full-session checkpoint (.npz): field state + config + step count
        + tracer session state — resumable via FluidServer(resume=path)."""
        import jax
        import jax.numpy as jnp

        from tpufluid.checkpoint import save_state

        self._acquire_or_503()
        try:
            if self.state is None:
                return None
            step = self.steps_done
            tracer_state = self.tracer.state_dict()
            # Device-side copy only under the lock (the next tick donates
            # self.state's buffers); transfer + deflate run outside so the
            # sim loop and event handling never stall on serialization.
            state = jax.tree.map(jnp.copy, self.state)
        finally:
            self.lock.release()
        buf = io.BytesIO()
        save_state(buf, state, self.config, step=step,
                   extra={"tracer": tracer_state})
        return buf.getvalue()

    def run(self):
        import jax.numpy as jnp

        from tpufluid.io import frame_to_uint8
        from tpufluid.ops.splat import SPLAT_COLS

        from PIL import Image

        if self._resume_state is not None:
            self.state = self._resume_state
            self._resume_state = None
        else:
            self.state = self._init_state(self.config)
            # initial random burst, like the reference's startup (script.js:1170)
            with self.lock:
                self.tracer.splat_stack.append(int(np.random.default_rng().integers(5, 25)))

        last = time.time()
        while not self._stop.is_set():
            t_frame = time.time()
            # The reference recomputes dt from wall time each frame,
            # clamped to 1/60 (calcDeltaTime, script.js:1188-1194).
            dt_wall = min(t_frame - last, MAX_DT)
            last = t_frame
            # The whole tick holds the lock: the fused step donates the state
            # buffers, so a concurrent reconfigure() must never see a
            # mid-step state. HTTP handlers only hold the lock briefly.
            with self.lock:
                events = self.tracer.drain_step(dt_wall)
                paused = self.paused
                max_s = self.config.MAX_SPLATS
                batch = np.zeros((max_s, SPLAT_COLS), np.float32)
                for i, (x, y, dx, dy, color) in enumerate(events[:max_s]):
                    batch[i] = [x, y, dx, dy, color[0], color[1], color[2], 1.0]
                if len(self.recorded) < self.max_recorded:
                    self.recorded.append(batch)
                    self.recorded_dts.append(dt_wall)
                if paused:
                    frame = frame_to_uint8(np.asarray(
                        self.render(self.state, self._dither)))[..., :3]
                else:
                    self.state, rgb = self.tick(self.state, jnp.float32(dt_wall),
                                                jnp.asarray(batch))
                    frame = np.asarray(rgb)
            buf = io.BytesIO()
            Image.fromarray(frame, "RGB").save(buf, "JPEG", quality=self.quality)
            with self.out_lock:
                self.frame_bytes = buf.getvalue()
                self.steps_done += 1
            # pace roughly like the reference's rAF (60 Hz cap)
            left = MAX_DT - (time.time() - t_frame)
            if left > 0:
                time.sleep(left)

    def stop(self):
        self._stop.set()


def make_handler(server: FluidServer):
    class Handler(BaseHTTPRequestHandler):
        # Socket timeout on EVERY connection (StreamRequestHandler.setup
        # applies it to reads and writes): a deliberately stalled client —
        # half-sent request line, or a receiver that never drains — times
        # out and frees its handler thread instead of holding it forever.
        # Each connection gets its own thread (ThreadingHTTPServer), so a
        # wedged client never stalls the sim loop either way; this bounds
        # the thread pile (tests/test_server.py::test_stalled_client).
        timeout = 15

        def log_message(self, *a):  # quiet
            pass

        def handle_one_request(self):
            # A frame client that navigates away mid-write is routine, not an
            # error: swallow the broken pipe instead of spamming the handler
            # thread with tracebacks.
            try:
                super().handle_one_request()
            except (BrokenPipeError, ConnectionResetError):
                self.close_connection = True

        def _send(self, data: bytes, ctype: str, extra=()):
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Cache-Control", "no-store")
            for k, v in extra:
                self.send_header(k, v)
            self.end_headers()
            self.wfile.write(data)

        def _send_or_503(self, data, ctype: str, extra=()):
            """503 for not-ready resources (e.g. before the first sim tick)."""
            if data is None:
                self.send_response(503)
                self.end_headers()
                return
            self._send(data, ctype, extra)

        def do_GET(self):
            if self.path in ("/", "") or self.path.startswith("/?"):
                # Page load: apply the reference's mobile startup downgrade
                # before the panel fetches /config (script.js:106-108).
                server.maybe_mobile_downgrade(self.headers.get("User-Agent"))
                self._send(_PAGE.encode(), "text/html")
            elif self.path.startswith("/frame"):
                with server.out_lock:
                    data = server.frame_bytes
                self._send_or_503(data, "image/jpeg")
            elif self.path.startswith("/screenshot"):
                try:
                    data = server.screenshot_png()
                except TimeoutError:
                    data = None  # tick holds the sim lock -> bounded 503
                self._send_or_503(data, "image/png",
                                  [("Content-Disposition", "attachment; filename=fluid.png")])
            elif self.path.startswith("/checkpoint.npz"):
                try:
                    data = server.checkpoint_bytes()
                except TimeoutError:
                    data = None
                self._send_or_503(data,
                                  "application/octet-stream",
                                  [("Content-Disposition",
                                    "attachment; filename=fluid_session.npz")])
            elif self.path.startswith("/trace.npz"):
                # Export the interactive session as a deterministic replay
                # trace (tpufluid.trace.Trace v2: per-step wall dt).
                try:
                    server._acquire_or_503()
                except TimeoutError:
                    self._send_or_503(None, "application/octet-stream")
                    return
                try:
                    batches = np.stack(server.recorded) if server.recorded else \
                        np.zeros((0, server.config.MAX_SPLATS, 8), np.float32)
                    dts = np.asarray(server.recorded_dts, np.float32)
                finally:
                    server.lock.release()
                buf = io.BytesIO()
                np.savez_compressed(buf, batches=batches, dts=dts,
                                    version=np.int32(2))
                self._send(buf.getvalue(), "application/octet-stream")
            elif self.path.startswith("/config"):
                import dataclasses

                try:
                    server._acquire_or_503()
                except TimeoutError:
                    self._send_or_503(None, "application/json")
                    return
                try:
                    body = json.dumps(dataclasses.asdict(server.config)).encode()
                finally:
                    server.lock.release()
                self._send(body, "application/json")
            elif self.path.startswith("/stats"):
                with server.out_lock:
                    out = {"steps": server.steps_done, "paused": server.paused}
                self._send(json.dumps(out).encode(), "application/json")
            else:
                self._send(_PAGE.encode(), "text/html")

        def do_POST(self):
            if self.path.startswith("/events"):
                n = int(self.headers.get("Content-Length", 0))
                try:
                    events = json.loads(self.rfile.read(n) or b"[]")
                    server.handle_events(events)
                    self.send_response(204)
                except TimeoutError:
                    # Backpressure, not client error: the queue is full or
                    # a slow tick holds the sim lock past the bound.
                    self.send_response(503)
                except Exception:
                    self.send_response(400)
                self.end_headers()
            elif self.path.startswith("/config"):
                n = int(self.headers.get("Content-Length", 0))
                try:
                    updates = json.loads(self.rfile.read(n) or b"{}")
                    # JSON gives lists for tuples (BACK_COLOR).
                    if "BACK_COLOR" in updates:
                        updates["BACK_COLOR"] = tuple(updates["BACK_COLOR"])
                    cfg = server.reconfigure(updates)
                    body = json.dumps(cfg).encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "application/json")
                    self.end_headers()
                    self.wfile.write(body)
                except TimeoutError:
                    self.send_response(503)
                    self.end_headers()
                except (TypeError, ValueError) as e:
                    self.send_response(400)
                    self.end_headers()
                    self.wfile.write(str(e).encode())
            else:
                self.send_response(404)
                self.end_headers()

    return Handler


def main(argv=None):
    import os

    if os.environ.get("TPUFLUID_DEVICE", "").lower() == "cpu":
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    from tpufluid import FluidConfig

    p = argparse.ArgumentParser(prog="tpufluid.server", description=__doc__)
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--sim-res", type=int, default=128)
    p.add_argument("--dye-res", type=int, default=512)
    p.add_argument("--canvas", type=str, default="640x360")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--no-bloom", action="store_true")
    p.add_argument("--no-sunrays", action="store_true")
    p.add_argument("--resume", type=str, default=None,
                   help="resume an interactive session from a /checkpoint.npz "
                        "download (fields + config + tracer RNG cursors)")
    p.add_argument("--dither", type=str, default=None,
                   help="external dither texture PNG (R channel, ditherScale "
                        "tiling — the reference's LDR_LLL1_0.png analog, "
                        "script.js:960,1626-1631)")
    args = p.parse_args(argv)

    cw, ch = (int(x) for x in args.canvas.split("x"))
    config = FluidConfig(SIM_RESOLUTION=args.sim_res, DYE_RESOLUTION=args.dye_res,
                         CANVAS_WIDTH=cw, CANVAS_HEIGHT=ch,
                         BLOOM=not args.no_bloom, SUNRAYS=not args.no_sunrays).validate()
    server = FluidServer(config, seed=args.seed, resume=args.resume,
                         dither_path=args.dither)
    sim_thread = threading.Thread(target=server.run, daemon=True)
    sim_thread.start()

    httpd = ThreadingHTTPServer(("127.0.0.1", args.port), make_handler(server))
    print(f"tpufluid interactive demo at http://127.0.0.1:{args.port}/")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        server.stop()


if __name__ == "__main__":
    main()
