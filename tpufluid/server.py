"""Interactive browser demo — the reference's index.html experience, served
by the TPU/CPU simulator.

The reference is a browser app: mouse/touch drags splat dye, space queues a
random burst, P pauses, and a dat.GUI panel tunes the config
(/root/reference/index.html, script.js:1464-1563, 208-281). This module
reproduces that loop headlessly: a background thread steps the simulation and
renders JPEG frames; a tiny HTTP server streams them to a canvas page that
posts pointer/keyboard events back into the same pointer state machine used
for trace replay (tpufluid.trace.PointerTracer) — so an interactive session
can be recorded and replayed deterministically.

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
html,body{margin:0;background:#000;height:100%;overflow:hidden}
img{width:100vw;height:100vh;object-fit:fill;cursor:crosshair;-webkit-user-drag:none;user-select:none}
#hud{position:fixed;top:8px;left:8px;color:#8f8;font:12px monospace;background:rgba(0,0,0,.5);padding:4px 8px}
</style></head><body>
<img id="view" draggable="false"><div id="hud">tpufluid</div>
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


class FluidServer:
    """Owns the sim loop; thread-safe event queue + latest JPEG frame."""

    def __init__(self, config, seed: int = 0, quality: int = 80):
        from tpufluid import init_state, make_render, make_step
        from tpufluid.trace import PointerTracer

        self.config = config
        self.tracer = PointerTracer(config, seed=seed)
        self.state = None
        self._init_state = init_state
        self.step = make_step(config)
        self.render = make_render(config)
        self.quality = quality
        self.paused = False
        self.lock = threading.Lock()
        self.frame_bytes: Optional[bytes] = None
        self.steps_done = 0
        # Per-step splat batches for Trace export; capped at ~10 minutes of
        # session so a long-running server doesn't grow without bound.
        self.recorded = []
        self.max_recorded = 36000
        self._stop = threading.Event()

    def reconfigure(self, updates: dict) -> dict:
        """Live config change — the dat.GUI behavior (script.js:208-281):
        resolution changes rebuild the fields with a resample
        (initFramebuffers), toggles re-specialize the jitted functions
        (updateKeywords). Returns the new config as a dict."""
        import dataclasses

        from tpufluid import FluidConfig, make_render, make_step
        from tpufluid.state import resize_state

        with self.lock:
            cfg = dataclasses.replace(self.config, **updates).validate()
            new_step = make_step(cfg)
            new_render = make_render(cfg)
            if self.state is not None:
                self.state = resize_state(self.state, cfg)
            if cfg.MAX_SPLATS != self.config.MAX_SPLATS:
                self.recorded = []  # trace batches are shape-homogeneous
            self.config = cfg
            self.tracer.config = cfg
            self.step = new_step
            self.render = new_render
            return dataclasses.asdict(cfg)

    def handle_events(self, events) -> None:
        w, h = self.config.CANVAS_WIDTH, self.config.CANVAS_HEIGHT
        with self.lock:
            for e in events:
                k = e.get("k")
                pid = int(e.get("id", 0))  # multitouch: one pointer per id
                if k == "down":
                    self.tracer.feed("down", pid=pid, x=e["x"] * w, y=e["y"] * h)
                elif k == "move":
                    self.tracer.feed("move", pid=pid, x=e["x"] * w, y=e["y"] * h)
                elif k == "up":
                    self.tracer.feed("up", pid=pid)
                elif k == "burst":
                    self.tracer.feed("burst", n=int(np.random.default_rng().integers(5, 25)))
                elif k == "pause":
                    self.paused = not self.paused

    def run(self):
        import jax
        import jax.numpy as jnp

        from tpufluid.io import frame_to_uint8
        from tpufluid.ops.splat import SPLAT_COLS

        from PIL import Image

        self.state = self._init_state(self.config)
        # initial random burst, like the reference's startup (script.js:1170)
        with self.lock:
            self.tracer.splat_stack.append(int(np.random.default_rng().integers(5, 25)))

        dt = jnp.float32(1.0 / 60.0)
        while not self._stop.is_set():
            t_frame = time.time()
            # The whole tick holds the lock: make_step donates the state
            # buffers, so a concurrent reconfigure() must never see a
            # mid-step state. HTTP handlers only hold the lock briefly.
            with self.lock:
                events = self.tracer.drain_step(1.0 / 60.0)
                paused = self.paused
                max_s = self.config.MAX_SPLATS
                batch = np.zeros((max_s, SPLAT_COLS), np.float32)
                for i, (x, y, dx, dy, color) in enumerate(events[:max_s]):
                    batch[i] = [x, y, dx, dy, color[0], color[1], color[2], 1.0]
                if len(self.recorded) < self.max_recorded:
                    self.recorded.append(batch)
                if not paused:
                    self.state = self.step(self.state, dt, jnp.asarray(batch))
                frame = frame_to_uint8(np.asarray(self.render(self.state)))[..., :3]
            buf = io.BytesIO()
            Image.fromarray(frame, "RGB").save(buf, "JPEG", quality=self.quality)
            with self.lock:
                self.frame_bytes = buf.getvalue()
                self.steps_done += 1
            # pace roughly like the reference's rAF (60 Hz cap)
            left = 1.0 / 60.0 - (time.time() - t_frame)
            if left > 0:
                time.sleep(left)

    def stop(self):
        self._stop.set()


def make_handler(server: FluidServer):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def do_GET(self):
            if self.path.startswith("/frame"):
                with server.lock:
                    data = server.frame_bytes
                if data is None:
                    self.send_response(503)
                    self.end_headers()
                    return
                self.send_response(200)
                self.send_header("Content-Type", "image/jpeg")
                self.send_header("Cache-Control", "no-store")
                self.end_headers()
                self.wfile.write(data)
            elif self.path.startswith("/trace.npz"):
                # Export the interactive session as a deterministic replay
                # trace (tpufluid.trace.Trace format).
                import io as _io

                with server.lock:
                    batches = np.stack(server.recorded) if server.recorded else \
                        np.zeros((0, server.config.MAX_SPLATS, 8), np.float32)
                buf = _io.BytesIO()
                np.savez_compressed(buf, batches=batches, dt=np.float64(1.0 / 60.0))
                self.send_response(200)
                self.send_header("Content-Type", "application/octet-stream")
                self.end_headers()
                self.wfile.write(buf.getvalue())
            elif self.path.startswith("/stats"):
                with server.lock:
                    out = {"steps": server.steps_done, "paused": server.paused}
                body = json.dumps(out).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(body)
            else:
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.end_headers()
                self.wfile.write(_PAGE.encode())

        def do_POST(self):
            if self.path.startswith("/events"):
                n = int(self.headers.get("Content-Length", 0))
                try:
                    events = json.loads(self.rfile.read(n) or b"[]")
                    server.handle_events(events)
                    self.send_response(204)
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
                except (TypeError, ValueError) as e:
                    self.send_response(400)
                    self.end_headers()
                    self.wfile.write(str(e).encode())
            else:
                self.send_response(404)
                self.end_headers()

    return Handler


def main(argv=None):
    from tpufluid import FluidConfig

    p = argparse.ArgumentParser(prog="tpufluid.server", description=__doc__)
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--sim-res", type=int, default=128)
    p.add_argument("--dye-res", type=int, default=512)
    p.add_argument("--canvas", type=str, default="640x360")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--no-bloom", action="store_true")
    p.add_argument("--no-sunrays", action="store_true")
    args = p.parse_args(argv)

    cw, ch = (int(x) for x in args.canvas.split("x"))
    config = FluidConfig(SIM_RESOLUTION=args.sim_res, DYE_RESOLUTION=args.dye_res,
                         CANVAS_WIDTH=cw, CANVAS_HEIGHT=ch,
                         BLOOM=not args.no_bloom, SUNRAYS=not args.no_sunrays).validate()
    server = FluidServer(config, seed=args.seed)
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
