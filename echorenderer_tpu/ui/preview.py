"""Live render preview: a web dashboard, the TPU-era analogue of the
reference's SDL2/ImGui GUI (Echo.UserInterface — SchedulerUI progress,
RenderUI statistics tables, ViewerUI live tile updates; SURVEY.md §2b row
'SDL2 + cimgui': a web/terminal dashboard is the idiomatic replacement).

A render loop publishes frames/progress into a `PreviewState`;
`PreviewServer` serves:
    /            auto-refreshing viewer page
    /frame.png   current image (tonemapped sRGB PNG)
    /status.json progress, noise, samples/sec, operation states, statistics

Stdlib http.server on a background thread — zero dependencies, works over
any port forward.
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

_PAGE = """<!doctype html>
<html><head><title>echorenderer-tpu</title>
<style>
 body { background:#111; color:#ddd; font-family:monospace; margin:2em; }
 img { image-rendering:pixelated; border:1px solid #333; max-width:95vw; }
 td { padding:0 1em 0 0; }
</style></head>
<body>
<h2>echorenderer-tpu live preview</h2>
<img id="frame" src="/frame.png"/>
<table id="stats"></table>
<script>
 async function tick() {
   try {
     const r = await fetch('/status.json'); const s = await r.json();
     document.getElementById('stats').innerHTML =
       Object.entries(s).map(([k,v]) =>
         `<tr><td>${k}</td><td>${typeof v==='object'?JSON.stringify(v):v}</td></tr>`).join('');
     document.getElementById('frame').src = '/frame.png?' + Date.now();
   } catch (e) {}
   setTimeout(tick, 1000);
 }
 tick();
</script>
</body></html>"""


class PreviewState:
    """Thread-safe bridge between the render loop and the HTTP server."""

    def __init__(self):
        self._lock = threading.Lock()
        self._png: bytes | None = None
        self._status: dict = {"state": "idle"}
        self._start = time.time()

    def publish_frame(self, image: np.ndarray, *, tonemap: bool = True):
        """Publish an (H, W, C) linear image (row 0 = bottom)."""
        import tempfile
        from pathlib import Path

        from ..io.images import save_png

        img = np.asarray(image)[..., :3]
        if tonemap:
            img = img / (1.0 + img)  # cheap reinhard for display

        with tempfile.NamedTemporaryFile(suffix=".png", delete=False) as f:
            tmp = f.name
        save_png(tmp, img)
        data = Path(tmp).read_bytes()
        Path(tmp).unlink(missing_ok=True)
        with self._lock:
            self._png = data

    def publish_status(self, **kw):
        with self._lock:
            self._status.update(kw)
            self._status["uptime_s"] = round(time.time() - self._start, 1)

    def frame_png(self) -> bytes | None:
        with self._lock:
            return self._png

    def status(self) -> dict:
        with self._lock:
            return dict(self._status)


class PreviewServer:
    """Background HTTP server bound to `state`."""

    def __init__(self, state: PreviewState, host: str = "127.0.0.1", port: int = 0):
        self.state = state
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # silence
                pass

            def do_GET(self):
                path = self.path.split("?")[0]
                if path == "/":
                    body = _PAGE.encode()
                    self._send(200, "text/html", body)
                elif path == "/frame.png":
                    png = outer.state.frame_png()
                    if png is None:
                        self._send(404, "text/plain", b"no frame yet")
                    else:
                        self._send(200, "image/png", png)
                elif path == "/status.json":
                    self._send(
                        200, "application/json",
                        json.dumps(outer.state.status()).encode(),
                    )
                else:
                    self._send(404, "text/plain", b"not found")

            def _send(self, code, ctype, body):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.send_header("Cache-Control", "no-store")
                self.end_headers()
                self.wfile.write(body)

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self._httpd.server_address[1]
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)

    def start(self):
        self._thread.start()
        return self

    def stop(self):
        self._httpd.shutdown()
        self._httpd.server_close()


def preview_progress(state: PreviewState, scene, profile):
    """A render_layer progress callback that publishes status (frames are
    published by the epoch loop via accumulator means)."""

    def cb(epoch, max_epoch, noise, layer="main", samples=0, image=None, **kw):
        status = dict(
            layer=layer, epoch=epoch, max_epoch=max_epoch,
            noise=(round(noise, 5) if np.isfinite(noise) else None),
            samples=samples,
        )
        if "tile_batch" in kw:  # spiral fill-in progress (b, n_batches)
            status["tile_batch"] = list(kw["tile_batch"])
        state.publish_status(**status)
        if image is not None:
            state.publish_frame(np.asarray(image))

    return cb
