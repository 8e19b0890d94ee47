"""Live browser viewer for a running simulation.

The reference's entire L4 is a live Unity viewport: per-particle colored
spheres scaled to the support radius, updated every frame
(``Assets/Scripts/Systems/ParticleAuthoring.cs:53-79,193-199`` + Hybrid
Renderer). This is the headless-TPU stand-in: ``cli run --serve PORT``
starts a tiny in-process HTTP server; the run loop pushes each rendered
frame + the latest diagnostics into it, and a browser at
``http://localhost:PORT`` shows the evolving planet with live conserved-
quantity metrics (the roadmap text-UI the reference never built,
``README.md:51-54``).

Zero dependencies beyond the stdlib: frames are the same matplotlib PNGs
as ``utils.render``; the page polls ``/frame.png`` and ``/diag.json``.
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

_PAGE = b"""<!doctype html>
<html><head><title>planetmodel-sph-tpu live</title><style>
body { background:#101014; color:#ddd; font:14px monospace; margin:0; }
#wrap { display:flex; flex-wrap:wrap; }
img { margin:8px; border:1px solid #333; max-width:min(96vw,780px); }
#diag { margin:8px; padding:8px; white-space:pre; }
h1 { font-size:16px; margin:8px; color:#8cf; }
</style></head><body>
<h1>planetmodel-sph-tpu &mdash; live view</h1>
<div id="wrap"><img id="frame" src="/frame.png"><div id="diag"></div></div>
<script>
const KEYS = ["step","total_energy","kinetic_energy","potential_energy",
  "internal_energy","momentum_mag","angular_momentum_z","radius_rms",
  "neighbors_avg","h_avg","rho_max","vel_max","steps_per_sec"];
async function tick() {
  try {
    const d = await (await fetch("/diag.json", {cache:"no-store"})).json();
    document.getElementById("diag").textContent = KEYS
      .filter(k => k in d)
      .map(k => k.padEnd(20) + (typeof d[k] === "number"
            ? d[k].toPrecision(6) : d[k]))
      .join("\\n");
    const img = document.getElementById("frame");
    img.src = "/frame.png?t=" + Date.now();
  } catch (e) {}
  setTimeout(tick, 1000);
}
tick();
</script></body></html>
"""


class LiveViewer:
    """Holds the latest frame/diagnostics; serves them over HTTP."""

    def __init__(self, port: int, host: str = "127.0.0.1"):
        self._lock = threading.Lock()
        self._png: bytes = b""
        self._diag: dict = {}
        viewer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):        # keep the CLI output clean
                pass

            def do_GET(self):
                path = self.path.split("?")[0]
                if path in ("/", "/index.html"):
                    body, ctype = _PAGE, "text/html"
                elif path == "/frame.png":
                    with viewer._lock:
                        body, ctype = viewer._png, "image/png"
                elif path == "/diag.json":
                    with viewer._lock:
                        body = json.dumps(viewer._diag).encode()
                    ctype = "application/json"
                else:
                    self.send_error(404)
                    return
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.send_header("Cache-Control", "no-store")
                self.end_headers()
                self.wfile.write(body)

        self._srv = ThreadingHTTPServer((host, port), Handler)
        self.port = self._srv.server_address[1]   # resolved when port=0
        self._thread = threading.Thread(target=self._srv.serve_forever,
                                        daemon=True)
        self._thread.start()

    def update(self, state, diag: dict | None = None, **render_kw):
        """Render the state to the in-memory frame + publish diagnostics."""
        from . import render
        buf = io.BytesIO()
        render.render_png(state, buf, **render_kw)
        with self._lock:
            self._png = buf.getvalue()
            if diag is not None:
                self._diag = {k: (float(v) if hasattr(v, "__float__") else v)
                              for k, v in diag.items()}

    def close(self):
        self._srv.shutdown()
        self._srv.server_close()
