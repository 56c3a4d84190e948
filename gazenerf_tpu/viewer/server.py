"""Interactive GazeNeRF viewer — browser UI over a jitted render closure.

TPU-framework counterpart of the reference's PyQt5 GUI
(reference: utils/vis_utils.py:101-535 — sliders + arcball driving live
renders).  This environment (and most TPU hosts) is headless, so the UI is a
self-contained web page served by a stdlib ``http.server``: sliders for gaze
(pitch, yaw) and a look-at orbit camera (azimuth, elevation, distance),
matching the reference GUI's controls (gaze sliders `GazeNeRFUtils`,
arcball camera `ArcBall`).

The render path is ONE jitted closure over the full model; slider moves
re-invoke it with new scalars (no recompile — all shapes static).
"""

from __future__ import annotations

import json
import math
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, Optional
from urllib.parse import parse_qs, urlparse

import numpy as np

import jax
import jax.numpy as jnp

from gazenerf_tpu.config import Config
from gazenerf_tpu.data.cameras import base_inv_inmat
from gazenerf_tpu.models.gaze_nerf import GazeNeRF
from gazenerf_tpu.ops.rays import pixel_grid

_PAGE = """<!doctype html>
<html><head><title>GazeNeRF viewer</title><style>
body { font-family: sans-serif; margin: 2em; background: #111; color: #eee; }
.row { margin: 0.4em 0; }
label { display: inline-block; width: 10em; }
input[type=range] { width: 22em; vertical-align: middle; }
img { margin-top: 1em; border: 1px solid #444; image-rendering: auto; }
#status { color: #8c8; margin-left: 1em; }
</style></head><body>
<h2>GazeNeRF viewer</h2>
<div class="row"><label>gaze pitch</label>
  <input type="range" id="pitch" min="-0.5" max="0.5" step="0.02" value="0">
  <span id="pitch_v">0</span></div>
<div class="row"><label>gaze yaw</label>
  <input type="range" id="yaw" min="-0.8" max="0.8" step="0.02" value="0">
  <span id="yaw_v">0</span></div>
<div class="row"><label>camera azimuth</label>
  <input type="range" id="az" min="-60" max="60" step="2" value="0">
  <span id="az_v">0</span></div>
<div class="row"><label>camera elevation</label>
  <input type="range" id="el" min="-40" max="40" step="2" value="0">
  <span id="el_v">0</span></div>
<div class="row"><label>camera distance</label>
  <input type="range" id="dist" min="9" max="16" step="0.5" value="12">
  <span id="dist_v">12</span><span id="status"></span></div>
<img id="view" width="512" height="512">
<script>
const ids = ["pitch", "yaw", "az", "el", "dist"];
let inflight = false, dirty = false;
function refresh() {
  if (inflight) { dirty = true; return; }
  inflight = true;
  document.getElementById("status").textContent = "rendering…";
  const q = ids.map(i => i + "=" + document.getElementById(i).value).join("&");
  const img = document.getElementById("view");
  const next = new Image();
  next.onload = () => {
    img.src = next.src;
    document.getElementById("status").textContent = "";
    inflight = false;
    if (dirty) { dirty = false; refresh(); }
  };
  next.src = "/render?" + q + "&t=" + Date.now();
}
ids.forEach(i => {
  const el = document.getElementById(i);
  el.addEventListener("input", () => {
    document.getElementById(i + "_v").textContent = el.value;
    refresh();
  });
});
refresh();
</script></body></html>"""


def lookat_camera(az_deg: float, el_deg: float, dist: float, featmap_size: int):
    """Orbit look-at camera; same construction as
    :func:`gazenerf_tpu.data.cameras.orbit_cameras` generalized to
    (azimuth, elevation, distance)."""
    az = math.radians(az_deg)
    el = math.radians(el_deg)
    vp = np.array(
        [
            dist * math.sin(az) * math.cos(el),
            dist * math.sin(el),
            dist * math.cos(az) * math.cos(el),
        ]
    )
    d1 = -vp
    d2 = np.cross([0.0, -1.0, 0.0], d1)
    d3 = np.cross(d1, d2)
    d1, d2, d3 = (v / np.linalg.norm(v) for v in (d1, d2, d3))
    R = np.stack([d2, d3, d1], axis=1).astype(np.float32)
    return (
        R[None],
        vp.astype(np.float32)[None, :, None],
        base_inv_inmat(featmap_size)[None],
    )


class ViewerApp:
    """Owns the model, codes, and the jitted render closure."""

    def __init__(
        self,
        cfg: Config,
        params=None,
        shape_code: Optional[np.ndarray] = None,
        appea_code: Optional[np.ndarray] = None,
        seed: int = 0,
    ):
        m = cfg.model
        self.cfg = cfg
        self.model = GazeNeRF(m)
        self.xy = np.asarray(pixel_grid(m.featmap_size))[None]
        key = jax.random.PRNGKey(seed)
        self.shape_code = jnp.asarray(
            shape_code.reshape(1, -1)
            if shape_code is not None
            else np.zeros((1, m.shape_code_dims), np.float32)
        )
        self.appea_code = jnp.asarray(
            appea_code.reshape(1, -1)
            if appea_code is not None
            else np.zeros((1, m.appea_code_dims), np.float32)
        )
        if params is None:
            R, T, K = lookat_camera(0, 0, 12.0, m.featmap_size)
            params = self.model.init(
                {"params": key}, jnp.asarray(self.xy), self.shape_code,
                self.appea_code, jnp.zeros((1, 2)), jnp.asarray(R),
                jnp.asarray(T), jnp.asarray(K),
            )
        self.params = params

        @jax.jit
        def render(gaze, R, T, K):
            out = self.model.apply(
                self.params, jnp.asarray(self.xy), self.shape_code,
                self.appea_code, gaze, R, T, K,
            )
            img = out["coarse_dict"]["merge_img"][0]
            return jnp.clip(img * 255.0, 0.0, 255.0).astype(jnp.uint8)

        self._render = render
        self._lock = threading.Lock()  # one TPU program at a time

    def render_png(self, pitch: float, yaw: float, az: float, el: float,
                   dist: float) -> bytes:
        import cv2

        R, T, K = lookat_camera(az, el, dist, self.cfg.model.featmap_size)
        gaze = jnp.asarray(np.array([[pitch, yaw]], np.float32))
        with self._lock:
            img = np.asarray(
                self._render(gaze, jnp.asarray(R), jnp.asarray(T), jnp.asarray(K))
            )
        ok, buf = cv2.imencode(".png", img[..., ::-1])  # RGB -> BGR for cv2
        assert ok
        return buf.tobytes()


def make_handler(app: ViewerApp):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code: int, ctype: str, body: bytes):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            u = urlparse(self.path)
            if u.path == "/":
                self._send(200, "text/html", _PAGE.encode())
            elif u.path == "/render":
                q = {k: float(v[0]) for k, v in parse_qs(u.query).items()
                     if k != "t"}
                png = app.render_png(
                    q.get("pitch", 0.0), q.get("yaw", 0.0), q.get("az", 0.0),
                    q.get("el", 0.0), q.get("dist", 12.0),
                )
                self._send(200, "image/png", png)
            elif u.path == "/health":
                self._send(200, "application/json", json.dumps({"ok": True}).encode())
            else:
                self._send(404, "text/plain", b"not found")

    return Handler


def serve(app: ViewerApp, host: str = "127.0.0.1", port: int = 8631,
          block: bool = True) -> ThreadingHTTPServer:
    server = ThreadingHTTPServer((host, port), make_handler(app))
    if block:
        print(f"GazeNeRF viewer on http://{host}:{port}")
        server.serve_forever()
    else:
        threading.Thread(target=server.serve_forever, daemon=True).start()
    return server
