"""Live inference demo server: upload images -> infer -> orbit viewer.

The native counterpart of the reference's interactive gradio app
(``scripts/gradio_app.py``, 1.6k LoC of gradio + viser + rerun): a
dependency-free stdlib ``http.server`` app. GET / serves an upload page;
the page base64-encodes the selected images and POSTs JSON to /infer;
the handler decodes, resizes to the model's 518-px AR bucket, runs the
injected ``infer_fn``, and responds with the self-contained WebGL orbit
viewer (utils/viewer.py) embedding the reconstruction.

``infer_fn(images: list[np.ndarray float HWC in [0,1]]) -> dict`` must
return {"points": (V,H,W,3), "colors": (V,H,W,3) [0,1],
"mask": (V,H,W) bool | None, "camera_poses": (V,4,4) | None,
"intrinsics": (V,3,3) | None}. ``make_model_infer_fn`` builds one from a
MapAnything model + params.

Run: python scripts/live_demo.py [--checkpoint ...] [--port 8008]
"""

from __future__ import annotations

import base64

import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Dict, Optional

import numpy as np

_UPLOAD_PAGE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>mapanything_tpu live demo</title>
<style>
 body { background:#111; color:#ddd; font:15px sans-serif; max-width:640px;
        margin:60px auto; }
 input, button { font:inherit; margin:8px 0; }
 button { padding:8px 22px; background:#2d6cdf; border:0; color:white;
          border-radius:4px; cursor:pointer; }
 #status { color:#8fb6ff; }
</style></head><body>
<h2>mapanything_tpu &mdash; live metric 3D reconstruction</h2>
<p>Select 2+ images of a scene; the model reconstructs a metric point
cloud with camera poses and opens an orbitable viewer.</p>
<input id="files" type="file" accept="image/*" multiple><br>
<button onclick="go()">Reconstruct</button> <span id="status"></span>
<script>
async function go() {
  const files = document.getElementById("files").files;
  if (files.length < 1) { alert("select images first"); return; }
  document.getElementById("status").textContent =
    "uploading " + files.length + " images + inferring...";
  const images = [];
  for (const f of files) {
    const buf = await f.arrayBuffer();
    images.push(btoa(String.fromCharCode(...new Uint8Array(buf))));
  }
  const resp = await fetch("/infer", {
    method: "POST",
    headers: {"Content-Type": "application/json"},
    body: JSON.stringify({images}),
  });
  if (!resp.ok) {
    document.getElementById("status").textContent =
      "error: " + (await resp.text());
    return;
  }
  document.open(); document.write(await resp.text()); document.close();
}
</script></body></html>
"""


def decode_image(data: bytes) -> np.ndarray:
    """Image bytes (png/jpg) -> float32 HWC RGB in [0, 1]."""
    import cv2

    arr = np.frombuffer(data, np.uint8)
    bgr = cv2.imdecode(arr, cv2.IMREAD_COLOR)
    if bgr is None:
        raise ValueError("could not decode image")
    return bgr[..., ::-1].astype(np.float32) / 255.0


def make_model_infer_fn(model, params, resolution: int = 518) -> Callable:
    """Build an infer_fn from a MapAnything model + params: resizes the
    upload set to its best shared AR bucket, runs images-only metric
    inference, returns viewer-ready arrays."""
    import jax
    import jax.numpy as jnp

    from mapanything_tpu.data.cropping import crop_resize_if_necessary
    from mapanything_tpu.models.encoders.normalizations import (
        IMAGE_NORMALIZATION_DICT,
    )
    from mapanything_tpu.utils.image import _fake_K, find_closest_aspect_ratio

    fwd = jax.jit(lambda p, v: model.apply(p, v))
    norm = IMAGE_NORMALIZATION_DICT["dinov2"]

    def infer_fn(images):
        h0, w0 = images[0].shape[:2]
        from mapanything_tpu.utils.image import RESOLUTION_MAPPINGS

        if resolution in RESOLUTION_MAPPINGS:
            target = find_closest_aspect_ratio(w0 / h0, resolution)
        else:  # test scales: square bucket
            target = (resolution, resolution)
        raw, normed = [], []
        for im in images:
            u8 = (np.clip(im, 0, 1) * 255).astype(np.uint8)
            out, _, _, _ = crop_resize_if_necessary(
                u8, target, None, _fake_K(*im.shape[:2])
            )
            raw.append(out.astype(np.float32) / 255.0)
            normed.append(norm.apply(raw[-1]))
        resized = np.stack(raw)  # (V, H, W, 3) in [0, 1] for colors
        from mapanything_tpu.models.mapanything import Views

        views = Views(img=jnp.asarray(np.stack(normed)[None]))
        preds = fwd(params, views)
        pts = np.asarray(preds.pts3d[0], np.float32)
        mask = (
            np.asarray(preds.non_ambiguous_mask[0])
            if preds.non_ambiguous_mask is not None
            else None
        )
        poses = None
        if preds.cam_quats is not None:
            from mapanything_tpu.geometry.quaternion import (
                quats_trans_to_pose_matrix,
            )

            poses = np.asarray(
                quats_trans_to_pose_matrix(preds.cam_quats[0], preds.cam_trans[0])
            )
        return {
            "points": pts,
            "colors": resized,
            "mask": mask,
            "camera_poses": poses,
            "intrinsics": None,
        }

    return infer_fn


def build_viewer_html(result: Dict, title: str = "live reconstruction") -> str:
    """Render an infer_fn result with the standalone WebGL viewer."""
    import tempfile

    from mapanything_tpu.utils.viewer import export_viewer_html

    with tempfile.NamedTemporaryFile(suffix=".html", delete=False) as f:
        path = f.name
    export_viewer_html(
        path,
        points=result["points"],
        colors=result.get("colors"),
        camera_poses=result.get("camera_poses"),
        intrinsics=result.get("intrinsics"),
        mask=result.get("mask"),
        title=title,
    )
    with open(path) as f:
        return f.read()


class LiveDemoHandler(BaseHTTPRequestHandler):
    """GET / -> upload page; POST /infer -> viewer html."""

    infer_fn: Optional[Callable] = None  # injected via make_server

    def log_message(self, *a):  # quiet
        pass

    def do_GET(self):
        if self.path not in ("/", "/index.html"):
            self.send_error(404)
            return
        body = _UPLOAD_PAGE.encode()
        self.send_response(200)
        self.send_header("Content-Type", "text/html; charset=utf-8")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_POST(self):
        if self.path != "/infer":
            self.send_error(404)
            return
        try:
            n = int(self.headers.get("Content-Length", "0"))
            payload = json.loads(self.rfile.read(n))
            images = [
                decode_image(base64.b64decode(b)) for b in payload["images"]
            ]
            if not images:
                raise ValueError("no images")
            result = type(self).infer_fn(images)
            html = build_viewer_html(
                result, title=f"live reconstruction ({len(images)} views)"
            ).encode()
        except Exception as e:  # surface errors to the page
            msg = f"inference failed: {e}".encode()
            self.send_response(500)
            self.send_header("Content-Type", "text/plain")
            self.send_header("Content-Length", str(len(msg)))
            self.end_headers()
            self.wfile.write(msg)
            return
        self.send_response(200)
        self.send_header("Content-Type", "text/html; charset=utf-8")
        self.send_header("Content-Length", str(len(html)))
        self.end_headers()
        self.wfile.write(html)


def make_server(infer_fn: Callable, port: int = 8008) -> ThreadingHTTPServer:
    """Bind the live demo server (call .serve_forever() to run)."""
    handler = type("Handler", (LiveDemoHandler,), {"infer_fn": staticmethod(infer_fn)})
    return ThreadingHTTPServer(("0.0.0.0", port), handler)
