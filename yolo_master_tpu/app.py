"""Interactive demo app (reference: /root/reference/app.py, a Gradio UI).

Two frontends over the same predict pipeline:
  * :func:`launch_gradio` — the reference-style tabbed UI (image predict per
    task, confidence/IoU sliders, model picker). Used when gradio is
    installed; this image ships without it, so the import is gated.
  * :func:`launch_http` — zero-dependency stdlib fallback: an http.server
    page with image upload -> annotated JPEG + JSON summary. Keeps the demo
    capability alive in hermetic environments.

Both scan a checkpoints directory and lazily build one model per task,
mirroring the reference's ModelManager (app.py:34-120).
"""

from __future__ import annotations

import io
import json
from pathlib import Path
from typing import Dict, Optional

import numpy as np

from .utils import LOGGER

TASKS = ("detect", "segment", "classify", "pose", "obb")


class ModelManager:
    """Scan/cache models per task (reference app.py:34 ModelManager)."""

    def __init__(self, ckpts_root: Optional[str] = None):
        self.ckpts_root = Path(ckpts_root) if ckpts_root else None
        self._models: Dict[str, object] = {}

    def scan_checkpoints(self) -> Dict[str, list]:
        out = {t: [] for t in TASKS}
        if self.ckpts_root and self.ckpts_root.exists():
            for p in sorted(self.ckpts_root.rglob("*.npz")):
                name = p.name.lower()
                task = next((t for t in ("segment", "classify", "pose", "obb") if t[:3] in name), "detect")
                out[task].append(str(p))
        return out

    def get(self, task: str = "detect", weights: Optional[str] = None):
        from .models.yolo import YOLO

        key = f"{task}:{weights}"
        if key not in self._models:
            name = {"detect": "yolo-master-n", "segment": "yolo-master-seg",
                    "classify": "yolo-master-cls", "pose": "yolo-master-pose",
                    "obb": "yolo-master-obb"}[task]
            model = YOLO(name, task=task)
            if weights:
                model.load(weights)
            self._models[key] = model
        return self._models[key]


def _predict_annotated(manager: ModelManager, img_bgr: np.ndarray, task: str,
                       conf: float, iou: float):
    model = manager.get(task)
    r = model.predict(img_bgr, conf=conf, iou=iou)[0]
    return r.plot(), r.summary()


def launch_gradio(ckpts_root: Optional[str] = None, **launch_kw):  # pragma: no cover - needs gradio
    """Reference-style Gradio UI; raises a clear error when gradio is absent."""
    try:
        import gradio as gr
    except ImportError as e:
        raise RuntimeError(
            "gradio is not installed in this image; use launch_http() for the "
            "stdlib demo server, or `pip install gradio` where allowed") from e

    manager = ModelManager(ckpts_root)

    def run(image, task, conf, iou):
        if image is None:
            return None, "[]"
        annotated, summary = _predict_annotated(manager, image[..., ::-1], task, conf, iou)
        return annotated[..., ::-1], json.dumps(summary, indent=2)

    with gr.Blocks(title="YOLO-Master TPU") as demo:
        gr.Markdown("# YOLO-Master TPU demo")
        with gr.Row():
            with gr.Column():
                image = gr.Image(type="numpy", label="input")
                task = gr.Dropdown(list(TASKS), value="detect", label="task")
                conf = gr.Slider(0.0, 1.0, 0.25, label="confidence")
                iou = gr.Slider(0.0, 1.0, 0.45, label="iou")
                btn = gr.Button("Predict")
            with gr.Column():
                out_img = gr.Image(label="annotated")
                out_json = gr.Code(language="json", label="summary")
        btn.click(run, [image, task, conf, iou], [out_img, out_json])
    return demo.launch(**launch_kw)


_PAGE = """<!doctype html><title>YOLO-Master TPU</title>
<h2>YOLO-Master TPU demo</h2>
<form method=post enctype=multipart/form-data action=/predict>
<input type=file name=image accept=image/*>
task <select name=task>{opts}</select>
conf <input name=conf value=0.25 size=4>
iou <input name=iou value=0.45 size=4>
<button>Predict</button></form>"""


def launch_http(port: int = 7860, ckpts_root: Optional[str] = None, serve_forever: bool = True):
    """stdlib HTTP demo: GET / serves the form, POST /predict returns the
    annotated JPEG (X-Summary header carries the JSON)."""
    import cv2
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    manager = ModelManager(ckpts_root)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            LOGGER.debug(" ".join(map(str, a)))

        def do_GET(self):
            body = _PAGE.format(opts="".join(f"<option>{t}</option>" for t in TASKS)).encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            import email
            from email import policy

            length = int(self.headers.get("Content-Length", 0))
            raw = self.rfile.read(length)
            msg = email.message_from_bytes(
                b"Content-Type: " + self.headers["Content-Type"].encode() + b"\r\n\r\n" + raw,
                policy=policy.default)
            fields = {}
            img_bytes = None
            for part in msg.iter_parts():
                if part.get_filename():
                    img_bytes = part.get_payload(decode=True)
                else:
                    fields[part.get_param("name", header="content-disposition")] = part.get_content().strip()
            if not img_bytes:
                self.send_error(400, "no image")
                return
            img = cv2.imdecode(np.frombuffer(img_bytes, np.uint8), cv2.IMREAD_COLOR)
            annotated, summary = _predict_annotated(
                manager, img, fields.get("task", "detect"),
                float(fields.get("conf", 0.25)), float(fields.get("iou", 0.45)))
            ok, jpg = cv2.imencode(".jpg", annotated)
            self.send_response(200)
            self.send_header("Content-Type", "image/jpeg")
            self.send_header("X-Summary", json.dumps(summary))
            self.end_headers()
            self.wfile.write(jpg.tobytes())

    httpd = ThreadingHTTPServer(("127.0.0.1", port), Handler)
    LOGGER.info(f"demo app on http://127.0.0.1:{httpd.server_address[1]}")
    if serve_forever:  # pragma: no cover - blocking
        httpd.serve_forever()
    return httpd


def launch(port: int = 7860, ckpts_root: Optional[str] = None):
    """Prefer gradio; fall back to the stdlib server."""
    try:
        import gradio  # noqa: F401

        return launch_gradio(ckpts_root, server_port=port)
    except ImportError:
        return launch_http(port, ckpts_root)
