"""Live inference UI (reference: ultralytics/solutions/streamlit_inference.py
Inference — a Streamlit page streaming webcam/video predictions).

streamlit is not in this image; the same capability is provided by an MJPEG
http.server stream over the frame loaders (works in any browser, zero deps).
When streamlit IS importable, :meth:`Inference.inference` defers to a
reference-style page instead.
"""

from __future__ import annotations

import threading
from typing import Optional

import numpy as np

from ..utils import LOGGER


class Inference:
    """Stream annotated predictions from any source to the browser."""

    def __init__(self, model: str = "yolo-master-n", task: Optional[str] = None,
                 conf: float = 0.25, iou: float = 0.45, **kw):
        from ..models.yolo import YOLO

        self.model = YOLO(model, task=task)
        self.conf, self.iou = conf, iou
        self.kw = kw

    def inference(self, source=0, port: int = 7880, serve_forever: bool = True,
                  max_frames: Optional[int] = None):
        """Serve an MJPEG stream of annotated frames at / (reference
        Inference.inference main loop)."""
        try:
            import streamlit  # noqa: F401

            return self._streamlit(source)  # pragma: no cover - needs streamlit
        except ImportError:
            pass
        import cv2
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        model, conf, iou, kw = self.model, self.conf, self.iou, self.kw
        boundary = b"--ymtframe"

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_GET(self):
                self.send_response(200)
                self.send_header("Content-Type", f"multipart/x-mixed-replace; boundary={boundary.decode()}")
                self.end_headers()
                for r in model.predict(source, stream=True, conf=conf, iou=iou, **kw):
                    ok, jpg = cv2.imencode(".jpg", r.plot())
                    if not ok:
                        continue
                    try:
                        self.wfile.write(boundary + b"\r\nContent-Type: image/jpeg\r\n\r\n")
                        self.wfile.write(jpg.tobytes() + b"\r\n")
                    except (BrokenPipeError, ConnectionResetError):
                        break

        httpd = ThreadingHTTPServer(("127.0.0.1", port), Handler)
        LOGGER.info(f"Inference stream on http://127.0.0.1:{httpd.server_address[1]}")
        if serve_forever:  # pragma: no cover - blocking
            httpd.serve_forever()
        return httpd

    def _streamlit(self, source):  # pragma: no cover - needs streamlit
        import streamlit as st

        st.title("YOLO-Master TPU")
        frame_slot = st.empty()
        for r in self.model.predict(source, stream=True, conf=self.conf, iou=self.iou, **self.kw):
            frame_slot.image(r.plot()[..., ::-1])
