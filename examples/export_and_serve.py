#!/usr/bin/env python3
"""Export a model, reload it through AutoBackend, and serve it.

    python examples/export_and_serve.py --format tflite --port 8500
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo-root run without install

ap = argparse.ArgumentParser()
ap.add_argument("--model", default="yolo-master-n")
ap.add_argument("--format", default="saved_model")
ap.add_argument("--imgsz", type=int, default=640)
ap.add_argument("--port", type=int, default=0, help=">0: start the HTTP/gRPC server")
args = ap.parse_args()

from yolo_master_tpu.models.yolo import YOLO

model = YOLO(args.model)
path = model.export(format=args.format, imgsz=args.imgsz, nms=True)
print("exported:", path)

reloaded = YOLO(path)  # AutoBackend dispatch on suffix/dir layout
print("reloaded kind:", reloaded.backend.kind)

if args.port:
    from yolo_master_tpu.serving import InferenceServer

    InferenceServer(model, port=args.port, max_batch=16).serve()
