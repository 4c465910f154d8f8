#!/usr/bin/env python3
"""Predict on an image (or directory/glob) and consume the Results API.

    python examples/predict_image.py path/to/img.jpg --model yolo-master-n
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo-root run without install

ap = argparse.ArgumentParser()
ap.add_argument("source")
ap.add_argument("--model", default="yolo-master-n")
ap.add_argument("--conf", type=float, default=0.25)
ap.add_argument("--save", default=None, help="write annotated image here")
ap.add_argument("--cpu", action="store_true")
args = ap.parse_args()

if args.cpu:
    import jax

    jax.config.update("jax_platforms", "cpu")

from yolo_master_tpu.models.yolo import YOLO

model = YOLO(args.model)
for r in model.predict(args.source, conf=args.conf, verbose=True):
    print(r.verbose())           # "2 persons, 1 bus, "
    print(r.to_json())           # structured detections
    if args.save:
        print("saved:", r.save(args.save))
