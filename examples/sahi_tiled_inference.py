#!/usr/bin/env python3
"""Sparse-SAHI tiled inference for large (4K/8K) imagery: a low-res
objectness pass skips empty tiles, high-res inference runs only on busy
tiles, and CW-NMS merges the overlaps.

    python examples/sahi_tiled_inference.py big.jpg --slice 1024 --overlap 0.2
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo-root run without install

ap = argparse.ArgumentParser()
ap.add_argument("source")
ap.add_argument("--model", default="yolo-master-n")
ap.add_argument("--slice", type=int, default=1024)
ap.add_argument("--overlap", type=float, default=0.2)
ap.add_argument("--objectness", type=float, default=0.15)
args = ap.parse_args()

from yolo_master_tpu.engine.predictor import load_image
from yolo_master_tpu.engine.sahi import SparseSAHIPredictor
from yolo_master_tpu.models.yolo import YOLO

model = YOLO(args.model)
predictor = SparseSAHIPredictor(
    model.model, model.params, names=model.names, slice_size=args.slice,
    overlap_ratio=args.overlap, objectness_threshold=args.objectness,
)
result = predictor(load_image(args.source), path=args.source)
print(result.verbose())
print("tiles run / skipped:", predictor.last_stats)
print(result.to_json())
