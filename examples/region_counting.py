#!/usr/bin/env python3
"""Region counting with the solutions API + shared annotator overlay
(reference examples/YOLOv8-Region-Counter analog).

    python examples/region_counting.py video.mp4 --region 100,100 500,100 500,400 100,400
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo-root run without install

ap = argparse.ArgumentParser()
ap.add_argument("source")
ap.add_argument("--model", default="yolo-master-n")
ap.add_argument("--region", nargs="+", required=True, help="x,y polygon points")
ap.add_argument("--save", default=None, help="write annotated frames to this dir")
args = ap.parse_args()

region = [tuple(map(float, p.split(","))) for p in args.region]

from pathlib import Path

from yolo_master_tpu.models.yolo import YOLO
from yolo_master_tpu.solutions import RegionCounter
from yolo_master_tpu.utils.annotator import Annotator
from yolo_master_tpu.utils.patches import imwrite

model = YOLO(args.model)
counter = RegionCounter({"zone": region})
for i, r in enumerate(model.track(args.source, stream=True)):
    if r.boxes is None or len(r.boxes) == 0:
        continue
    counts = counter.count(r.boxes.xyxy)
    print(f"frame {i}: {counts}")
    if args.save:
        ann = Annotator(r.orig_img.copy(), names=r.names)
        ann.detections(r.boxes.xyxy, r.boxes.conf, r.boxes.cls,
                       track_ids=None if not r.boxes.is_track else r.boxes.id)
        ann.polygon(region, fill_alpha=0.15)
        ann.counts(counts)
        Path(args.save).mkdir(parents=True, exist_ok=True)
        imwrite(f"{args.save}/frame_{i:05d}.jpg", ann.result())
