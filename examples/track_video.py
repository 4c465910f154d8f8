#!/usr/bin/env python3
"""Multi-object tracking over a video source.

    python examples/track_video.py video.mp4 --tracker bytetrack
Trackers: bytetrack, botsort, ocsort, deepocsort, fasttracker, tracktrack.
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo-root run without install

ap = argparse.ArgumentParser()
ap.add_argument("source", help="video file, RTSP URL, or webcam index")
ap.add_argument("--model", default="yolo-master-n")
ap.add_argument("--tracker", default="bytetrack")
ap.add_argument("--vid-stride", type=int, default=1)
args = ap.parse_args()

from yolo_master_tpu.models.yolo import YOLO

model = YOLO(args.model)
for r in model.track(args.source, tracker=args.tracker, stream=True,
                     vid_stride=args.vid_stride):
    ids = [] if r.boxes is None or not r.boxes.is_track else r.boxes.id.astype(int).tolist()
    print(f"frame {r.frame}: {len(ids)} tracks {ids[:8]}")
