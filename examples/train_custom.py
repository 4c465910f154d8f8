#!/usr/bin/env python3
"""Train on a YOLO-format dataset (path or bundled zoo name).

    python examples/train_custom.py --data VisDrone.yaml --epochs 100 --batch 32
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo-root run without install

ap = argparse.ArgumentParser()
ap.add_argument("--data", required=True, help="dataset yaml (path or zoo name)")
ap.add_argument("--model", default="yolo-master-n")
ap.add_argument("--epochs", type=int, default=100)
ap.add_argument("--batch", type=int, default=16, help="-1 = autobatch")
ap.add_argument("--imgsz", type=int, default=640)
ap.add_argument("--save-dir", default="runs/train/custom")
ap.add_argument("--resume", action="store_true")
args = ap.parse_args()

from yolo_master_tpu.models.yolo import YOLO

model = YOLO(args.model)
metrics = model.train(data=args.data, epochs=args.epochs, batch=args.batch,
                      imgsz=args.imgsz, save_dir=args.save_dir, resume=args.resume)
print("final:", metrics)
print("val:", model.val(data=args.data, imgsz=args.imgsz))
