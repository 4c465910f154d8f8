#!/usr/bin/env python3
"""Reproduce YOLO-Master nano baselines on SKU-110K (retail shelves, extreme
object density). Analog of reference scripts/reproduce/reproduce_sku110k.py.
SKU-110K images carry up to ~700 GT boxes — max_gt is raised accordingly so
the static-shape train step keeps every annotation.
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
from _reproduce_common import MODELS, DatasetSpec, run_dataset  # noqa: E402

if __name__ == "__main__":
    raise SystemExit(run_dataset(DatasetSpec(
        name="SKU-110K", data="SKU-110K.yaml", project="runs/reproduce/sku110k",
        extra={"max_gt": 768})))
