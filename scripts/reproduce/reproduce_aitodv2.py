#!/usr/bin/env python3
"""Reproduce YOLO-Master nano baselines on AI-TOD-v2 (tiny objects in aerial
images; mean object size ~12 px). Analog of reference
scripts/reproduce/reproduce_aitodv2.py. Tiny-object regime stresses the
assigner and small-stride heads; imgsz 800 matches the reference protocol.
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
from _reproduce_common import MODELS, DatasetSpec, run_dataset  # noqa: E402

if __name__ == "__main__":
    raise SystemExit(run_dataset(DatasetSpec(
        name="AI-TOD-v2", data="AI-TOD-v2.yaml", project="runs/reproduce/aitodv2",
        imgsz=800, extra={"max_gt": 512})))
