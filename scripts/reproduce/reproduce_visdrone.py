#!/usr/bin/env python3
"""Reproduce YOLO-Master-v0.1-N and EsMoE-N baselines on VisDrone (aerial,
dense small objects). Analog of reference scripts/reproduce/reproduce_visdrone.py.

Examples:
    python scripts/reproduce/reproduce_visdrone.py --check-build
    python scripts/reproduce/reproduce_visdrone.py --epochs 300 --batch 64
    python scripts/reproduce/reproduce_visdrone.py --model EsMoE-N --no-sparse-eval
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
from _reproduce_common import MODELS, DatasetSpec, run_dataset  # noqa: E402

if __name__ == "__main__":
    raise SystemExit(run_dataset(DatasetSpec(
        name="VisDrone", data="VisDrone.yaml", project="runs/reproduce/visdrone")))
