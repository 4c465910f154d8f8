#!/usr/bin/env python3
"""Reproduce YOLO-Master nano baselines on BCCD (blood-cell detection, 3
classes, ~360 images). Analog of reference scripts/reproduce/reproduce_bccd_*.py.
BCCD is small enough to overfit quickly — the reference uses it as the
fast-turnaround sanity dataset; defaults here mirror that (100 epochs).

BCCD has no bundled zoo yaml (it ships as a roboflow export): pass
--data /path/to/bccd/data.yaml.
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
from _reproduce_common import MODELS, DatasetSpec, run_dataset  # noqa: E402

if __name__ == "__main__":
    raise SystemExit(run_dataset(DatasetSpec(
        name="BCCD", data="bccd.yaml", project="runs/reproduce/bccd")))
