"""Utility layer (reference L0: ultralytics/utils/__init__.py).

Keeps only what the TPU build needs: logging, YAML IO, math helpers.
"""

from __future__ import annotations

import logging
import os
from pathlib import Path

import yaml

LOGGER = logging.getLogger("yolo_master_tpu")
if not LOGGER.handlers:
    _h = logging.StreamHandler()
    _h.setFormatter(logging.Formatter("%(message)s"))
    LOGGER.addHandler(_h)
    LOGGER.setLevel(os.environ.get("YMT_LOGLEVEL", "INFO"))

ROOT = Path(__file__).resolve().parents[1]
CFG_DIR = ROOT / "cfg"
MODELS_DIR = CFG_DIR / "models"


def make_divisible(x: float, divisor: int = 8) -> int:
    """Round channel count up to the nearest multiple of ``divisor``
    (reference utils/ops.py make_divisible / torch_utils)."""
    import math

    return math.ceil(x / divisor) * divisor


def yaml_load(path) -> dict:
    with open(path) as f:
        return yaml.safe_load(f)


def yaml_save(path, data: dict) -> None:
    with open(path, "w") as f:
        yaml.safe_dump(data, f, sort_keys=False)


def find_model_yaml(name: str) -> Path:
    """Resolve a model name ('yolo-master-n', 'yolo-master-n.yaml', path) to a yaml file.

    Compound-scale suffixes resolve to the base yaml + scale char, like the
    reference's guess-scale logic (ultralytics/nn/tasks.py yaml_model_load).
    """
    p = Path(name)
    if p.suffix in {".yaml", ".yml"} and p.exists():
        return p
    stem = p.stem if p.suffix else str(name)
    cand = MODELS_DIR / f"{stem}.yaml"
    if cand.exists():
        return cand
    # strip trailing scale char: yolo-master-n -> yolo-master.yaml, scale n
    if len(stem) > 2 and stem[-2] == "-" and stem[-1] in "nsmlx":
        cand = MODELS_DIR / f"{stem[:-2]}.yaml"
        if cand.exists():
            return cand
    raise FileNotFoundError(f"model yaml not found for '{name}' (searched {MODELS_DIR})")


def guess_scale(name: str) -> str | None:
    stem = Path(name).stem
    if len(stem) > 2 and stem[-2] == "-" and stem[-1] in "nsmlx":
        return stem[-1]
    return None
