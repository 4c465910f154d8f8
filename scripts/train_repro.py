#!/usr/bin/env python
"""Reproducible training entry point (reference scripts/reproduce/* —
dataset-specific repro runs with pinned seeds and logged configs).

Usage:
    python scripts/train_repro.py --data coco8.yaml --model yolo-master-n \
        --epochs 100 --batch 16 --imgsz 640 --seed 0 [--peft lora_r=8]

Writes runs/<name>/: results.csv, routing_history.csv + dashboard,
best/last.npz, and a repro.json capturing the exact config + environment.
"""

from __future__ import annotations

import argparse
import json
import platform
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def git_rev() -> str:
    try:
        return subprocess.run(["git", "rev-parse", "--short", "HEAD"], capture_output=True,
                              text=True, cwd=Path(__file__).parents[1]).stdout.strip()
    except Exception:  # noqa: BLE001
        return "unknown"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True)
    ap.add_argument("--model", default="yolo-master-n")
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--name", default="repro")
    ap.add_argument("--optimizer", default="auto")
    ap.add_argument("--peft", default=None, help="e.g. lora_r=8 or molora_num_experts=4")
    args = ap.parse_args()

    import jax

    from yolo_master_tpu.models.yolo import YOLO

    peft = None
    if args.peft:
        k, v = args.peft.split("=")
        peft = {k: int(v)}

    save_dir = Path("runs") / args.name
    save_dir.mkdir(parents=True, exist_ok=True)
    (save_dir / "repro.json").write_text(json.dumps({
        "argv": sys.argv[1:],
        "git": git_rev(),
        "jax": jax.__version__,
        "backend": jax.default_backend(),
        "devices": [str(d) for d in jax.devices()],
        "python": platform.python_version(),
    }, indent=2))

    model = YOLO(args.model)
    out = model.train(data=args.data, epochs=args.epochs, batch=args.batch, imgsz=args.imgsz,
                      seed=args.seed, optimizer=args.optimizer, save_dir=str(save_dir), peft=peft)
    (save_dir / "final_metrics.json").write_text(json.dumps(
        {k: float(v) for k, v in out.items() if isinstance(v, (int, float))}, indent=2))
    print(json.dumps({k: round(float(v), 5) for k, v in out.items() if isinstance(v, (int, float))}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
