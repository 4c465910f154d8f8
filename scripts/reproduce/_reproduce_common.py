#!/usr/bin/env python3
"""Shared runner for the per-dataset baseline reproduction scripts.

Analog of the reference's ``scripts/reproduce/_reproduce_common.py``: each
entry point trains the two nano release variants from their YAMLs (from
scratch) on one dataset, logs per-epoch metrics to the run's ``results.csv``
(the trainer's callback fan-out already writes it), and aggregates the final
metrics of every run into ``summary.csv`` under the sweep directory.

Models
------
  - YOLO-Master-v0.1-N  (OptimizedMOEImproved blocks — train/eval-consistent)
  - YOLO-Master-EsMoE-N (ES_MOE blocks — paper variant)

Sparse vs dense evaluation (EsMoE-N)
------------------------------------
Like the reference, ES_MOE defaults to sparse top-k inference at eval. The
reference documents that the shipped sparse eval collapses val mAP and offers
``--no-sparse-eval`` for the corrected dense evaluation; the same flag exists
here (it flips ``use_sparse_inference`` on every ES_MOE module before any
validation). In this framework sparse eval is gathered-exact (renormalized
top-k, tests/test_sparse_dispatch.py) so the collapse does not occur — the
flag is kept for protocol parity with the reference scripts.

Offline use: ``--check-build`` builds each model, runs one forward at the
requested imgsz, and prints parameter/GFLOP counts without touching data.
"""
from __future__ import annotations

import argparse
import csv
import sys
import time
from dataclasses import dataclass, field
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))


@dataclass(frozen=True)
class ModelSpec:
    key: str          # CLI name, e.g. "v0.1-N"
    cfg: str          # model yaml name, e.g. "yolo-master-v0_1-n"
    has_esmoe: bool = False


@dataclass(frozen=True)
class DatasetSpec:
    name: str         # display name
    data: str         # dataset yaml (zoo name or path)
    project: str      # sweep directory
    imgsz: int = 640
    extra: dict = field(default_factory=dict)


MODELS = (
    ModelSpec("v0.1-N", "yolo-master-v0_1-n"),
    ModelSpec("EsMoE-N", "yolo-master-n", has_esmoe=True),
)


def set_sparse_eval(model, enabled: bool) -> int:
    """Flip ``use_sparse_inference`` on every routed module (ES_MOE and kin),
    walking nested blocks; returns the number of modules flipped."""
    seen, n = set(), 0

    def walk(obj, depth=0):
        nonlocal n
        if depth > 8 or id(obj) in seen or not hasattr(obj, "__dict__"):
            return
        seen.add(id(obj))
        if hasattr(obj, "use_sparse_inference"):
            obj.use_sparse_inference = enabled
            n += 1
        for v in vars(obj).values():
            if isinstance(v, (list, tuple)):
                for it in v:
                    walk(it, depth + 1)
            elif hasattr(v, "__dict__") and not isinstance(v, type):
                walk(v, depth + 1)

    for layer in getattr(model, "layers", []):
        walk(layer)
    return n


def check_build(spec: ModelSpec, imgsz: int) -> dict:
    import jax
    import numpy as np

    from yolo_master_tpu.models.yolo import YOLO

    y = YOLO(spec.cfg)
    x = np.zeros((1, imgsz, imgsz, 3), np.float32)
    out = jax.jit(lambda p, im: y.model.forward_predict(p, im))(y.params, x)
    jax.block_until_ready(out)
    n_params = int(sum(p.size for p in jax.tree_util.tree_leaves(y.params)))
    return {"model": spec.key, "cfg": spec.cfg, "params": n_params,
            "out_shape": tuple(np.asarray(out).shape)}


def run_one(spec: ModelSpec, ds: DatasetSpec, args) -> dict:
    from yolo_master_tpu.models.yolo import YOLO

    y = YOLO(spec.cfg)
    if spec.has_esmoe and args.no_sparse_eval:
        n = set_sparse_eval(y.model, False)
        print(f"[{spec.key}] corrected dense eval: flipped {n} ES_MOE modules")
    run_dir = Path(ds.project) / spec.key.replace(".", "_")
    t0 = time.time()
    metrics = y.train(
        data=args.data or ds.data, epochs=args.epochs, batch=args.batch,
        imgsz=args.imgsz or ds.imgsz, save_dir=str(run_dir),
        tensorboard=args.tensorboard, **ds.extra,
    )
    out = {"model": spec.key, "dataset": ds.name, "sec": round(time.time() - t0, 1)}
    out.update({k: float(v) for k, v in (metrics or {}).items() if isinstance(v, (int, float))})
    return out


def run_dataset(ds: DatasetSpec, models=MODELS) -> int:
    ap = argparse.ArgumentParser(description=f"Reproduce YOLO-Master baselines on {ds.name}")
    ap.add_argument("--model", choices=[m.key for m in models], help="run only this variant")
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--imgsz", type=int, default=None)
    ap.add_argument("--data", default=None, help="override dataset yaml (e.g. a local copy)")
    ap.add_argument("--no-sparse-eval", action="store_true",
                    help="corrected dense evaluation for ES_MOE models (see module docstring)")
    ap.add_argument("--check-build", action="store_true",
                    help="offline: build each model + one forward, print params/GFLOPs, exit")
    ap.add_argument("--tensorboard", action="store_true")
    args = ap.parse_args()

    selected = [m for m in models if args.model in (None, m.key)]
    if args.check_build:
        for m in selected:
            print(check_build(m, args.imgsz or ds.imgsz))
        return 0

    rows = []
    for m in selected:
        try:
            rows.append(run_one(m, ds, args))
        except Exception as e:  # noqa: BLE001 — one failed variant must not sink the sweep
            import traceback

            traceback.print_exc()
            rows.append({"model": m.key, "dataset": ds.name, "error": str(e)})
    sweep = Path(ds.project)
    sweep.mkdir(parents=True, exist_ok=True)
    keys = sorted({k for r in rows for k in r})
    with open(sweep / "summary.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=keys)
        w.writeheader()
        w.writerows(rows)
    print(f"summary -> {sweep / 'summary.csv'}")
    return 0 if all("error" not in r for r in rows) else 1
