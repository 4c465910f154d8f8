"""CLI entrypoint: ``yolo-tpu TASK MODE key=value ...``
(reference: ultralytics/cfg/__init__.py:58-59,1137 entrypoint).

Examples:
    yolo-tpu detect predict model=yolo-master-n source=img.jpg conf=0.3
    yolo-tpu detect train model=yolo-master-n data=coco8.yaml epochs=50
    yolo-tpu detect val model=yolo-master-n data=coco8.yaml
    yolo-tpu detect export model=yolo-master-n format=saved_model
"""

from __future__ import annotations

import difflib
import sys
from typing import Any, Dict

from ..utils import LOGGER
from . import get_default_cfg

TASKS = ("detect", "segment", "classify", "pose", "obb", "semantic")
MODES = ("train", "val", "predict", "export", "track", "benchmark")

INT_KEYS = {"epochs", "patience", "batch", "imgsz", "seed", "workers", "max_det", "max_nms", "max_gt",
            "save_period", "slice_size", "lora_r", "molora_experts", "molora_top_k", "track_buffer", "close_mosaic"}
FLOAT_KEYS = {"lr0", "lrf", "momentum", "weight_decay", "warmup_epochs", "box", "cls", "dfl", "pose", "kobj",
              "conf", "iou", "sigma", "overlap_ratio", "objectness_threshold", "moe_gain", "fraction",
              "hsv_h", "hsv_s", "hsv_v", "fliplr", "flipud", "mosaic", "mixup", "scale", "translate",
              "lora_alpha", "lora_dropout", "track_high_thresh", "track_low_thresh", "new_track_thresh", "match_thresh"}
BOOL_KEYS = {"save", "val", "resume", "amp", "cos_lr", "half", "agnostic_nms", "augment", "retina_masks",
             "cluster", "weighted", "sparse_sahi", "int8", "nms", "dynamic", "lora", "molora",
             "save_txt", "save_conf", "save_crop", "save_json", "show", "rect", "multi_scale",
             "single_cls", "plots", "albumentations"}


def parse_value(key: str, value: str, like: Any = None) -> Any:
    if key in BOOL_KEYS or isinstance(like, bool):
        return value.lower() in ("1", "true", "yes")
    if key in INT_KEYS or isinstance(like, int):
        return int(float(value))
    if key in FLOAT_KEYS or isinstance(like, float):
        return float(value)
    if value.lower() in ("none", "null", ""):
        return None
    return value


def parse_args(argv) -> Dict[str, Any]:
    cfg = get_default_cfg()
    positional = []
    for arg in argv:
        if "=" in arg:
            key, value = arg.split("=", 1)
            if key not in cfg:
                # reference-config reconciliation (cfg/compat.py): aliases
                # translate, accepted keys merge, rejected keys error with
                # the recorded reason — never a silent drop
                from .compat import resolve_key

                kind, info = resolve_key(key)
                if kind == "alias":
                    key = info
                elif kind == "accepted":
                    cfg[key] = parse_value(key, value, like=info)
                    continue
                elif kind == "rejected":
                    raise SystemExit(f"'{key}' is not supported on the TPU path: {info}")
                else:
                    hint = difflib.get_close_matches(key, cfg.keys(), n=1)
                    raise SystemExit(f"unknown arg '{key}'" + (f" — did you mean '{hint[0]}'?" if hint else ""))
            cfg[key] = parse_value(key, value)
        else:
            positional.append(arg)
    for pos in positional:
        if pos in TASKS:
            cfg["task"] = pos
        elif pos in MODES:
            cfg["mode"] = pos
        else:
            raise SystemExit(f"unknown positional arg '{pos}' (tasks: {TASKS}, modes: {MODES})")
    return cfg


def entrypoint(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if not argv or argv[0] in ("-h", "--help", "help"):
        print(__doc__)
        return 0
    cfg = parse_args(argv)
    task, mode = cfg["task"], cfg["mode"]
    from ..utils.checks import check_imgsz

    cfg["imgsz"] = check_imgsz(cfg["imgsz"], stride=32)

    from ..models.yolo import YOLO

    model_name = cfg.get("model") or "yolo-master-n"
    yolo = YOLO(model_name, task="classify" if task == "classify" else "detect" if task == "detect" else task)
    if str(model_name).endswith(".npz"):
        raise SystemExit("pass the architecture via model= and weights via weights=")

    if mode == "predict":
        if not cfg.get("source"):
            raise SystemExit("predict requires source=...")
        results = yolo.predict(
            cfg["source"],
            conf=cfg.get("conf") or 0.25,
            iou=0.45 if cfg.get("iou") is None else cfg["iou"],
            imgsz=cfg["imgsz"],
            max_det=cfg["max_det"],
        )
        from pathlib import Path

        out_dir = Path(cfg.get("project") or "runs") / (cfg.get("name") or f"{task}_predict")
        for i, r in enumerate(results):
            LOGGER.info(f"{r.path}: {len(r)} dets  {[s['name'] for s in r.summary()]}")
            stem = Path(r.path).stem if r.path not in ("", "array") else f"im{i}"
            if cfg.get("save_txt"):
                r.save_txt(str(out_dir / "labels" / f"{stem}.txt"), save_conf=bool(cfg.get("save_conf")))
            if cfg.get("save_crop"):
                r.save_crop(str(out_dir / "crops"), f"{stem}.jpg")
            if cfg.get("save") and (cfg.get("save_txt") or cfg.get("save_crop") or cfg.get("show")):
                r.save(str(out_dir / f"{stem}.jpg"))
        return 0
    if mode == "train":
        if not cfg.get("data"):
            raise SystemExit("train requires data=...")
        out = yolo.train(
            data=cfg["data"], epochs=cfg["epochs"], batch=cfg["batch"], imgsz=cfg["imgsz"],
            lr0=cfg["lr0"], lrf=cfg["lrf"], momentum=cfg["momentum"], weight_decay=cfg["weight_decay"],
            warmup_epochs=cfg["warmup_epochs"], patience=cfg["patience"], max_gt=cfg["max_gt"],
            save_dir=f"runs/{task}/{cfg.get('name') or 'train'}", val=cfg["val"], seed=cfg["seed"],
        )
        LOGGER.info(f"training done: {out}")
        return 0
    if mode == "val":
        if not cfg.get("data"):
            raise SystemExit("val requires data=...")
        out = yolo.val(data=cfg["data"], imgsz=cfg["imgsz"], batch=cfg["batch"],
                       conf=cfg.get("conf") or 0.001, iou=cfg["iou"], max_det=cfg["max_det"])
        LOGGER.info(f"{out}")
        return 0
    if mode == "export":
        from ..engine.exporter import export_model

        out = export_model(yolo.model, yolo.params, fmt=cfg["format"], imgsz=cfg["imgsz"], int8=cfg["int8"], nms=cfg["nms"])
        LOGGER.info(f"exported: {out}")
        return 0
    if mode == "track":
        if not cfg.get("source"):
            raise SystemExit("track requires source=... (video/stream/images)")
        results = yolo.track(
            cfg["source"],
            tracker=cfg.get("tracker") or "bytetrack",
            conf=cfg.get("conf") or 0.25,
            iou=0.45 if cfg.get("iou") is None else cfg["iou"],
            imgsz=cfg["imgsz"],
            max_det=cfg["max_det"],
            vid_stride=int(cfg.get("vid_stride") or 1),
        )
        for r in results:
            ids = [int(t[4]) for t in r.tracks] if r.tracks is not None else []
            LOGGER.info(f"{r.path}#{getattr(r, 'frame', 0)}: {len(ids)} tracks {ids}")
        return 0
    if mode == "benchmark":
        out = yolo.benchmark(imgsz=cfg["imgsz"], data=cfg.get("data"))
        for fmt, row in out.items():
            LOGGER.info(f"benchmark {fmt}: {row}")
        return 0
    raise SystemExit(f"mode '{mode}' not implemented yet")


if __name__ == "__main__":
    raise SystemExit(entrypoint())
