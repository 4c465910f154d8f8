"""YOLO model facade (reference: ultralytics/engine/model.py:30-1199).

Unified user entry point: ``YOLO("yolo-master-n").predict(...)/.val()/.train()``.
Model sources: a model name / yaml (fresh init), our orbax/npz checkpoints, or
a reference PyTorch ``.pt`` (converted on load via utils/torch_import).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np

from ..cfg import COCO_NAMES
from ..engine.predictor import DetectionPredictor
from ..nn.tasks import (
    ClassificationModel,
    DetectionModel,
    OBBModel,
    PoseModel,
    RTDETRDetectionModel,
    SegmentationModel,
    SemanticSegmentationModel,
)
from ..utils import LOGGER

TASK_MODELS = {
    "detect": DetectionModel,
    "segment": SegmentationModel,
    "pose": PoseModel,
    "obb": OBBModel,
    "classify": ClassificationModel,
    "semantic": SemanticSegmentationModel,
    "rtdetr": RTDETRDetectionModel,
}


class YOLO:
    """User facade over task models (reference engine/model.py Model class)."""

    def __init__(self, model: str = "yolo-master-n", task: Optional[str] = None, nc: Optional[int] = None, seed: int = 0):
        task = task or self._guess_task(str(model))
        self.task = task
        self.names: Dict[int, str] = dict(COCO_NAMES)
        self.ckpt_path = None
        model = str(model)
        if model.endswith(".pt"):
            raise NotImplementedError(
                "loading reference .pt directly by path: use YOLO(name).load_torch(path) with the matching yaml"
            )
        if model.endswith((".npz", ".ckpt")):
            raise NotImplementedError("native checkpoint loading lands with the trainer")
        if task not in TASK_MODELS:
            raise KeyError(f"unknown task '{task}' (choices: {list(TASK_MODELS)})")
        self.model = TASK_MODELS[task](model, nc=nc)
        self.model_name = model
        self.params = self.model.init_params(seed)
        self._predictor: Optional[DetectionPredictor] = None

    @staticmethod
    def _guess_task(name: str) -> str:
        """Infer task from model name (reference Model task inference)."""
        for key in ("seg", "pose", "obb", "cls", "semantic"):
            if f"-{key}" in name or f"_{key}" in name:
                return {"seg": "segment", "cls": "classify"}.get(key, key)
        if "rtdetr" in name:
            return "rtdetr"
        return "detect"

    # -- weights ---------------------------------------------------------------
    def load_torch(self, pt_path: str) -> "YOLO":
        """Import reference PyTorch weights (.pt) into the params tree."""
        from ..utils.torch_import import load_reference_checkpoint

        self.params = jax.device_put(load_reference_checkpoint(self.params, pt_path))
        self.ckpt_path = pt_path
        LOGGER.info(f"imported reference checkpoint {pt_path}")
        return self

    def load_state_dict(self, state_dict) -> "YOLO":
        from ..utils.torch_import import import_state_dict

        self.params = jax.device_put(import_state_dict(self.params, state_dict))
        return self

    # -- inference ---------------------------------------------------------------
    def predict(self, source, **kwargs):
        pred_keys = {"imgsz", "conf", "iou", "max_det", "max_nms", "agnostic_nms", "classes", "batch", "compute_dtype"}
        cfg = {k: v for k, v in kwargs.items() if k in pred_keys}
        if self._predictor is None or cfg:
            self._predictor = DetectionPredictor(self.model, self.params, names=self.names, **cfg)
        self._predictor.params = self.params
        return self._predictor(source)

    def __call__(self, source, **kwargs):
        return self.predict(source, **kwargs)

    def track(self, source, tracker: str = "bytetrack", persist: bool = False, **kwargs):
        """Frame-sequence tracking: predict per frame then associate
        (reference trackers/track.py predictor callbacks)."""
        from ..trackers import TRACKER_MAP

        if not persist or not hasattr(self, "_tracker") or self._tracker is None:
            self._tracker = TRACKER_MAP[tracker](
                track_high_thresh=kwargs.pop("track_high_thresh", 0.45),
                track_low_thresh=kwargs.pop("track_low_thresh", 0.1),
                new_track_thresh=kwargs.pop("new_track_thresh", 0.6),
                track_buffer=kwargs.pop("track_buffer", 30),
                match_thresh=kwargs.pop("match_thresh", 0.8),
            )
        from ..trackers.bot_sort import BOTSORT

        results = self.predict(source, **kwargs)
        for r in results:
            if r.boxes is None or len(r.boxes) == 0:
                r.tracks = np.zeros((0, 7), np.float32)
                continue
            if isinstance(self._tracker, BOTSORT):
                r.tracks = self._tracker.update(r.boxes.xyxy, r.boxes.conf, r.boxes.cls, img=r.orig_img)
            else:
                r.tracks = self._tracker.update(r.boxes.xyxy, r.boxes.conf, r.boxes.cls)
        return results

    # -- training / validation (engine milestones) -------------------------------
    def train(self, **kwargs):
        """Per-task trainer dispatch (reference task_map, models/yolo/model.py:88)."""
        from ..engine.trainers_task import TASK_TRAINERS

        trainer_cls = TASK_TRAINERS.get(self.task)
        if trainer_cls is None:
            raise NotImplementedError(f"no trainer for task '{self.task}'")
        trainer = trainer_cls(self, **kwargs)
        return trainer.train()

    def val(self, **kwargs):
        if self.task in ("segment", "pose", "obb", "classify", "semantic"):
            from ..engine import validators_task as vt

            cls = {
                "segment": vt.SegmentationValidator,
                "pose": vt.PoseValidator,
                "obb": vt.OBBValidator,
                "classify": vt.ClassificationValidator,
                "semantic": vt.SemanticValidator,
            }[self.task]
            return cls(self.model, params=self.params, **kwargs)()
        from ..engine.validator import DetectionValidator

        validator = DetectionValidator(self, **kwargs)
        return validator()

    def info(self):
        n = self.model.num_params(self.params)
        LOGGER.info(f"{self.model_name}: {n:,} params (incl. BN stats), strides {getattr(self.model, 'head_strides', None)}")
        return n
