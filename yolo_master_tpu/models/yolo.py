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
    WorldModel,
    YOLOEModel,
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
    "world": WorldModel,
    "yoloe": YOLOEModel,
}


class YOLO:
    """User facade over task models (reference engine/model.py Model class)."""

    def __init__(self, model: str = "yolo-master-n", task: Optional[str] = None, nc: Optional[int] = None, seed: int = 0):
        task = task or (self._guess_task(str(model)) if isinstance(model, str) else "detect")
        self.task = task
        self.names: Dict[int, str] = dict(COCO_NAMES)
        self.ckpt_path = None
        self.backend = None
        if isinstance(model, dict):  # inline cfg dict (reference Model(cfg))
            if task not in TASK_MODELS:
                raise KeyError(f"unknown task '{task}' (choices: {list(TASK_MODELS)})")
            self.model = TASK_MODELS[task](model, nc=nc)
            self.model_name = model.get("name", "custom")
            self.params = self.model.init_params(seed)
            self._predictor = None
            return
        model = str(model)
        if model.endswith(".pt"):
            raise NotImplementedError(
                "loading reference .pt directly by path: use YOLO(name).load_torch(path) with the matching yaml"
            )
        if model.endswith((".npz", ".tflite", ".stablehlo")) or Path(model).is_dir():
            # exported artifact -> AutoBackend (reference nn/autobackend.py:89)
            from ..nn.autobackend import AutoBackend

            self.backend = AutoBackend(model)
            self.model = self.backend.model  # None for non-native runtimes
            self.model_name = model
            self.params = self.backend.params
            self._predictor = None
            return
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
        if "yoloe" in name:
            return "yoloe"
        if "world" in name:
            return "world"
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
    def predict(self, source, stream: bool = False, vid_stride: int = 1, **kwargs):
        pred_keys = {"imgsz", "conf", "iou", "max_det", "max_nms", "agnostic_nms", "classes", "batch",
                     "compute_dtype", "second_nms_iou"}
        cfg = {k: v for k, v in kwargs.items() if k in pred_keys}
        # rebuild (and recompile) only when the predict cfg actually changed —
        # repeated predict(conf=...) calls with identical args reuse the jit
        if self._predictor is None or (cfg and cfg != getattr(self, "_predict_cfg", None)):
            from ..engine.predictors_task import TASK_PREDICTORS

            pred_cls = TASK_PREDICTORS.get(self.task, DetectionPredictor)
            self._predictor = pred_cls(self.model, self.params, names=self.names, backend=self.backend, **cfg)
            self._predict_cfg = cfg or getattr(self, "_predict_cfg", None)
        self._predictor.params = self.params
        return self._predictor(source, stream=stream, vid_stride=vid_stride)

    def __call__(self, source, **kwargs):
        return self.predict(source, **kwargs)

    def track(self, source, tracker: str = "bytetrack", persist: bool = False, stream: bool = False,
              vid_stride: int = 1, **kwargs):
        """Frame-sequence tracking over any source incl. video files and live
        streams (reference trackers/track.py predictor callbacks): predict per
        frame, associate in arrival order."""
        from ..trackers import TRACKER_MAP

        if not persist or not hasattr(self, "_tracker") or self._tracker is None:
            self._tracker = TRACKER_MAP[tracker](
                track_high_thresh=kwargs.pop("track_high_thresh", 0.45),
                track_low_thresh=kwargs.pop("track_low_thresh", 0.1),
                new_track_thresh=kwargs.pop("new_track_thresh", 0.6),
                track_buffer=kwargs.pop("track_buffer", 30),
                match_thresh=kwargs.pop("match_thresh", 0.8),
            )
        upd_vars = self._tracker.update.__code__.co_varnames
        takes_img = "img" in upd_vars
        if "dets_del" in upd_vars:  # TrackTrack's loose-NMS recovered bucket:
            # run a second NMS at the loose IoU inside the same jit
            kwargs.setdefault("second_nms_iou", 0.95)

        results_iter = self.predict(source, stream=True, vid_stride=vid_stride, **kwargs)

        def associate():
            from ..engine.results import Boxes

            for r in results_iter:
                extra = {}
                if takes_img:
                    extra["img"] = r.orig_img
                if "dets_del" in upd_vars and getattr(r, "dets_del", None) is not None:
                    extra["dets_del"] = r.dets_del
                if r.boxes is None or len(r.boxes) == 0:
                    r.tracks = np.zeros((0, 7), np.float32)
                else:
                    r.tracks = self._tracker.update(r.boxes.xyxy, r.boxes.conf, r.boxes.cls, **extra)
                if len(r.tracks):
                    # adopt the tracker's output as the boxes (reference
                    # trackers/track.py on_predict_postprocess_end:
                    # res.update(boxes=tracks)) — Boxes.is_track carries ids
                    r.boxes = Boxes(r.tracks, r.orig_shape)
                yield r

        return associate() if stream else list(associate())

    # -- training / validation (engine milestones) -------------------------------
    def train(self, **kwargs):
        """Per-task trainer dispatch (reference task_map, models/yolo/model.py:88).

        When ``data`` is a list/tuple the base model is fine-tuned on each
        dataset in series and a ``{dataset: metrics}`` dict is returned
        (reference MultiTrainer, engine/model.py:872-883)."""
        from ..engine.trainers_task import TASK_TRAINERS

        task = self.task
        trainer_cls = TASK_TRAINERS.get(task)
        if trainer_cls is None:
            raise NotImplementedError(f"no trainer for task '{self.task}'")
        data = kwargs.get("data")
        if isinstance(data, (list, tuple)):
            from ..engine.trainer import MultiTrainer

            kwargs = dict(kwargs)
            kwargs.pop("data")
            save_dir = kwargs.pop("save_dir", "runs/multitrain")
            return MultiTrainer(self, data, trainer_cls=trainer_cls, save_dir=save_dir, **kwargs).train()
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

        if self.backend is not None:
            return DetectionValidator(backend=self.backend, **kwargs)()
        validator = DetectionValidator(self, **kwargs)
        return validator()

    def export(self, format: str = "saved_model", imgsz: int = 640, nms: bool = True, output=None, **kwargs) -> str:
        """Export the model to a deployment artifact (reference Model.export,
        engine/model.py:769). Returns the artifact path, loadable back via
        YOLO(path) through AutoBackend."""
        from ..engine.exporter import export_model

        return export_model(self.model, self.params, fmt=format, imgsz=imgsz, nms=nms, output=output, **kwargs)

    def benchmark(self, imgsz: int = 640, formats=("npz", "saved_model", "tflite", "stablehlo"), data=None, **kwargs) -> Dict[str, dict]:
        """Export to each format and time (+ optionally validate) it
        (reference utils/benchmarks.py benchmark())."""
        import tempfile
        import time as _t

        out: Dict[str, dict] = {}
        x = np.random.default_rng(0).uniform(0, 1, (1, imgsz, imgsz, 3)).astype(np.float32)
        for fmt in formats:
            try:
                with tempfile.TemporaryDirectory() as td:
                    from ..engine.exporter import EXPORT_FORMATS
                    from ..nn.autobackend import AutoBackend

                    path = self.export(format=fmt, imgsz=imgsz, nms=False,
                                       output=str(Path(td) / ("m" + EXPORT_FORMATS[fmt]["suffix"])))
                    be = AutoBackend(path, model=self.model)
                    be(x)  # warmup
                    t0 = _t.perf_counter()
                    for _ in range(3):
                        be(x)
                    ms = (_t.perf_counter() - t0) / 3 * 1e3
                    entry = {"ok": True, "latency_ms": round(ms, 2)}
                    if data is not None:
                        entry["metrics"] = self.val(data=data, **kwargs) if be.kind in ("native", "npz") else \
                            __import__("yolo_master_tpu.engine.validator", fromlist=["DetectionValidator"]).DetectionValidator(
                                backend=be, data=data, imgsz=imgsz)()
                    out[fmt] = entry
            except Exception as e:  # noqa: BLE001
                out[fmt] = {"ok": False, "error": str(e)}
        return out

    def tune(self, data: str, iterations: int = 10, epochs: int = 10, save_dir: str = "runs/tune", **kwargs):
        """Hyperparameter evolution (reference Model.tune -> engine/tuner.py):
        each trial re-initializes weights, trains with the mutated hyp set, and
        reports fitness back to the mutation loop."""
        from ..engine.tuner import Tuner

        trainer_keys = ("lr0", "lrf", "momentum", "weight_decay", "warmup_epochs")

        def train_fn(hyp: Dict[str, float]) -> float:
            h = dict(hyp)
            tkw = {k: h.pop(k) for k in trainer_keys if k in h}
            self.params = self.model.init_params(0)  # fresh weights per trial
            out = self.train(data=data, epochs=epochs, hyp=h, save_dir=f"{save_dir}/trial", **tkw, **kwargs)
            return float(out.get("best_fitness", out.get("fitness", 0.0)))

        return Tuner(train_fn, save_dir=save_dir)(iterations)

    def set_classes(self, classes, encoder=None):
        """Swap the open-vocabulary class set (YOLOWorld/YOLOE; reference
        Model.set_classes). Encodes prompts and installs the text bank."""
        if not hasattr(self.model, "set_classes"):
            raise AttributeError(f"task '{self.task}' has no text vocabulary (use a -world/-yoloe model)")
        self.params = self.model.set_classes(self.params, list(classes), encoder)
        self.names = dict(enumerate(classes))
        self._predictor = None  # vocabulary changed: rebuild the predict graph
        return self

    def fuse(self, s2d: bool = False, pallas_stem: bool = False, imgsz: int = 640) -> "YOLO":
        """Deploy-time parameter surgery (reference Model.fuse): fold BN into
        conv biases.

        ``pallas_stem=True`` additionally replaces the two k3/s2 stem Convs
        with one fused Pallas kernel consuming a space-to-depth(4) host blob
        (ops/pallas_stem.py; measured 1.476 -> 1.194 ms e2e bs=1 and
        867 -> 1035 img/s bs=16 on v5e @640). The predictor then emits blobs
        in preprocess; ``imgsz`` must match predict-time imgsz (the kernel is
        shape-specialized).

        ``s2d=True`` instead rewrites the stem as space-to-depth XLA convs —
        bit-exact but measured SLOWER end-to-end (the in-graph relayout
        transpose dominates; see nn/layers.py SpaceToDepthConv), kept for
        pipelines with pre-block-laid inputs. Training on a fused model is
        unsupported (BN stats are gone)."""
        from ..utils.fuse import fuse_bn_params, pallas_stem_fuse, s2d_stem

        if self.model is None:
            return self  # exported-artifact backend: already frozen
        self.params = fuse_bn_params(self.params)
        if pallas_stem:
            # uint8_input: predictor ships raw uint8 blobs (4x smaller
            # transfer), /255 pre-folded into the stem weights
            self.params = pallas_stem_fuse(self.model, self.params, imgsz, uint8_input=True)
        elif s2d:
            self.params = s2d_stem(self.model, self.params)
        self._predictor = None  # graph changed: rebuild
        self._fused = True
        return self

    def info(self, imgsz: int = 640, detailed: bool = True):
        """Params + compiled-graph GFLOPs (reference Model.info)."""
        if detailed and hasattr(self.model, "forward_train"):
            from ..utils.info import model_info

            return model_info(self.model, self.params, imgsz=imgsz)
        n = self.model.num_params(self.params)
        LOGGER.info(f"{self.model_name}: {n:,} params (incl. BN stats), strides {getattr(self.model, 'head_strides', None)}")
        return n


class RTDETR(YOLO):
    """RT-DETR facade (reference models/rtdetr/model.py RTDETR): the YOLO verb
    surface over the transformer detector — NMS-free decode, rtdetr task."""

    def __init__(self, model: str = "rtdetr-master", **kw):
        super().__init__(model, task="rtdetr", **kw)


class YOLOWorld(YOLO):
    """Open-vocabulary facade (reference models/yolo/model.py YOLOWorld):
    YOLO with a text-conditioned WorldDetect head + set_classes()."""

    def __init__(self, model: str = "yolo-master-world", **kw):
        super().__init__(model, task="world", **kw)


class YOLOE(YOLO):
    """Text/visual-prompt facade (reference models/yolo/model.py YOLOE)."""

    def __init__(self, model: str = "yolo-master-yoloe", **kw):
        super().__init__(model, task="yoloe", **kw)

    def get_visual_pe(self, image_bgr, prompt_masks):
        """[1,Q,embed] visual prompt embeddings from binary masks drawn over
        the image (reference YOLOEModel.get_visual_pe)."""
        import jax.numpy as jnp

        from ..data.letterbox import letterbox

        lb, _, _ = letterbox(image_bgr, (640, 640))
        x = jnp.asarray(lb[..., ::-1].astype(np.float32) / 255.0)[None]
        vp = jnp.asarray(prompt_masks, jnp.float32)[None]  # [1,Q,H/8,W/8]
        return self.model.get_visual_pe(self.params, x, vp)

    def set_vocab_from_visual(self, image_bgr, prompt_masks, names):
        """Use visual prompt embeddings AS the vocabulary (prompt-free flow)."""
        vpe = np.asarray(self.get_visual_pe(image_bgr, prompt_masks))[0]
        from ..nn.module import dict_copy

        params = dict_copy(self.params)
        params["layers"][str(self.model.specs[-1].i)]["txt_feats"] = vpe
        self.params = params
        self.model.nc = len(names)
        self.model.head.nc = len(names)
        self.names = dict(enumerate(names))
        self._predictor = None
        return self
