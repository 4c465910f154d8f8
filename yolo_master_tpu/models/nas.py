"""YOLO-NAS facade (reference: ultralytics/models/nas/{model,predict,val}.py).

The reference NAS class is a thin wrapper over pretrained super-gradients
checkpoints: its predictor adapts the model's raw (decoded-boxes, scores)
output pair into the shared NMS path, and its validator pins NAS-specific
defaults (conf=0.001, iou=0.7, no multi-label). super-gradients (and its
weight hub) is network-dependent and absent here, so this facade provides
the same API over any detection graph in the registry, plus the same
raw-output adaptation contract for imported NAS-style weights: a model whose
decode yields (boxes_xyxy, class_scores) instead of the YOLO (xywh+logits)
layout.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..engine.predictor import DetectionPredictor
from ..nn.module import Context
from ..ops.nms import non_max_suppression


class NASPredictor(DetectionPredictor):
    """Adapts NAS raw output (xyxy boxes + per-class scores, already decoded)
    into the shared fixed-shape NMS (reference nas/predict.py: cat boxes+conf
    then shared postprocess)."""

    def _get_fn(self, bs: int):
        # NAS raw-output contract: a head that declares decode_layout="xyxy"
        # emits already-decoded corner boxes + per-class probabilities
        # (reference predict.py adapts them with xyxy2xywh before the shared
        # NMS). Registry heads decode xywh and take the standard path.
        if getattr(self.model.head, "decode_layout", "xywh") != "xyxy":
            return super()._get_fn(bs)
        if bs not in self._jitted:
            model, conf, iou, max_det, max_nms = self.model, self.conf, self.iou, self.max_det, self.max_nms

            @jax.jit
            def run(params, x):
                ctx = Context(training=False)
                preds = model.forward_train(params, x, ctx)
                decoded = model.head.decode(preds)
                xyxy = decoded[..., :4]
                xywh = jnp.concatenate([(xyxy[..., :2] + xyxy[..., 2:4]) / 2,
                                        xyxy[..., 2:4] - xyxy[..., :2]], -1)
                decoded = jnp.concatenate([xywh, decoded[..., 4:]], -1)
                return non_max_suppression(decoded, nc=model.nc, conf_thres=conf,
                                           iou_thres=iou, max_det=max_det, max_nms=max_nms)

            self._jitted[bs] = run
        return self._jitted[bs]


class NAS:
    """User facade (reference nas/model.py): pretrained-weights-only wrapper.

    ``NAS("weights.npz")`` loads an exported checkpoint; passing a registry
    architecture name builds it fresh (for testing without the weight hub)."""

    def __init__(self, model="yolo-master-n"):
        if isinstance(model, str) and Path(model).suffix in {".yaml", ".yml"}:
            raise AssertionError("YOLO-NAS models only support pre-trained models.")
        from ..nn.tasks import DetectionModel
        from ..utils.checkpoint import load_params_npz

        self.task = "detect"
        if isinstance(model, str) and Path(model).suffix == ".npz" and Path(model).exists():
            self.model = DetectionModel("yolo-master-n")
            self.params = load_params_npz(model)
        else:
            self.model = DetectionModel(model)
            self.params = self.model.init_params(0)
        self.names = {i: str(i) for i in range(self.model.nc)}
        self._predictor: Optional[NASPredictor] = None

    def predict(self, source, stream: bool = False, **kw):
        if self._predictor is None or kw:
            self._predictor = NASPredictor(self.model, self.params, names=self.names, **kw)
        self._predictor.params = self.params
        return self._predictor(source, stream=stream)

    __call__ = predict

    def val(self, data: str, **kw):
        """NAS-default validation (reference nas/val.py: conf 0.001, iou 0.7)."""
        from ..engine.validator import DetectionValidator

        kw.setdefault("conf", 0.001)
        kw.setdefault("iou", 0.7)
        return DetectionValidator(self.model, self.params, data=data, **kw)()

    def info(self):
        from ..utils.info import model_info

        return model_info(self.model, self.params)
