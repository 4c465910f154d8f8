"""Predictor: streaming inference over sources (reference: ultralytics/engine/predictor.py:73-539).

TPU-first layout: preprocess (letterbox, host) -> one jitted graph containing
model forward + decode + fixed-shape NMS (no host round-trip between forward
and NMS, per BASELINE north star) -> host-side box rescale into Results.

Batch-size bucketing keeps recompiles bounded: inputs are padded to the next
power-of-two batch (XLA static shapes).
"""

from __future__ import annotations

import glob
import time
from pathlib import Path
from typing import Any, Dict, Iterable, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..data.letterbox import letterbox
from ..nn.module import Context
from ..ops.nms import non_max_suppression
from ..utils import LOGGER
from .results import Results

IMG_FORMATS = {"bmp", "jpeg", "jpg", "png", "tif", "tiff", "webp"}


def load_image(path: str) -> np.ndarray:
    import cv2

    im = cv2.imread(str(path))  # BGR HWC
    if im is None:
        raise FileNotFoundError(f"image not found or unreadable: {path}")
    return im


def expand_source(source) -> List[Any]:
    """Normalize a predict source into a list of (path, image or None)."""
    if isinstance(source, (list, tuple)):
        out = []
        for s in source:
            out.extend(expand_source(s))
        return out
    if isinstance(source, np.ndarray):
        return [("array", source)]
    p = Path(str(source))
    if p.is_dir():
        files = sorted(f for f in p.rglob("*") if f.suffix.lower().lstrip(".") in IMG_FORMATS)
        return [(str(f), None) for f in files]
    if any(ch in str(source) for ch in "*?["):
        return [(f, None) for f in sorted(glob.glob(str(source), recursive=True))]
    return [(str(p), None)]


class DetectionPredictor:
    """Batched detection inference (reference models/yolo/detect/predict.py)."""

    def __init__(
        self,
        model,
        params,
        names: Optional[Dict[int, str]] = None,
        imgsz: int = 640,
        conf: float = 0.25,
        iou: float = 0.45,
        max_det: int = 300,
        max_nms: int = 2048,
        agnostic_nms: bool = False,
        classes: Optional[Sequence[int]] = None,
        compute_dtype=jnp.float32,
        batch: int = 1,
    ):
        self.model = model
        self.params = params
        self.names = names or {i: str(i) for i in range(model.nc)}
        self.imgsz = imgsz if isinstance(imgsz, (tuple, list)) else (imgsz, imgsz)
        self.conf, self.iou = conf, iou
        self.max_det, self.max_nms = max_det, max_nms
        self.agnostic = agnostic_nms
        self.compute_dtype = compute_dtype
        self.batch = batch
        self.class_mask = None
        if classes is not None:
            m = np.zeros((model.nc,), np.float32)
            m[list(classes)] = 1.0
            self.class_mask = jnp.asarray(m)
        self._jitted = {}

    # -- device graph --------------------------------------------------------
    def _get_fn(self, bs: int):
        if bs not in self._jitted:
            end2end = self.model.head.end2end

            supports_raw = hasattr(self.model.head, "decode") and "raw_scores" in self.model.head.decode.__code__.co_varnames

            @jax.jit
            def run(params, x):
                ctx = Context(training=False)
                preds = self.model.forward_train(params, x, ctx)
                if end2end:
                    decoded = self.model.head.decode(preds)
                    out = self.model.head.postprocess_end2end(decoded, self.max_det)
                    conf_ok = out[..., 4] > self.conf
                    return {
                        "boxes": out[..., :4],
                        "scores": out[..., 4] * conf_ok,
                        "classes": jnp.where(conf_ok, out[..., 5], -1.0),
                        "valid": conf_ok,
                    }
                # logits fast path: candidate selection pre-sigmoid (monotonic)
                decoded = self.model.head.decode(preds, raw_scores=supports_raw)
                return non_max_suppression(
                    decoded,
                    nc=self.model.nc,
                    conf_thres=self.conf,
                    iou_thres=self.iou,
                    max_det=self.max_det,
                    max_nms=self.max_nms,
                    agnostic=self.agnostic,
                    class_mask=self.class_mask,
                    scores_are_logits=supports_raw,
                )

            self._jitted[bs] = run
        return self._jitted[bs]

    # -- host pipeline ---------------------------------------------------------
    def preprocess(self, images: List[np.ndarray]):
        """Letterbox + BGR->RGB + /255, stacked NHWC float batch."""
        processed, meta = [], []
        for im in images:
            lb, ratio, pad = letterbox(im, self.imgsz)
            processed.append(lb[..., ::-1])  # BGR -> RGB
            meta.append((im.shape[:2], ratio, pad))
        x = np.stack(processed).astype(np.float32) / 255.0
        return x, meta

    def __call__(self, source, stream: bool = False) -> List[Results]:
        items = expand_source(source)
        results: List[Results] = []
        for start in range(0, len(items), self.batch):
            chunk = items[start : start + self.batch]
            paths, images = [], []
            for path, arr in chunk:
                paths.append(path)
                images.append(arr if arr is not None else load_image(path))
            t0 = time.perf_counter()
            x, meta = self.preprocess(images)
            t1 = time.perf_counter()
            bs = x.shape[0]
            # power-of-two bucketing (capped at self.batch): ragged tail
            # batches pad up to a bucket instead of triggering a fresh compile
            pad_to = min(self.batch, 1 << (bs - 1).bit_length())
            if pad_to != bs:
                x = np.concatenate([x, np.zeros((pad_to - bs, *x.shape[1:]), x.dtype)], 0)
            det = self._get_fn(pad_to)(self.params, jnp.asarray(x, self.compute_dtype))
            det = jax.tree_util.tree_map(np.asarray, det)
            t2 = time.perf_counter()
            for i in range(bs):
                results.append(
                    self._build_result(paths[i], images[i], meta[i], jax.tree_util.tree_map(lambda a: a[i], det))
                )
            t3 = time.perf_counter()
            for i in range(bs):
                results[start + i].speed = {
                    "preprocess": (t1 - t0) / bs * 1e3,
                    "inference": (t2 - t1) / bs * 1e3,
                    "postprocess": (t3 - t2) / bs * 1e3,
                }
        return results

    def _build_result(self, path, orig_img, meta, det) -> Results:
        orig_shape, ratio, pad = meta
        n = int(det["valid"].sum())
        boxes = det["boxes"][:n].copy()
        # undo letterbox: subtract pad, divide ratio, clip
        boxes[:, [0, 2]] = (boxes[:, [0, 2]] - pad[0]) / ratio[0]
        boxes[:, [1, 3]] = (boxes[:, [1, 3]] - pad[1]) / ratio[1]
        boxes[:, [0, 2]] = boxes[:, [0, 2]].clip(0, orig_shape[1])
        boxes[:, [1, 3]] = boxes[:, [1, 3]].clip(0, orig_shape[0])
        data = np.concatenate([boxes, det["scores"][:n, None], det["classes"][:n, None]], -1)
        return Results(orig_img, path=path, names=self.names, boxes=data)
