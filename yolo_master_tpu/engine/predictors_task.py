"""Per-task predictors: segment / pose / obb / classify.

Reference: ultralytics/models/yolo/{segment,pose,obb,classify}/predict.py.
Each subclasses DetectionPredictor, overriding only the jitted device graph
(what extra tensors come back) and the host-side Results assembly — the
streaming-source loop, batching/bucketing, and letterbox handling are shared.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.module import Context
from ..ops.nms import non_max_suppression
from ..utils.metrics import sigmoid_np
from .predictor import DetectionPredictor
from .results import Results


class SegmentationPredictor(DetectionPredictor):
    """Detections + instance masks (reference segment/predict.py).

    The jitted graph returns NMS detections (mask coefficients ride the NMS
    'extra' channels) plus the prototype tensor; masks are assembled on host:
    sigmoid(coefs @ proto) > 0.5, cropped to boxes, un-letterboxed to the
    original resolution."""

    def _get_fn(self, bs: int):
        if bs not in self._jitted:
            model, conf, iou, max_det, max_nms = self.model, self.conf, self.iou, self.max_det, self.max_nms

            @jax.jit
            def run(params, x):
                ctx = Context(training=False)
                preds = model.forward_train(params, x, ctx)
                decoded = model.head.decode(preds)
                det = non_max_suppression(decoded, nc=model.nc, conf_thres=conf, iou_thres=iou,
                                          max_det=max_det, max_nms=max_nms,
                                          agnostic=self.agnostic, class_mask=self.class_mask)
                det["proto"] = preds["proto"]
                return det

            self._jitted[bs] = run
        return self._jitted[bs]

    def _build_result(self, path, orig_img, meta, det) -> Results:
        import cv2

        r = super()._build_result(path, orig_img, meta, {k: v for k, v in det.items() if k != "proto"})
        orig_shape, ratio, pad = meta
        n = len(r.boxes) if r.boxes is not None else 0
        proto = det["proto"]  # [mh, mw, nm]
        mh, mw, nm = proto.shape
        if n == 0:
            r.masks = None
            return r
        coefs = det["extra"][:n, :nm]
        pm = sigmoid_np(coefs @ proto.reshape(-1, nm).T)  # [n, mh*mw]
        pm = pm.reshape(n, mh, mw)
        # crop to boxes in letterbox space at proto resolution
        sx, sy = mw / self.imgsz[1], mh / self.imgsz[0]
        lb_boxes = det["boxes"][:n]
        ys, xs = np.mgrid[0:mh, 0:mw]
        masks = np.zeros((n, *orig_shape), bool)
        # content window of the letterboxed image, in proto coords
        cx1, cy1 = pad[0] * sx, pad[1] * sy
        cx2 = (pad[0] + orig_shape[1] * ratio[0]) * sx
        cy2 = (pad[1] + orig_shape[0] * ratio[1]) * sy
        for j in range(n):
            x1, y1, x2, y2 = lb_boxes[j] * np.array([sx, sy, sx, sy])
            m = pm[j] * ((xs >= x1) & (xs < x2) & (ys >= y1) & (ys < y2))
            # un-letterbox: crop the content window, resize to original
            crop = m[int(round(cy1)): max(int(round(cy2)), int(round(cy1)) + 1),
                     int(round(cx1)): max(int(round(cx2)), int(round(cx1)) + 1)]
            masks[j] = cv2.resize(crop.astype(np.float32), (orig_shape[1], orig_shape[0]),
                                  interpolation=cv2.INTER_LINEAR) > 0.5
        from .results import Masks

        r.masks = Masks(masks, orig_shape)
        return r


class PosePredictor(DetectionPredictor):
    """Detections + keypoints (reference pose/predict.py). Keypoints ride the
    NMS extra channels as [nk*3] absolute letterbox pixels; un-letterboxed on
    host."""

    def _build_result(self, path, orig_img, meta, det) -> Results:
        r = super()._build_result(path, orig_img, meta, det)
        orig_shape, ratio, pad = meta
        n = len(r.boxes) if r.boxes is not None else 0
        nk = self.model.head.kpt_shape[0]
        nd = self.model.head.kpt_shape[1]
        k = det["extra"][:n, : nk * nd].reshape(n, nk, nd).copy()
        k[..., 0] = ((k[..., 0] - pad[0]) / ratio[0]).clip(0, orig_shape[1])
        k[..., 1] = ((k[..., 1] - pad[1]) / ratio[1]).clip(0, orig_shape[0])
        from .results import Keypoints

        r.keypoints = Keypoints(k, orig_shape) if n else None
        return r


class OBBPredictor(DetectionPredictor):
    """Oriented detections (reference obb/predict.py): probIoU rotated
    fast-NMS on device (reference utils/nms.py:150-153,193 — the same keep-set
    the OBBValidator scores), xywhr un-letterboxed on host."""

    def _get_fn(self, bs: int):
        if bs not in self._jitted:
            from ..ops.nms import rotated_non_max_suppression

            model, conf, iou, max_det, max_nms = self.model, self.conf, self.iou, self.max_det, self.max_nms

            @jax.jit
            def run(params, x):
                preds = model.forward_train(params, x, Context(training=False))
                decoded = model.head.decode(preds)  # [B, A, 4+nc+1] xywh + scores + angle
                return rotated_non_max_suppression(decoded, nc=model.nc, conf_thres=conf,
                                                   iou_thres=iou, max_det=max_det,
                                                   max_nms=max_nms, agnostic=self.agnostic,
                                                   multi_label=False)

            self._jitted[bs] = run
        return self._jitted[bs]

    def _build_result(self, path, orig_img, meta, det) -> Results:
        orig_shape, ratio, pad = meta
        n = int(det["valid"].sum())
        rb = det["rboxes"][:n].copy()
        cx = (rb[:, 0] - pad[0]) / ratio[0]
        cy = (rb[:, 1] - pad[1]) / ratio[1]
        w = rb[:, 2] / ratio[0]
        h = rb[:, 3] / ratio[1]
        data = np.stack([cx, cy, w, h, rb[:, 4], det["scores"][:n], det["classes"][:n]], -1)
        return Results(orig_img, path=path, names=self.names, obb=data)


class ClassificationPredictor(DetectionPredictor):
    """Whole-image classification (reference classify/predict.py): center-crop
    square resize (no letterbox), softmax probs in Results.probs."""

    def __init__(self, *args, imgsz: int = 224, **kwargs):
        super().__init__(*args, imgsz=imgsz, **kwargs)

    def _get_fn(self, bs: int):
        if bs not in self._jitted:
            model = self.model

            @jax.jit
            def run(params, x):
                logits = model.forward_train(params, x, Context(training=False))
                return {"probs": jax.nn.softmax(logits.astype(jnp.float32), -1)}

            self._jitted[bs] = run
        return self._jitted[bs]

    def preprocess(self, images):
        import cv2

        processed, meta = [], []
        th, tw = self.imgsz
        for im in images:
            h, w = im.shape[:2]
            s = min(h, w)
            y0, x0 = (h - s) // 2, (w - s) // 2
            crop = im[y0: y0 + s, x0: x0 + s]
            processed.append(cv2.resize(crop, (tw, th), interpolation=cv2.INTER_LINEAR)[..., ::-1])
            meta.append((im.shape[:2], (1.0, 1.0), (0.0, 0.0)))
        x = np.stack(processed).astype(np.float32) / 255.0
        return x, meta

    def _build_result(self, path, orig_img, meta, det) -> Results:
        return Results(orig_img, path=path, names=self.names, probs=det["probs"])


TASK_PREDICTORS = {
    "detect": DetectionPredictor,
    "world": DetectionPredictor,
    "yoloe": DetectionPredictor,
    "segment": SegmentationPredictor,
    "pose": PosePredictor,
    "obb": OBBPredictor,
    "classify": ClassificationPredictor,
}
