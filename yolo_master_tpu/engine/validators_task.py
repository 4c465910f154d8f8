"""Task validators: segment (mask mAP), pose (OKS mAP), obb (probIoU mAP).

Reference: ultralytics/models/yolo/{segment,pose,obb}/val.py — each extends the
detection matching with a task-specific IoU: mask IoU over binarized proto
masks, OKS over keypoints, probIoU over rotated boxes. Matching and AP math
reuse utils/metrics (same 10-threshold greedy matching)."""

from __future__ import annotations

import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.dataset import DataLoader, OBBDataset, PoseDataset, SegmentDataset
from ..nn.module import Context
from ..ops.nms import non_max_suppression
from ..utils import LOGGER
from ..utils.metrics import IOUV, DetMetrics, ap_per_class, box_iou_np, match_predictions, sigmoid_np

OKS_SIGMA = (
    np.array([0.26, 0.25, 0.25, 0.35, 0.35, 0.79, 0.79, 0.72, 0.72, 0.62, 0.62, 1.07, 1.07, 0.87, 0.87, 0.89, 0.89], np.float32)
    / 10.0
)


def mask_iou_np(gt_masks: np.ndarray, pred_masks: np.ndarray, eps: float = 1e-7) -> np.ndarray:
    """[M, H, W] x [N, H, W] binary masks -> [M, N] IoU."""
    g = gt_masks.reshape(len(gt_masks), -1).astype(np.float32)
    p = pred_masks.reshape(len(pred_masks), -1).astype(np.float32)
    inter = g @ p.T
    union = g.sum(1)[:, None] + p.sum(1)[None] - inter + eps
    return inter / union


def oks_np(gt_kpts: np.ndarray, pred_kpts: np.ndarray, areas: np.ndarray, ndim: int = 3, eps: float = 1e-7) -> np.ndarray:
    """Object keypoint similarity [M, N] (reference utils/metrics.py:201 kpt_iou:
    e = d / ((2*sigma)^2 * (area+eps) * 2), the cocoeval formulation; visibility
    mask is gt vis != 0, normalized by visible-count + eps)."""
    M, nk = gt_kpts.shape[:2]
    N = len(pred_kpts)
    sigmas = OKS_SIGMA if nk == 17 else np.ones(nk, np.float32) / nk
    d = (gt_kpts[:, None, :, 0] - pred_kpts[None, :, :, 0]) ** 2 + (gt_kpts[:, None, :, 1] - pred_kpts[None, :, :, 1]) ** 2
    vis = (gt_kpts[..., 2] != 0) if ndim == 3 else np.ones((M, nk), bool)
    e = d / ((2 * sigmas[None, None]) ** 2 * (areas[:, None, None] + eps) * 2)
    oks = np.sum(np.exp(-e) * vis[:, None, :], -1) / (vis.sum(-1)[:, None] + eps)
    return oks


def probiou_np(gt: np.ndarray, pred: np.ndarray) -> np.ndarray:
    """Pairwise probIoU [M, N] of xywhr boxes via the jnp implementation."""
    from ..ops.rotated import probiou

    g = jnp.asarray(gt)[:, None, :]
    p = jnp.asarray(pred)[None, :, :]
    return np.asarray(probiou(g, p))


class _TaskValidator:
    """Shared loop: jitted forward+decode+NMS, per-image matching on host."""

    dataset_cls = None

    def __init__(self, model, params=None, data=None, imgsz: int = 640, batch: int = 8,
                 conf: float = 0.001, iou: float = 0.7, max_det: int = 300, max_gt: int = 64,
                 mesh=None, **dkw):
        self.model = model
        self.params = params
        self.data = data
        self.mesh = mesh  # accepted for trainer parity; loop is single-host
        self.imgsz, self.batch = imgsz, batch
        self.conf, self.iou, self.max_det = conf, iou, max_det
        self.max_gt = max_gt
        self.dkw = dkw
        self._fn = None

    def _jit(self):
        if self._fn is None:
            model, conf, iou, max_det = self.model, self.conf, self.iou, self.max_det
            extra = self._extra_channels()

            def run(p, x):
                preds = model.forward_train(p, x, Context(training=False))
                decoded = model.head.decode(preds)
                det = non_max_suppression(decoded, nc=model.nc, conf_thres=conf, iou_thres=iou,
                                          max_det=max_det, max_nms=4096, multi_label=True)
                out = {"det": det}
                self._add_extras(out, preds)
                return out

            self._fn = jax.jit(run)
        return self._fn

    def _extra_channels(self):
        return 0

    def _add_extras(self, out, preds):
        pass

    def __call__(self, params=None, dataset=None) -> Dict[str, float]:
        params = params if params is not None else self.params
        ds = dataset or self.dataset_cls(self.data, split="val", imgsz=self.imgsz, max_gt=self.max_gt, augment=False, **self.dkw)
        loader = DataLoader(ds, self.batch, shuffle=False)
        fn = self._jit()
        stats = {"box": [], "task": []}
        seen = 0
        t0 = time.perf_counter()
        for batch in loader.epoch(0):
            out = fn(params, jnp.asarray(batch["images"]))
            out = jax.tree_util.tree_map(np.asarray, out)
            bs = batch["images"].shape[0]
            for i in range(bs):
                if seen >= len(ds):
                    break
                self._update(stats, out, batch, i)
                seen += 1
        res = self._compute(stats)
        res["images"] = seen
        res["sec"] = time.perf_counter() - t0
        LOGGER.info(f"{type(self).__name__}: {seen} imgs {res}")
        return res

    @staticmethod
    def _ap_from(stats):
        if not stats:
            return {"mAP50": 0.0, "mAP50-95": 0.0}
        tp = np.concatenate([s[0] for s in stats])
        conf = np.concatenate([s[1] for s in stats])
        pcls = np.concatenate([s[2] for s in stats])
        tcls = np.concatenate([s[3] for s in stats])
        if tcls.size == 0:
            return {"mAP50": 0.0, "mAP50-95": 0.0}
        r = ap_per_class(tp, conf, pcls, tcls)
        return {
            "mAP50": float(r["ap50"].mean()) if r["ap50"].size else 0.0,
            "mAP50-95": float(r["ap"].mean()) if r["ap"].size else 0.0,
        }


class SegmentationValidator(_TaskValidator):
    """Box + mask mAP (reference models/yolo/segment/val.py)."""

    dataset_cls = SegmentDataset

    def _add_extras(self, out, preds):
        out["proto"] = preds["proto"]

    def _update(self, stats, out, batch, i):
        det = out["det"]
        n = int(det["valid"][i].sum())
        gt_n = int(batch["mask"][i].sum())
        boxes, scores, cls = det["boxes"][i, :n], det["scores"][i, :n], det["classes"][i, :n]
        gt_boxes, gt_cls = batch["boxes"][i, :gt_n], batch["classes"][i, :gt_n]
        iou = box_iou_np(gt_boxes, boxes) if n and gt_n else np.zeros((gt_n, n))
        correct_box = match_predictions(cls, gt_cls, iou) if n else np.zeros((0, len(IOUV)), bool)
        stats["box"].append((correct_box, scores, cls, gt_cls))

        # predicted masks = sigmoid(coefs @ proto) > 0.5, cropped to boxes
        coefs = det["extra"][i, :n]  # [n, nm]
        proto = out["proto"][i]  # [mh, mw, nm]
        mh, mw = proto.shape[:2]
        if n:
            pm = sigmoid_np(coefs @ proto.reshape(-1, proto.shape[-1]).T)  # [n, mh*mw]
            pm = pm.reshape(n, mh, mw) > 0.5
            scale = mh / (self.imgsz)
            ys, xs = np.mgrid[0:mh, 0:mw]
            for j in range(n):
                x1, y1, x2, y2 = boxes[j] * scale
                pm[j] &= (xs >= x1) & (xs < x2) & (ys >= y1) & (ys < y2)
        else:
            pm = np.zeros((0, mh, mw), bool)
        gm = batch["masks"][i, :gt_n] > 0.5
        miou = mask_iou_np(gm, pm) if n and gt_n else np.zeros((gt_n, n))
        correct_mask = match_predictions(cls, gt_cls, miou) if n else np.zeros((0, len(IOUV)), bool)
        stats["task"].append((correct_mask, scores, cls, gt_cls))

    def _compute(self, stats):
        box = self._ap_from(stats["box"])
        mask = self._ap_from(stats["task"])
        return {"mAP50": box["mAP50"], "mAP50-95": box["mAP50-95"],
                "mask_mAP50": mask["mAP50"], "mask_mAP50-95": mask["mAP50-95"],
                "fitness": 0.45 * box["mAP50-95"] + 0.45 * mask["mAP50-95"] + 0.1 * (box["mAP50"] + mask["mAP50"]) / 2}


class PoseValidator(_TaskValidator):
    """Box + OKS pose mAP (reference models/yolo/pose/val.py)."""

    dataset_cls = PoseDataset

    def _update(self, stats, out, batch, i):
        det = out["det"]
        n = int(det["valid"][i].sum())
        gt_n = int(batch["mask"][i].sum())
        boxes, scores, cls = det["boxes"][i, :n], det["scores"][i, :n], det["classes"][i, :n]
        gt_boxes, gt_cls = batch["boxes"][i, :gt_n], batch["classes"][i, :gt_n]
        iou = box_iou_np(gt_boxes, boxes) if n and gt_n else np.zeros((gt_n, n))
        stats["box"].append((match_predictions(cls, gt_cls, iou) if n else np.zeros((0, len(IOUV)), bool), scores, cls, gt_cls))

        nk = batch["keypoints"].shape[2]
        pk = det["extra"][i, :n].reshape(n, nk, -1) if n else np.zeros((0, nk, 3))
        gk = batch["keypoints"][i, :gt_n]
        areas = (gt_boxes[:, 2] - gt_boxes[:, 0]) * (gt_boxes[:, 3] - gt_boxes[:, 1]) * 0.53
        oks = oks_np(gk, pk, areas) if n and gt_n else np.zeros((gt_n, n))
        stats["task"].append((match_predictions(cls, gt_cls, oks) if n else np.zeros((0, len(IOUV)), bool), scores, cls, gt_cls))

    def _compute(self, stats):
        box = self._ap_from(stats["box"])
        pose = self._ap_from(stats["task"])
        return {"mAP50": box["mAP50"], "mAP50-95": box["mAP50-95"],
                "pose_mAP50": pose["mAP50"], "pose_mAP50-95": pose["mAP50-95"],
                "fitness": 0.45 * box["mAP50-95"] + 0.45 * pose["mAP50-95"] + 0.1 * box["mAP50"]}


class OBBValidator(_TaskValidator):
    """probIoU-matched rotated-box mAP (reference models/yolo/obb/val.py)."""

    dataset_cls = OBBDataset

    def _jit(self):
        if self._fn is None:
            from ..ops.nms import rotated_non_max_suppression

            model, conf, max_det = self.model, self.conf, self.max_det

            def run(p, x):
                preds = model.forward_train(p, x, Context(training=False))
                decoded = model.head.decode(preds)  # [B, A, 4+nc+1] xywh + scores + angle
                # reference nms.py:150-153: rotated branch = fast-NMS over
                # probIoU with the class offset applied to box centers
                det = rotated_non_max_suppression(decoded, nc=model.nc, conf_thres=conf,
                                                  iou_thres=self.iou, max_det=max_det,
                                                  max_nms=4096, multi_label=True)
                return {"det": det}

            self._fn = jax.jit(run)
        return self._fn

    def _update(self, stats, out, batch, i):
        det = out["det"]
        n = int(det["valid"][i].sum())
        gt_n = int(batch["mask"][i].sum())
        scores, cls = det["scores"][i, :n], det["classes"][i, :n]
        gt_cls = batch["classes"][i, :gt_n]
        pred_r = det["rboxes"][i, :n] if n else np.zeros((0, 5))
        gt_r = batch["rboxes"][i, :gt_n]
        iou = probiou_np(gt_r, pred_r) if n and gt_n else np.zeros((gt_n, n))
        stats["box"].append((match_predictions(cls, gt_cls, iou) if n else np.zeros((0, len(IOUV)), bool), scores, cls, gt_cls))
        stats["task"].append(stats["box"][-1])

    def _compute(self, stats):
        box = self._ap_from(stats["box"])
        return {"mAP50": box["mAP50"], "mAP50-95": box["mAP50-95"],
                "fitness": 0.9 * box["mAP50-95"] + 0.1 * box["mAP50"]}


class ClassificationValidator:
    """Top-1/top-5 accuracy (reference models/yolo/classify/val.py)."""

    def __init__(self, model, params=None, data=None, imgsz: int = 224, batch: int = 16, mesh=None, **kw):
        self.model = model
        self.params = params
        self.data = data
        self.imgsz, self.batch = imgsz, batch
        self._fn = None

    def __call__(self, params=None, dataset=None) -> Dict[str, float]:
        from pathlib import Path

        from ..data.dataset import ClassificationDataset

        params = params if params is not None else self.params
        ds = dataset or ClassificationDataset(str(Path(self.data) / "val"), imgsz=self.imgsz)
        loader = DataLoader(ds, self.batch, shuffle=False)
        if self._fn is None:
            model = self.model
            self._fn = jax.jit(lambda p, x: model.forward_train(p, x, Context(training=False)))
        correct1 = correct5 = seen = 0
        t0 = time.perf_counter()
        for batch in loader.epoch(0):
            logits = np.asarray(self._fn(params, jnp.asarray(batch["images"])))
            order = np.argsort(-logits, -1)
            for i in range(logits.shape[0]):
                if seen >= len(ds):
                    break
                y = int(batch["classes"][i])
                correct1 += int(order[i, 0] == y)
                correct5 += int(y in order[i, :5])
                seen += 1
        res = {
            "top1": correct1 / max(seen, 1),
            "top5": correct5 / max(seen, 1),
            "fitness": correct1 / max(seen, 1),
            "images": seen,
            "sec": time.perf_counter() - t0,
        }
        LOGGER.info(f"ClassificationValidator: {res}")
        return res


class SemanticValidator:
    """Pixel accuracy + mean IoU over classes (reference semantic val)."""

    def __init__(self, model, params=None, data=None, imgsz: int = 640, batch: int = 8, max_gt: int = 0, mesh=None, **kw):
        self.model = model
        self.params = params
        self.data = data
        self.imgsz, self.batch = imgsz, batch
        self._fn = None

    def __call__(self, params=None, dataset=None) -> Dict[str, float]:
        from ..data.dataset import SemanticDataset

        params = params if params is not None else self.params
        ds = dataset or SemanticDataset(self.data, split="val", imgsz=self.imgsz, augment=False)
        loader = DataLoader(ds, self.batch, shuffle=False)
        if self._fn is None:
            model = self.model
            self._fn = jax.jit(lambda p, x: model.forward_predict(p, x, Context(training=False)))
        nc = self.model.nc
        inter = np.zeros(nc)
        union = np.zeros(nc)
        correct = total = 0
        seen = 0
        t0 = time.perf_counter()
        for batch in loader.epoch(0):
            pred = np.asarray(self._fn(params, jnp.asarray(batch["images"])))  # [B, h, w, nc] logits
            lab = np.argmax(pred, -1)
            gt = batch["sem_mask"]
            if lab.shape[1:] != gt.shape[1:]:  # logits at stride: nearest-upsample
                ry, rx = gt.shape[1] // lab.shape[1], gt.shape[2] // lab.shape[2]
                lab = np.repeat(np.repeat(lab, ry, 1), rx, 2)[:, : gt.shape[1], : gt.shape[2]]
            for i in range(lab.shape[0]):
                if seen >= len(ds):
                    break
                valid = gt[i] != 255
                correct += int((lab[i][valid] == gt[i][valid]).sum())
                total += int(valid.sum())
                for c in range(nc):
                    pi, gi = lab[i][valid] == c, gt[i][valid] == c
                    inter[c] += int((pi & gi).sum())
                    union[c] += int((pi | gi).sum())
                seen += 1
        present = union > 0
        miou = float((inter[present] / np.maximum(union[present], 1)).mean()) if present.any() else 0.0
        res = {
            "pixel_acc": correct / max(total, 1),
            "mIoU": miou,
            "fitness": miou,
            "images": seen,
            "sec": time.perf_counter() - t0,
        }
        LOGGER.info(f"SemanticValidator: {res}")
        return res
