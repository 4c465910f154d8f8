"""Sparse SAHI: sliced hyper-inference for 4K/8K imagery with blank-region
skipping (reference README.md:299-337; config keys cfg/__init__.py:330,393-394;
the reference ships the harness but not the predictor module — SURVEY.md §2.13
says to implement the described pipeline natively).

Pipeline:
  1. low-res full-image pass -> objectness heatmap (max class prob per anchor)
  2. tile grid with overlap; skip tiles whose max objectness < threshold
  3. high-res inference on the surviving tiles, batched through the SAME
     jitted graph (tiles share the slice_size shape -> one compilation)
  4. merge all detections in global coordinates via CW-NMS

TPU notes: the keep/skip decision is host-side between jit calls (that's where
the 3-5x saving lives); tile batches are padded to power-of-two buckets so the
jitted graph sees a small, fixed set of shapes.
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.letterbox import letterbox
from ..nn.module import Context
from ..ops.nms import cluster_weighted_nms, non_max_suppression
from ..utils import LOGGER
from .results import Results


def tile_grid(h: int, w: int, slice_size: int, overlap_ratio: float) -> List[Tuple[int, int]]:
    """Top-left corners of a covering tile grid."""
    stride = max(1, int(slice_size * (1 - overlap_ratio)))
    xs = list(range(0, max(w - slice_size, 0) + 1, stride))
    ys = list(range(0, max(h - slice_size, 0) + 1, stride))
    if not xs or xs[-1] + slice_size < w:
        xs.append(max(w - slice_size, 0))
    if not ys or ys[-1] + slice_size < h:
        ys.append(max(h - slice_size, 0))
    return [(x, y) for y in sorted(set(ys)) for x in sorted(set(xs))]


class SparseSAHIPredictor:
    """Sliced inference with objectness-gated tile skipping."""

    def __init__(
        self,
        model,
        params,
        names=None,
        imgsz: int = 640,
        slice_size: int = 640,
        overlap_ratio: float = 0.2,
        objectness_threshold: float = 0.15,
        conf: float = 0.25,
        iou: float = 0.45,
        max_det: int = 300,
        use_cw_nms: bool = True,
        sigma: float = 0.1,
        tile_batch: int = 8,
    ):
        self.model = model
        self.params = params
        self.names = names or {}
        self.imgsz = imgsz
        self.slice_size = slice_size
        self.overlap_ratio = overlap_ratio
        self.objectness_threshold = objectness_threshold
        self.conf, self.iou, self.max_det = conf, iou, max_det
        self.use_cw_nms = use_cw_nms
        self.sigma = sigma
        self.tile_batch = tile_batch
        self._decode = jax.jit(lambda p, x: model.forward_predict(p, x, Context(training=False)))
        self.last_stats = {}

    # -- stage 1: low-res objectness ----------------------------------------
    def _lowres_pass(self, img: np.ndarray):
        lb, ratio, pad = letterbox(img, self.imgsz)
        x = jnp.asarray(lb[..., ::-1].astype(np.float32) / 255.0)[None]
        decoded = np.asarray(self._decode(self.params, x))[0]  # [A, 4+nc]
        boxes = decoded[:, :4]  # xywh, letterbox px
        obj = decoded[:, 4:].max(-1)
        # anchor centers back to original image coords
        cx = (boxes[:, 0] - pad[0]) / ratio[0]
        cy = (boxes[:, 1] - pad[1]) / ratio[1]
        return decoded, obj, cx, cy, (ratio, pad)

    # -- stage 3: batched tile inference --------------------------------------
    def _run_tiles(self, img: np.ndarray, tiles: List[Tuple[int, int]]):
        s = self.slice_size
        all_det = []
        for start in range(0, len(tiles), self.tile_batch):
            chunk = tiles[start : start + self.tile_batch]
            crops = np.zeros((self.tile_batch, s, s, 3), np.float32)  # fixed batch: one compile
            for i, (x0, y0) in enumerate(chunk):
                crop = img[y0 : y0 + s, x0 : x0 + s]
                crops[i, : crop.shape[0], : crop.shape[1]] = crop[..., ::-1].astype(np.float32) / 255.0
            decoded = np.asarray(self._decode(self.params, jnp.asarray(crops)))
            for i, (x0, y0) in enumerate(chunk):
                d = decoded[i].copy()
                d[:, 0] += x0  # shift xywh centers to global coords
                d[:, 1] += y0
                all_det.append(d)
        return np.concatenate(all_det, 0) if all_det else None

    def __call__(self, img: np.ndarray, path: str = "sahi") -> Results:
        h, w = img.shape[:2]
        decoded_low, obj, cx, cy, (ratio, pad) = self._lowres_pass(img)

        tiles = tile_grid(h, w, self.slice_size, self.overlap_ratio)
        hot = (cx[obj >= self.objectness_threshold], cy[obj >= self.objectness_threshold])
        active = []
        for x0, y0 in tiles:
            inside = (hot[0] >= x0) & (hot[0] < x0 + self.slice_size) & (hot[1] >= y0) & (hot[1] < y0 + self.slice_size)
            if inside.any():
                active.append((x0, y0))
        self.last_stats = {"tiles": len(tiles), "active": len(active), "skip_ratio": 1 - len(active) / max(len(tiles), 1)}

        # low-res detections mapped to global coords
        low = decoded_low.copy()
        low[:, 0] = (low[:, 0] - pad[0]) / ratio[0]
        low[:, 1] = (low[:, 1] - pad[1]) / ratio[1]
        low[:, 2] /= ratio[0]
        low[:, 3] /= ratio[1]

        merged = low if not active else np.concatenate([low, self._run_tiles(img, active)], 0)
        pred = jnp.asarray(merged)[None]
        if self.use_cw_nms:
            det = cluster_weighted_nms(
                pred, nc=self.model.nc, conf_thres=self.conf, iou_thres=self.iou,
                max_det=self.max_det, max_nms=4096, sigma=self.sigma,
            )
        else:
            det = non_max_suppression(
                pred, nc=self.model.nc, conf_thres=self.conf, iou_thres=self.iou,
                max_det=self.max_det, max_nms=4096,
            )
        det = jax.tree_util.tree_map(lambda a: np.asarray(a[0]), det)
        n = int(det["valid"].sum())
        boxes = det["boxes"][:n].copy()
        boxes[:, [0, 2]] = boxes[:, [0, 2]].clip(0, w)
        boxes[:, [1, 3]] = boxes[:, [1, 3]].clip(0, h)
        data = np.concatenate([boxes, det["scores"][:n, None], det["classes"][:n, None]], -1)
        return Results(img, path=path, names=self.names, boxes=data)
