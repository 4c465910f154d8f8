"""Association utilities (reference: ultralytics/trackers/utils/matching.py)."""

from __future__ import annotations

import numpy as np
from scipy.optimize import linear_sum_assignment

from ..utils.metrics import box_iou_np


def iou_distance(atracks, btracks) -> np.ndarray:
    """1 - IoU cost matrix between two track/box lists (xyxy)."""
    aboxes = np.asarray([t.xyxy if hasattr(t, "xyxy") else t for t in atracks], np.float32).reshape(-1, 4)
    bboxes = np.asarray([t.xyxy if hasattr(t, "xyxy") else t for t in btracks], np.float32).reshape(-1, 4)
    if len(aboxes) == 0 or len(bboxes) == 0:
        return np.zeros((len(aboxes), len(bboxes)), np.float32)
    return 1.0 - box_iou_np(aboxes, bboxes)


def bbox_ioa(boxes_a: np.ndarray, boxes_b: np.ndarray, iou: bool = False) -> np.ndarray:
    """[A, B] intersection over boxes_b area (xyxy), or IoU when ``iou=True``
    (reference utils/metrics.py bbox_ioa — used by the occlusion-cover and
    track-aware-NMS checks)."""
    a = np.asarray(boxes_a, np.float32).reshape(-1, 4)
    b = np.asarray(boxes_b, np.float32).reshape(-1, 4)
    ix = np.minimum(a[:, None, 2], b[None, :, 2]) - np.maximum(a[:, None, 0], b[None, :, 0])
    iy = np.minimum(a[:, None, 3], b[None, :, 3]) - np.maximum(a[:, None, 1], b[None, :, 1])
    inter = np.clip(ix, 0, None) * np.clip(iy, 0, None)
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    denom = area_b[None, :]
    if iou:
        area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
        denom = area_a[:, None] + denom - inter
    return inter / (denom + 1e-9)


def fuse_score(cost_matrix: np.ndarray, detections) -> np.ndarray:
    """Fuse detection confidence into the cost (reference matching.py fuse_score)."""
    if cost_matrix.size == 0:
        return cost_matrix
    scores = np.asarray([d.score for d in detections])[None, :]
    return 1.0 - (1.0 - cost_matrix) * scores


def linear_assignment(cost_matrix: np.ndarray, thresh: float):
    """Hungarian assignment with gating; returns (matches, unmatched_a, unmatched_b)."""
    if cost_matrix.size == 0:
        return [], list(range(cost_matrix.shape[0])), list(range(cost_matrix.shape[1]))
    rows, cols = linear_sum_assignment(cost_matrix)
    matches, ua, ub = [], [], []
    matched_a, matched_b = set(), set()
    for r, c in zip(rows, cols):
        if cost_matrix[r, c] <= thresh:
            matches.append((int(r), int(c)))
            matched_a.add(int(r))
            matched_b.add(int(c))
    ua = [i for i in range(cost_matrix.shape[0]) if i not in matched_a]
    ub = [j for j in range(cost_matrix.shape[1]) if j not in matched_b]
    return matches, ua, ub
