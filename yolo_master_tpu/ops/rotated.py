"""Rotated-box (OBB) geometry: probIoU and rbox<->dist transforms.

Reference: ultralytics/utils/metrics.py:224-290 (_get_covariance_matrix,
probiou) and utils/tal.py:434-490 (dist2rbox, rbox2dist).
Format everywhere: xywhr (center, size, radians), last-axis layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _covariance(boxes: jnp.ndarray, floor: float = 0.0):
    """Gaussian-bbox covariance components (a, c; c, b) from xywhr."""
    a = boxes[..., 2] ** 2 / 12 + floor
    b = boxes[..., 3] ** 2 / 12 + floor
    r = boxes[..., 4]
    cos, sin = jnp.cos(r), jnp.sin(r)
    cos2, sin2 = cos**2, sin**2
    return a * cos2 + b * sin2, a * sin2 + b * cos2, (a - b) * cos * sin


def probiou(obb1: jnp.ndarray, obb2: jnp.ndarray, CIoU: bool = False, eps: float = 1e-7, floor: float = 0.0):
    """Probabilistic IoU of rotated boxes (Bhattacharyya-distance based),
    elementwise with broadcasting (reference metrics.py:245-290)."""
    x1, y1 = obb1[..., 0], obb1[..., 1]
    x2, y2 = obb2[..., 0], obb2[..., 1]
    a1, b1, c1 = _covariance(obb1, floor)
    a2, b2, c2 = _covariance(obb2, floor)

    denom = (a1 + a2) * (b1 + b2) - (c1 + c2) ** 2 + eps
    t1 = ((a1 + a2) * (y1 - y2) ** 2 + (b1 + b2) * (x1 - x2) ** 2) / denom * 0.25
    t2 = ((c1 + c2) * (x2 - x1) * (y1 - y2)) / denom * 0.5
    det1 = jnp.clip(a1 * b1 - c1**2, 0, None)
    det2 = jnp.clip(a2 * b2 - c2**2, 0, None)
    t3 = jnp.log(((a1 + a2) * (b1 + b2) - (c1 + c2) ** 2) / (4 * jnp.sqrt(det1 * det2) + eps) + eps) * 0.5
    bd = jnp.clip(t1 + t2 + t3, eps, 100.0)
    hd = jnp.sqrt(1.0 - jnp.exp(-bd) + eps)
    iou = 1 - hd
    if CIoU:
        w1, h1 = obb1[..., 2], obb1[..., 3]
        w2, h2 = obb2[..., 2], obb2[..., 3]
        v = (4 / jnp.pi**2) * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
        alpha = jax.lax.stop_gradient(v / (v - iou + (1 + eps)))
        return iou - v * alpha
    return iou


def dist2rbox(pred_dist: jnp.ndarray, pred_angle: jnp.ndarray, anchor_points: jnp.ndarray):
    """ltrb distances + angle -> rotated box xywh (reference tal.py:434-452).
    pred_dist [..., 4], pred_angle [..., 1], anchor_points [..., 2]."""
    lt, rb = jnp.split(pred_dist, 2, axis=-1)
    cos, sin = jnp.cos(pred_angle), jnp.sin(pred_angle)
    xf, yf = jnp.split((rb - lt) / 2, 2, axis=-1)
    x = xf * cos - yf * sin
    y = xf * sin + yf * cos
    xy = jnp.concatenate([x, y], -1) + anchor_points
    return jnp.concatenate([xy, lt + rb], -1)


def rbox2dist(target_bboxes: jnp.ndarray, anchor_points: jnp.ndarray, target_angle: jnp.ndarray, reg_max=None):
    """Rotated box xywh + angle -> ltrb distances (reference tal.py:455-490)."""
    xy, wh = jnp.split(target_bboxes, 2, axis=-1)
    offset = xy - anchor_points
    ox, oy = offset[..., 0:1], offset[..., 1:2]
    cos, sin = jnp.cos(target_angle), jnp.sin(target_angle)
    xf = ox * cos + oy * sin
    yf = -ox * sin + oy * cos
    w, h = wh[..., 0:1], wh[..., 1:2]
    dist = jnp.concatenate([w / 2 - xf, h / 2 - yf, w / 2 + xf, h / 2 + yf], -1)
    if reg_max is not None:
        dist = jnp.clip(dist, 0, reg_max - 0.01)
    return dist


def xywhr2xyxyxyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    """xywhr -> 4 corner points [..., 4, 2] (reference ops.py xywhr2xyxyxyxy)."""
    ctr = boxes[..., :2]
    w, h, r = boxes[..., 2:3], boxes[..., 3:4], boxes[..., 4:5]
    cos, sin = jnp.cos(r), jnp.sin(r)
    vec1 = jnp.concatenate([w / 2 * cos, w / 2 * sin], -1)
    vec2 = jnp.concatenate([-h / 2 * sin, h / 2 * cos], -1)
    return jnp.stack([ctr + vec1 + vec2, ctr + vec1 - vec2, ctr - vec1 - vec2, ctr - vec1 + vec2], axis=-2)
