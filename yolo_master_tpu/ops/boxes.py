"""Box ops (reference: ultralytics/utils/ops.py and utils/metrics.py IoU family).

All functions work on last-axis xyxy/xywh layouts and are jnp/numpy agnostic
where possible (jnp used throughout; numpy inputs are promoted).
"""

from __future__ import annotations

import jax.numpy as jnp


def xywh2xyxy(x):
    """center-xywh -> xyxy (reference ops.py)."""
    xy, wh = x[..., :2], x[..., 2:4]
    half = wh / 2
    return jnp.concatenate([xy - half, xy + half, x[..., 4:]], -1)


def xyxy2xywh(x):
    x1y1, x2y2 = x[..., :2], x[..., 2:4]
    return jnp.concatenate([(x1y1 + x2y2) / 2, x2y2 - x1y1, x[..., 4:]], -1)


def clip_boxes(boxes, shape):
    """Clip xyxy boxes to image shape (h, w)."""
    h, w = shape
    return jnp.stack(
        [
            jnp.clip(boxes[..., 0], 0, w),
            jnp.clip(boxes[..., 1], 0, h),
            jnp.clip(boxes[..., 2], 0, w),
            jnp.clip(boxes[..., 3], 0, h),
        ],
        -1,
    )


def scale_boxes(img1_shape, boxes, img0_shape, ratio_pad=None, padding=True):
    """Rescale xyxy boxes from letterboxed img1_shape back to img0_shape
    (reference ops.py:119 scale_boxes)."""
    if ratio_pad is None:
        gain = min(img1_shape[0] / img0_shape[0], img1_shape[1] / img0_shape[1])
        pad_w = round((img1_shape[1] - img0_shape[1] * gain) / 2 - 0.1)
        pad_h = round((img1_shape[0] - img0_shape[0] * gain) / 2 - 0.1)
    else:
        gain = ratio_pad[0][0]
        pad_w, pad_h = ratio_pad[1]
    if padding:
        boxes = boxes - jnp.array([pad_w, pad_h, pad_w, pad_h], boxes.dtype)
    boxes = boxes / gain
    return clip_boxes(boxes, img0_shape)


def box_area(b):
    return jnp.clip(b[..., 2] - b[..., 0], 0, None) * jnp.clip(b[..., 3] - b[..., 1], 0, None)


def box_iou_matrix(a, b, eps=1e-7):
    """Pairwise IoU of xyxy boxes: a [N,4], b [M,4] -> [N,M]
    (reference metrics.py box_iou)."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:4], b[None, :, 2:4])
    wh = jnp.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(a)[:, None] + box_area(b)[None, :] - inter + eps
    return inter / union


def bbox_iou(box1, box2, xywh=True, GIoU=False, DIoU=False, CIoU=False, eps=1e-7):
    """Elementwise IoU with optional GIoU/DIoU/CIoU penalties
    (reference utils/metrics.py:82-150 bbox_iou). Broadcasting elementwise.
    """
    if xywh:
        x1, y1, w1, h1 = box1[..., 0], box1[..., 1], box1[..., 2], box1[..., 3]
        x2, y2, w2, h2 = box2[..., 0], box2[..., 1], box2[..., 2], box2[..., 3]
        b1x1, b1x2, b1y1, b1y2 = x1 - w1 / 2, x1 + w1 / 2, y1 - h1 / 2, y1 + h1 / 2
        b2x1, b2x2, b2y1, b2y2 = x2 - w2 / 2, x2 + w2 / 2, y2 - h2 / 2, y2 + h2 / 2
    else:
        b1x1, b1y1, b1x2, b1y2 = box1[..., 0], box1[..., 1], box1[..., 2], box1[..., 3]
        b2x1, b2y1, b2x2, b2y2 = box2[..., 0], box2[..., 1], box2[..., 2], box2[..., 3]
        w1, h1 = b1x2 - b1x1, b1y2 - b1y1 + eps
        w2, h2 = b2x2 - b2x1, b2y2 - b2y1 + eps

    inter = jnp.clip(jnp.minimum(b1x2, b2x2) - jnp.maximum(b1x1, b2x1), 0, None) * jnp.clip(
        jnp.minimum(b1y2, b2y2) - jnp.maximum(b1y1, b2y1), 0, None
    )
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union
    if not (GIoU or DIoU or CIoU):
        return iou

    cw = jnp.maximum(b1x2, b2x2) - jnp.minimum(b1x1, b2x1)  # convex width
    ch = jnp.maximum(b1y2, b2y2) - jnp.minimum(b1y1, b2y1)  # convex height
    if CIoU or DIoU:
        c2 = cw**2 + ch**2 + eps
        rho2 = ((b2x1 + b2x2 - b1x1 - b1x2) ** 2 + (b2y1 + b2y2 - b1y1 - b1y2) ** 2) / 4
        if CIoU:
            v = (4 / jnp.pi**2) * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
            import jax

            alpha = v / (v - iou + (1 + eps))
            alpha = jax.lax.stop_gradient(alpha)
            return iou - (rho2 / c2 + v * alpha)
        return iou - rho2 / c2
    c_area = cw * ch + eps
    return iou - (c_area - union) / c_area
