from .boxes import (
    bbox_iou,
    box_iou_matrix,
    clip_boxes,
    scale_boxes,
    xywh2xyxy,
    xyxy2xywh,
)
from .anchors import bbox2dist, dist2bbox, make_anchors
from .nms import non_max_suppression

__all__ = [
    "bbox_iou",
    "box_iou_matrix",
    "clip_boxes",
    "scale_boxes",
    "xywh2xyxy",
    "xyxy2xywh",
    "bbox2dist",
    "dist2bbox",
    "make_anchors",
    "non_max_suppression",
]
