"""Detection training loss (reference: ultralytics/utils/loss.py:98-492 —
DFLoss, BboxLoss, v8DetectionLoss) + mixture-aux composition
(reference nn/mixture_loss.py CompositeCriterion:329).

Fully static shapes: GT comes padded to [B, M] with a validity mask; the whole
loss (TAL assignment included) is one pure function inside the jitted step.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops.anchors import bbox2dist, dfl_decode, dist2bbox, make_anchors
from ..ops.boxes import bbox_iou
from .assigner import task_aligned_assign


class LossBreakdown(NamedTuple):
    total: jnp.ndarray
    box: jnp.ndarray
    cls: jnp.ndarray
    dfl: jnp.ndarray
    aux: jnp.ndarray


def bce_with_logits(logits, targets):
    """Elementwise binary cross-entropy on logits (torch BCEWithLogitsLoss)."""
    logits = logits.astype(jnp.float32)
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def dfl_loss(pred_dist, target, reg_max: int):
    """Distribution focal loss (reference loss.py:98-116).

    pred_dist: [..., 4, reg_max] logits; target: [..., 4] continuous ltrb.
    Returns [...,] mean over the 4 sides.
    """
    target = jnp.clip(target, 0, reg_max - 1 - 0.01)
    tl = jnp.floor(target).astype(jnp.int32)
    tr = tl + 1
    wl = tr.astype(jnp.float32) - target
    wr = 1.0 - wl
    logp = jax.nn.log_softmax(pred_dist.astype(jnp.float32), axis=-1)
    ce_l = -jnp.take_along_axis(logp, tl[..., None], -1)[..., 0]
    ce_r = -jnp.take_along_axis(logp, jnp.clip(tr, 0, reg_max - 1)[..., None], -1)[..., 0]
    return jnp.mean(ce_l * wl + ce_r * wr, axis=-1)


def detection_loss(
    preds: Dict[str, jnp.ndarray],  # {"boxes": [B,A,4*reg_max], "scores": [B,A,nc]}
    hw_shapes: Sequence[Tuple[int, int]],
    strides: Sequence[int],
    gt_bboxes: jnp.ndarray,  # [B, M, 4] xyxy in input pixels
    gt_classes: jnp.ndarray,  # [B, M] int
    gt_mask: jnp.ndarray,  # [B, M] bool
    nc: int,
    reg_max: int = 16,
    box_gain: float = 7.5,
    cls_gain: float = 0.5,
    dfl_gain: float = 1.5,
    tal_topk: int = 10,
) -> LossBreakdown:
    """v8DetectionLoss for one head branch. Returns per-component losses
    (already scaled by gains and batch size, like reference loss.py:487-492)."""
    pred_dist = preds["boxes"]  # [B,A,4*reg_max]
    pred_scores = preds["scores"]  # [B,A,nc] logits
    B, A = pred_scores.shape[:2]

    anchors, stride_t = make_anchors(hw_shapes, strides)  # [A,2] grid units, [A,1]

    # decode to xyxy in grid units
    pred_ltrb = dfl_decode(pred_dist, reg_max)  # [B,A,4]
    pred_bboxes = dist2bbox(pred_ltrb, anchors[None], xywh=False)

    assign = task_aligned_assign(
        jax.nn.sigmoid(jax.lax.stop_gradient(pred_scores).astype(jnp.float32)),
        jax.lax.stop_gradient(pred_bboxes) * stride_t[None],
        anchors * stride_t,
        gt_classes,
        gt_bboxes,
        gt_mask,
        num_classes=nc,
        topk=tal_topk,
        strides=strides,
    )

    target_scores_sum = jnp.maximum(jnp.sum(assign.target_scores), 1.0)

    # cls BCE
    loss_cls = jnp.sum(bce_with_logits(pred_scores, assign.target_scores)) / target_scores_sum

    # box CIoU + DFL on foreground anchors (masked instead of gathered)
    fg = assign.fg_mask.astype(jnp.float32)  # [B,A]
    weight = jnp.sum(assign.target_scores, -1) * fg  # [B,A]
    target_grid = assign.target_bboxes / stride_t[None]  # grid units
    iou = bbox_iou(pred_bboxes, target_grid, xywh=False, CIoU=True)
    loss_box = jnp.sum((1.0 - iou) * weight) / target_scores_sum

    target_ltrb = bbox2dist(anchors[None], target_grid, reg_max - 1)  # [B,A,4]
    dl = dfl_loss(pred_dist.reshape(B, A, 4, reg_max), target_ltrb, reg_max)  # [B,A]
    loss_dfl = jnp.sum(dl * weight) / target_scores_sum

    loss_box = loss_box * box_gain * B
    loss_cls = loss_cls * cls_gain * B
    loss_dfl = loss_dfl * dfl_gain * B
    total = loss_box + loss_cls + loss_dfl
    return LossBreakdown(total, loss_box, loss_cls, loss_dfl, jnp.zeros(()))


def composite_loss(
    preds: Dict,
    hw_shapes,
    strides,
    gt_bboxes,
    gt_classes,
    gt_mask,
    nc: int,
    aux_total: jnp.ndarray,
    reg_max: int = 16,
    box_gain: float = 7.5,
    cls_gain: float = 0.5,
    dfl_gain: float = 1.5,
    moe_gain: float = 0.01,
    end2end: bool = False,
) -> LossBreakdown:
    """Task loss + mixture aux losses (reference CompositeCriterion,
    nn/mixture_loss.py:329; default moe aux gain from cfg/default.yaml moe keys).

    For end2end models this is the dual-assignment loss: one2many (topk=10)
    plus one2one (topk=1) on detached features (reference utils/loss.py E2E).
    """
    kw = dict(nc=nc, reg_max=reg_max, box_gain=box_gain, cls_gain=cls_gain, dfl_gain=dfl_gain)
    lb = detection_loss(preds["one2many"], hw_shapes, strides, gt_bboxes, gt_classes, gt_mask, tal_topk=10, **kw)
    if end2end and "one2one" in preds:
        lb2 = detection_loss(preds["one2one"], hw_shapes, strides, gt_bboxes, gt_classes, gt_mask, tal_topk=1, **kw)
        lb = LossBreakdown(lb.total + lb2.total, lb.box + lb2.box, lb.cls + lb2.cls, lb.dfl + lb2.dfl, lb.aux)
    aux = moe_gain * aux_total
    return LossBreakdown(lb.total + aux, lb.box, lb.cls, lb.dfl, aux)
