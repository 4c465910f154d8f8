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
    # select the tl/tr bins via an iota-compare reduction instead of two
    # take_along_axis gathers: a lane-axis gather (and its scatter-add
    # backward) serializes on TPU — measured 75 ms of the bs=64@640 loss
    # stage; the fused compare+sum form is bytes-free. Same math exactly.
    iota = jnp.arange(reg_max, dtype=jnp.int32)
    sel = wl[..., None] * (iota == tl[..., None]) + wr[..., None] * (iota == jnp.clip(tr, 0, reg_max - 1)[..., None])
    return jnp.mean(-jnp.sum(logp * sel, -1), axis=-1)


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
    return_assign: bool = False,
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

    # TAL metric inputs are fp32 even under bf16 training: a bf16 align metric
    # (x^6 on [0,1] overlaps with an 8-bit mantissa) measurably degrades
    # assignment quality (the AdamW+bf16 overfit gate stops learning) and the
    # fp32->bf16 swap bought no wall-clock at all — the assigner is top-k- and
    # fusion-bound, not bytes-bound (runs/bench/perf_sweep_train.json).
    assign = task_aligned_assign(
        jax.nn.sigmoid(jax.lax.stop_gradient(pred_scores).astype(jnp.float32)),
        jax.lax.stop_gradient(pred_bboxes).astype(jnp.float32) * stride_t[None],
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

    if reg_max > 1:
        target_ltrb = bbox2dist(anchors[None], target_grid, reg_max - 1)  # [B,A,4]
        dl = dfl_loss(pred_dist.reshape(B, A, 4, reg_max), target_ltrb, reg_max)  # [B,A]
    else:
        # DFL-free head (reg_max==1): normalized L1 on raw ltrb distances
        # (reference BboxLoss else-branch, loss.py:150-162)
        hw0 = hw_shapes[0]
        imgsz = jnp.array([hw0[1] * strides[0], hw0[0] * strides[0]], jnp.float32)  # (W, H)
        norm = jnp.array([imgsz[0], imgsz[1], imgsz[0], imgsz[1]], jnp.float32)[None, None, :]
        target_ltrb = bbox2dist(anchors[None], target_grid) * stride_t[None] / norm
        pred_n = pred_ltrb.astype(jnp.float32) * stride_t[None] / norm
        dl = jnp.mean(jnp.abs(pred_n - target_ltrb), -1)
    loss_dfl = jnp.sum(dl * weight) / target_scores_sum

    loss_box = loss_box * box_gain * B
    loss_cls = loss_cls * cls_gain * B
    loss_dfl = loss_dfl * dfl_gain * B
    total = loss_box + loss_cls + loss_dfl
    lb = LossBreakdown(total, loss_box, loss_cls, loss_dfl, jnp.zeros(()))
    if return_assign:
        return lb, assign
    return lb


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


# ---------------------------------------------------------------------------
# Instance segmentation loss (reference utils/loss.py:494-655 v8SegmentationLoss)
# ---------------------------------------------------------------------------

def crop_mask(masks: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """Zero mask pixels outside xyxy boxes (reference ops.py:477-494).
    masks [..., H, W], boxes [..., 4] in mask-pixel units."""
    h, w = masks.shape[-2:]
    r = jnp.arange(w, dtype=boxes.dtype)
    c = jnp.arange(h, dtype=boxes.dtype)
    x1, y1, x2, y2 = boxes[..., 0:1], boxes[..., 1:2], boxes[..., 2:3], boxes[..., 3:4]
    inside_x = (r[None, :] >= x1[..., None, :]) & (r[None, :] < x2[..., None, :])  # [..., 1, W]
    inside_y = (c[:, None] >= y1[..., :, None]) & (c[:, None] < y2[..., :, None])  # [..., H, 1]
    return masks * (inside_x & inside_y)


def segmentation_loss(
    pred_mask_coefs: jnp.ndarray,  # [B, A, nm]
    proto: jnp.ndarray,  # [B, Hm, Wm, nm] (NHWC)
    gt_masks: jnp.ndarray,  # [B, M, Hm, Wm] binary, mask-resolution
    assign,  # AssignResult from the detection branch
    imgsz: Tuple[int, int],
) -> jnp.ndarray:
    """Static-shape mask loss: per-anchor BCE of (coef @ proto) vs assigned GT
    mask, cropped to the target box, area-normalized, fg-masked
    (reference loss.py:565-655). GT masks are padded to M like GT boxes."""
    B, A, nm = pred_mask_coefs.shape
    Hm, Wm = proto.shape[1:3]
    fg = assign.fg_mask
    # assigned GT mask per anchor: gather over M -> [B, A, Hm, Wm] is huge;
    # instead compute per-GT mask losses then gather scalars.
    # pred masks for all anchors: [B, A, Hm, Wm] = coefs @ proto
    pred_masks = jnp.einsum("ban,bhwn->bahw", pred_mask_coefs.astype(jnp.float32), proto.astype(jnp.float32))
    gt_per_anchor = jnp.take_along_axis(gt_masks, assign.target_gt_idx[:, :, None, None], axis=1)  # [B,A,Hm,Wm]
    bce = jnp.maximum(pred_masks, 0) - pred_masks * gt_per_anchor + jnp.log1p(jnp.exp(-jnp.abs(pred_masks)))

    # crop to target box in mask pixels
    scale = jnp.array([Wm / imgsz[1], Hm / imgsz[0], Wm / imgsz[1], Hm / imgsz[0]], jnp.float32)
    mxyxy = assign.target_bboxes.astype(jnp.float32) * scale
    cropped = crop_mask(bce, mxyxy)  # [B,A,Hm,Wm]

    norm = jnp.array([imgsz[1], imgsz[0], imgsz[1], imgsz[0]], jnp.float32)
    nbox = assign.target_bboxes.astype(jnp.float32) / norm
    area = jnp.clip((nbox[..., 2] - nbox[..., 0]) * (nbox[..., 3] - nbox[..., 1]), 1e-7, None)  # [B,A]
    per_anchor = jnp.mean(cropped, axis=(2, 3)) / area  # [B,A]
    total = jnp.sum(per_anchor * fg)
    return total / jnp.clip(jnp.sum(fg), 1.0, None)


# ---------------------------------------------------------------------------
# Pose loss (reference utils/loss.py:655-800 v8PoseLoss + KeypointLoss:326-342)
# ---------------------------------------------------------------------------

OKS_SIGMA = jnp.array(
    [0.26, 0.25, 0.25, 0.35, 0.35, 0.79, 0.79, 0.72, 0.72, 0.62, 0.62, 1.07, 1.07, 0.87, 0.87, 0.89, 0.89],
    jnp.float32,
) / 10.0


def kpts_decode_train(anchor_points: jnp.ndarray, pred_kpts: jnp.ndarray) -> jnp.ndarray:
    """Train-time kpt decode in grid units (reference loss.py:704-710)."""
    xy = pred_kpts[..., :2] * 2.0 + (anchor_points[None, :, None, :] - 0.5)
    return jnp.concatenate([xy, pred_kpts[..., 2:]], -1)


def pose_loss(
    pred_kpts_raw: jnp.ndarray,  # [B, A, nk]
    gt_kpts: jnp.ndarray,  # [B, M, nkpt, ndim] in input pixels
    assign,
    anchors: jnp.ndarray,  # [A, 2] grid units
    stride_t: jnp.ndarray,  # [A, 1]
    kpt_shape=(17, 3),
):
    """Keypoint location (OKS-style) + visibility-object losses, static shape."""
    B, A = pred_kpts_raw.shape[:2]
    nkpt, ndim = kpt_shape
    fg = assign.fg_mask.astype(jnp.float32)  # [B,A]
    n_fg = jnp.clip(jnp.sum(fg), 1.0, None)

    pred = kpts_decode_train(anchors, pred_kpts_raw.reshape(B, A, nkpt, ndim).astype(jnp.float32))
    # gather assigned GT keypoints, to grid units
    sel = jnp.take_along_axis(gt_kpts.astype(jnp.float32), assign.target_gt_idx[:, :, None, None], axis=1)  # [B,A,nkpt,ndim]
    s = stride_t[None, :, None, :]  # [1, A, 1, 1]
    sel = jnp.concatenate([sel[..., :2] / s, sel[..., 2:]], -1)

    tb = assign.target_bboxes.astype(jnp.float32) / stride_t[None]
    area = jnp.clip((tb[..., 2] - tb[..., 0]) * (tb[..., 3] - tb[..., 1]), 0, None)  # [B,A]

    kpt_mask = (sel[..., 2] != 0) if ndim == 3 else jnp.ones(sel.shape[:-1], bool)  # [B,A,nkpt]
    d = (pred[..., 0] - sel[..., 0]) ** 2 + (pred[..., 1] - sel[..., 1]) ** 2
    sigmas = OKS_SIGMA if nkpt == 17 and ndim == 3 else jnp.ones((nkpt,), jnp.float32) / nkpt
    e = d / ((2 * sigmas[None, None]) ** 2 * (area[..., None] + 1e-9) * 2)
    factor = nkpt / (jnp.sum(kpt_mask, -1) + 1e-9)  # [B,A]
    per_anchor = jnp.mean(factor[..., None] * (1 - jnp.exp(-e)) * kpt_mask, axis=-1)  # [B,A]
    loc_loss = jnp.sum(per_anchor * fg) / n_fg

    if ndim == 3:
        vis_logits = pred[..., 2]
        vis_bce = jnp.maximum(vis_logits, 0) - vis_logits * kpt_mask + jnp.log1p(jnp.exp(-jnp.abs(vis_logits)))
        # torch: BCE mean over fg anchors' keypoints
        obj_loss = jnp.sum(jnp.mean(vis_bce, -1) * fg) / n_fg
    else:
        obj_loss = jnp.zeros(())
    return loc_loss, obj_loss


# ---------------------------------------------------------------------------
# OBB loss (reference utils/loss.py:997-1115 v8OBBLoss + RotatedBboxLoss)
# ---------------------------------------------------------------------------

def obb_loss(
    preds: Dict[str, jnp.ndarray],  # {"boxes", "scores", "angle"}
    hw_shapes,
    strides,
    gt_rboxes: jnp.ndarray,  # [B, M, 5] xywhr input pixels
    gt_classes: jnp.ndarray,
    gt_mask: jnp.ndarray,
    nc: int,
    reg_max: int = 16,
    box_gain: float = 7.5,
    cls_gain: float = 0.5,
    dfl_gain: float = 1.5,
    tal_topk: int = 10,
) -> LossBreakdown:
    from ..ops.anchors import make_anchors as _mk
    from ..ops.rotated import dist2rbox, probiou, rbox2dist
    from .assigner import rotated_task_aligned_assign

    pred_dist = preds["boxes"]
    pred_scores = preds["scores"]
    pred_angle = preds["angle"]  # already (sigmoid-0.25)*pi
    B, A = pred_scores.shape[:2]
    anchors, stride_t = _mk(hw_shapes, strides)

    pred_ltrb = dfl_decode(pred_dist, reg_max)
    pred_rbox = dist2rbox(pred_ltrb, pred_angle.astype(pred_ltrb.dtype), anchors[None])  # grid units xywh + r

    # tiny-GT filter (reference loss.py:1050-1053): drop boxes under 2px
    tiny = (gt_rboxes[..., 2] < 2) | (gt_rboxes[..., 3] < 2)
    gt_mask = gt_mask & ~tiny

    # Assignment quality degrades measurably from bf16-rounded box coords
    # (same invariant as the axis-aligned path): run the assigner in fp32.
    assigner_boxes = jnp.concatenate(
        [jax.lax.stop_gradient(pred_rbox[..., :4]) * stride_t[None], jax.lax.stop_gradient(pred_angle)], -1
    ).astype(jnp.float32)
    assign = rotated_task_aligned_assign(
        jax.nn.sigmoid(jax.lax.stop_gradient(pred_scores).astype(jnp.float32)),
        assigner_boxes,
        anchors * stride_t,
        gt_classes,
        gt_rboxes,
        gt_mask,
        num_classes=nc,
        topk=tal_topk,
        strides=strides,
    )
    target_scores_sum = jnp.maximum(jnp.sum(assign.target_scores), 1.0)
    loss_cls = jnp.sum(bce_with_logits(pred_scores, assign.target_scores)) / target_scores_sum

    fg = assign.fg_mask.astype(jnp.float32)
    weight = jnp.sum(assign.target_scores, -1) * fg
    target_grid = jnp.concatenate(
        [assign.target_bboxes[..., :4] / stride_t[None], assign.target_bboxes[..., 4:]], -1
    )
    pred_full = jnp.concatenate([pred_rbox[..., :4], pred_angle.astype(pred_rbox.dtype)], -1)
    iou = probiou(pred_full, target_grid, floor=0.01)
    loss_box = jnp.sum((1.0 - iou) * weight) / target_scores_sum

    target_ltrb = rbox2dist(target_grid[..., :4], anchors[None], target_grid[..., 4:5], reg_max - 1)
    dl = dfl_loss(pred_dist.reshape(B, A, 4, reg_max), target_ltrb, reg_max)
    loss_dfl = jnp.sum(dl * weight) / target_scores_sum

    loss_box = loss_box * box_gain * B
    loss_cls = loss_cls * cls_gain * B
    loss_dfl = loss_dfl * dfl_gain * B
    return LossBreakdown(loss_box + loss_cls + loss_dfl, loss_box, loss_cls, loss_dfl, jnp.zeros(()))


def classification_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Cross-entropy (reference v8ClassificationLoss, loss.py:985-995)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], -1))


def bce_dice_loss(pred_logits: jnp.ndarray, target: jnp.ndarray, weight_bce=0.5, weight_dice=0.5, smooth=1.0):
    """Combined BCE + multi-channel Dice (reference utils/loss.py:269-325).
    pred_logits, target: [B, H, W, C] (target one-hot/soft)."""
    bce = jnp.mean(bce_with_logits(pred_logits, target))
    probs = jax.nn.sigmoid(pred_logits.astype(jnp.float32))
    inter = jnp.sum(probs * target, axis=(1, 2))
    union = jnp.sum(probs, axis=(1, 2)) + jnp.sum(target, axis=(1, 2))
    dice = (2 * inter + smooth) / (union + smooth)
    dice_loss = jnp.mean(1.0 - dice)
    return weight_bce * bce + weight_dice * dice_loss


def semantic_loss(preds: Dict, sem_target: jnp.ndarray, nc: int, aux_weight: float = 0.4):
    """Semantic segmentation loss: BCE-Dice on main logits + P4 aux head
    (reference v8SegmentationLoss semantic branch + SemanticSegment training).
    sem_target: [B, H, W] int class map (downsampled to logit resolution)."""
    logits = preds["logits"]  # [B, h, w, nc]
    h, w = logits.shape[1:3]
    # nearest-downsample target to logit resolution
    t = sem_target[:, :: sem_target.shape[1] // h, :: sem_target.shape[2] // w]
    t = t[:, :h, :w]
    onehot = jax.nn.one_hot(t, nc, dtype=jnp.float32)
    total = bce_dice_loss(logits, onehot)
    if "aux_logits" in preds:
        aux_logits = preds["aux_logits"]
        ha, wa = aux_logits.shape[1:3]
        ta = sem_target[:, :: sem_target.shape[1] // ha, :: sem_target.shape[2] // wa][:, :ha, :wa]
        total = total + aux_weight * bce_dice_loss(aux_logits, jax.nn.one_hot(ta, nc, dtype=jnp.float32))
    return total
