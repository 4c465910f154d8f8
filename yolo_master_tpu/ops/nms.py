"""TPU-native NMS: fixed-shape, batched, fully on-device.

Reference semantics: ultralytics/utils/nms.py:13-171 (greedy torchvision-style
NMS with the class-offset trick, conf prefilter, max_nms cap, max_det limit).

TPU-first recast (SURVEY.md §7.4): instead of dynamic boolean filtering and a
sequential greedy loop over a dynamic candidate set, we
  1. select the top ``max_nms`` candidates by score with ``lax.top_k``
     (score 0 / invalid for entries below ``conf_thres``) — static shape;
  2. run *exact greedy* NMS as a ``max_det``-step ``lax.scan``: each step picks
     the highest-scored unsuppressed candidate and suppresses everything with
     IoU > threshold against it. This needs no N×N IoU matrix (O(max_det · N)
     work, vectorized on the VPU) and reproduces torchvision's greedy keep set
     exactly for the first ``max_det`` keeps.
Outputs are fixed-shape [B, max_det, 6] plus a validity mask, so the whole
predict path stays inside one jitted graph.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from .boxes import xywh2xyxy

MAX_WH = 7680.0  # class-offset magnitude (reference nms.py max_wh)


def _greedy_nms(boxes: jnp.ndarray, scores: jnp.ndarray, iou_thres: float, max_det: int):
    """Exact greedy NMS over [N] candidates.

    Args:
        boxes: [N, 4] xyxy (already class-offset if class-aware).
        scores: [N] scores; invalid candidates must be <= 0.
        max_det: number of sequential keep steps.

    Returns:
        keep_idx [max_det] int32 indices into N, keep_valid [max_det] bool.
    """
    n = boxes.shape[0]
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    areas = jnp.clip(x2 - x1, 0, None) * jnp.clip(y2 - y1, 0, None)

    def step(alive_scores, _):
        idx = jnp.argmax(alive_scores)
        best = alive_scores[idx]
        valid = best > 0.0
        bx1, by1, bx2, by2 = x1[idx], y1[idx], x2[idx], y2[idx]
        iw = jnp.clip(jnp.minimum(x2, bx2) - jnp.maximum(x1, bx1), 0, None)
        ih = jnp.clip(jnp.minimum(y2, by2) - jnp.maximum(y1, by1), 0, None)
        inter = iw * ih
        iou = inter / (areas + areas[idx] - inter + 1e-7)
        suppress = (iou > iou_thres) | (jnp.arange(n) == idx)
        alive_scores = jnp.where(valid & suppress, 0.0, alive_scores)
        return alive_scores, (idx.astype(jnp.int32), valid)

    _, (keep_idx, keep_valid) = jax.lax.scan(step, scores, None, length=max_det)
    return keep_idx, keep_valid


def _prep_candidates(
    pred: jnp.ndarray,
    nc: int,
    conf_thres: float,
    max_nms: int,
    multi_label: bool,
    class_mask: Optional[jnp.ndarray],
    scores_are_logits: bool,
):
    """pred: [A, 4+nc+extra] xywh. Top-max_nms candidate selection (vmapped)."""
    a = pred.shape[0]
    extra = pred.shape[1] - 4 - nc
    boxes = xywh2xyxy(pred[:, :4])
    cls_scores = pred[:, 4 : 4 + nc]
    if class_mask is not None:
        if scores_are_logits:
            # zeroing a logit would sigmoid to 0.5 and beat real negatives;
            # excluded classes must be -inf in logit space
            cls_scores = jnp.where(class_mask[None, :] > 0, cls_scores, -1e9)
        else:
            cls_scores = cls_scores * class_mask[None, :]

    if multi_label and nc > 1:
        # candidates = all (anchor, class) pairs above threshold
        flat = cls_scores.reshape(-1)  # [A*nc]
        k = min(max_nms, flat.shape[0])
        scores, flat_idx = jax.lax.top_k(flat, k)
        anchor_idx = flat_idx // nc
        cls_idx = (flat_idx % nc).astype(jnp.float32)
    else:
        conf = jnp.max(cls_scores, axis=-1)
        k = min(max_nms, a)
        scores, anchor_idx = jax.lax.top_k(conf, k)
        cls_idx = jnp.argmax(cls_scores[anchor_idx], axis=-1).astype(jnp.float32)
    cboxes = boxes[anchor_idx]
    cextra = pred[anchor_idx, 4 + nc :] if extra else jnp.zeros((k, 0), pred.dtype)

    if scores_are_logits:
        scores = jax.nn.sigmoid(scores.astype(jnp.float32))
    scores = jnp.where(scores > conf_thres, scores, 0.0)
    return cboxes, scores.astype(jnp.float32), cls_idx, cextra


def _single_image_nms(
    pred: jnp.ndarray,
    nc: int,
    conf_thres: float,
    iou_thres: float,
    max_det: int,
    max_nms: int,
    agnostic: bool,
    multi_label: bool,
    class_mask: Optional[jnp.ndarray],
    use_pallas: bool,
    scores_are_logits: bool = False,
):
    """pred: [A, 4+nc+extra] with xywh boxes; returns fixed-shape detections."""
    cboxes, scores, cls_idx, cextra = _prep_candidates(
        pred, nc, conf_thres, max_nms, multi_label, class_mask, scores_are_logits
    )
    extra = cextra.shape[-1]
    offset = 0.0 if agnostic else cls_idx[:, None] * MAX_WH
    if use_pallas:
        from .pallas_nms import pallas_greedy_nms

        keep_idx, keep_valid = pallas_greedy_nms(
            (cboxes + offset).astype(jnp.float32), scores, iou_thres, max_det
        )
    else:
        keep_idx, keep_valid = _greedy_nms(cboxes + offset, scores, iou_thres, max_det)

    out_boxes = cboxes[keep_idx] * keep_valid[:, None]
    out_scores = scores[keep_idx] * keep_valid
    out_cls = jnp.where(keep_valid, cls_idx[keep_idx], -1.0)
    out_extra = cextra[keep_idx] * keep_valid[:, None] if extra else cextra[:max_det]
    return {
        "boxes": out_boxes,
        "scores": out_scores,
        "classes": out_cls,
        "valid": keep_valid,
        "extra": out_extra,
    }


@partial(
    jax.jit,
    static_argnames=("nc", "conf_thres", "iou_thres", "max_det", "max_nms", "agnostic", "multi_label", "use_pallas", "scores_are_logits"),
)
def non_max_suppression(
    prediction: jnp.ndarray,
    nc: int,
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    max_det: int = 300,
    max_nms: int = 30000,
    agnostic: bool = False,
    multi_label: bool = False,
    class_mask: Optional[jnp.ndarray] = None,
    use_pallas: Optional[bool] = None,
    scores_are_logits: bool = False,
):
    """Batched fixed-shape NMS.

    Args:
        prediction: [B, A, 4+nc+extra], boxes xywh in input-image pixels
            (the decoded output of the Detect head, anchors-last layout).
        class_mask: optional [nc] 0/1 mask implementing the ``classes=`` filter.

    Returns:
        dict of boxes [B,max_det,4] (xyxy), scores [B,max_det],
        classes [B,max_det] (-1 where invalid), valid [B,max_det] bool,
        extra [B,max_det,extra].
    """
    if use_pallas is None:
        # the Pallas kernel is 15-20x faster than the lax.scan greedy loop on
        # TPU; the scan stays as the portable (CPU/interpret) fallback
        use_pallas = jax.default_backend() != "cpu"

    prep = partial(
        _prep_candidates,
        nc=nc,
        conf_thres=conf_thres,
        max_nms=max_nms,
        multi_label=multi_label,
        class_mask=class_mask,
        scores_are_logits=scores_are_logits,
    )
    cboxes, scores, cls_idx, cextra = jax.vmap(prep)(prediction)  # [B, k, ...]
    extra = cextra.shape[-1]
    offset = 0.0 if agnostic else cls_idx[..., None] * MAX_WH
    if use_pallas:
        # one kernel invocation for the whole batch: every image advances in
        # lockstep on its own sublane row (vmapping the single-image kernel
        # would serialize the batch as a pallas grid)
        from .pallas_nms import pallas_batched_greedy_nms

        keep_idx, keep_valid = pallas_batched_greedy_nms(
            (cboxes + offset).astype(jnp.float32), scores, iou_thres, max_det
        )
    else:
        keep_idx, keep_valid = jax.vmap(partial(_greedy_nms, iou_thres=iou_thres, max_det=max_det))(
            cboxes + offset, scores
        )

    take = jnp.take_along_axis
    out_boxes = take(cboxes, keep_idx[..., None], 1) * keep_valid[..., None]
    out_scores = take(scores, keep_idx, 1) * keep_valid
    out_cls = jnp.where(keep_valid, take(cls_idx, keep_idx, 1), -1.0)
    out_extra = take(cextra, keep_idx[..., None], 1) * keep_valid[..., None] if extra else cextra[:, :max_det]
    return {
        "boxes": out_boxes,
        "scores": out_scores,
        "classes": out_cls,
        "valid": keep_valid,
        "extra": out_extra,
    }


@partial(
    jax.jit,
    static_argnames=("nc", "conf_thres", "iou_thres", "max_det", "max_nms", "agnostic", "multi_label"),
)
def rotated_non_max_suppression(
    prediction: jnp.ndarray,
    nc: int,
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    max_det: int = 300,
    max_nms: int = 2048,
    agnostic: bool = False,
    multi_label: bool = False,
):
    """Batched rotated-box NMS, reference-exact.

    Reference semantics: ultralytics/utils/nms.py:150-153 — the rotated branch
    applies the class offset to the box CENTER and suppresses via
    ``TorchNMS.fast_nms(boxes, scores, iou_func=batch_probiou)`` (nms.py:193):
    candidate i is dropped iff ANY higher-scored candidate overlaps it with
    probIoU >= threshold, regardless of whether that candidate itself survives
    (Fast-NMS, arXiv:1904.02689). Unlike greedy NMS this is one dense O(k²)
    probIoU matrix + a triangular reduction — no sequential loop at all, so it
    maps onto the TPU as a single fused matmul-shaped block with zero
    scan-carried dependencies.

    Args:
        prediction: [B, A, 4+nc+1] with xywh + class scores + angle(rad).

    Returns:
        dict of rboxes [B,max_det,5] (xywhr), scores, classes (-1 invalid),
        valid mask.
    """
    from .rotated import probiou

    def prep(pred):
        cls_scores = pred[:, 4 : 4 + nc]
        angle = pred[:, -1]
        if multi_label and nc > 1:
            flat = cls_scores.reshape(-1)
            k = min(max_nms, flat.shape[0])
            scores, flat_idx = jax.lax.top_k(flat, k)
            anchor_idx = flat_idx // nc
            cls_idx = (flat_idx % nc).astype(jnp.float32)
        else:
            conf = jnp.max(cls_scores, axis=-1)
            k = min(max_nms, pred.shape[0])
            scores, anchor_idx = jax.lax.top_k(conf, k)
            cls_idx = jnp.argmax(cls_scores[anchor_idx], axis=-1).astype(jnp.float32)
        rboxes = jnp.concatenate([pred[anchor_idx, :4], angle[anchor_idx, None]], -1)
        scores = jnp.where(scores > conf_thres, scores, 0.0)
        return rboxes, scores.astype(jnp.float32), cls_idx

    rboxes, scores, cls_idx = jax.vmap(prep)(prediction)  # [B, k, ...]

    def fast_nms_one(rb, s, ci):
        # class offset on centers only (reference nms.py:151)
        off = 0.0 if agnostic else ci[:, None] * MAX_WH
        b = jnp.concatenate([rb[:, :2] + off, rb[:, 2:]], -1)
        order = jnp.argsort(-s)  # score-descending, mirrors torch.argsort
        bs = b[order]
        ious = probiou(bs[:, None, :], bs[None, :, :])  # [k, k]
        ious = jnp.triu(ious, k=1)  # only higher-scored rows suppress
        keep = (ious >= iou_thres).sum(0) == 0
        keep &= s[order] > 0.0  # sub-threshold candidates are never emitted
        kept_scores = jnp.where(keep, s[order], -1.0)
        if kept_scores.shape[0] < max_det:  # fewer candidates than max_det
            pad = max_det - kept_scores.shape[0]
            kept_scores = jnp.pad(kept_scores, (0, pad), constant_values=-1.0)
            order = jnp.pad(order, (0, pad))
        vals, pick = jax.lax.top_k(kept_scores, max_det)  # score order == rank order
        return order[pick].astype(jnp.int32), vals > 0.0

    keep_idx, valid = jax.vmap(fast_nms_one)(rboxes, scores, cls_idx)
    take = jnp.take_along_axis
    out_r = take(rboxes, keep_idx[..., None], 1) * valid[..., None]
    return {
        "rboxes": out_r,
        "scores": take(scores, keep_idx, 1) * valid,
        "classes": jnp.where(valid, take(cls_idx, keep_idx, 1), -1.0),
        "valid": valid,
    }


def _greedy_cw_nms(boxes, scores, iou_thres, max_det, sigma=0.1, weighted_iou=True):
    """Cluster-Weighted NMS: greedy cluster formation + Gaussian-weighted box
    fusion instead of hard suppression (reference README.md:338-364; config
    flags `cluster`/`weighted`, cfg/default.yaml:140-141).

    At each greedy step the highest-scored candidate seeds a cluster of all
    unsuppressed boxes with IoU > threshold; the output box is the weighted
    average with weights w_i = score_i * exp(-(1 - iou_i)^2 / sigma)
    (Gaussian in IoU distance). `weighted_iou=False` degrades to plain
    score-weighted fusion (the `weighted` flag).

    Returns fused boxes [max_det, 4], scores [max_det], seed idx, valid mask.
    """
    n = boxes.shape[0]
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    areas = jnp.clip(x2 - x1, 0, None) * jnp.clip(y2 - y1, 0, None)

    def step(alive_scores, _):
        idx = jnp.argmax(alive_scores)
        best = alive_scores[idx]
        valid = best > 0.0
        bx1, by1, bx2, by2 = x1[idx], y1[idx], x2[idx], y2[idx]
        iw = jnp.clip(jnp.minimum(x2, bx2) - jnp.maximum(x1, bx1), 0, None)
        ih = jnp.clip(jnp.minimum(y2, by2) - jnp.maximum(y1, by1), 0, None)
        inter = iw * ih
        iou = inter / (areas + areas[idx] - inter + 1e-7)
        member = ((iou > iou_thres) | (jnp.arange(n) == idx)) & (alive_scores > 0.0)
        if weighted_iou:
            w = alive_scores * jnp.exp(-((1.0 - iou) ** 2) / sigma) * member
        else:
            w = alive_scores * iou * member
        denom = jnp.clip(jnp.sum(w), 1e-9, None)
        fused = jnp.sum(boxes * w[:, None], 0) / denom
        alive_scores = jnp.where(valid & member, 0.0, alive_scores)
        return alive_scores, (fused, best, idx.astype(jnp.int32), valid)

    _, (fused_boxes, fused_scores, seed_idx, keep_valid) = jax.lax.scan(step, scores, None, length=max_det)
    return fused_boxes, fused_scores, seed_idx, keep_valid


@partial(
    jax.jit,
    static_argnames=("nc", "conf_thres", "iou_thres", "max_det", "max_nms", "agnostic", "sigma", "weighted_iou", "use_pallas"),
)
def cluster_weighted_nms(
    prediction: jnp.ndarray,
    nc: int,
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    max_det: int = 300,
    max_nms: int = 2048,
    agnostic: bool = False,
    sigma: float = 0.1,
    weighted_iou: bool = True,
    use_pallas: Optional[bool] = None,
):
    """Batched CW-NMS over decoded predictions [B, A, 4+nc] (xywh boxes)."""
    if use_pallas is None:
        use_pallas = jax.default_backend() != "cpu"

    def prep(pred):
        boxes = xywh2xyxy(pred[:, :4])
        cls_scores = pred[:, 4 : 4 + nc]
        conf = jnp.max(cls_scores, axis=-1)
        k = min(max_nms, pred.shape[0])
        scores, anchor_idx = jax.lax.top_k(conf, k)
        cls_idx = jnp.argmax(cls_scores[anchor_idx], axis=-1).astype(jnp.float32)
        scores = jnp.where(scores > conf_thres, scores, 0.0)
        return boxes[anchor_idx], scores.astype(jnp.float32), cls_idx

    cboxes, scores, cls_idx = jax.vmap(prep)(prediction)  # [B, k, ...]
    offset = 0.0 if agnostic else cls_idx[..., None] * MAX_WH
    if use_pallas:
        from .pallas_nms import pallas_batched_cw_nms

        fused, fscores, seed, valid = pallas_batched_cw_nms(
            cboxes + offset, scores, iou_thres, max_det, sigma, weighted_iou
        )
    else:
        fused, fscores, seed, valid = jax.vmap(
            partial(_greedy_cw_nms, iou_thres=iou_thres, max_det=max_det,
                    sigma=sigma, weighted_iou=weighted_iou)
        )(cboxes + offset, scores)
    out_cls = jnp.where(valid, jnp.take_along_axis(cls_idx, seed, 1), -1.0)
    fused = fused - (0.0 if agnostic else out_cls[..., None] * MAX_WH) * valid[..., None]
    return {
        "boxes": fused * valid[..., None],
        "scores": fscores * valid,
        "classes": out_cls,
        "valid": valid,
    }
