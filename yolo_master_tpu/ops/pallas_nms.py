"""Pallas TPU kernel: greedy NMS with VMEM-resident candidates.

The lax.scan greedy NMS (ops/nms.py) compiles to ~max_det sequential HLO loop
iterations; at max_det=300 that costs ~3.3 ms/image on a v5e — dominating the
e2e latency (fwd 1.0 ms). This kernel keeps all candidates in VMEM
(max_nms x 4 boxes + scores ~ 40 KB) and runs the greedy loop as an in-kernel
fori_loop: same exact keep set, no per-step HLO dispatch.

Layout: scores/coords as [1, N] rows (lane dimension N), per-step argmax as a
VPU reduction, candidate suppression as one vectorized IoU row.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_kernel(boxes_ref, scores_ref, keep_idx_ref, keep_valid_ref, alive_ref, flag_ref,
                iou_thres: float, max_det: int):
    n = scores_ref.shape[1]
    alive_ref[:] = scores_ref[:]
    flag_ref[0] = 1
    x1 = boxes_ref[0:1, :]
    y1 = boxes_ref[1:2, :]
    x2 = boxes_ref[2:3, :]
    y2 = boxes_ref[3:4, :]
    areas = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)  # [1, N]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)

    def body(i, _):
        # early exit: greedy termination is monotone — scores only ever get
        # zeroed, so once the best alive score is <= 0 every later step is
        # invalid too; skip the VPU argmax/IoU work for the rest of the loop
        keep_idx_ref[0, i] = 0
        keep_valid_ref[0, i] = 0

        @pl.when(flag_ref[0] == 1)
        def _():
            alive = alive_ref[:]
            best = jnp.max(alive)
            idx = jnp.argmax(alive[0], axis=0).astype(jnp.int32)
            valid = best > 0.0
            bx1 = jnp.sum(jnp.where(lane == idx, x1, 0.0))
            by1 = jnp.sum(jnp.where(lane == idx, y1, 0.0))
            bx2 = jnp.sum(jnp.where(lane == idx, x2, 0.0))
            by2 = jnp.sum(jnp.where(lane == idx, y2, 0.0))
            barea = jnp.maximum(bx2 - bx1, 0.0) * jnp.maximum(by2 - by1, 0.0)
            iw = jnp.maximum(jnp.minimum(x2, bx2) - jnp.maximum(x1, bx1), 0.0)
            ih = jnp.maximum(jnp.minimum(y2, by2) - jnp.maximum(y1, by1), 0.0)
            inter = iw * ih
            iou = inter / (areas + barea - inter + 1e-7)
            suppress = (iou > iou_thres) | (lane == idx)
            alive_ref[:] = jnp.where(valid & suppress, 0.0, alive)
            keep_idx_ref[0, i] = idx
            keep_valid_ref[0, i] = valid.astype(jnp.int32)
            flag_ref[0] = valid.astype(jnp.int32)

        return 0

    jax.lax.fori_loop(0, max_det, body, 0)


def _batched_nms_kernel(x1_ref, y1_ref, x2_ref, y2_ref, scores_ref,
                        keep_idx_ref, keep_valid_ref, alive_ref, flag_ref,
                        iou_thres: float, max_det: int):
    """All B images advance in lockstep, one VPU sublane row per image.

    The single-image kernel leaves 7/8 sublanes idle and vmap serializes the
    batch as a grid — at bs=16 that is 16 sequential greedy loops. Here each
    fori_loop step does one greedy pick for EVERY image as row-wise [B, N]
    VPU ops (per-row argmax, masked-sum coordinate select, row-broadcast IoU).
    Keep outputs land in VMEM via one-hot accumulation over a det-lane iota
    (`where(det_lane == i, idx, 0)`) so no dynamic-index stores are needed,
    and a whole-batch SMEM alive flag early-exits once every row is exhausted.
    """
    b, n = scores_ref.shape
    alive_ref[:] = scores_ref[:]
    flag_ref[0] = 1
    keep_idx_ref[:] = jnp.zeros_like(keep_idx_ref)
    keep_valid_ref[:] = jnp.zeros_like(keep_valid_ref)
    x1, y1, x2, y2 = x1_ref[:], y1_ref[:], x2_ref[:], y2_ref[:]
    areas = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)  # [B, N]
    lane = jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)
    det_lane = jax.lax.broadcasted_iota(jnp.int32, (b, keep_idx_ref.shape[1]), 1)

    def body(i, _):
        @pl.when(flag_ref[0] == 1)
        def _():
            alive = alive_ref[:]
            best = jnp.max(alive, axis=1, keepdims=True)  # [B, 1]
            idx = jnp.argmax(alive, axis=1)[:, None].astype(jnp.int32)  # [B, 1]
            valid = best > 0.0  # [B, 1]
            sel = lane == idx
            bx1 = jnp.sum(jnp.where(sel, x1, 0.0), axis=1, keepdims=True)
            by1 = jnp.sum(jnp.where(sel, y1, 0.0), axis=1, keepdims=True)
            bx2 = jnp.sum(jnp.where(sel, x2, 0.0), axis=1, keepdims=True)
            by2 = jnp.sum(jnp.where(sel, y2, 0.0), axis=1, keepdims=True)
            barea = jnp.maximum(bx2 - bx1, 0.0) * jnp.maximum(by2 - by1, 0.0)
            iw = jnp.maximum(jnp.minimum(x2, bx2) - jnp.maximum(x1, bx1), 0.0)
            ih = jnp.maximum(jnp.minimum(y2, by2) - jnp.maximum(y1, by1), 0.0)
            inter = iw * ih
            iou = inter / (areas + barea - inter + 1e-7)
            suppress = (iou > iou_thres) | sel
            alive_ref[:] = jnp.where(valid & suppress, 0.0, alive)
            write = (det_lane == i) & valid
            keep_idx_ref[:] = keep_idx_ref[:] + jnp.where(write, idx, 0)
            keep_valid_ref[:] = keep_valid_ref[:] + jnp.where(write, 1, 0)
            flag_ref[0] = jnp.any(valid).astype(jnp.int32)

        return 0

    jax.lax.fori_loop(0, max_det, body, 0)


@partial(jax.jit, static_argnames=("iou_thres", "max_det", "interpret"))
def pallas_batched_greedy_nms(boxes: jnp.ndarray, scores: jnp.ndarray, iou_thres: float,
                              max_det: int, interpret: bool = False):
    """Exact greedy NMS over a batch: boxes [B, N, 4] xyxy (class-offset
    applied), scores [B, N] (invalid <= 0). Per image, the keep set equals
    ops.nms._greedy_nms exactly. Returns keep_idx [B, max_det] int32,
    keep_valid [B, max_det] bool.
    """
    b, n = scores.shape
    bf = boxes.astype(jnp.float32)
    x1, y1, x2, y2 = bf[..., 0], bf[..., 1], bf[..., 2], bf[..., 3]
    det_pad = -(-max_det // 128) * 128  # lane-dim-aligned output tile
    keep_idx, keep_valid = pl.pallas_call(
        partial(_batched_nms_kernel, iou_thres=iou_thres, max_det=max_det),
        out_shape=(
            jax.ShapeDtypeStruct((b, det_pad), jnp.int32),
            jax.ShapeDtypeStruct((b, det_pad), jnp.int32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((b, n), jnp.float32), pltpu.SMEM((1,), jnp.int32)],
        interpret=interpret,
    )(x1, y1, x2, y2, scores.astype(jnp.float32))
    return keep_idx[:, :max_det], keep_valid[:, :max_det].astype(bool)


def _batched_cw_nms_kernel(x1_ref, y1_ref, x2_ref, y2_ref, scores_ref,
                           fx1_ref, fy1_ref, fx2_ref, fy2_ref,
                           fscore_ref, seed_ref, valid_ref, alive_ref, flag_ref,
                           iou_thres: float, max_det: int, sigma: float,
                           weighted_iou: bool):
    """Batched Cluster-Weighted NMS in lockstep (ops.nms._greedy_cw_nms math):
    per step each image's best candidate seeds a cluster (IoU > thres among
    still-alive boxes); the output box is the Gaussian-IoU- (or plain-IoU-)
    score-weighted average of the cluster. Fused coords land in four [B, D]
    planes via the same one-hot det-lane accumulation as the hard-NMS kernel.
    """
    b, n = scores_ref.shape
    alive_ref[:] = scores_ref[:]
    flag_ref[0] = 1
    for ref in (fx1_ref, fy1_ref, fx2_ref, fy2_ref, fscore_ref):
        ref[:] = jnp.zeros_like(ref)
    seed_ref[:] = jnp.zeros_like(seed_ref)
    valid_ref[:] = jnp.zeros_like(valid_ref)
    x1, y1, x2, y2 = x1_ref[:], y1_ref[:], x2_ref[:], y2_ref[:]
    areas = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)
    det_lane = jax.lax.broadcasted_iota(jnp.int32, (b, fscore_ref.shape[1]), 1)

    def body(i, _):
        @pl.when(flag_ref[0] == 1)
        def _():
            alive = alive_ref[:]
            best = jnp.max(alive, axis=1, keepdims=True)  # [B,1]
            idx = jnp.argmax(alive, axis=1)[:, None].astype(jnp.int32)
            valid = best > 0.0
            sel = lane == idx
            bx1 = jnp.sum(jnp.where(sel, x1, 0.0), axis=1, keepdims=True)
            by1 = jnp.sum(jnp.where(sel, y1, 0.0), axis=1, keepdims=True)
            bx2 = jnp.sum(jnp.where(sel, x2, 0.0), axis=1, keepdims=True)
            by2 = jnp.sum(jnp.where(sel, y2, 0.0), axis=1, keepdims=True)
            barea = jnp.maximum(bx2 - bx1, 0.0) * jnp.maximum(by2 - by1, 0.0)
            iw = jnp.maximum(jnp.minimum(x2, bx2) - jnp.maximum(x1, bx1), 0.0)
            ih = jnp.maximum(jnp.minimum(y2, by2) - jnp.maximum(y1, by1), 0.0)
            inter = iw * ih
            iou = inter / (areas + barea - inter + 1e-7)
            member = ((iou > iou_thres) | sel) & (alive > 0.0)
            if weighted_iou:
                w = alive * jnp.exp(-((1.0 - iou) ** 2) / sigma) * member
            else:
                w = alive * iou * member
            denom = jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-9)  # [B,1]
            fx1 = jnp.sum(x1 * w, axis=1, keepdims=True) / denom
            fy1 = jnp.sum(y1 * w, axis=1, keepdims=True) / denom
            fx2 = jnp.sum(x2 * w, axis=1, keepdims=True) / denom
            fy2 = jnp.sum(y2 * w, axis=1, keepdims=True) / denom
            alive_ref[:] = jnp.where(valid & member, 0.0, alive)
            write = (det_lane == i) & valid
            fx1_ref[:] = fx1_ref[:] + jnp.where(write, fx1, 0.0)
            fy1_ref[:] = fy1_ref[:] + jnp.where(write, fy1, 0.0)
            fx2_ref[:] = fx2_ref[:] + jnp.where(write, fx2, 0.0)
            fy2_ref[:] = fy2_ref[:] + jnp.where(write, fy2, 0.0)
            fscore_ref[:] = fscore_ref[:] + jnp.where(write, best, 0.0)
            seed_ref[:] = seed_ref[:] + jnp.where(write, idx, 0)
            valid_ref[:] = valid_ref[:] + jnp.where(write, 1, 0)
            flag_ref[0] = jnp.any(valid).astype(jnp.int32)

        return 0

    jax.lax.fori_loop(0, max_det, body, 0)


@partial(jax.jit, static_argnames=("iou_thres", "max_det", "sigma", "weighted_iou", "interpret"))
def pallas_batched_cw_nms(boxes: jnp.ndarray, scores: jnp.ndarray, iou_thres: float,
                          max_det: int, sigma: float = 0.1, weighted_iou: bool = True,
                          interpret: bool = False):
    """Batched CW-NMS: boxes [B, N, 4] xyxy (class-offset applied), scores
    [B, N]. Per image equals ops.nms._greedy_cw_nms. Returns fused boxes
    [B, max_det, 4], scores [B, max_det], seed idx [B, max_det] int32,
    valid [B, max_det] bool.
    """
    b, n = scores.shape
    bf = boxes.astype(jnp.float32)
    det_pad = -(-max_det // 128) * 128
    outs = pl.pallas_call(
        partial(_batched_cw_nms_kernel, iou_thres=iou_thres, max_det=max_det,
                sigma=sigma, weighted_iou=weighted_iou),
        out_shape=tuple(
            [jax.ShapeDtypeStruct((b, det_pad), jnp.float32)] * 5
            + [jax.ShapeDtypeStruct((b, det_pad), jnp.int32)] * 2
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * 7),
        scratch_shapes=[pltpu.VMEM((b, n), jnp.float32), pltpu.SMEM((1,), jnp.int32)],
        interpret=interpret,
    )(bf[..., 0], bf[..., 1], bf[..., 2], bf[..., 3], scores.astype(jnp.float32))
    fx1, fy1, fx2, fy2, fscore, seed, valid = (o[:, :max_det] for o in outs)
    fused = jnp.stack([fx1, fy1, fx2, fy2], -1)
    return fused, fscore, seed, valid.astype(bool)


@partial(jax.jit, static_argnames=("iou_thres", "max_det", "interpret"))
def pallas_greedy_nms(boxes: jnp.ndarray, scores: jnp.ndarray, iou_thres: float, max_det: int,
                      interpret: bool = False):
    """Exact greedy NMS over [N] candidates (drop-in for ops.nms._greedy_nms).

    Args:
        boxes [N, 4] xyxy (class-offset applied), scores [N] (invalid <= 0).

    Returns:
        keep_idx [max_det] int32, keep_valid [max_det] bool.
    """
    n = boxes.shape[0]
    boxes_t = boxes.T.astype(jnp.float32)  # [4, N]
    scores_r = scores[None].astype(jnp.float32)  # [1, N]
    keep_idx, keep_valid = pl.pallas_call(
        partial(_nms_kernel, iou_thres=iou_thres, max_det=max_det),
        out_shape=(
            jax.ShapeDtypeStruct((1, max_det), jnp.int32),
            jax.ShapeDtypeStruct((1, max_det), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scalar keep stores
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[pltpu.VMEM((1, n), jnp.float32), pltpu.SMEM((1,), jnp.int32)],
        interpret=interpret,
    )(boxes_t, scores_r)
    return keep_idx[0], keep_valid[0].astype(bool)
