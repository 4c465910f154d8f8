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
