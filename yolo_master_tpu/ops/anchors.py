"""Anchor-free grid anchors and DFL box decode (reference: ultralytics/utils/tal.py:397-432).

Pure functions over static shapes; anchors depend only on feature-map sizes and
strides so they are constant-folded by XLA inside the jitted graph.

Layout note: anchors-last [A, 2]; boxes [..., A, 4] (the reference uses
channel-first [2, A] / [B, 4, A]).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp


def make_anchors(hw_shapes: Sequence[Tuple[int, int]], strides: Sequence[int], grid_cell_offset: float = 0.5):
    """Anchor centers for each feature level.

    Args:
        hw_shapes: [(H, W)] per detection level.
        strides: per-level stride.

    Returns:
        anchor_points [A, 2] (x, y in feature-grid units), stride_tensor [A, 1].
    """
    points, stride_list = [], []
    for (h, w), s in zip(hw_shapes, strides):
        sx = jnp.arange(w, dtype=jnp.float32) + grid_cell_offset
        sy = jnp.arange(h, dtype=jnp.float32) + grid_cell_offset
        gy, gx = jnp.meshgrid(sy, sx, indexing="ij")
        points.append(jnp.stack([gx, gy], -1).reshape(-1, 2))
        stride_list.append(jnp.full((h * w, 1), float(s), jnp.float32))
    return jnp.concatenate(points, 0), jnp.concatenate(stride_list, 0)


def dist2bbox(distance: jnp.ndarray, anchor_points: jnp.ndarray, xywh: bool = True) -> jnp.ndarray:
    """ltrb distances -> boxes (reference tal.py:413-422). Last-axis layout."""
    lt, rb = jnp.split(distance, 2, axis=-1)
    x1y1 = anchor_points - lt
    x2y2 = anchor_points + rb
    if xywh:
        c_xy = (x1y1 + x2y2) / 2
        wh = x2y2 - x1y1
        return jnp.concatenate([c_xy, wh], -1)
    return jnp.concatenate([x1y1, x2y2], -1)


def bbox2dist(anchor_points: jnp.ndarray, bbox: jnp.ndarray, reg_max: int | None = None) -> jnp.ndarray:
    """xyxy boxes -> ltrb distances, clamped to reg_max (reference tal.py:425-431)."""
    x1y1, x2y2 = jnp.split(bbox, 2, axis=-1)
    dist = jnp.concatenate([anchor_points - x1y1, x2y2 - anchor_points], -1)
    if reg_max is not None:
        dist = jnp.clip(dist, 0, reg_max - 0.01)
    return dist


def dfl_decode(box_logits: jnp.ndarray, reg_max: int = 16) -> jnp.ndarray:
    """Integral (expectation) decode of DFL distributions.

    Args:
        box_logits: [..., A, 4*reg_max] raw regression outputs.

    Returns:
        [..., A, 4] expected ltrb distances.

    Reference: DFL module (nn/modules/block.py:63-85) — softmax over the
    reg_max bins then expectation with weights 0..reg_max-1. The torch view
    order is (4, reg_max) groups along channels.
    """
    import jax

    if reg_max <= 1:  # DFL disabled (reference: DFL -> nn.Identity when reg_max==1)
        return box_logits
    shape = box_logits.shape
    x = box_logits.reshape(*shape[:-1], 4, reg_max)
    x = jax.nn.softmax(x.astype(jnp.float32), axis=-1)
    proj = jnp.arange(reg_max, dtype=jnp.float32)
    return jnp.einsum("...r,r->...", x, proj).astype(box_logits.dtype)
