"""Router-aware MoE quantization (reference: ultralytics/nn/modules/moe/
quantize.py:40-251): experts quantize to int8, routers stay full precision —
quantizing the tiny routing MLPs destabilizes top-k selection for negligible
size savings.

TPU recast: per-output-channel symmetric int8 weight quantization as pytree
surgery. Quantized leaves become {"q": int8, "scale": f32}; ``dequantize_params``
restores dense weights (storage/export quantization; a fused int8 matmul
runtime path can consume the same tree).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

ROUTER_KEYS = ("routing", "router", "se_gate", "complexity_estimator", "global_fc", "expert_prior")


def _is_router_path(path: Tuple[str, ...]) -> bool:
    return any(seg in ROUTER_KEYS for seg in path)


def quantize_leaf(w: np.ndarray) -> Dict[str, np.ndarray]:
    """Per-output-channel symmetric int8 (last axis = output channels for HWIO).

    The scale per channel is MSE-optimal, not abs-max: abs-max lets a single
    outlier weight stretch the grid for the whole channel, which is where most
    of the int8 round-trip mAP loss came from (measured on the synthetic gate,
    tests/test_quant_accuracy.py). A short grid search over clip ratios picks
    the scale minimizing round-trip weight MSE per channel — same quantization
    PLAN as the reference (routers fp16, everything else int8,
    reference moe/quantize.py:40-58), just a tighter grid.

    1-D leaves (biases/norm vectors) intentionally share ONE scale per leaf
    (flat [n,1] view) rather than the lossless per-element scales of earlier
    revisions — per-element scales are no compression at all; the shared
    scale is the sensible behavior and its error is covered by the int8
    round-trip accuracy gate."""
    w = np.asarray(w, np.float32)
    # channels = last axis for ndim>1 (HWIO/[in,out]); 1-D leaves quantize as
    # one "channel" (flat [n,1] view) so the same search covers both
    flat = w.reshape(-1, w.shape[-1]) if w.ndim > 1 else w.reshape(-1, 1)
    amax = np.maximum(np.abs(flat).max(axis=0, keepdims=True), 1e-8)  # [1, C]
    best_scale = amax / 127.0
    best_err = None
    for ratio in (1.0, 0.95, 0.9, 0.85, 0.8, 0.75, 0.7):
        scale = np.maximum(amax * ratio, 1e-8) / 127.0
        q = np.clip(np.round(flat / scale), -127, 127)
        err = ((q * scale - flat) ** 2).sum(0, keepdims=True)
        if best_err is None:
            best_err = err
        else:
            better = err < best_err
            best_scale = np.where(better, scale, best_scale)
            best_err = np.minimum(err, best_err)
    kd_shape = (1,) * (w.ndim - 1) + (w.shape[-1],) if w.ndim > 1 else (1,)
    scale = best_scale.reshape(kd_shape)
    q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return {"q": q, "scale": scale.astype(np.float32)}


def quantize_params(params, min_size: int = 512, router_aware: bool = True):
    """Quantize conv/linear weights ('w' leaves) to int8, skipping router
    subtrees when router_aware (the reference's node-exclusion plan)."""

    def walk(node, path):
        if isinstance(node, dict):
            if "q" in node and "scale" in node:
                return node
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        arr = np.asarray(node)
        if (
            path[-1] == "w"
            and arr.size >= min_size
            and arr.dtype.kind == "f"
            and not (router_aware and _is_router_path(path))
        ):
            return quantize_leaf(arr)
        return node

    return walk(params, ())


def dequantize_params(qparams):
    def walk(node):
        if isinstance(node, dict):
            if "q" in node and "scale" in node:
                return jnp.asarray(np.asarray(node["q"], np.float32) * np.asarray(node["scale"]))
            return {k: walk(v) for k, v in node.items()}
        return jnp.asarray(node)

    return walk(qparams)


def quantization_report(params, qparams) -> dict:
    """Size accounting of the quantization plan."""
    def nbytes(tree):
        return sum(np.asarray(x).nbytes for x in jax.tree_util.tree_leaves(tree))

    orig = nbytes(params)
    quant = nbytes(qparams)
    n_q = 0

    def count(node):
        nonlocal n_q
        if isinstance(node, dict):
            if "q" in node and "scale" in node:
                n_q += 1
                return
            for v in node.values():
                count(v)

    count(qparams)
    return {"original_bytes": orig, "quantized_bytes": quant, "ratio": quant / max(orig, 1), "quantized_tensors": n_q}
