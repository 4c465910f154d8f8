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
    """Per-output-channel symmetric int8 (last axis = output channels for HWIO)."""
    w = np.asarray(w, np.float32)
    axis = tuple(range(w.ndim - 1)) if w.ndim > 1 else ()
    amax = np.maximum(np.abs(w).max(axis=axis, keepdims=True), 1e-8)
    scale = amax / 127.0
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
