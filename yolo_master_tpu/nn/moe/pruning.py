"""MoE expert pruning: remove under-used experts from a trained model
(reference: ultralytics/nn/modules/moe/pruning.py:12-632 MoEPruner /
prune_moe_model).

Functional recast: pruning is pure pytree surgery — slice the expert subtrees
and the router's output row out of the params dict and rebuild the module with
fewer experts. Usage statistics come from Context.stats collected over a
diagnosis pass (the registry-free analog of ExpertUsageTracker).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...utils import LOGGER
from ..module import Context
from .es_moe import ES_MOE


def collect_usage_stats(model, params, batches, max_batches: int = 16) -> Dict[str, np.ndarray]:
    """Run forward passes in training-stat mode and average per-block expert
    usage (the diagnosis pass; reference pruning.py diagnose)."""
    totals: Dict[str, np.ndarray] = {}
    count = 0
    for i, batch in enumerate(batches):
        if i >= max_batches:
            break
        x = jnp.asarray(batch["images"]) if isinstance(batch, dict) else jnp.asarray(batch)
        ctx = Context(training=True, step=0)
        model.forward_train(params, x, ctx)
        for path, stats in ctx.stats.items():
            usage = stats.get("expert_usage")
            if usage is None:
                continue
            u = np.asarray(usage, np.float64)
            totals[path] = totals.get(path, 0.0) + u
        count += 1
    return {k: v / max(count, 1) for k, v in totals.items()}


def expert_importance(usage: np.ndarray, mode: str = "usage", mean_weight: Optional[np.ndarray] = None) -> np.ndarray:
    """Importance scores (reference pruning.py importance_mode usage/usage_weight)."""
    if mode == "usage_weight" and mean_weight is not None:
        return usage * mean_weight
    return usage


def select_experts_to_keep(usage: np.ndarray, threshold: float = 0.15, keep_top_m: Optional[int] = None) -> List[int]:
    """Keep experts above the usage threshold; always keep at least the best
    (and optionally the top-M) (reference pruning.py:18-42)."""
    order = np.argsort(-usage)
    keep = {int(i) for i in np.nonzero(usage >= threshold)[0]}
    keep.add(int(order[0]))
    if keep_top_m:
        keep.update(int(i) for i in order[:keep_top_m])
    return sorted(keep)


def prune_es_moe_block(block: ES_MOE, block_params: dict, keep: List[int]):
    """Slice an ES_MOE block down to the kept experts.

    Returns (new_block, new_params). Router fc2 output rows are sliced to the
    kept experts; kernel-size list follows the kept order.
    """
    from .es_moe import expert_kernel_sizes

    ks_all = expert_kernel_sizes(block.num_experts, block.max_kernel_size)
    new_block = ES_MOE(
        block.in_channels,
        block.out_channels,
        num_experts=len(keep),
        top_k=min(block.top_k, len(keep)) if block.use_top_k else None,
        use_sparse_inference=block.use_sparse_inference,
        dynamic_threshold=block.dynamic_threshold,
        max_kernel_size=block.max_kernel_size,
    )
    # monkey-fix kernel sizes to the kept experts' original kernels
    from .experts import EfficientExpertGroup
    from ..module import ModuleList

    new_block.experts = ModuleList([EfficientExpertGroup(block.in_channels, block.out_channels, ks_all[i]) for i in keep])

    new_params = {
        "routing": {
            "fc1": dict(block_params["routing"]["fc1"]),
            "fc2": {
                "w": jnp.asarray(np.asarray(block_params["routing"]["fc2"]["w"])[:, keep]),
                "b": jnp.asarray(np.asarray(block_params["routing"]["fc2"]["b"])[keep]),
            },
        },
        "experts": {str(j): block_params["experts"][str(i)] for j, i in enumerate(keep)},
        "norm_bn": dict(block_params["norm_bn"]),
    }
    return new_block, new_params


def prune_moe_model(model, params, usage_stats: Dict[str, np.ndarray], threshold: float = 0.15,
                    keep_top_m: Optional[int] = None):
    """Prune every ES_MOE block in a DetectionModel by usage (reference
    pruning.py:549-572). Returns (model, new_params); the model is mutated
    in place (module graph surgery) and re-finalized."""
    from ..module import apply_updates, dict_copy

    new_params = dict_copy(params)
    pruned = 0
    for spec in model.specs:
        if not isinstance(spec.module, ES_MOE):
            continue
        path = spec.module.path
        usage = usage_stats.get(path)
        if usage is None:
            continue
        keep = select_experts_to_keep(np.asarray(usage), threshold, keep_top_m)
        if len(keep) == spec.module.num_experts:
            continue
        block_params = new_params["layers"][str(spec.i)]
        new_block, new_bp = prune_es_moe_block(spec.module, block_params, keep)
        spec.module = new_block
        model.layers.mods[spec.i] = new_block
        new_params["layers"][str(spec.i)] = new_bp
        pruned += 1
        LOGGER.info(f"pruned {path}: kept experts {keep}")
    model.finalize()
    LOGGER.info(f"pruned {pruned} ES_MOE blocks (threshold {threshold})")
    return model, new_params
