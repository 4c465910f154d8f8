"""LoRA for the functional param tree (reference: ultralytics/utils/lora/
{api,config,backend,planner}.py — 7,864 LoC of torch adapter injection).

Functional recast: adapters live in their OWN pytree keyed by the target
leaf's path; the effective weights are produced by a pure merge
``W_eff = stop_grad(W) + (alpha/r) * (A @ B)`` inside the jitted step, so
training optimizes only the adapter tree (the freeze/optimizer-group machinery
of the reference collapses into "take grads w.r.t. the adapter tree").

Conv kernels (HWIO) factorize over (H*W*I) x O; linear over I x O — the same
flattened-fan-in convention the reference's conv-LoRA backend uses.

The placement planner (reference utils/lora/planner.py: architecture
fingerprint -> regression -> ACCEPT/REFUSE/ADAPT) is approximated by its
observable behavior: attention/projection/1x1-conv-heavy targets are accepted,
depthwise and norm leaves refused.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import LOGGER

DEFAULT_TARGET_HINTS = ("qkv", "proj", "cv1", "cv2", "pointwise", "fc1", "fc2", "expert")
REFUSE_HINTS = ("bn", "norm", "depthwise", "dfl")


@dataclass
class LoRAConfig:
    r: int = 8
    alpha: float = 16.0
    targets: Sequence[str] = ()  # path substrings; empty -> planner defaults
    min_fan: int = 32  # skip tiny leaves
    seed: int = 0

    @property
    def scale(self) -> float:
        return self.alpha / max(self.r, 1)


def _iter_weight_paths(params, prefix=()):
    if isinstance(params, dict):
        for k, v in params.items():
            yield from _iter_weight_paths(v, prefix + (k,))
    else:
        yield prefix, params


def plan_lora_targets(params, cfg: LoRAConfig) -> List[str]:
    """Select adapter targets (the planner's ACCEPT set)."""
    hints = tuple(cfg.targets) or DEFAULT_TARGET_HINTS
    targets = []
    for path, leaf in _iter_weight_paths(params):
        if path[-1] != "w" or getattr(leaf, "ndim", 0) < 2:
            continue
        dotted = ".".join(path)
        if any(h in dotted for h in REFUSE_HINTS):
            continue
        shape = leaf.shape
        fan_in = int(np.prod(shape[:-1]))
        if fan_in < cfg.min_fan or shape[-1] < cfg.min_fan:
            continue
        # depthwise convs (I==1 per group) are refused by shape
        if leaf.ndim == 4 and shape[2] == 1:
            continue
        if any(h in dotted for h in hints):
            targets.append(dotted)
    return targets


def init_lora(params, cfg: LoRAConfig, targets: Optional[List[str]] = None,
              rank_map: Optional[Dict[str, int]] = None,
              alpha_map: Optional[Dict[str, float]] = None) -> Dict[str, dict]:
    """Adapter tree: {dotted_path: {"A": [fan_in, r] (gaussian), "B": [r, out] (zeros)}}.

    ``rank_map``/``alpha_map`` give per-target ranks/alphas (the vPEFT
    placement-plan path, reference vpeft/placement_plan.py); unmapped targets
    fall back to cfg.r / cfg.alpha."""
    targets = targets if targets is not None else plan_lora_targets(params, cfg)
    key = jax.random.PRNGKey(cfg.seed)
    adapters = {}
    leaves = {".".join(p): l for p, l in _iter_weight_paths(params)}
    for i, dotted in enumerate(targets):
        leaf = leaves[dotted]
        fan_in = int(np.prod(leaf.shape[:-1]))
        out = leaf.shape[-1]
        r = int((rank_map or {}).get(dotted, cfg.r))
        k = jax.random.fold_in(key, i)
        adapters[dotted] = {
            "A": jax.random.normal(k, (fan_in, r), jnp.float32) / np.sqrt(fan_in),
            "B": jnp.zeros((r, out), jnp.float32),
        }
    LOGGER.info(f"LoRA: {len(adapters)} targets, r={cfg.r}")
    return adapters


def scale_map(adapters: Dict[str, dict], alpha: float = 16.0,
              alpha_map: Optional[Dict[str, float]] = None) -> Dict[str, float]:
    """Per-target merge scales alpha_t / r_t (r read off the adapter shapes)."""
    return {
        t: float((alpha_map or {}).get(t, alpha)) / max(ad["A"].shape[-1], 1)
        for t, ad in adapters.items()
    }


def merge_lora(params, adapters: Dict[str, dict], scale, train: bool = True):
    """Effective params = stop_grad(base) + scale * (A@B) at each target.

    ``scale`` may be a float (uniform alpha/r) or a {target: float} map from
    :func:`scale_map` (per-target vPEFT ranks)."""
    scales = scale if isinstance(scale, dict) else None

    def walk(node, prefix=()):
        if not isinstance(node, dict):
            dotted = ".".join(prefix)
            if dotted in adapters:
                ad = adapters[dotted]
                base = jax.lax.stop_gradient(node) if train else node
                delta = (ad["A"] @ ad["B"]).reshape(node.shape)
                s = scales.get(dotted, 1.0) if scales is not None else scale
                return base + s * delta.astype(node.dtype)
            return jax.lax.stop_gradient(node) if train else node
        return {k: walk(v, prefix + (k,)) for k, v in node.items()}

    return walk(params)


def fold_lora(params, adapters: Dict[str, dict], scale: float):
    """Permanently bake adapters into the weights (deploy merge;
    reference utils/lora/io.py merge_adapters)."""
    return merge_lora(params, adapters, scale, train=False)


def lora_param_count(adapters) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(adapters))


def save_adapters(adapters, path: str, meta: Optional[dict] = None) -> str:
    from ..utils.checkpoint import flatten_tree

    flat = flatten_tree(adapters)
    np.savez(path, **flat)
    return path


def load_adapters(path: str):
    from ..utils.checkpoint import unflatten_tree

    data = np.load(path)
    nested = unflatten_tree({k: data[k] for k in data.files})
    # top level keys are dotted target paths that themselves contain dots —
    # flatten_tree splits them; re-join all but the trailing A/B level
    def rejoin(tree, prefix=()):
        out = {}

        def walk(node, pref):
            if isinstance(node, dict) and set(node.keys()) == {"A", "B"}:
                out[".".join(pref)] = {k: jnp.asarray(v) for k, v in node.items()}
            elif isinstance(node, dict):
                for k, v in node.items():
                    walk(v, pref + (k,))

        walk(tree, prefix)
        return out

    return rejoin(nested)
