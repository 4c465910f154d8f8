"""MoLoRA: mixture-of-LoRA adapters (reference: ultralytics/nn/peft/molora/
{layer,model,router,moe_aware}.py — per-expert low-rank adapters with a
router, sharing the MoE aux registry).

Functional recast: each target carries E (A_e, B_e) pairs plus router weights
over adapter experts. The reference routes per sample from layer inputs; the
weight-merge formulation here uses a *learned global gate* (input-independent
softmax, temperature-annealed) so the mixture still folds into one effective
weight per step — the deltas stay jit-mergeable. Per-sample routed MoLoRA
requires per-module hooks and is tracked as follow-up work; the aux balance
loss over gate probabilities matches the reference's shared-registry term
(molora_share_moe_registry, cfg/default.yaml:282).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .lora import LoRAConfig, _iter_weight_paths, plan_lora_targets


@dataclass
class MoLoRAConfig(LoRAConfig):
    num_experts: int = 4
    top_k: int = 2
    temperature: float = 1.0
    balance_coeff: float = 0.01


def init_molora(params, cfg: MoLoRAConfig, targets: Optional[List[str]] = None) -> Dict[str, dict]:
    targets = targets if targets is not None else plan_lora_targets(params, cfg)
    key = jax.random.PRNGKey(cfg.seed)
    leaves = {".".join(p): l for p, l in _iter_weight_paths(params)}
    adapters = {}
    for i, dotted in enumerate(targets):
        leaf = leaves[dotted]
        fan_in = int(np.prod(leaf.shape[:-1]))
        out = leaf.shape[-1]
        k = jax.random.fold_in(key, i)
        adapters[dotted] = {
            "A": jax.random.normal(k, (cfg.num_experts, fan_in, cfg.r), jnp.float32) / np.sqrt(fan_in),
            "B": jnp.zeros((cfg.num_experts, cfg.r, out), jnp.float32),
            "gate": jnp.zeros((cfg.num_experts,), jnp.float32),
        }
    return adapters


def _gate_probs(gate_logits, top_k, temperature):
    probs = jax.nn.softmax(gate_logits / max(temperature, 0.1))
    if top_k < probs.shape[-1]:
        thr = jax.lax.top_k(probs, top_k)[0][-1]
        keep = probs >= thr
        probs = probs * keep
        probs = probs / jnp.clip(jnp.sum(probs), 1e-9, None)
    return probs


def merge_molora(params, adapters: Dict[str, dict], cfg: MoLoRAConfig, train: bool = True):
    """Effective params + aux balance loss over gate probabilities."""
    aux = jnp.zeros(())

    def walk(node, prefix=()):
        nonlocal aux
        if not isinstance(node, dict):
            dotted = ".".join(prefix)
            if dotted in adapters:
                ad = adapters[dotted]
                probs = _gate_probs(ad["gate"], cfg.top_k, cfg.temperature)
                delta = jnp.einsum("e,eio->io", probs, jnp.einsum("eir,ero->eio", ad["A"], ad["B"]))
                base = jax.lax.stop_gradient(node) if train else node
                aux = aux + cfg.num_experts * jnp.sum(probs**2) - 1.0
                return base + cfg.scale * delta.reshape(node.shape).astype(node.dtype)
            return jax.lax.stop_gradient(node) if train else node
        return {k: walk(v, prefix + (k,)) for k, v in node.items()}

    merged = walk(params)
    return merged, cfg.balance_coeff * jnp.clip(aux, 0.0, None)
