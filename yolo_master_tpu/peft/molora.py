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


# ---------------------------------------------------------------------------
# Per-sample routed MoLoRA (reference molora/router.py input-conditioned path)
# ---------------------------------------------------------------------------

class RoutedMoLoRAConv:
    """Input-conditioned MoLoRA overlay for one conv/linear site.

    The reference routes adapter experts per sample from layer inputs
    (nn/peft/molora/router.py). The weight-merge form above cannot express
    that (one merged weight per step), but the LOW-RANK structure can:
        y = base(x) + scale * sum_e p_e(x) * ((x * A_e) * B_e)
    Both adapter matmuls act on activations, so the per-sample router weights
    apply to [B, ...] outputs — no per-sample weight materialization, and the
    whole overlay stays jit-compatible with static shapes. Cost is
    O(E * r * (fan_in + fan_out)) FLOPs on top of the base op.

    Works for 4D HWIO conv kernels (the A factor becomes a kxk conv down to
    rank r, B a 1x1 up) and 2D linear kernels.
    """

    def __init__(self, kernel_shape, cfg: MoLoRAConfig):
        self.kernel_shape = tuple(kernel_shape)
        self.cfg = cfg
        self.is_conv = len(kernel_shape) == 4

    def init(self, key) -> dict:
        cfg = self.cfg
        fan_in = int(np.prod(self.kernel_shape[:-1]))
        out = self.kernel_shape[-1]
        k1, k2 = jax.random.split(key)
        in_feat = self.kernel_shape[2] if self.is_conv else self.kernel_shape[0]
        return {
            "A": jax.random.normal(k1, (cfg.num_experts, fan_in, cfg.r), jnp.float32) / np.sqrt(fan_in),
            "B": jnp.zeros((cfg.num_experts, cfg.r, out), jnp.float32),
            # router: GAP(x) -> linear -> E logits (input-conditioned)
            "router_w": 0.05 * jax.random.normal(k2, (in_feat, cfg.num_experts), jnp.float32),
            "router_b": jnp.zeros((cfg.num_experts,), jnp.float32),
        }

    def route(self, p, x) -> jnp.ndarray:
        """[B, E] per-sample gate probabilities (top-k masked, renormalized)."""
        cfg = self.cfg
        pooled = jnp.mean(x.astype(jnp.float32), axis=tuple(range(1, x.ndim - 1)))  # [B, C]
        logits = pooled @ p["router_w"] + p["router_b"]
        probs = jax.nn.softmax(logits / max(cfg.temperature, 0.1), -1)
        if cfg.top_k < cfg.num_experts:
            vals = jax.lax.top_k(probs, cfg.top_k)[0][:, -1:]
            probs = probs * (probs >= vals)
            probs = probs / jnp.clip(jnp.sum(probs, -1, keepdims=True), 1e-9, None)
        return probs

    def delta(self, p, x, stride: int = 1, padding=None) -> jnp.ndarray:
        """Per-sample routed adapter output (add to the base op's output)."""
        cfg = self.cfg
        probs = self.route(p, x)  # [B, E]
        if self.is_conv:
            from ..nn.layers import autopad, conv2d

            kh, kw, ci, _ = self.kernel_shape
            pad = autopad(kh, padding)
            # one grouped conv for all E down-projections: [kh,kw,ci,E*r]
            a = p["A"].reshape(cfg.num_experts, kh, kw, ci, cfg.r)
            a = jnp.transpose(a, (1, 2, 3, 0, 4)).reshape(kh, kw, ci, cfg.num_experts * cfg.r)
            z = conv2d(x, a.astype(x.dtype), stride=stride, padding=pad)  # [B,H,W,E*r]
            B_, H, W, _ = z.shape
            z = z.reshape(B_, H, W, cfg.num_experts, cfg.r)
            up = jnp.einsum("bhwer,ero->bhweo", z.astype(jnp.float32), p["B"])
            out = jnp.einsum("bhweo,be->bhwo", up, probs)
        else:
            z = jnp.einsum("bi,eir->ber", x.astype(jnp.float32), p["A"])
            up = jnp.einsum("ber,ero->beo", z, p["B"])
            out = jnp.einsum("beo,be->bo", up, probs)
        return (cfg.scale * out).astype(x.dtype), probs

    def aux_loss(self, probs) -> jnp.ndarray:
        """Batch-level balance term: E * sum(mean_probs^2) - 1 >= 0."""
        mean = jnp.mean(probs.astype(jnp.float32), 0)
        return self.cfg.balance_coeff * jnp.clip(
            self.cfg.num_experts * jnp.sum(mean**2) - 1.0, 0.0, None)
