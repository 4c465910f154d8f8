"""Legacy dynamic MoE blocks (DyC2f checkpoint compatibility).

Reference: ultralytics/nn/modules/dynamic_moe.py:1-153 — DynamicExpert /
MoEGate / DyMoEBlock / DyC2f, kept under their historical names so old YAMLs
and checkpoints keep loading.

TPU-first notes: the gate's top-k dispatch is recast as static-shape rank
masking over [B,E] weights (exact-zero non-selected experts), and the
LayerScale gammas live in the params tree. Expert mixing is a dense weighted
sum — at legacy scale (E=4, k=2) the grouped compute fits one fusion and the
gather machinery would cost more than it saves.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..layers import Conv, DWConv
from ..module import Context, Module, ModuleList, Params
from .mixtures import moe_aux_loss, process_logits

EXPERT_KINDS = ("spatial", "channel", "detail", "texture")


class DynamicExpert(Module):
    """Feature expert (dynamic_moe.py:12-35): spatial (DW7+PW), channel
    (SE-style multiplicative), detail (3x3+3x3), texture (DW5+PW)."""

    def __init__(self, dim: int, expert_type: str = "spatial"):
        super().__init__()
        self.expert_type = expert_type
        if expert_type == "spatial":
            self.net = ModuleList([Conv(dim, dim, 7, 1, 3, g=dim), Conv(dim, dim, 1)])
        elif expert_type == "channel":
            self.net = ModuleList([Conv(dim, dim // 4, 1), Conv(dim // 4, dim, 1, act=False)])
        elif expert_type == "detail":
            self.net = ModuleList([Conv(dim, dim, 3, 1, 1), Conv(dim, dim, 3, 1, 1)])
        else:  # texture
            self.net = ModuleList([DWConv(dim, dim, 5, 1), Conv(dim, dim, 1)])

    def __call__(self, p: Params, x, ctx: Context):
        if self.expert_type == "channel":
            y = jnp.mean(x, axis=(1, 2), keepdims=True)
            y = self.net[0](p["net"]["0"], y, ctx)
            y = self.net[1](p["net"]["1"], y, ctx)
            return x * jax.nn.sigmoid(y.astype(jnp.float32)).astype(x.dtype)
        y = self.net[0](p["net"]["0"], x, ctx)
        return self.net[1](p["net"]["1"], y, ctx)


class MoEGate(Module):
    """GAP -> Linear top-k router with GShard balance loss
    (dynamic_moe.py:38-64)."""

    def __init__(self, dim: int, num_experts: int = 4, top_k: int = 2):
        super().__init__()
        self.dim, self.num_experts, self.top_k = dim, num_experts, min(top_k, num_experts)
        self.balance_loss_weight = 0.01

    def init(self, key) -> Params:
        k1, k2 = jax.random.split(key)
        bound = 1.0 / (self.dim ** 0.5)
        return {
            "w": jax.random.uniform(k1, (self.dim, self.num_experts), jnp.float32, -bound, bound),
            "b": jax.random.uniform(k2, (self.num_experts,), jnp.float32, -bound, bound),
        }

    def __call__(self, p: Params, x, ctx: Context):
        pooled = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        logits = pooled @ p["w"] + p["b"]
        w, probs, logits32 = process_logits(
            logits, training=False, noise_std=0.0, top_k=self.top_k,
            num_experts=self.num_experts, rng=None,
        )
        balance = None
        if ctx.training:
            balance = moe_aux_loss(probs, logits32, w > 0, self.num_experts,
                                   balance_coeff=1.0, z_coeff=0.0)
        return w, balance


class DyMoEBlock(Module):
    """Routed residual block with LayerScale gammas (dynamic_moe.py:65-113)."""

    def __init__(self, dim: int, c2: Optional[int] = None, num_experts: int = 4,
                 top_k: int = 2, mlp_ratio: float = 2.0):
        super().__init__()
        if c2 is not None and c2 != dim:
            raise ValueError("DyMoEBlock is residual: c2 must equal dim")
        self.dim, self.num_experts, self.top_k = dim, num_experts, top_k
        self.experts = ModuleList([
            DynamicExpert(dim, EXPERT_KINDS[i % len(EXPERT_KINDS)]) for i in range(num_experts)
        ])
        self.gate = MoEGate(dim, num_experts, top_k)
        hidden = int(dim * mlp_ratio)
        self.mlp = ModuleList([Conv(dim, hidden, 1), Conv(hidden, dim, 1, act=False)])

    def init(self, key) -> Params:
        p = super().init(key)
        p["gamma1"] = 1e-4 * jnp.ones((self.dim,), jnp.float32)
        p["gamma2"] = 1e-4 * jnp.ones((self.dim,), jnp.float32)
        return p

    def __call__(self, p: Params, x, ctx: Context):
        w, balance = self.gate(p["gate"], x, ctx)
        routed = jnp.zeros_like(x, dtype=jnp.float32)
        for i, expert in enumerate(self.experts):
            y = expert(p["experts"][str(i)], x, ctx)
            routed = routed + y.astype(jnp.float32) * w[:, i][:, None, None, None]
        if ctx.training and balance is not None:
            aux = self.gate.balance_loss_weight * balance
            ctx.add_aux(self.path, aux)
            ctx.stats[self.path] = {"expert_usage": jnp.mean((w > 0).astype(jnp.float32), 0), "aux_loss": aux}
        x = x + p["gamma1"].astype(x.dtype) * routed.astype(x.dtype)
        y = self.mlp[0](p["mlp"]["0"], x, ctx)
        y = self.mlp[1](p["mlp"]["1"], y, ctx)
        return x + p["gamma2"].astype(x.dtype) * y


class DyC2f(Module):
    """C2f-style wrapper over DyMoEBlocks with a residual gamma
    (dynamic_moe.py:115-146). Requires c1 == c2 (historical residual form)."""

    def __init__(self, c1: int, c2: int, n: int = 1, num_experts: int = 4,
                 top_k: int = 2, e: float = 0.5):
        super().__init__()
        self.c2 = c2
        hidden = int(c2 * e)
        self.cv1 = Conv(c1, hidden, 1, 1)
        self.cv2 = Conv((1 + n) * hidden, c2, 1)
        self.m = ModuleList([DyMoEBlock(hidden, num_experts=num_experts, top_k=top_k) for _ in range(n)])

    def init(self, key) -> Params:
        p = super().init(key)
        p["gamma"] = 0.01 * jnp.ones((self.c2,), jnp.float32)
        return p

    def __call__(self, p: Params, x, ctx: Context):
        feats = [self.cv1(p["cv1"], x, ctx)]
        for i, block in enumerate(self.m):
            feats.append(block(p["m"][str(i)], feats[-1], ctx))
        out = self.cv2(p["cv2"], jnp.concatenate(feats, axis=-1), ctx)
        return x + p["gamma"].astype(x.dtype) * out
