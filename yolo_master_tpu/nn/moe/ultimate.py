"""Ultra/Ultimate MoE line: the conditional-compute variants.

Reference: ultralytics/nn/modules/moe/modules.py:103 (UltraOptimizedMoE),
:308 (AdaptiveCapacityMoE), :742 (OptimizedMOE), :1292 (HyperUltimateMoE),
:1515 (UltimateOptimizedMoE); routers.py:60 (UltraEfficientRouter),
:355 (AdvancedRoutingLayer); gated.py:1816 (AdaptiveBalanceController).

TPU-first recast of the torch mutable-state machinery:
  * the reference's channel-split dynamic path (HyperUltimate/Ultimate) maps
    onto :class:`MatMulFusedExperts` — all experts as ONE grouped matmul on
    the MXU, then static-shape top-k masking. The torch code iterates a
    ModuleList per selected expert; here the "dispatch" is a weighted sum
    with exact zeros, identical numerics, no dynamic shapes.
  * progressive sparsity / dynamic temperature are pure functions of
    ``ctx.step`` (traced), replacing the ``register_buffer`` counters +
    in-forward mutation (modules.py:1402-1419, 1617-1627).
  * conditional-compute ``weight_threshold`` zeroes sub-threshold top-k
    weights out-of-place (the torch version skips those experts eagerly;
    under jit the masked weights make the contribution exactly zero, and the
    sparse eval path skips the compute for real via gather dispatch).
  * AdaptiveBalanceController's learnable expert-importance prior is a real
    parameter in the params tree; its coeff decay reads ``ctx.step``.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..layers import BatchNorm, ConvSeq, GroupNorm, PlainConv, avg_pool, get_safe_groups, silu
from ..module import Context, Module, ModuleList, Params
from ..moa import _SiLUm
from .gated import MatMulFusedExperts, UltraLightRouter
from .mixtures import (
    EXPERT_TYPES,
    _path_key,
    moe_aux_loss,
    process_logits,
)
from .routers import LOGIT_CLAMP


# ---------------------------------------------------------------------------
# Routers (reference routers.py:60-167, 355-410)
# ---------------------------------------------------------------------------

class UltraEfficientRouter(Module):
    """8x-downsampled depthwise-separable router (routers.py:60): avg-pool
    ``pool_scale`` -> DW3x3+GN+SiLU -> PW compress+GN+SiLU -> 1x1 -> E logits.
    ~95% router-FLOPs reduction vs the local-conv baseline."""

    def __init__(self, c1, num_experts, reduction=16, top_k=2, noise_std=1.0,
                 temperature=1.0, pool_scale=8):
        super().__init__()
        self.num_experts, self.top_k = num_experts, top_k
        self.noise_std, self.pool_scale = noise_std, pool_scale
        self.temperature = max(float(temperature), 1e-3)
        reduced = max(c1 // reduction, 4)
        self.router = ConvSeq(
            PlainConv(c1, c1, 3, g=c1), GroupNorm(c1, 8), _SiLUm(),
            PlainConv(c1, reduced, 1), GroupNorm(reduced, 4), _SiLUm(),
            PlainConv(reduced, num_experts, 1, bias=True),
        )

    def init(self, key) -> Params:
        p = super().init(key)
        # router-head small-variance init (modules.py:187-191)
        p["router"]["6"]["w"] = 0.05 * jax.random.normal(key, p["router"]["6"]["w"].shape)
        return p

    def logits(self, p, x, ctx):
        if x.shape[1] > self.pool_scale and x.shape[2] > self.pool_scale:
            x = avg_pool(x, self.pool_scale)
        lmap = self.router(p["router"], x, ctx)
        return jnp.mean(lmap.astype(jnp.float32), axis=(1, 2)) / self.temperature


class AdvancedRoutingLayer(Module):
    """Legacy-checkpoint GAP router (routers.py:355): GAP -> 1x1 reduce ->
    SiLU -> 1x1 -> E. Channel mismatches are adapted by pad/truncate, exactly
    like the reference's tensor-only fallback."""

    def __init__(self, c1, num_experts=3, top_k=None, noise_std=0.0):
        super().__init__()
        self.c1, self.num_experts = c1, num_experts
        self.top_k = num_experts if top_k is None else min(top_k, num_experts)
        self.noise_std = noise_std
        reduced = max(c1 // 8, 8)
        self.router = ConvSeq(PlainConv(c1, reduced, 1), _SiLUm(), PlainConv(reduced, num_experts, 1, bias=True))

    def logits(self, p, x, ctx):
        pooled = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True)
        C = pooled.shape[-1]
        if C < self.c1:
            pooled = jnp.pad(pooled, ((0, 0), (0, 0), (0, 0), (0, self.c1 - C)))
        elif C > self.c1:
            pooled = pooled[..., : self.c1]
        out = self.router(p["router"], pooled.astype(x.dtype), ctx)
        return out.reshape(x.shape[0], self.num_experts).astype(jnp.float32)


# ---------------------------------------------------------------------------
# UltraOptimizedMoE / AdaptiveCapacityMoE (modules.py:103-396)
# ---------------------------------------------------------------------------

class UltraOptimizedMoE(Module):
    """Ultra-efficient router + batched experts + shared expert + conditional
    compute threshold (modules.py:103-305)."""

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        num_experts: int = 4,
        top_k: int = 2,
        expert_type: str = "simple",
        router_reduction: int = 16,
        router_pool_scale: int = 8,
        noise_std: float = 1.0,
        router_temperature: float = 1.0,
        balance_loss_coeff: float = 1.0,
        router_z_loss_coeff: float = 1.0,
        num_groups: int = 8,
        weight_threshold: float = 0.01,
    ):
        super().__init__()
        if expert_type not in EXPERT_TYPES:
            raise ValueError(f"unknown expert_type '{expert_type}'")
        self.in_channels, self.out_channels = in_channels, out_channels
        self.num_experts, self.top_k = num_experts, min(top_k, num_experts)
        self.noise_std = noise_std
        self.balance_loss_coeff = balance_loss_coeff
        self.router_z_loss_coeff = router_z_loss_coeff
        self.weight_threshold = weight_threshold
        self.routing = UltraEfficientRouter(
            in_channels, num_experts, reduction=router_reduction, top_k=top_k,
            noise_std=noise_std, temperature=router_temperature, pool_scale=router_pool_scale,
        )
        kwargs = {"num_groups": num_groups} if expert_type == "simple" else {}
        self.experts = ModuleList([EXPERT_TYPES[expert_type](in_channels, out_channels, **kwargs) for _ in range(num_experts)])
        # shared expert: 1x1 + GN + SiLU (modules.py:159-163)
        self.shared_expert = ConvSeq(
            PlainConv(in_channels, out_channels, 1),
            GroupNorm(out_channels, get_safe_groups(out_channels, num_groups)),
            _SiLUm(),
        )

    def _routing(self, p, x, ctx):
        rng = _path_key(ctx.step, self.path) if ctx.training else None
        logits = self.routing.logits(p["routing"], x, ctx)
        w, probs, logits32 = process_logits(
            logits, training=ctx.training, noise_std=self.noise_std,
            top_k=self.top_k, num_experts=self.num_experts, rng=rng,
        )
        # conditional compute: zero sub-threshold weights, renormalize
        # (modules.py weight_threshold; out-of-place, grad-preserving)
        if self.weight_threshold > 0:
            w = jnp.where(w >= self.weight_threshold, w, 0.0)
            w = w / jnp.clip(jnp.sum(w, -1, keepdims=True), 1e-9, None)
        return w, probs, logits32

    def _expert_mix(self, p, x, w, ctx):
        """Weighted expert sum; gathered sparse dispatch at eval."""
        if (not ctx.training) and ctx.sparse_inference and self.top_k < self.num_experts:
            from .dispatch import gather_dispatch, stack_expert_params, top_k_from_weights

            bank = stack_expert_params([p["experts"][str(i)] for i in range(self.num_experts)])
            wts, idx = top_k_from_weights(w, self.top_k)
            return gather_dispatch(self.experts[0], bank, x, idx, wts, ctx).astype(jnp.float32)
        out = jnp.zeros((*x.shape[:3], self.out_channels), jnp.float32)
        for i, expert in enumerate(self.experts):
            y = expert(p["experts"][str(i)], x, ctx)
            out = out + y.astype(jnp.float32) * w[:, i][:, None, None, None]
        return out

    def _publish_aux(self, probs, logits32, w, ctx):
        if not ctx.training:
            return
        aux = moe_aux_loss(
            probs, logits32, w > 0, self.num_experts,
            balance_coeff=self.balance_loss_coeff, z_coeff=self.router_z_loss_coeff,
        )
        ctx.add_aux(self.path, aux)
        ctx.stats[self.path] = {"expert_usage": jnp.mean(probs, 0), "aux_loss": aux}

    def __call__(self, p: Params, x, ctx: Context):
        w, probs, logits32 = self._routing(p, x, ctx)
        shared = self.shared_expert(p["shared_expert"], x, ctx)
        out = (shared.astype(jnp.float32) + self._expert_mix(p, x, w, ctx)).astype(x.dtype)
        self._publish_aux(probs, logits32, w, ctx)
        return out


class AdaptiveCapacityMoE(UltraOptimizedMoE):
    """Complexity-adaptive capacity: scales the sparse-expert contribution by
    a differentiable factor in [1/cf, cf] (modules.py:308-396, the sync-free
    2026-06-25 revision)."""

    def __init__(self, *args, capacity_factor: float = 1.5, **kwargs):
        super().__init__(*args, **kwargs)
        self.capacity_factor = max(float(capacity_factor), 1.0)
        self.complexity_estimator = PlainConv(self.in_channels, 1, 1, bias=True)

    def __call__(self, p: Params, x, ctx: Context):
        w, probs, logits32 = self._routing(p, x, ctx)
        shared = self.shared_expert(p["shared_expert"], x, ctx).astype(jnp.float32)
        expert_out = self._expert_mix(p, x, w, ctx)
        if self.capacity_factor > 1.0:
            pooled = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True)
            s = jnp.mean(jax.nn.sigmoid(
                self.complexity_estimator(p["complexity_estimator"], pooled.astype(x.dtype), ctx).astype(jnp.float32)
            ))
            scale = jnp.exp((2.0 * s - 1.0) * math.log(self.capacity_factor))
            expert_out = expert_out * scale
        out = (shared + expert_out).astype(x.dtype)
        self._publish_aux(probs, logits32, w, ctx)
        return out


# ---------------------------------------------------------------------------
# AdaptiveBalanceController (gated.py:1816-1905)
# ---------------------------------------------------------------------------

class AdaptiveBalanceController(Module):
    """Step-decayed balance coefficient + learnable expert-importance prior +
    collapse-penalizing entropy term (gated.py:1816, rev5 GShard-scale)."""

    def __init__(self, num_experts, initial_coeff=1.0, final_coeff=0.1,
                 decay_steps=50000, entropy_coeff=0.1):
        super().__init__()
        self.num_experts = num_experts
        self.initial_coeff, self.final_coeff = initial_coeff, final_coeff
        self.decay_steps, self.entropy_coeff = decay_steps, entropy_coeff

    def init(self, key) -> Params:
        return {"expert_importance": jnp.ones((self.num_experts,), jnp.float32)}

    def __call__(self, p: Params, routing_stats, ctx: Context):
        usage = routing_stats["expert_usage"].astype(jnp.float32)  # [E]
        progress = jnp.clip(jnp.asarray(ctx.step, jnp.float32) / self.decay_steps, 0.0, 1.0)
        coeff = self.initial_coeff * (1 - progress) + self.final_coeff * progress
        target = jax.nn.softmax(p["expert_importance"])
        router_probs = routing_stats.get("router_probs")
        if router_probs is not None:
            # GShard with the learned prior as soft target: E*sum(imp*usage/target-ish)
            importance = jnp.mean(router_probs.astype(jnp.float32), axis=0)
            balance = self.num_experts * jnp.sum(importance * jax.lax.stop_gradient(usage) / jnp.clip(target * self.num_experts, 1e-6, None))
        else:
            balance = self.num_experts * jnp.sum(usage * target)
        usage_safe = jnp.clip(usage, 1e-6, None)
        entropy = -jnp.sum(usage_safe * jnp.log(usage_safe))
        max_ent = math.log(max(self.num_experts, 2))
        ent_penalty = jnp.clip(max_ent - entropy, 0.0, None) / max_ent
        total = coeff * (balance + self.entropy_coeff * ent_penalty)
        return jnp.nan_to_num(total, nan=0.0, posinf=0.0, neginf=0.0)


# ---------------------------------------------------------------------------
# HyperUltimateMoE / UltimateOptimizedMoE (modules.py:1292-1660)
# ---------------------------------------------------------------------------

class HyperUltimateMoE(Module):
    """Channel-split MoE: static depthwise path ‖ dynamic MatMul-fused-expert
    path, complexity-scaled routing, progressive sparsity, adaptive balance
    (modules.py:1292-1513).

    The dynamic path computes all experts as one grouped conv (the
    MXU-optimal form); top-k selection is static-shape rank masking over the
    full [B,E] weight vector so the traced adaptive-k warmup schedule never
    changes shapes."""

    entropy_coeff = 0.0
    initial_temperature = 1.0
    final_temperature = 1.0

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        num_experts: int = 4,
        top_k: int = 2,
        split_ratio: float = 0.5,
        num_groups: int = 8,
        use_routing_cache: bool = True,
        capacity_factor: float = 1.5,
        warmup_steps: int = 5000,
        balance_loss_coeff: float = 1.0,
        router_z_loss_coeff: float = 0.0,
    ):
        super().__init__()
        if in_channels != out_channels:
            raise ValueError("HyperUltimateMoE is residual: in_channels must equal out_channels")
        self.in_channels, self.out_channels = in_channels, out_channels
        self.num_experts, self.top_k = num_experts, min(top_k, num_experts)
        self.capacity_factor = capacity_factor
        self.warmup_steps = warmup_steps
        self.balance_loss_coeff = balance_loss_coeff
        self.router_z_loss_coeff = router_z_loss_coeff

        self.dynamic_channels = int(in_channels * split_ratio)
        self.static_channels = in_channels - self.dynamic_channels
        self.out_dynamic = int(out_channels * split_ratio)
        self.out_static = out_channels - self.out_dynamic

        # static path: DW3x3+BN+SiLU -> PW1x1+BN+SiLU (modules.py:1324-1332)
        self.static_net = ConvSeq(
            PlainConv(self.static_channels, self.static_channels, 3, g=self.static_channels),
            BatchNorm(self.static_channels), _SiLUm(),
            PlainConv(self.static_channels, self.out_static, 1),
            BatchNorm(self.out_static), _SiLUm(),
        )
        self.routing = UltraLightRouter(self.dynamic_channels, num_experts, self.top_k,
                                        temperature=self.initial_temperature)
        self.fused_experts = MatMulFusedExperts(self.dynamic_channels, self.out_dynamic,
                                                num_experts, num_groups, top_k=self.top_k)
        self.complexity_estimator = PlainConv(self.dynamic_channels, 1, 1, bias=True)
        self.balance_controller = AdaptiveBalanceController(
            num_experts, initial_coeff=balance_loss_coeff, final_coeff=0.1 * balance_loss_coeff,
            decay_steps=50000, entropy_coeff=self.entropy_coeff,
        )
        self.proj = PlainConv(out_channels, out_channels, 1)
        self.bn = GroupNorm(out_channels, get_safe_groups(out_channels, num_groups))

    # -- schedules as pure functions of ctx.step ---------------------------
    def _adaptive_top_k(self, ctx):
        if not ctx.training:
            return self.top_k
        progress = jnp.clip(jnp.asarray(ctx.step, jnp.float32) / self.warmup_steps, 0.0, 1.0)
        k = self.num_experts - progress * (self.num_experts - self.top_k)
        return jnp.maximum(self.top_k, jnp.floor(k)).astype(jnp.int32)

    def _temperature(self, ctx):
        if self.initial_temperature == self.final_temperature:
            return self.initial_temperature
        progress = jnp.clip(jnp.asarray(ctx.step, jnp.float32) / self.warmup_steps, 0.0, 1.0)
        t = self.initial_temperature * (1 - progress) + self.final_temperature * progress
        return jnp.maximum(t, 0.1)

    def __call__(self, p: Params, x, ctx: Context):
        B, H, W, _ = x.shape
        x_static = x[..., : self.static_channels]
        x_dyn = x[..., self.static_channels:]

        out_static = self.static_net(p["static_net"], x_static, ctx)

        # complexity scale in [0.3, 1.5] (nan-guarded, modules.py:1643-1645)
        pooled = jnp.mean(x_dyn.astype(jnp.float32), axis=(1, 2), keepdims=True)
        cs = jnp.mean(jax.nn.sigmoid(
            self.complexity_estimator(p["complexity_estimator"], pooled.astype(x.dtype), ctx).astype(jnp.float32)))
        cs = jnp.clip(jnp.nan_to_num(cs, nan=1.0, posinf=1.5, neginf=0.3), 0.3, 1.5)

        # routing over full E with static-shape adaptive-k masking
        logits = self.routing.logits(p["routing"], x_dyn, ctx) / self._temperature(ctx)
        w, probs, logits32 = process_logits(
            logits, training=ctx.training, noise_std=0.0,
            top_k=self._adaptive_top_k(ctx), num_experts=self.num_experts, rng=None,
        )
        w = w * cs

        # dynamic path: all experts in one grouped conv, dense weighted sum in
        # training (static shapes under traced k); true top-k gather at eval
        sparse_eval = (not ctx.training) and ctx.sparse_inference and self.top_k < self.num_experts
        if sparse_eval:
            wts, idx = jax.lax.top_k(w, self.top_k)
            out_dyn = self.fused_experts(p["fused_experts"], x_dyn, ctx, wts, idx, self.top_k)
        else:
            idx = jnp.broadcast_to(jnp.arange(self.num_experts)[None], (B, self.num_experts))
            out_dyn = self.fused_experts(p["fused_experts"], x_dyn, ctx, w, idx, self.num_experts)

        out = jnp.concatenate([out_static, out_dyn], axis=-1)
        out = self.proj(p["proj"], out, ctx)
        out = self.bn(p["bn"], out, ctx) + x

        if ctx.training:
            stats = {"expert_usage": jnp.mean((w > 0).astype(jnp.float32), 0), "router_probs": probs}
            aux = self.balance_controller(p["balance_controller"], stats, ctx)
            if self.router_z_loss_coeff:
                aux = aux + self.router_z_loss_coeff * jnp.mean(jax.nn.logsumexp(logits32, -1) ** 2)
            ctx.add_aux(self.path, aux)
            ctx.stats[self.path] = {"expert_usage": jnp.mean(probs, 0), "aux_loss": aux}
        return out


class UltimateOptimizedMoE(HyperUltimateMoE):
    """HyperUltimateMoE + dynamic temperature (2.0 -> 0.5 over warmup) +
    entropy regularization (modules.py:1515-1660)."""

    entropy_coeff = 0.01
    initial_temperature = 2.0
    final_temperature = 0.5

    def __init__(self, *args, initial_temperature=2.0, final_temperature=0.5,
                 entropy_coeff=0.01, **kwargs):
        self.initial_temperature = initial_temperature
        self.final_temperature = final_temperature
        self.entropy_coeff = entropy_coeff
        super().__init__(*args, **kwargs)
