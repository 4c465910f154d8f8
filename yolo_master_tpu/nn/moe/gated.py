"""AdaptiveGate MoE family (v0.4 - v0.13) — the released EsMoE-weights blocks.

Reference: ultralytics/nn/modules/moe/gated.py (2,740 LoC). Implemented here:
DualStreamGateRouter(V2), ZeroCostRouter, FusedExpertGroup /
LowRankFusedExpertGroup / MatMulFusedExperts, SharedInvertedExpertGroup,
AdaptiveGateMoE -> HybridAdaptiveGateMoE(v2) -> OptimalHybridGateMoE ->
GatedFusionMoE, the low-rank/refine/context/detail chain up to
VisualEnhancedAdaptiveGateMoE (the block in released EsMoE checkpoints,
model-zoo/models.json:5).

TPU-first mapping:
  * FusedExpertGroup's "all experts in one grouped conv" (gated.py:936-1030)
    is already the TPU-native dispatch: one grouped conv -> [B, E, OC, H, W]
    -> top-k gather -> vectorized per-expert GN affine -> weighted sum. This
    IS the grouped-matmul expert kernel of the BASELINE north star for the
    small-E regime.
  * router temperature cosine-anneals from ctx.step (traced) instead of the
    torch mutable-buffer schedule (gated.py:423-433, 2000-step anneal).
  * the complexity gate keeps full top-k shape and zeroes low-rank weights
    (already static-shape-friendly in the reference, gated.py:398-420).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..layers import BatchNorm, ConvSeq, GroupNorm, LayerNorm, Linear, PlainConv, avg_pool, conv2d, silu, upsample_nearest
from ..module import Context, Module, ModuleList, Params
from ..layers import get_safe_groups
from ..moa import _SiLUm
from .mixtures import _path_key, moe_aux_loss

LOGIT_CLAMP = 30.0


def _topk_renorm(probs, k):
    vals, idx = jax.lax.top_k(probs, k)
    vals = vals / (jnp.sum(vals, -1, keepdims=True) + 1e-6)
    return vals, idx


class ZeroCostRouter(Module):
    """Channel-statistics-only router (gated.py:855-935): [mean,std] -> FC.

    Faithful quirk: the reference's mapping net is Sequential(Linear, Softmax)
    and its output is THEN divided by temperature, clamped, and softmaxed
    again (gated.py:875-900) — i.e. the "logits" entering the final softmax
    are already probabilities. Preserved exactly (param key ``router.0`` too)
    so imported checkpoints route identically."""

    def __init__(self, in_channels, num_experts, top_k, temperature=1.0):
        super().__init__()
        self.num_experts, self.top_k = num_experts, top_k
        self.temperature = max(temperature, 1e-3)
        self.router = ConvSeq(Linear(2 * in_channels, num_experts, bias=False))

    def init(self, key) -> Params:
        p = super().init(key)
        p["router"]["0"]["w"] = 0.05 * jax.random.normal(key, p["router"]["0"]["w"].shape)
        return p

    def logits(self, p, x, ctx):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(1, 2))
        std = jnp.std(xf, axis=(1, 2))
        raw = self.router(p["router"], jnp.concatenate([mean, std], -1), ctx).astype(jnp.float32)
        return jax.nn.softmax(raw, -1)  # the Sequential's Softmax

    def __call__(self, p, x, ctx, temperature=None):
        logits = jnp.clip(self.logits(p, x, ctx) / (temperature or self.temperature),
                          -LOGIT_CLAMP, LOGIT_CLAMP)
        probs = jax.nn.softmax(logits, -1)
        w, idx = _topk_renorm(probs, self.top_k)
        return w, idx, {"router_probs": probs, "router_logits": logits}


class UltraLightRouter(ZeroCostRouter):
    """Alias kept for registry parity (gated.py:2720)."""


class DualStreamGateRouter(Module):
    """Global channel-stats FC + local DW-conv stream, merged by learned alpha
    (gated.py:51-154)."""

    def __init__(self, in_channels, num_experts, top_k, temperature=1.0, local_reduction=16, pool_scale=4):
        super().__init__()
        self.num_experts, self.top_k = num_experts, top_k
        self.temperature = max(temperature, 1e-3)
        self.pool_scale = pool_scale
        self.global_fc = Linear(2 * in_channels, num_experts, bias=False)
        reduced = max(in_channels // local_reduction, 4)
        self.local_conv = ConvSeq(
            PlainConv(in_channels, in_channels, 3, g=in_channels), GroupNorm(in_channels, 8), _SiLUm(),
            PlainConv(in_channels, reduced, 1), GroupNorm(reduced, 4), _SiLUm(),
            PlainConv(reduced, num_experts, 1, bias=True),
        )

    def init(self, key) -> Params:
        p = super().init(key)
        if "global_fc" in p:  # absent in MultiHeadRouterV3 (renamed global_proj)
            p["global_fc"]["w"] = 0.05 * jax.random.normal(key, p["global_fc"]["w"].shape)
        p["alpha"] = jnp.asarray(0.5, jnp.float32)
        return p

    def _global_logits(self, p, x, ctx):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(1, 2))
        std = jnp.std(xf, axis=(1, 2))
        stats = jnp.concatenate([mean, std], -1)
        return self.global_fc(p["global_fc"], stats, ctx), stats

    def _local_logits(self, p, x, ctx):
        if x.shape[1] > self.pool_scale and x.shape[2] > self.pool_scale:
            x = avg_pool(x, self.pool_scale)
        lmap = self.local_conv(p["local_conv"], x, ctx)
        return jnp.mean(lmap.astype(jnp.float32), axis=(1, 2))

    def fused_logits(self, p, x, ctx):
        g, _ = self._global_logits(p, x, ctx)
        l = self._local_logits(p, x, ctx)
        alpha = jax.nn.sigmoid(p["alpha"])
        return jnp.clip(alpha * g + (1 - alpha) * l, -LOGIT_CLAMP, LOGIT_CLAMP)

    def __call__(self, p, x, ctx: Context, temperature=None):
        logits = self.fused_logits(p, x, ctx)
        probs = jax.nn.softmax(logits / (temperature if temperature is not None else self.temperature), -1)
        w, idx = _topk_renorm(probs, self.top_k)
        return w, idx, {"router_probs": probs, "router_logits": logits}


class DualStreamGateRouterV2(DualStreamGateRouter):
    """v0.11 router: LayerNorm'd stats + learnable per-expert prior bias +
    decaying Switch-style train noise (gated.py:155-250)."""

    def __init__(self, in_channels, num_experts, top_k, temperature=1.0,
                 local_reduction=16, pool_scale=4, noise_std=0.1):
        super().__init__(in_channels, num_experts, top_k, temperature, local_reduction, pool_scale)
        self.stat_norm = LayerNorm(2 * in_channels)
        self.noise_std_init = noise_std

    def init(self, key) -> Params:
        p = super().init(key)
        p["expert_prior"] = jnp.zeros((self.num_experts,), jnp.float32)
        return p

    def fused_logits(self, p, x, ctx):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(1, 2))
        std = jnp.std(xf, axis=(1, 2))
        stats = self.stat_norm(p["stat_norm"], jnp.concatenate([mean, std], -1), ctx)
        g = self.global_fc(p["global_fc"], stats, ctx)
        l = self._local_logits(p, x, ctx)
        alpha = jax.nn.sigmoid(p["alpha"])
        logits = alpha * g + (1 - alpha) * l + p["expert_prior"][None]
        if ctx.training and self.noise_std_init > 0:
            # linear decay to 0 over the first half of a nominal 2000-step run
            decay = jnp.clip(1.0 - jnp.asarray(ctx.step, jnp.float32) / 1000.0, 0.0, 1.0)
            noise = jax.random.normal(_path_key(ctx.step, self.path), logits.shape)
            logits = logits + noise * self.noise_std_init * decay
        return jnp.clip(logits, -LOGIT_CLAMP, LOGIT_CLAMP)


# ---------------------------------------------------------------------------
# Expert backends
# ---------------------------------------------------------------------------

class FusedExpertGroup(Module):
    """All experts as ONE grouped 3x3 conv -> [B,E,OC,H,W] -> top-k gather ->
    vectorized per-expert GroupNorm affine -> SiLU -> weighted sum
    (gated.py:936-1030). The TPU grouped-dispatch kernel of this family."""

    kernel_size = 3

    def __init__(self, in_channels, out_channels, num_experts, num_groups=8, top_k=2):
        super().__init__()
        self.num_experts, self.out_channels = num_experts, out_channels
        self.top_k = min(top_k, num_experts)
        fused_out = num_experts * out_channels
        g = min(get_safe_groups(in_channels, num_groups), fused_out)
        while g > 1 and (in_channels % g or fused_out % g):
            g -= 1
        self.conv_groups = max(1, g)
        self.fused_conv = PlainConv(in_channels, fused_out, self.kernel_size, g=self.conv_groups)
        self.norm_groups = get_safe_groups(out_channels, num_groups)

    def init(self, key) -> Params:
        p = super().init(key)
        p["expert_norm_weight"] = jnp.ones((self.num_experts, self.out_channels), jnp.float32)
        p["expert_norm_bias"] = jnp.zeros((self.num_experts, self.out_channels), jnp.float32)
        return p

    def __call__(self, p, x, ctx, routing_weights=None, routing_indices=None, top_k=None):
        B, H, W, _ = x.shape
        E, OC = self.num_experts, self.out_channels
        k = top_k or self.top_k
        fused = self.fused_conv(p["fused_conv"], x, ctx)  # [B,H,W,E*OC]
        fused = fused.reshape(B, H, W, E, OC)
        # gather top-k experts [B,H,W,k,OC]
        idx = routing_indices.reshape(B, k)
        sel = jnp.take_along_axis(fused, idx[:, None, None, :, None], axis=3)
        # per-(sample,expert) GroupNorm with gathered affine
        g = self.norm_groups
        xf = sel.astype(jnp.float32).reshape(B, H * W, k, g, OC // g)
        mean = jnp.mean(xf, axis=(1, 4), keepdims=True)
        var = jnp.var(xf, axis=(1, 4), keepdims=True)
        normed = ((xf - mean) * jax.lax.rsqrt(var + 1e-5)).reshape(B, H, W, k, OC)
        w_aff = jnp.take_along_axis(p["expert_norm_weight"][None], idx[:, :, None], 1)  # [B,k,OC]
        b_aff = jnp.take_along_axis(p["expert_norm_bias"][None], idx[:, :, None], 1)
        normed = normed * w_aff[:, None, None] + b_aff[:, None, None]
        normed = silu(normed)
        wts = routing_weights.reshape(B, 1, 1, k, 1).astype(normed.dtype)
        return jnp.sum(normed * wts, 3).astype(x.dtype)


class MatMulFusedExperts(FusedExpertGroup):
    """Registry alias of FusedExpertGroup (gated.py:2734 keeps it k=3 —
    "alias for now"; the param tree must match for checkpoint import)."""


class LowRankFusedExpertGroup(Module):
    """Shared 1x1 bottleneck before the fused experts (gated.py:1035-1086)."""

    def __init__(self, in_channels, out_channels, num_experts, num_groups=8, top_k=2,
                 bottleneck_ratio=0.5, min_channels=16):
        super().__init__()
        bc = min(in_channels, max(min_channels, round(in_channels * bottleneck_ratio)))
        self.bottleneck = ConvSeq(PlainConv(in_channels, bc, 1), GroupNorm(bc, num_groups), _SiLUm())
        self.fused = FusedExpertGroup(bc, out_channels, num_experts, num_groups, top_k=top_k)

    def __call__(self, p, x, ctx, routing_weights=None, routing_indices=None, top_k=None):
        y = self.bottleneck(p["bottleneck"], x, ctx)
        return self.fused(p["fused"], y, ctx, routing_weights, routing_indices, top_k)


class SharedInvertedExpertGroup(Module):
    """Shared expand+dw trunk, per-expert pointwise projections, masked-dense
    dispatch (reference experts.py:179-270)."""

    def __init__(self, in_channels, out_channels, num_experts, expand_ratio=2.0,
                 kernel_size=3, top_k=2, weight_threshold=0.0):
        super().__init__()
        self.num_experts, self.out_channels = num_experts, out_channels
        self.top_k = top_k
        self.weight_threshold = weight_threshold
        hid = max(1, int(in_channels * expand_ratio))
        self.shared_feature = ConvSeq(
            PlainConv(in_channels, hid, 1), GroupNorm(hid, 8), _SiLUm(),
            PlainConv(hid, hid, kernel_size, g=hid), GroupNorm(hid, 8), _SiLUm(),
        )
        self.expert_projections = ModuleList(
            [ConvSeq(PlainConv(hid, out_channels, 1), GroupNorm(out_channels, 8)) for _ in range(num_experts)]
        )

    def __call__(self, p, x, ctx, routing_weights=None, routing_indices=None, top_k=None):
        B, H, W, _ = x.shape
        k = top_k or self.top_k
        feats = self.shared_feature(p["shared_feature"], x, ctx)
        idx = routing_indices.reshape(B, k)
        wts = routing_weights.reshape(B, k)
        wts = wts * (wts > self.weight_threshold)
        # per-sample expert weights [B, E] from (idx, wts)
        w_full = jnp.zeros((B, self.num_experts), wts.dtype)
        w_full = jax.vmap(lambda wf, i, v: wf.at[i].add(v))(w_full, idx, wts)
        out = None
        for e, proj in enumerate(self.expert_projections):
            y = proj(p["expert_projections"][str(e)], feats, ctx)
            term = y * w_full[:, e][:, None, None, None].astype(y.dtype)
            out = term if out is None else out + term
        return out


# ---------------------------------------------------------------------------
# AdaptiveGateMoE family
# ---------------------------------------------------------------------------

class AdaptiveGateMoE(Module):
    """v0.4 base: SE-gated channel split, dual-stream routing, shared-inverted
    experts, stable complexity gate, GroupNorm projection + residual
    (gated.py:252-545)."""

    router_cls = DualStreamGateRouter
    anneal_steps = 2000

    def __init__(self, in_channels, out_channels, num_experts=4, top_k=2, split_ratio=0.5,
                 num_groups=8, initial_temperature=1.0, final_temperature=0.5,
                 balance_loss_coeff=1.0, router_z_loss_coeff=1.0, entropy_loss_coeff=0.01):
        super().__init__()
        self.in_channels, self.out_channels = in_channels, out_channels
        self.num_experts, self.top_k = num_experts, top_k
        self.balance_loss_coeff = balance_loss_coeff
        self.router_z_loss_coeff = router_z_loss_coeff
        self.entropy_loss_coeff = entropy_loss_coeff
        self.initial_temperature = initial_temperature
        self.final_temperature = final_temperature
        self.dynamic_channels = int(in_channels * split_ratio)
        self.static_channels = in_channels - self.dynamic_channels
        self.out_dynamic = int(out_channels * split_ratio)
        self.out_static = out_channels - self.out_dynamic
        self.shuffle_groups = 1

        se_hidden = max(in_channels // 4, 4)
        self.se_gate = ConvSeq(Linear(in_channels, se_hidden, bias=False), _SiLUm(), Linear(se_hidden, in_channels))
        self.static_net = ConvSeq(
            PlainConv(self.static_channels, self.static_channels, 3, g=self.static_channels),
            BatchNorm(self.static_channels), _SiLUm(),
            PlainConv(self.static_channels, self.out_static, 1), BatchNorm(self.out_static), _SiLUm(),
        )
        self.routing = self.router_cls(self.dynamic_channels, num_experts, top_k, temperature=initial_temperature)
        self.fused_experts = SharedInvertedExpertGroup(
            self.dynamic_channels, self.out_dynamic, num_experts, top_k=top_k, weight_threshold=0.0
        )
        self.complexity_estimator = PlainConv(self.dynamic_channels, 1, 1, bias=True)
        self.proj = PlainConv(out_channels, out_channels, 1)
        self.bn = GroupNorm(out_channels, num_groups)

    # -- helpers -------------------------------------------------------------
    def _temperature(self, ctx: Context):
        """Cosine anneal initial->final over 2000 steps (gated.py:423-433)."""
        if not ctx.training:
            return self.final_temperature
        progress = jnp.clip(jnp.asarray(ctx.step, jnp.float32) / self.anneal_steps, 0.0, 1.0)
        cos_val = 0.5 * (1 + jnp.cos(jnp.pi * progress))
        return jnp.maximum(self.final_temperature + (self.initial_temperature - self.final_temperature) * cos_val, 0.1)

    def _se_split(self, p, x, ctx):
        pooled = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        gate = jax.nn.sigmoid(self.se_gate(p["se_gate"], pooled, ctx)).astype(x.dtype)
        xs = x[..., : self.static_channels] * gate[:, None, None, : self.static_channels]
        xd = x[..., self.static_channels :] * gate[:, None, None, self.static_channels :]
        return xs, xd

    def _complexity(self, p, xd, ctx):
        pooled = jnp.mean(xd, axis=(1, 2), keepdims=True)
        raw = jnp.mean(jax.nn.sigmoid(self.complexity_estimator(p["complexity_estimator"], pooled, ctx).astype(jnp.float32)))
        return jnp.clip(jnp.nan_to_num(raw, nan=1.0, posinf=1.0, neginf=1.0), 0.3, 1.5)

    def _complexity_gate(self, w, complexity):
        """Zero low-rank top-k weights by keep_count = round(c*k) (gated.py:398-420)."""
        k = w.shape[1]
        if k <= 1:
            return w
        keep = jnp.clip(jnp.round(complexity * k), 1, k)
        rank = jnp.arange(1, k + 1, dtype=jnp.float32)
        mask = (rank[None] <= keep).astype(w.dtype)
        w = w * mask
        return w / jnp.clip(jnp.sum(w, 1, keepdims=True), 1e-6, None)

    def _channel_shuffle(self, x):
        if self.shuffle_groups <= 1:
            return x
        B, H, W, C = x.shape
        g = self.shuffle_groups
        return x.reshape(B, H, W, g, C // g).transpose(0, 1, 2, 4, 3).reshape(B, H, W, C)

    def _publish_aux(self, ctx, stats, w, idx):
        if not ctx.training:
            return
        probs, logits = stats["router_probs"], stats["router_logits"]
        keep = jnp.zeros_like(probs).astype(bool)
        keep = jax.vmap(lambda kf, i: kf.at[i].set(True))(keep, idx)
        aux = moe_aux_loss(probs, logits, keep, self.num_experts,
                           balance_coeff=self.balance_loss_coeff, z_coeff=self.router_z_loss_coeff,
                           entropy_coeff=self.entropy_loss_coeff)
        ctx.add_aux(self.path, aux)
        ctx.stats[self.path] = {"expert_usage": jnp.mean(probs, 0)}

    # -- forward -------------------------------------------------------------
    def _post_mix(self, p, out_concat, ctx):
        """Hook for refine/context stages in subclasses."""
        return out_concat

    def _fuse_paths(self, p, out_static, out_dynamic, x, ctx):
        """Static/dynamic fusion hook — plain concat by default; v0.15's
        GatedFusionMoE swaps in the CrossPathGate (gated.py:2672)."""
        return jnp.concatenate([out_static, out_dynamic], -1)

    def _pre_residual(self, p, out, ctx):
        """Hook between projection-BN and the residual add — v0.15's gentle
        drop-path lives here (gated.py:2684-2688)."""
        return out

    def __call__(self, p, x, ctx: Context):
        xs, xd = self._se_split(p, x, ctx)
        dg = getattr(self, "detail_gate", None)
        if dg is not None:  # v0.9/v0.10 detail-aware variants
            xd = dg(p["detail_gate"], xd, ctx)
        out_static = self.static_net(p["static_net"], xs, ctx)
        complexity = self._complexity(p, xd, ctx)
        w, idx, stats = self.routing(p["routing"], xd, ctx, temperature=self._temperature(ctx))
        w = self._complexity_gate(w, complexity)
        out_dynamic = self.fused_experts(p["fused_experts"], xd, ctx, w, idx, self.top_k)
        out = self._channel_shuffle(self._fuse_paths(p, out_static, out_dynamic, x, ctx))
        out = self._post_mix(p, out, ctx)
        out = self.proj(p["proj"], out, ctx)
        out = self._pre_residual(p, self.bn(p["bn"], out, ctx), ctx) + x
        self._publish_aux(ctx, stats, w, idx)
        return out


class HybridAdaptiveGateMoE(AdaptiveGateMoE):
    """v0.6: fused experts when E small, shared-inverted when E large, plus
    channel shuffle (gated.py:1285-1395)."""

    def __init__(self, in_channels, out_channels, num_experts=4, top_k=2, split_ratio=0.5,
                 num_groups=8, initial_temperature=1.2, final_temperature=0.5,
                 balance_loss_coeff=1.0, router_z_loss_coeff=1.0, entropy_loss_coeff=0.01,
                 fused_expert_threshold=8, shuffle_groups=2):
        super().__init__(in_channels, out_channels, num_experts, top_k, split_ratio, num_groups,
                         initial_temperature, final_temperature, balance_loss_coeff,
                         router_z_loss_coeff, entropy_loss_coeff)
        self.shuffle_groups = shuffle_groups if out_channels % shuffle_groups == 0 else 1
        if num_experts <= fused_expert_threshold:
            self.expert_backend = "fused"
            self.fused_experts = FusedExpertGroup(self.dynamic_channels, self.out_dynamic, num_experts, num_groups, top_k=top_k)
        else:
            self.expert_backend = "shared_inverted"
            self.fused_experts = SharedInvertedExpertGroup(
                self.dynamic_channels, self.out_dynamic, num_experts, top_k=top_k, weight_threshold=0.0
            )


class HybridAdaptiveGateMoEv2(HybridAdaptiveGateMoE):
    """v0.11: DualStreamGateRouterV2 drop-in (gated.py:1395-1459)."""

    router_cls = DualStreamGateRouterV2


class LowRankHybridAdaptiveGateMoE(HybridAdaptiveGateMoE):
    """v0.7: low-rank fused experts (gated.py:1459-1515)."""

    def __init__(self, *args, bottleneck_ratio=0.5, **kw):
        super().__init__(*args, **kw)
        if self.expert_backend == "fused":
            self.fused_experts = LowRankFusedExpertGroup(
                self.dynamic_channels, self.out_dynamic, self.num_experts, top_k=self.top_k,
                bottleneck_ratio=bottleneck_ratio,
            )


class _RefineMixin:
    """v0.8 residual depthwise refinement with SE gate (gated.py:1515-1635)."""

    def _build_refine(self, out_channels, num_groups=8, refine_reduction=8):
        hid = max(out_channels // refine_reduction, 8)
        self.feature_refiner = ConvSeq(
            PlainConv(out_channels, out_channels, 3, g=out_channels), GroupNorm(out_channels, num_groups), _SiLUm()
        )
        self.feature_gate = ConvSeq(PlainConv(out_channels, hid, 1), _SiLUm(), PlainConv(hid, out_channels, 1, bias=True))

    def _refine(self, p, x, ctx):
        gate_in = jnp.mean(x, axis=(1, 2), keepdims=True)
        gate = jax.nn.sigmoid(self.feature_gate(p["feature_gate"], gate_in, ctx).astype(jnp.float32)).astype(x.dtype)
        scale = jnp.tanh(p["refine_scale"]).astype(x.dtype)
        return x + scale * self.feature_refiner(p["feature_refiner"], x, ctx) * gate


class RefinedLowRankHybridAdaptiveGateMoE(LowRankHybridAdaptiveGateMoE, _RefineMixin):
    """v0.8 (gated.py:1515)."""

    def __init__(self, *args, refine_reduction=8, **kw):
        super().__init__(*args, **kw)
        self._build_refine(self.out_channels, refine_reduction=refine_reduction)

    def init(self, key) -> Params:
        p = super().init(key)
        p["refine_scale"] = jnp.asarray(0.1, jnp.float32)
        return p

    def _post_mix(self, p, out, ctx):
        return self._refine(p, out, ctx)


class VisualDetailGate(Module):
    """High-frequency detail gate (gated.py:1088-1116): gate from x - blur."""

    def __init__(self, channels, num_groups=8, reduction=8):
        super().__init__()
        hid = max(channels // reduction, 8)
        self.detail_filter = ConvSeq(
            PlainConv(channels, channels, 3, g=channels), GroupNorm(channels, num_groups), _SiLUm(),
            PlainConv(channels, hid, 1), _SiLUm(), PlainConv(hid, channels, 1, bias=True),
        )

    def init(self, key) -> Params:
        p = super().init(key)
        p["detail_scale"] = jnp.asarray(0.1, jnp.float32)
        return p

    def __call__(self, p, x, ctx):
        smooth = avg_pool(jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge"), 3, 1)
        detail = x - smooth
        gate = jax.nn.sigmoid(self.detail_filter(p["detail_filter"], detail, ctx).astype(jnp.float32)).astype(x.dtype)
        return x * (1 + jnp.tanh(p["detail_scale"]).astype(x.dtype) * gate)


class PyramidContextMixer(Module):
    """Pool-pyramid context with gated residual (gated.py:1139-1206)."""

    def __init__(self, channels, num_groups=8, pool_scales=(2, 4)):
        super().__init__()
        self.pool_scales = tuple(pool_scales)
        self.local_context = ConvSeq(
            PlainConv(channels, channels, 3, g=channels), GroupNorm(channels, num_groups), _SiLUm()
        )
        self.pool_projections = ModuleList(
            [ConvSeq(PlainConv(channels, channels, 1), GroupNorm(channels, num_groups), _SiLUm()) for _ in self.pool_scales]
        )
        self.context_gate = PlainConv(channels, channels, 1, bias=True)

    def init(self, key) -> Params:
        p = super().init(key)
        p["context_scale"] = jnp.asarray(0.1, jnp.float32)
        return p

    def __call__(self, p, x, ctx):
        B, H, W, C = x.shape
        contexts = [self.local_context(p["local_context"], x, ctx)]
        for i, scale in enumerate(self.pool_scales):
            if H % scale == 0 and W % scale == 0 and H > scale:
                pooled = avg_pool(x, scale)
                proj = self.pool_projections[i](p["pool_projections"][str(i)], pooled, ctx)
                contexts.append(upsample_nearest(proj, scale))
            else:
                contexts.append(self.pool_projections[i](p["pool_projections"][str(i)], x, ctx))
        context = sum(contexts) / len(contexts)
        gate = jax.nn.sigmoid(self.context_gate(p["context_gate"], context, ctx).astype(jnp.float32)).astype(x.dtype)
        return x + jnp.tanh(p["context_scale"]).astype(x.dtype) * context * gate


class ContextRefinedLowRankHybridAdaptiveGateMoE(RefinedLowRankHybridAdaptiveGateMoE):
    """v0.10: + PyramidContextMixer before refine (gated.py:1691-1753)."""

    def __init__(self, *args, **kw):
        super().__init__(*args, **kw)
        self.context_mixer = PyramidContextMixer(self.out_channels)

    def _post_mix(self, p, out, ctx):
        out = self.context_mixer(p["context_mixer"], out, ctx)
        return self._refine(p, out, ctx)


class VisualEnhancedAdaptiveGateMoE(ContextRefinedLowRankHybridAdaptiveGateMoE):
    """v0.10 visual block — used by the released EsMoE checkpoints
    (gated.py:1753-1815, model-zoo/models.json:5): detail gate on the dynamic
    branch before routing + context mixing + refinement after fusion."""

    def __init__(self, *args, detail_reduction=8, **kw):
        super().__init__(*args, **kw)
        # applied on the dynamic branch before routing by the base __call__
        self.detail_gate = VisualDetailGate(self.dynamic_channels, reduction=detail_reduction)


class FusedAdaptiveGateMoE(AdaptiveGateMoE):
    """v0.5: AdaptiveGateMoE with fully-fused expert candidates — keeps v0.4
    dual-stream routing but swaps the sparse per-expert projections for the
    one-grouped-conv FusedExpertGroup (reference gated.py:1242-1283)."""

    def __init__(self, in_channels, out_channels, num_experts=4, top_k=2, split_ratio=0.5,
                 num_groups=8, initial_temperature=1.0, final_temperature=0.5,
                 balance_loss_coeff=1.0, router_z_loss_coeff=1.0, entropy_loss_coeff=0.01):
        super().__init__(in_channels, out_channels, num_experts, top_k, split_ratio, num_groups,
                         initial_temperature, final_temperature, balance_loss_coeff,
                         router_z_loss_coeff, entropy_loss_coeff)
        self.expert_backend = "fused"
        self.fused_experts = FusedExpertGroup(self.dynamic_channels, self.out_dynamic, num_experts, num_groups, top_k=top_k)


class DetailAwareLowRankHybridAdaptiveGateMoE(LowRankHybridAdaptiveGateMoE):
    """v0.9: LowRankHybrid + VisualDetailGate enhancing the dynamic branch
    BEFORE routing, so router and experts see high-frequency residual cues
    (reference gated.py:1635-1689)."""

    def __init__(self, *args, detail_reduction=8, **kw):
        super().__init__(*args, **kw)
        self.detail_gate = VisualDetailGate(self.dynamic_channels, reduction=detail_reduction)


class OptimalHybridGateMoE(HybridAdaptiveGateMoEv2):
    """v0.12 production synthesis: v0.6 core + v0.11 router + light DW refine
    (gated.py:1892-2078). The refine branch is NOT the v0.8 one: it is a
    DW3x3+GroupNorm (no activation) times a global SE gate
    (pool -> 1x1 (no bias) -> SiLU -> 1x1 (bias) -> sigmoid), residual-added
    with tanh(refine_scale) (reference gated.py:1971-1999)."""

    def __init__(self, in_channels, out_channels, num_experts=4, top_k=2, split_ratio=0.5,
                 num_groups=8, initial_temperature=1.2, final_temperature=0.5,
                 balance_loss_coeff=1.0, router_z_loss_coeff=1.0, entropy_loss_coeff=0.01,
                 fused_expert_threshold=8, shuffle_groups=2, refine=True, refine_reduction=8):
        super().__init__(in_channels, out_channels, num_experts, top_k, split_ratio, num_groups,
                         initial_temperature, final_temperature, balance_loss_coeff,
                         router_z_loss_coeff, entropy_loss_coeff, fused_expert_threshold,
                         shuffle_groups)
        self.refine_on = refine
        if refine:
            hid = max(self.out_channels // refine_reduction, 8)
            self.refine_dw = ConvSeq(
                PlainConv(self.out_channels, self.out_channels, 3, g=self.out_channels),
                GroupNorm(self.out_channels, num_groups),
            )
            self.refine_gate = ConvSeq(
                PlainConv(self.out_channels, hid, 1), _SiLUm(),
                PlainConv(hid, self.out_channels, 1, bias=True),
            )

    def init(self, key) -> Params:
        p = super().init(key)
        if self.refine_on:
            p["refine_scale"] = jnp.asarray(0.1, jnp.float32)
        return p

    def _post_mix(self, p, out, ctx):
        if not self.refine_on:
            return out
        gate_in = jnp.mean(out, axis=(1, 2), keepdims=True)
        gate = jax.nn.sigmoid(self.refine_gate(p["refine_gate"], gate_in, ctx).astype(jnp.float32)).astype(out.dtype)
        refined = self.refine_dw(p["refine_dw"], out, ctx) * gate
        return out + jnp.tanh(p["refine_scale"]).astype(out.dtype) * refined


class MultiHeadRouterV3(DualStreamGateRouterV2):
    """v0.13 multi-head parallel router (reference gated.py:2080-2265): the
    normalized [B, 2C] stats are split into ``num_heads`` slices, each with
    its own low-rank expert projection; heads are soft-merged by a learned
    per-head weight around a residual full-stats projection, plus the V2
    local branch, expert prior, decaying train noise, and soft expert dropout
    (a dropped top-k slot is scaled by 0.5, not zeroed)."""

    def __init__(self, in_channels, num_experts, top_k, temperature=1.0,
                 local_reduction=16, pool_scale=4, noise_std=0.1,
                 num_heads=4, expert_dropout=0.1):
        super().__init__(in_channels, num_experts, top_k, temperature, local_reduction, pool_scale, noise_std)
        stat_dim = 2 * in_channels
        self.num_heads = max(1, min(num_heads, num_experts))
        self.head_dim = max(stat_dim // self.num_heads, 4)
        self.expert_dropout = float(expert_dropout)
        self.heads = ModuleList([Linear(self.head_dim, num_experts, bias=False) for _ in range(self.num_heads)])
        # residual full-stats projection, named as the reference names it
        # (global_proj — the torch V3 is NOT a DualStreamGateRouter subclass
        # and has no global_fc; keeping its key makes weight import 1:1)
        self.global_proj = self.global_fc
        del self.global_fc

    def init(self, key) -> Params:
        p = super().init(key)
        ks = jax.random.split(key, self.num_heads + 1)
        for i in range(self.num_heads):
            p["heads"][str(i)]["w"] = 0.02 * jax.random.normal(ks[i], p["heads"][str(i)]["w"].shape)
        p["global_proj"]["w"] = 0.02 * jax.random.normal(ks[-1], p["global_proj"]["w"].shape)
        p["head_alpha"] = jnp.full((self.num_heads,), 1.0 / self.num_heads, jnp.float32)
        p["global_weight"] = jnp.asarray(0.1, jnp.float32)
        return p

    def fused_logits(self, p, x, ctx):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(1, 2))
        std = jnp.std(xf, axis=(1, 2))
        stats = self.stat_norm(p["stat_norm"], jnp.concatenate([mean, std], -1), ctx)
        hw = jax.nn.sigmoid(p["head_alpha"])
        hw = hw / (jnp.sum(hw) + 1e-6)
        gw = jax.nn.sigmoid(p["global_weight"])
        need = self.head_dim * self.num_heads
        sp = jnp.pad(stats, ((0, 0), (0, max(need - stats.shape[1], 0))))[:, :need]
        chunks = sp.reshape(stats.shape[0], self.num_heads, self.head_dim)
        logits = gw * self.global_proj(p["global_proj"], stats, ctx)
        for i, h in enumerate(self.heads):
            logits = logits + (1 - gw) * hw[i] * h(p["heads"][str(i)], chunks[:, i], ctx)
        l = self._local_logits(p, x, ctx)
        alpha = jax.nn.sigmoid(p["alpha"])
        logits = alpha * logits + (1 - alpha) * l + p["expert_prior"][None]
        if ctx.training and self.noise_std_init > 0:
            decay = jnp.clip(1.0 - jnp.asarray(ctx.step, jnp.float32) / 1000.0, 0.0, 1.0)
            noise = jax.random.normal(_path_key(ctx.step, self.path), logits.shape)
            logits = logits + noise * self.noise_std_init * decay
        return jnp.clip(logits, -LOGIT_CLAMP, LOGIT_CLAMP)

    def __call__(self, p, x, ctx: Context, temperature=None):
        logits = self.fused_logits(p, x, ctx)
        probs = jax.nn.softmax(logits / (temperature if temperature is not None else self.temperature), -1)
        w, idx = jax.lax.top_k(probs, self.top_k)
        if ctx.training and self.expert_dropout > 0 and self.top_k > 1:
            # soft expert dropout: scale ONE random top-k slot by 0.5 for
            # a random expert_dropout fraction of samples (gated.py:2224-2238)
            B = w.shape[0]
            kd = _path_key(ctx.step + 1, self.path)
            k1, k2 = jax.random.split(kd)
            drop = jax.random.uniform(k1, (B, 1)) < self.expert_dropout
            slot = jax.random.randint(k2, (B, 1), 0, self.top_k)
            hit = jnp.arange(self.top_k)[None] == slot
            w = jnp.where(drop & hit, w * 0.5, w)
        w = w / (jnp.sum(w, -1, keepdims=True) + 1e-6)
        return w, idx, {"router_probs": probs, "router_logits": logits}


class MultiHeadRouterMoE(OptimalHybridGateMoE):
    """v0.13 MoE: the v0.12 core with MultiHeadRouterV3 routing
    (reference gated.py:2479-2533)."""

    def __init__(self, in_channels, out_channels, num_experts=4, top_k=2, split_ratio=0.5,
                 num_groups=8, initial_temperature=1.2, final_temperature=0.5,
                 balance_loss_coeff=1.0, router_z_loss_coeff=1.0, entropy_loss_coeff=0.01,
                 fused_expert_threshold=8, shuffle_groups=2, refine=True, refine_reduction=8,
                 num_heads=4, expert_dropout=0.05):
        super().__init__(in_channels, out_channels, num_experts, top_k, split_ratio, num_groups,
                         initial_temperature, final_temperature, balance_loss_coeff,
                         router_z_loss_coeff, entropy_loss_coeff, fused_expert_threshold,
                         shuffle_groups, refine=refine, refine_reduction=refine_reduction)
        self.routing = MultiHeadRouterV3(
            self.dynamic_channels, num_experts, top_k, temperature=initial_temperature,
            num_heads=num_heads, expert_dropout=expert_dropout,
        )


class DiversifiedExpertGroup(Module):
    """v0.14 heterogeneous expert pool (reference gated.py:2267-2477): shared
    1x1 expand, per-expert 3x3 DW with cycled dilation 1,1,2,2,... (different
    effective receptive fields), per-expert 1x1 projection; masked-dense
    dispatch so shapes stay static under jit."""

    def __init__(self, in_channels, out_channels, num_experts, expand_ratio=2.0,
                 top_k=2, weight_threshold=0.0, num_groups=8):
        super().__init__()
        self.num_experts, self.out_channels = num_experts, out_channels
        self.top_k, self.weight_threshold = top_k, weight_threshold
        hid = max(1, int(in_channels * expand_ratio))
        self.hid = hid
        self.shared_expand = ConvSeq(
            PlainConv(in_channels, hid, 1), GroupNorm(hid, num_groups), _SiLUm()
        )
        self.dilations = [1 + (i // 2) for i in range(num_experts)]
        self.dw_layers = ModuleList([
            ConvSeq(PlainConv(hid, hid, 3, g=hid, dilation=d), GroupNorm(hid, num_groups), _SiLUm())
            for d in self.dilations
        ])
        self.expert_projections = ModuleList([
            ConvSeq(PlainConv(hid, out_channels, 1), GroupNorm(out_channels, num_groups))
            for _ in range(num_experts)
        ])

    def __call__(self, p, x, ctx, routing_weights=None, routing_indices=None, top_k=None):
        B = x.shape[0]
        k = top_k or self.top_k
        feats = self.shared_expand(p["shared_expand"], x, ctx)
        idx = routing_indices.reshape(B, k)
        wts = routing_weights.reshape(B, k)
        wts = wts * (wts > self.weight_threshold)
        w_full = jnp.zeros((B, self.num_experts), wts.dtype)
        w_full = jax.vmap(lambda wf, i, v: wf.at[i].add(v))(w_full, idx, wts)
        out = None
        for e in range(self.num_experts):
            y = self.dw_layers[e](p["dw_layers"][str(e)], feats, ctx)
            y = self.expert_projections[e](p["expert_projections"][str(e)], y, ctx)
            term = y * w_full[:, e][:, None, None, None].astype(y.dtype)
            out = term if out is None else out + term
        return out


class DiversifiedExpertMoE(OptimalHybridGateMoE):
    """v0.14 MoE: the v0.12 core with DiversifiedExpertGroup experts
    (reference gated.py:2535-2583)."""

    def __init__(self, in_channels, out_channels, num_experts=4, top_k=2, split_ratio=0.5,
                 num_groups=8, initial_temperature=1.2, final_temperature=0.5,
                 balance_loss_coeff=1.0, router_z_loss_coeff=1.0, entropy_loss_coeff=0.01,
                 fused_expert_threshold=8, shuffle_groups=2, refine=True, refine_reduction=8):
        super().__init__(in_channels, out_channels, num_experts, top_k, split_ratio, num_groups,
                         initial_temperature, final_temperature, balance_loss_coeff,
                         router_z_loss_coeff, entropy_loss_coeff, fused_expert_threshold,
                         shuffle_groups, refine=refine, refine_reduction=refine_reduction)
        self.fused_experts = DiversifiedExpertGroup(
            self.dynamic_channels, self.out_dynamic, num_experts, expand_ratio=2.0,
            top_k=top_k, weight_threshold=0.0, num_groups=num_groups,
        )


class CrossPathGate(Module):
    """v0.15 learnable cross-path fusion (reference gated.py:2398-2477): a
    channel gate computed from BOTH paths' pooled statistics modulates each
    path before concat. Conservative residual design — the last gate layer is
    zero-init and gate_scale starts at 0, so fusion == plain concat at init:
    gate = 0.5 + tanh(gate_scale) * 0.5 * sigmoid(raw)."""

    def __init__(self, static_channels, dynamic_channels, out_channels, drop_prob=0.05):
        super().__init__()
        self.static_channels, self.dynamic_channels = static_channels, dynamic_channels
        self.drop_prob = float(drop_prob)
        stat_dim = static_channels + dynamic_channels
        hid = max(stat_dim // 4, 8)
        self.gate_net = ConvSeq(
            Linear(stat_dim, hid, bias=False), _SiLUm(), Linear(hid, out_channels * 2, bias=True)
        )

    def init(self, key) -> Params:
        p = super().init(key)
        # zero-init the output layer: fusion starts as exact concat
        last = p["gate_net"]["2"]
        last["w"] = jnp.zeros_like(last["w"])
        last["b"] = jnp.zeros_like(last["b"])
        p["gate_scale"] = jnp.asarray(0.0, jnp.float32)
        p["drop_scale"] = jnp.asarray(1.0, jnp.float32)  # reference param (unused in forward)
        return p

    def __call__(self, p, out_static, out_dynamic, ctx: Context):
        pooled = jnp.mean(jnp.concatenate([out_static, out_dynamic], -1).astype(jnp.float32), axis=(1, 2))
        raw = self.gate_net(p["gate_net"], pooled, ctx).astype(jnp.float32)
        gate = 0.5 + jnp.tanh(p["gate_scale"]) * 0.5 * jax.nn.sigmoid(raw)
        gs = gate[:, None, None, : self.static_channels].astype(out_static.dtype)
        gd = gate[:, None, None, self.static_channels : self.static_channels + self.dynamic_channels].astype(out_dynamic.dtype)
        return jnp.concatenate([out_static * gs, out_dynamic * gd], -1)


class GatedFusionMoE(OptimalHybridGateMoE):
    """v0.15: the v0.12 core with CrossPathGate fusion replacing plain concat
    plus a gentle drop-path on the projection residual
    (reference gated.py:2585-2719)."""

    def __init__(self, in_channels, out_channels, num_experts=4, top_k=2, split_ratio=0.5,
                 num_groups=8, initial_temperature=1.2, final_temperature=0.5,
                 balance_loss_coeff=1.0, router_z_loss_coeff=1.0, entropy_loss_coeff=0.01,
                 fused_expert_threshold=8, shuffle_groups=2, refine=True, refine_reduction=8,
                 drop_prob=0.05):
        super().__init__(in_channels, out_channels, num_experts, top_k, split_ratio, num_groups,
                         initial_temperature, final_temperature, balance_loss_coeff,
                         router_z_loss_coeff, entropy_loss_coeff, fused_expert_threshold,
                         shuffle_groups, refine=refine, refine_reduction=refine_reduction)
        self.cross_gate = CrossPathGate(self.out_static, self.out_dynamic, out_channels, drop_prob=drop_prob)

    def _fuse_paths(self, p, out_static, out_dynamic, x, ctx):
        return self.cross_gate(p["cross_gate"], out_static, out_dynamic, ctx)

    def _pre_residual(self, p, out, ctx):
        # gentle drop-path: zero only the projection residual for a random
        # drop_prob fraction of samples, rescaling survivors by 1/keep
        # (gated.py:2684-2688); the identity path stays alive
        dp = self.cross_gate.drop_prob
        if not ctx.training or dp <= 0:
            return out
        drop = jax.random.uniform(_path_key(ctx.step + 2, self.path), (out.shape[0], 1, 1, 1)) < dp
        return out * jnp.where(drop, 0.0, 1.0 / (1.0 - dp)).astype(out.dtype)
