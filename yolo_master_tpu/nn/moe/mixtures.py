"""Second-generation MoE blocks: OptimizedMOEImproved / ABlockMoE / A2C2fMoE.

Reference: ultralytics/nn/modules/moe/modules.py:922-1290 + routers.py:168-410
+ experts.py:12-296 + loss.py:94-290 (MoELoss).

TPU-first recast of the mutable-state machinery:
  * progressive sparsity (warmup E -> top_k over 5000 steps, modules.py:1027-1034)
    uses ``ctx.step`` (a traced scalar) with *static-shape* masking: full sort
    of the E probs, keep ranks < adaptive_k, renormalize — no dynamic k.
  * deterministic expert dropout seeded by the global step
    (modules.py:1071-1082): jax.random key folded from ctx.step + module path,
    identical on every data shard (the DDP same-seed discipline for free).
  * router noise: fp32 softmax with N(0, noise_std) logit noise in training
    (routers.py:201-208), keyed by step+path.
  * sparse dispatch = masked dense sum (top-k weights are exactly zero
    elsewhere), matching the reference's index_add_ numerics with static shapes.
  * aux losses (balance = E * sum(importance x usage_counts), z-loss, optional
    entropy) published into ctx.aux (the registry replacement).
"""

from __future__ import annotations

import zlib
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..layers import BatchNorm, Conv, ConvSeq, GroupNorm, PlainConv, avg_pool, silu
from ..module import Context, Module, ModuleList, Params
from .routers import LOGIT_CLAMP


def _path_key(ctx_step, path: str) -> jax.Array:
    """Deterministic per-(step, module) PRNG key, identical across data shards."""
    seed = zlib.crc32(path.encode()) & 0x7FFFFFFF
    key = jax.random.PRNGKey(seed)
    return jax.random.fold_in(key, jnp.asarray(ctx_step, jnp.uint32))


# ---------------------------------------------------------------------------
# Experts (reference experts.py:12-296; GroupNorm for single-sample stability)
# ---------------------------------------------------------------------------

class SimpleExpert(Module):
    """1x1 expand -> GN -> SiLU -> 1x1 project -> GN (experts.py:72-86)."""

    def __init__(self, c1, c2, expand_ratio=2.0, num_groups=8):
        super().__init__()
        hid = int(c1 * expand_ratio)
        self.conv = ConvSeq(PlainConv(c1, hid, 1), GroupNorm(hid, num_groups), _SiLU(), PlainConv(hid, c2, 1), GroupNorm(c2, num_groups))

    def __call__(self, p, x, ctx):
        return self.conv(p["conv"], x, ctx)


class _SiLU(Module):
    def init(self, key):
        return {}

    def __call__(self, p, x, ctx):
        return silu(x)


class SpatialExpert(Module):
    """pw-expand -> dw3x3 -> pw-project, all GN+SiLU (experts.py:91-109)."""

    def __init__(self, c1, c2, expand_ratio=2.0, num_groups=8):
        super().__init__()
        hid = int(c1 * expand_ratio)
        self.conv = ConvSeq(
            PlainConv(c1, hid, 1), GroupNorm(hid, num_groups), _SiLU(),
            PlainConv(hid, hid, 3, g=hid), GroupNorm(hid, num_groups), _SiLU(),
            PlainConv(hid, c2, 1), GroupNorm(c2, num_groups),
        )

    def __call__(self, p, x, ctx):
        return self.conv(p["conv"], x, ctx)


class GhostExpert(Module):
    """Primary conv + cheap depthwise op, concat (experts.py:115-137)."""

    def __init__(self, c1, c2, kernel_size=3, ratio=2, num_groups=8):
        super().__init__()
        import math

        self.c2 = c2
        init_c = math.ceil(c2 / ratio)
        new_c = init_c * (ratio - 1)
        self.primary_conv = ConvSeq(PlainConv(c1, init_c, kernel_size), GroupNorm(init_c, num_groups), _SiLU())
        self.cheap_operation = ConvSeq(PlainConv(init_c, new_c, 3, g=init_c), GroupNorm(new_c, num_groups), _SiLU())

    def __call__(self, p, x, ctx):
        x1 = self.primary_conv(p["primary_conv"], x, ctx)
        x2 = self.cheap_operation(p["cheap_operation"], x1, ctx)
        return jnp.concatenate([x1, x2], -1)[..., : self.c2]


class InvertedResidualExpert(Module):
    """MobileNetV2-style inverted residual expert (experts.py:148-180)."""

    def __init__(self, c1, c2, expand_ratio=2.0, kernel_size=3, num_groups=8):
        super().__init__()
        hid = int(c1 * expand_ratio)
        self.add = c1 == c2
        self.conv = ConvSeq(
            PlainConv(c1, hid, 1), GroupNorm(hid, num_groups), _SiLU(),
            PlainConv(hid, hid, kernel_size, g=hid), GroupNorm(hid, num_groups), _SiLU(),
            PlainConv(hid, c2, 1), GroupNorm(c2, num_groups),
        )

    def __call__(self, p, x, ctx):
        y = self.conv(p["conv"], x, ctx)
        return x + y if self.add else y


EXPERT_TYPES = {
    "simple": SimpleExpert,
    "ghost": GhostExpert,
    "inverted": InvertedResidualExpert,
    "spatial": SpatialExpert,
}


# ---------------------------------------------------------------------------
# Routers (reference routers.py:168-353)
# ---------------------------------------------------------------------------

class _SpatialRouterNet(ConvSeq):
    """conv3x3 -> BN -> SiLU -> conv1x1 -> BN router trunk (param indices match
    the torch nn.Sequential for checkpoint import)."""

    def __init__(self, c1, reduced, num_experts, first_k=3):
        super().__init__(
            PlainConv(c1, reduced, first_k), BatchNorm(reduced), _SiLU(), PlainConv(reduced, num_experts, 1), BatchNorm(num_experts)
        )


def process_logits(logits, *, training: bool, noise_std: float, top_k, num_experts: int, rng=None):
    """Shared router post-processing (reference routers.py:184-250):
    train noise -> fp32 softmax -> top-k (possibly traced adaptive k) with
    static-shape rank masking -> renormalize.

    Returns (sparse_weights [B,E], probs [B,E], logits [B,E]).
    """
    logits = logits.astype(jnp.float32)
    if training and noise_std > 0 and rng is not None:
        logits = logits + jax.random.normal(rng, logits.shape) * noise_std
    probs = jax.nn.softmax(jnp.clip(logits, -LOGIT_CLAMP, LOGIT_CLAMP), axis=-1)
    # rank of each expert by prob (0 = best); static shapes even for traced k
    order = jnp.argsort(-probs, axis=-1)
    ranks = jnp.argsort(order, axis=-1)
    keep = ranks < top_k  # top_k may be traced (progressive sparsity)
    w = probs * keep
    w = w / jnp.clip(jnp.sum(w, -1, keepdims=True), 1e-9, None)
    return w, probs, logits


class EfficientSpatialRouter(Module):
    """4x-pooled conv router, spatial-mean logits (routers.py:251-292)."""

    def __init__(self, c1, num_experts, reduction=8, top_k=2, noise_std=1.0, pool_scale=4):
        super().__init__()
        self.num_experts, self.top_k, self.noise_std, self.pool_scale = num_experts, top_k, noise_std, pool_scale
        self.router = _SpatialRouterNet(c1, max(c1 // reduction, 8), num_experts, first_k=3)

    def logits(self, p, x, ctx):
        if x.shape[1] > self.pool_scale and x.shape[2] > self.pool_scale:
            x = avg_pool(x, self.pool_scale)
        out = self.router(p["router"], x, ctx)
        return jnp.mean(out.astype(jnp.float32), axis=(1, 2))


class LocalRoutingLayer(Module):
    """2x-pooled conv router (routers.py:321-353)."""

    def __init__(self, c1, num_experts, reduction=8, top_k=2, noise_std=1.0):
        super().__init__()
        self.num_experts, self.top_k, self.noise_std, self.pool_scale = num_experts, top_k, noise_std, 2
        self.router = _SpatialRouterNet(c1, max(c1 // reduction, 8), num_experts, first_k=3)

    def logits(self, p, x, ctx):
        if x.shape[1] > self.pool_scale:
            x = avg_pool(x, self.pool_scale)
        out = self.router(p["router"], x, ctx)
        return jnp.mean(out.astype(jnp.float32), axis=(1, 2))


class AdaptiveRoutingLayer(Module):
    """GAP conv router (routers.py:295-318)."""

    def __init__(self, c1, num_experts, reduction=8, top_k=2, noise_std=1.0):
        super().__init__()
        self.num_experts, self.top_k, self.noise_std = num_experts, top_k, noise_std
        self.router = _SpatialRouterNet(c1, max(c1 // reduction, 8), num_experts, first_k=1)

    def logits(self, p, x, ctx):
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        out = self.router(p["router"], pooled, ctx)
        return out.reshape(x.shape[0], self.num_experts).astype(jnp.float32)


ROUTER_TYPES = {"efficient": EfficientSpatialRouter, "local": LocalRoutingLayer, "adaptive": AdaptiveRoutingLayer}


# ---------------------------------------------------------------------------
# MoE aux loss (reference loss.py:94-290 MoELoss)
# ---------------------------------------------------------------------------

def moe_aux_loss(probs, logits, keep_mask, num_experts: int, balance_coeff=1.0, z_coeff=1.0, entropy_coeff=0.0):
    """balance = E * sum(mean probs x usage-from-counts); z = mean logsumexp^2;
    entropy optional. keep_mask [B,E] marks selected experts (hard usage)."""
    importance = jnp.mean(probs, axis=0)
    counts = jnp.sum(keep_mask.astype(jnp.float32), axis=0)
    usage = jax.lax.stop_gradient(counts / jnp.clip(jnp.sum(counts), 1.0, None))
    balance = num_experts * jnp.sum(importance * usage)
    lse = jax.nn.logsumexp(logits, axis=-1)
    z = jnp.mean(lse**2)
    total = balance_coeff * balance + z_coeff * z
    if entropy_coeff > 0:
        ent = -jnp.mean(jnp.sum(probs * jnp.log(probs + 1e-8), -1))
        total = total + entropy_coeff * ent
    return total


# ---------------------------------------------------------------------------
# OptimizedMOEImproved (reference modules.py:922-1167)
# ---------------------------------------------------------------------------

class OptimizedMOEImproved(Module):
    """Pluggable-router MoE with an always-on shared expert.

    Also registered as ``ModularRouterExpertMoE`` (reference alias); the inner
    MLP of :class:`ABlockMoE`.
    """

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        num_experts: int = 4,
        top_k: int = 2,
        expert_type: str = "simple",
        router_type: str = "efficient",
        noise_std: float = 1.0,
        balance_loss_coeff: float = 1.0,
        router_z_loss_coeff: float = 1.0,
        expert_expand_ratio: float = 2.0,
        progressive_sparsity: bool = True,
        detach_routing: bool = False,
        add_residual: bool = True,
        warmup_steps: int = 5000,
        expert_dropout_rate: float = 0.15,
        dropout_interval: int = 100,
    ):
        super().__init__()
        if not 1 <= top_k <= num_experts:
            raise ValueError(f"top_k must be in [1, {num_experts}], got {top_k}")
        if expert_type not in EXPERT_TYPES:
            raise ValueError(f"unknown expert_type '{expert_type}'")
        if router_type not in ROUTER_TYPES:
            raise ValueError(f"unknown router_type '{router_type}'")
        self.in_channels, self.out_channels = in_channels, out_channels
        self.num_experts, self.top_k = num_experts, top_k
        self.balance_loss_coeff = balance_loss_coeff
        self.router_z_loss_coeff = router_z_loss_coeff
        self.progressive_sparsity = progressive_sparsity
        self.detach_routing = detach_routing
        self.add_residual = add_residual
        self.noise_std = noise_std
        self.warmup_steps = warmup_steps
        self.expert_dropout_rate = expert_dropout_rate
        self.dropout_interval = dropout_interval

        self.routing = ROUTER_TYPES[router_type](in_channels, num_experts, top_k=top_k, noise_std=noise_std)
        kwargs = {"ratio": int(expert_expand_ratio)} if expert_type == "ghost" else {"expand_ratio": expert_expand_ratio}
        self.experts = ModuleList([EXPERT_TYPES[expert_type](in_channels, out_channels, **kwargs) for _ in range(num_experts)])
        self.shared_expert = ConvSeq(PlainConv(in_channels, out_channels, 1), BatchNorm(out_channels), _SiLU())

    def _adaptive_top_k(self, ctx: Context):
        """Progressive sparsity: E -> top_k over warmup_steps (modules.py:1027-1034)."""
        if not (ctx.training and self.progressive_sparsity):
            return self.top_k
        step = jnp.asarray(ctx.step, jnp.float32)
        progress = jnp.clip(step / self.warmup_steps, 0.0, 1.0)
        k = self.num_experts - progress * (self.num_experts - self.top_k)
        return jnp.maximum(self.top_k, jnp.floor(k)).astype(jnp.int32)

    def __call__(self, p: Params, x, ctx: Context):
        B = x.shape[0]
        adaptive_k = self._adaptive_top_k(ctx)
        rng = _path_key(ctx.step, self.path) if ctx.training else None
        logits = self.routing.logits(p["routing"], x, ctx)
        w, probs, logits32 = process_logits(
            logits, training=ctx.training, noise_std=self.noise_std, top_k=adaptive_k,
            num_experts=self.num_experts, rng=rng,
        )

        # deterministic expert dropout, same on every shard (modules.py:1071-1082)
        if ctx.training and self.expert_dropout_rate > 0:
            step = jnp.asarray(ctx.step, jnp.int32)
            apply_drop = (step >= self.warmup_steps) & (step % self.dropout_interval == 0)
            n_drop = max(1, int(self.num_experts * self.expert_dropout_rate))
            perm = jax.random.permutation(jax.random.fold_in(rng, 1), self.num_experts)
            drop_mask = jnp.ones((self.num_experts,), bool).at[perm[:n_drop]].set(False)
            keep_alive = jnp.where(apply_drop, drop_mask, jnp.ones_like(drop_mask))
            w = w * keep_alive[None, :]

        if self.detach_routing:
            w = jax.lax.stop_gradient(w)

        shared = self.shared_expert(p["shared_expert"], x, ctx)
        sparse_eval = not ctx.training and ctx.sparse_inference and self.top_k < self.num_experts
        if sparse_eval:
            # gathered dispatch: only the K selected experts are computed
            # (reference eager sparse index_add_, modules.py:1089-1116)
            from .dispatch import gather_dispatch, stack_expert_params, top_k_from_weights

            bank = stack_expert_params([p["experts"][str(i)] for i in range(self.num_experts)])
            wts, idx = top_k_from_weights(w, self.top_k)
            routed = gather_dispatch(self.experts[0], bank, x, idx, wts, ctx)
            out = shared.astype(jnp.float32) + routed.astype(jnp.float32)
        else:
            out = shared.astype(jnp.float32)
            for i, expert in enumerate(self.experts):
                y = expert(p["experts"][str(i)], x, ctx)
                out = out + y.astype(jnp.float32) * w[:, i][:, None, None, None]
        out = out.astype(x.dtype)
        if self.add_residual and self.in_channels == self.out_channels:
            out = out + x

        if ctx.training:
            keep_mask = w > 0
            aux = moe_aux_loss(
                probs, logits32, keep_mask, self.num_experts,
                balance_coeff=self.balance_loss_coeff, z_coeff=self.router_z_loss_coeff,
            )
            ctx.add_aux(self.path, aux)
            ctx.stats[self.path] = {"expert_usage": jnp.mean(probs, 0), "aux_loss": aux}
        return out


# ---------------------------------------------------------------------------
# ABlockMoE / A2C2fMoE (reference modules.py:1170-1290) — the yolo26-master path
# ---------------------------------------------------------------------------

from ..layers import AAttn, A2C2f, C3k  # noqa: E402


class ABlockMoE(Module):
    """Area-attention block whose MLP is an OptimizedMOEImproved (MoE-FFN).

    Residuals owned here: x += attn(x); x += moe(x) — the inner MoE has
    add_residual=False (reference modules.py:1170-1225 no-double-add fix).
    """

    def __init__(self, dim, num_heads, mlp_ratio=1.2, area=1, num_experts=4, top_k=2, expert_type="simple"):
        super().__init__()
        self.attn = AAttn(dim, num_heads=num_heads, area=area)
        self.mlp = OptimizedMOEImproved(
            dim, dim, num_experts=num_experts, top_k=top_k, expert_type=expert_type,
            expert_expand_ratio=mlp_ratio, progressive_sparsity=True, add_residual=False,
        )

    def __call__(self, p, x, ctx):
        x = x + self.attn(p["attn"], x, ctx)
        return x + self.mlp(p["mlp"], x, ctx)


class A2C2fMoE(Module):
    """A2C2f with ABlockMoE inner blocks (reference modules.py:1229-1290)."""

    def __init__(self, c1, c2, n=1, a2=True, area=1, residual=False, mlp_ratio=2.0, e=0.5,
                 g=1, shortcut=True, num_experts=4, top_k=2, expert_type="simple"):
        super().__init__()
        from ..layers import Conv, ConvSeq

        c_ = int(c2 * e)
        assert c_ % 32 == 0
        self.c2 = c2
        self.cv1 = Conv(c1, c_, 1, 1)
        self.cv2 = Conv((1 + n) * c_, c2, 1)
        self.residual = a2 and residual
        self.m = ModuleList(
            [
                ConvSeq(*[ABlockMoE(c_, c_ // 32, mlp_ratio, area, num_experts, top_k, expert_type) for _ in range(2)])
                if a2
                else C3k(c_, c_, 2, shortcut, g)
                for _ in range(n)
            ]
        )

    def init(self, key) -> Params:
        p = super().init(key)
        if self.residual:
            p["gamma"] = 0.01 * jnp.ones((self.c2,), jnp.float32)
        return p

    def __call__(self, p, x, ctx):
        ys = [self.cv1(p["cv1"], x, ctx)]
        for i, m in enumerate(self.m):
            ys.append(m(p["m"][str(i)], ys[-1], ctx))
        y = self.cv2(p["cv2"], jnp.concatenate(ys, -1), ctx)
        if self.residual:
            return x + p["gamma"].astype(y.dtype) * y
        return y


ModularRouterExpertMoE = OptimizedMOEImproved
