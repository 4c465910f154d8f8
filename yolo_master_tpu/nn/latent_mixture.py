"""Latent mixtures: dense channel-expert mixtures routed through a shared
latent bottleneck (reference: ultralytics/nn/modules/latent_mixture.py:138-526).

Used by the yolo26-master-latent-* configs. Router math stays in fp32 with a
persistent temperature; aux = balance (E*sum(imp^2)-1, clamped) + z-loss.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from ..utils import make_divisible
from .layers import ConvSeq, GroupNorm, LayerNorm, Linear, PlainConv, silu
from .moa import _SiLUm
from .module import Context, Module, ModuleList, Params

ROUTER_LOGIT_LIMIT = 30.0


def _conv1x1_gn(c1, c2):
    return ConvSeq(PlainConv(c1, c2, 1), GroupNorm(c2, 1), _SiLUm())


class DenseChannelExpert(Module):
    """pw -> GN(1) -> SiLU -> dw3x3 -> GN(1) -> SiLU -> pw, tiny-init output
    (reference latent_mixture.py:113-135)."""

    def __init__(self, channels: int, expert_ratio: float = 0.25):
        super().__init__()
        hidden = make_divisible(max(8, round(channels * expert_ratio)), 8)
        self.net = ConvSeq(
            PlainConv(channels, hidden, 1), GroupNorm(hidden, 1), _SiLUm(),
            PlainConv(hidden, hidden, 3, g=hidden), GroupNorm(hidden, 1), _SiLUm(),
            PlainConv(hidden, channels, 1),
        )

    def init(self, key) -> Params:
        p = super().init(key)
        last = p["net"][str(len(self.net) - 1)]
        last["w"] = 1e-3 * jax.random.normal(key, last["w"].shape)
        return p

    def __call__(self, p, x, ctx):
        return self.net(p["net"], x, ctx)


class LatentRouter(Module):
    """FP32 latent router: LayerNorm -> MLP trunk -> expert head, persistent
    temperature, train-only logit noise, optional scale-token embedding
    (reference latent_mixture.py:138-310)."""

    def __init__(self, latent_dim, num_experts, router_hidden_dim=None, temperature=1.0,
                 noise_std=0.0, router_init_std=0.0, num_tokens=None, per_token=False):
        super().__init__()
        self.latent_dim = latent_dim
        self.num_experts = num_experts
        hidden = router_hidden_dim or latent_dim
        self.temperature = max(float(temperature), 0.1)
        self.noise_std = float(noise_std)
        self.router_init_std = float(router_init_std)
        self.num_tokens = num_tokens
        self.per_token = per_token
        self.norm = LayerNorm(latent_dim)
        self.trunk = ConvSeq(Linear(latent_dim, hidden), _SiLUm(), Linear(hidden, latent_dim), _SiLUm())
        self.expert_head = Linear(latent_dim, num_experts)

    def init(self, key) -> Params:
        p = super().init(key)
        k1, k2 = jax.random.split(key)
        if self.router_init_std > 0:
            p["expert_head"]["w"] = self.router_init_std * jax.random.normal(k1, p["expert_head"]["w"].shape)
            p["expert_head"]["b"] = self.router_init_std * jax.random.normal(k2, p["expert_head"]["b"].shape)
        else:
            p["expert_head"]["w"] = jnp.zeros_like(p["expert_head"]["w"])
            p["expert_head"]["b"] = jnp.zeros_like(p["expert_head"]["b"])
        if self.num_tokens is not None:
            p["scale_embedding"] = 0.02 * jax.random.normal(k1, (self.num_tokens, self.latent_dim))
        return p

    def __call__(self, p, tokens, ctx: Context):
        """tokens [B,T,D] or [B,D] -> (logits, probs) in fp32."""
        x = tokens.astype(jnp.float32)
        if x.ndim == 3:
            if "scale_embedding" in p:
                x = x + p["scale_embedding"][None]
            routed = x if self.per_token else jnp.mean(x, 1)
        else:
            routed = x
        h = self.trunk(p["trunk"], self.norm(p["norm"], routed, ctx), ctx)
        logits = self.expert_head(p["expert_head"], h, ctx)
        if ctx.training and self.noise_std > 0:
            from .moe.mixtures import _path_key

            logits = logits + jax.random.normal(_path_key(ctx.step, self.path), logits.shape) * self.noise_std
        logits = jnp.clip(jnp.nan_to_num(logits, nan=0.0, posinf=ROUTER_LOGIT_LIMIT, neginf=-ROUTER_LOGIT_LIMIT),
                          -ROUTER_LOGIT_LIMIT, ROUTER_LOGIT_LIMIT)
        probs = jax.nn.softmax(logits / self.temperature, -1)
        return logits, probs


def _latent_aux(logits, probs, num_experts, balance_coeff, z_coeff):
    """balance = clamp(E*sum(imp^2) - 1, 0) + z-loss (latent_mixture.py:293-305)."""
    importance = jnp.mean(probs.reshape(-1, probs.shape[-1]), 0)
    balance = jnp.clip(num_experts * jnp.sum(importance**2) - 1.0, 0.0, None)
    z = jnp.mean(jax.nn.logsumexp(logits, -1) ** 2)
    return balance_coeff * balance + z_coeff * z


class LatentMixture(Module):
    """Single-scale latent mixture: aligned features in, one feature out
    (reference latent_mixture.py:365-442)."""

    def __init__(self, in_channels, out_channels, num_experts=4, expert_ratio=0.25,
                 router_hidden_dim=None, temperature=1.0, balance_loss_coeff=1e-2,
                 router_z_loss_coeff=1e-3, residual_init=0.0, noise_std=0.0, router_init_std=0.0):
        super().__init__()
        if isinstance(in_channels, int):
            in_channels = [in_channels]
        self.in_channels = tuple(in_channels)
        self.out_channels = out_channels
        self.num_experts = num_experts
        self.balance_loss_coeff = balance_loss_coeff
        self.router_z_loss_coeff = router_z_loss_coeff
        self.residual_init = residual_init
        self.base_is_identity = self.in_channels[0] == out_channels
        if not self.base_is_identity:
            self.base_proj = _conv1x1_gn(self.in_channels[0], out_channels)
        self.token_projs = ModuleList(
            [_Identity() if c == out_channels else _conv1x1_gn(c, out_channels) for c in self.in_channels]
        )
        self.router = LatentRouter(out_channels, num_experts, router_hidden_dim, temperature,
                                   noise_std, router_init_std, num_tokens=len(self.in_channels), per_token=False)
        self.experts = ModuleList([DenseChannelExpert(out_channels, expert_ratio) for _ in range(num_experts)])

    def init(self, key) -> Params:
        p = super().init(key)
        p["residual_gain"] = jnp.asarray(self.residual_init, jnp.float32)
        return p

    def __call__(self, p, xs, ctx: Context):
        if not isinstance(xs, (list, tuple)):
            xs = [xs]
        base = xs[0] if self.base_is_identity else self.base_proj(p["base_proj"], xs[0], ctx)
        tokens = []
        for i, (x, proj) in enumerate(zip(xs, self.token_projs)):
            t = x if isinstance(proj, _Identity) else proj(p["token_projs"][str(i)], x, ctx)
            tokens.append(jnp.mean(t.astype(jnp.float32), axis=(1, 2)))
        scale_tokens = jnp.stack(tokens, 1)  # [B, T, D]
        logits, probs = self.router(p["router"], scale_tokens, ctx)
        mixed = jnp.zeros_like(base)
        for e, expert in enumerate(self.experts):
            gate = probs[:, e].astype(base.dtype)[:, None, None, None]
            mixed = mixed + expert(p["experts"][str(e)], base, ctx) * gate
        out = base + p["residual_gain"].astype(base.dtype) * mixed
        if ctx.training:
            ctx.add_aux(self.path, _latent_aux(logits, probs, self.num_experts,
                                               self.balance_loss_coeff, self.router_z_loss_coeff), family="latent")
        return out


class _Identity(Module):
    def init(self, key):
        return {}

    def __call__(self, p, x, ctx):
        return x


class MultiScaleLatentMixture(Module):
    """List-to-list latent mixture across scales (reference latent_mixture.py:444-526)."""

    def __init__(self, channels: Sequence[int], latent_dim=128, num_experts=4, expert_ratio=0.25,
                 router_hidden_dim=None, temperature=1.0, balance_loss_coeff=1e-2,
                 router_z_loss_coeff=1e-3, residual_init=0.0, noise_std=0.0, router_init_std=0.0):
        super().__init__()
        self.channels = tuple(channels)
        self.latent_dim = latent_dim
        self.num_experts = num_experts
        self.balance_loss_coeff = balance_loss_coeff
        self.router_z_loss_coeff = router_z_loss_coeff
        self.residual_init = residual_init
        self.input_projs = ModuleList(
            [_Identity() if c == latent_dim else _conv1x1_gn(c, latent_dim) for c in self.channels]
        )
        self.router = LatentRouter(latent_dim, num_experts, router_hidden_dim, temperature,
                                   noise_std, router_init_std, num_tokens=len(self.channels), per_token=True)
        self.experts = ModuleList(
            [ModuleList([DenseChannelExpert(c, expert_ratio) for _ in range(num_experts)]) for c in self.channels]
        )

    def init(self, key) -> Params:
        p = super().init(key)
        p["residual_gain"] = jnp.full((len(self.channels),), self.residual_init, jnp.float32)
        return p

    def __call__(self, p, xs, ctx: Context):
        tokens = []
        for i, (x, proj) in enumerate(zip(xs, self.input_projs)):
            t = x if isinstance(proj, _Identity) else proj(p["input_projs"][str(i)], x, ctx)
            tokens.append(jnp.mean(t.astype(jnp.float32), axis=(1, 2)))
        scale_tokens = jnp.stack(tokens, 1)
        logits, probs = self.router(p["router"], scale_tokens, ctx)  # per_token: [B,T,E]
        outs = []
        for s, x in enumerate(xs):
            mixed = jnp.zeros_like(x)
            for e in range(self.num_experts):
                gate = probs[:, s, e].astype(x.dtype)[:, None, None, None]
                mixed = mixed + self.experts[s][e](p["experts"][str(s)][str(e)], x, ctx) * gate
            outs.append(x + p["residual_gain"][s].astype(x.dtype) * mixed)
        if ctx.training:
            ctx.add_aux(self.path, _latent_aux(logits, probs, self.num_experts,
                                               self.balance_loss_coeff, self.router_z_loss_coeff), family="latent")
        return outs
