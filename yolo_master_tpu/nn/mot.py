"""Mixture-of-Transformers (MoT): token/image-level soft top-k routing over
three complete transformer experts — LocalConv / Swin-window / Deformable.

Reference: ultralytics/nn/modules/mot/ (block.py:19-260, experts.py:67-430,
router.py:61-200). TPU recast: deformable sampling uses an explicit bilinear
gather (no torch grid_sample); window shift via jnp.roll; all experts dense
and mixed by (possibly sparse-masked) routing weights, so top-k masking keeps
static shapes while matching the reference's sparse-train numerics.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from .layers import Conv, ConvSeq, GroupNorm, LayerNorm, Linear, PlainConv, silu
from .moa import _SiLUm, sdpa, window_partition, window_reverse, _pad_hw
from .module import Context, Module, ModuleList, Params, trunc_normal


class _LocalConvTransformerExpert(Module):
    """Conv-biased attention + GLU FFN (mot/experts.py:67-140)."""

    def __init__(self, dim, num_heads, mlp_ratio=2.0, dropout=0.0):
        super().__init__()
        assert dim % num_heads == 0
        self.nh, self.hd = num_heads, dim // num_heads
        self.scale = self.hd**-0.5
        self.dim = dim
        self.dw_mix = PlainConv(dim, dim, 3, g=dim)
        self.qkv = PlainConv(dim, dim * 3, 1)
        self.pe = PlainConv(dim, dim, 7, g=dim)
        self.proj = PlainConv(dim, dim, 1)
        self.norm1 = GroupNorm(dim, 8)
        self.norm2 = GroupNorm(dim, 8)
        hidden = int(dim * mlp_ratio)
        self.ffn_gate = Conv(dim, hidden, 1)  # + sigmoid
        self.ffn_val = Conv(dim, hidden, 1)
        self.ffn_out = Conv(hidden, dim, 1, act=False)

    def init(self, key) -> Params:
        p = super().init(key)
        p["ls1"] = jnp.full((self.dim,), 0.1, jnp.float32)
        p["ls2"] = jnp.full((self.dim,), 0.1, jnp.float32)
        return p

    def __call__(self, p, x, ctx):
        B, H, W, C = x.shape
        N = H * W
        xn = self.norm1(p["norm1"], x, ctx)
        qkv = self.qkv(p["qkv"], self.dw_mix(p["dw_mix"], xn, ctx), ctx)
        q, k, v = jnp.split(qkv, 3, -1)
        v = v + self.pe(p["pe"], v, ctx)
        def heads(t):
            return t.reshape(B, N, self.nh, self.hd).transpose(0, 2, 1, 3)
        out = sdpa(heads(q.reshape(B, N, C)), heads(k.reshape(B, N, C)), heads(v.reshape(B, N, C)), self.scale)
        out = out.transpose(0, 2, 1, 3).reshape(B, H, W, C)
        x = x + p["ls1"].astype(x.dtype) * self.proj(p["proj"], out, ctx)
        xn = self.norm2(p["norm2"], x, ctx)
        gate = jax.nn.sigmoid(self.ffn_gate(p["ffn_gate"], xn, ctx).astype(jnp.float32)).astype(x.dtype)
        ffn = gate * self.ffn_val(p["ffn_val"], xn, ctx)
        return x + p["ls2"].astype(x.dtype) * self.ffn_out(p["ffn_out"], ffn, ctx)


class _WindowTransformerExpert(Module):
    """Swin-style (optionally shifted) window transformer (mot/experts.py:141-277)."""

    def __init__(self, dim, num_heads, window_size=7, mlp_ratio=2.0, dropout=0.0, shift_size=0):
        super().__init__()
        assert dim % num_heads == 0
        self.nh, self.hd = num_heads, dim // num_heads
        self.scale = self.hd**-0.5
        self.win = window_size
        self.shift = (window_size // 2) if shift_size else 0
        self.dim = dim
        self.qkv = Linear(dim, dim * 3, bias=False)
        self.proj = Linear(dim, dim, bias=False)
        self.norm1 = LayerNorm(dim)
        self.norm2 = LayerNorm(dim)
        hidden = int(dim * mlp_ratio)
        self.ffn = ConvSeq(Linear(dim, hidden), _GELU(), Linear(hidden, dim))

    def init(self, key) -> Params:
        p = super().init(key)
        p["ls1"] = jnp.full((self.dim,), 0.1, jnp.float32)
        p["ls2"] = jnp.full((self.dim,), 0.1, jnp.float32)
        return p

    def __call__(self, p, x, ctx):
        B, H, W, C = x.shape
        win = self.win
        xn = self.norm1(p["norm1"], x, ctx)
        if self.shift:
            xn = jnp.roll(xn, (-self.shift, -self.shift), axis=(1, 2))
        xp, ph, pw = _pad_hw(xn, win)
        Hp, Wp = xp.shape[1:3]
        wx = window_partition(xp, win)  # [nW, ww, C]
        qkv = self.qkv(p["qkv"], wx, ctx)
        q, k, v = jnp.split(qkv, 3, -1)
        def heads(t):
            return t.reshape(t.shape[0], -1, self.nh, self.hd).transpose(0, 2, 1, 3)
        out = sdpa(heads(q), heads(k), heads(v), self.scale)
        out = out.transpose(0, 2, 1, 3).reshape(wx.shape[0], -1, C)
        out = self.proj(p["proj"], out, ctx)
        out = window_reverse(out, win, B, Hp, Wp)[:, :H, :W]
        if self.shift:
            out = jnp.roll(out, (self.shift, self.shift), axis=(1, 2))
        x = x + p["ls1"].astype(x.dtype) * out
        ff = self.ffn(p["ffn"], self.norm2(p["norm2"], x, ctx), ctx)
        return x + p["ls2"].astype(x.dtype) * ff


class _GELU(Module):
    def init(self, key):
        return {}

    def __call__(self, p, x, ctx):
        return jax.nn.gelu(x)


def bilinear_sample(feat: jnp.ndarray, sx: jnp.ndarray, sy: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sampling of feat [B,H,W,C] at pixel coords sx, sy [B, ...].

    The torch reference uses F.grid_sample (align_corners=True, zero padding);
    this is the explicit gather equivalent (mot/experts.py deformable core).
    """
    B, H, W, C = feat.shape
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx = sx - x0
    wy = sy - y0

    def gather(yi, xi):
        yi_c = jnp.clip(yi.astype(jnp.int32), 0, H - 1)
        xi_c = jnp.clip(xi.astype(jnp.int32), 0, W - 1)
        flat = feat.reshape(B, H * W, C)
        idx = yi_c * W + xi_c  # [B, ...]
        sampled = jnp.take_along_axis(flat, idx.reshape(B, -1, 1), axis=1)
        valid = (yi >= 0) & (yi <= H - 1) & (xi >= 0) & (xi <= W - 1)
        return sampled.reshape(*idx.shape, C) * valid[..., None]

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    wx = wx[..., None]
    wy = wy[..., None]
    return (v00 * (1 - wx) + v01 * wx) * (1 - wy) + (v10 * (1 - wx) + v11 * wx) * wy


class _DeformableTransformerExpert(Module):
    """Single-scale deformable attention expert (mot/experts.py:278-430):
    each query predicts n_points offsets (tanh-clamped) + softmax point
    weights; features sampled bilinearly and aggregated."""

    def __init__(self, dim, num_heads, n_points=4, mlp_ratio=2.0, dropout=0.0, align_corners=True):
        super().__init__()
        assert dim % num_heads == 0
        self.nh, self.hd, self.np = num_heads, dim // num_heads, n_points
        self.dim = dim
        self.q_proj = Linear(dim, dim, bias=False)
        self.v_proj = Linear(dim, dim, bias=False)
        self.offset_proj = Linear(dim, num_heads * n_points * 2)
        self.attn_proj = Linear(dim, num_heads * n_points)
        self.out_proj = Linear(dim, dim, bias=False)
        self.norm1 = LayerNorm(dim)
        self.norm2 = LayerNorm(dim)
        hidden = int(dim * mlp_ratio)
        self.ffn = ConvSeq(Linear(dim, hidden), _GELU(), Linear(hidden, dim))

    def init(self, key) -> Params:
        p = super().init(key)
        # zero-init offsets/weights -> identity-like initial sampling
        for name in ("offset_proj", "attn_proj"):
            p[name]["w"] = jnp.zeros_like(p[name]["w"])
            p[name]["b"] = jnp.zeros_like(p[name]["b"])
        p["ls1"] = jnp.full((self.dim,), 0.1, jnp.float32)
        p["ls2"] = jnp.full((self.dim,), 0.1, jnp.float32)
        return p

    def __call__(self, p, x, ctx):
        B, H, W, C = x.shape
        N = H * W
        nh, np_, hd = self.nh, self.np, self.hd
        xn = self.norm1(p["norm1"], x, ctx).reshape(B, N, C)
        q = self.q_proj(p["q_proj"], xn, ctx)
        v = self.v_proj(p["v_proj"], xn, ctx).reshape(B, H, W, C)

        offsets = jnp.tanh(self.offset_proj(p["offset_proj"], q, ctx).astype(jnp.float32))
        offsets = offsets.reshape(B, N, nh, np_, 2)  # normalized [-1,1]
        attn_w = jax.nn.softmax(self.attn_proj(p["attn_proj"], q, ctx).astype(jnp.float32).reshape(B, N, nh, np_), -1)

        # reference grid in pixels + offsets scaled to half-extent
        ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32), indexing="ij")
        ref_x = xs.reshape(-1)[None, :, None, None]  # [1,N,1,1]
        ref_y = ys.reshape(-1)[None, :, None, None]
        sx = ref_x + offsets[..., 0] * (W - 1) / 2
        sy = ref_y + offsets[..., 1] * (H - 1) / 2

        # sample per head: v heads [B,H,W,nh,hd]
        vh = v.reshape(B, H, W, nh, hd)
        out = jnp.zeros((B, N, nh, hd), jnp.float32)
        for h in range(nh):
            samples = bilinear_sample(vh[..., h, :], sx[:, :, h], sy[:, :, h])  # [B,N,np,hd]
            out = out.at[:, :, h].set(jnp.sum(samples.astype(jnp.float32) * attn_w[:, :, h][..., None], 2))
        out = self.out_proj(p["out_proj"], out.reshape(B, N, C).astype(x.dtype), ctx).reshape(B, H, W, C)
        x = x + p["ls1"].astype(x.dtype) * out
        ff = self.ffn(p["ffn"], self.norm2(p["norm2"], x, ctx), ctx)
        return x + p["ls2"].astype(x.dtype) * ff


class _MoTRouter(Module):
    """Token- or image-level soft top-k router (mot/router.py:61-200)."""

    def __init__(self, dim, num_experts=3, top_k=2, use_spatial=True, temperature=1.0, exploration_eps=0.02):
        super().__init__()
        self.num_experts, self.top_k = num_experts, top_k
        self.use_spatial = use_spatial
        self.temperature = max(temperature, 0.1)
        self.eps = min(max(exploration_eps, 0.0), 0.2)
        hidden = max(dim // 8, num_experts * 4)
        if use_spatial:
            self.router = ConvSeq(
                PlainConv(dim, hidden, 1), GroupNorm(hidden, 4), _SiLUm(), PlainConv(hidden, num_experts, 1, bias=True)
            )
        else:
            self.router = ConvSeq(Linear(dim, hidden, bias=False), _SiLUm(), Linear(hidden, num_experts))

    def init(self, key) -> Params:
        p = super().init(key)
        last = p["router"][str(len(self.router) - 1)]
        last["w"] = jnp.zeros_like(last["w"])
        last["b"] = jnp.zeros_like(last["b"])
        return p

    def __call__(self, p, x, ctx):
        """Returns (weights, probs, logits): weights [B,H,W,E] or [B,1,1,E]."""
        if self.use_spatial:
            logits = self.router(p["router"], x, ctx).astype(jnp.float32) / self.temperature  # [B,H,W,E]
        else:
            pooled = jnp.mean(x, axis=(1, 2))
            logits = self.router(p["router"], pooled, ctx).astype(jnp.float32)[:, None, None, :] / self.temperature
        probs = jax.nn.softmax(logits, -1)
        # soft top-k mask + renormalize
        if self.top_k < self.num_experts:
            thr = jax.lax.top_k(probs, self.top_k)[0][..., -1:]
            keep = probs >= thr
            w = probs * keep
            w = w / jnp.clip(jnp.sum(w, -1, keepdims=True), 1e-9, None)
        else:
            w = probs
        if ctx.training and self.eps > 0:
            # exploration floor keeps all experts trainable (router.py eps)
            w = (1 - self.eps) * w + self.eps / self.num_experts
        return w, probs, logits


class MoTBlock(Module):
    """Mixture of three transformer experts with soft top-k routing
    (reference mot/block.py:19-260)."""

    NUM_EXPERTS = 3

    def __init__(self, dim, num_heads=8, top_k=2, window_size=7, n_points=4, mlp_ratio=2.0,
                 temperature=1.0, use_spatial_router=True, balance_loss_coeff=0.01,
                 router_z_loss_coeff=None, dropout=0.0, exploration_eps=0.02,
                 window_shift=False, sparse_train=False):
        super().__init__()
        if not 1 <= top_k <= self.NUM_EXPERTS:
            raise ValueError(f"top_k must be in [1, {self.NUM_EXPERTS}], got {top_k}")
        self.top_k = top_k
        self.balance_loss_coeff = balance_loss_coeff
        self.z_coeff = balance_loss_coeff if router_z_loss_coeff is None else router_z_loss_coeff
        eff = num_heads
        while dim % eff != 0 and eff > 1:
            eff -= 1
        self.experts = ModuleList(
            [
                _LocalConvTransformerExpert(dim, eff, mlp_ratio, dropout),
                _WindowTransformerExpert(dim, eff, window_size, mlp_ratio, dropout, shift_size=window_size // 2 if window_shift else 0),
                _DeformableTransformerExpert(dim, eff, n_points, mlp_ratio, dropout),
            ]
        )
        self.router = _MoTRouter(dim, self.NUM_EXPERTS, top_k, use_spatial=use_spatial_router,
                                 temperature=temperature, exploration_eps=exploration_eps)
        self.out_norm = GroupNorm(dim, 8)
        self.out_proj = PlainConv(dim, dim, 1)

    def __call__(self, p, x, ctx):
        w, probs, logits = self.router(p["router"], x, ctx)
        if ctx.training and (self.balance_loss_coeff > 0 or self.z_coeff > 0):
            importance = jnp.mean(probs.reshape(-1, self.NUM_EXPERTS), 0)
            balance = self.NUM_EXPERTS * jnp.sum(importance**2)
            z = jnp.mean(jax.nn.logsumexp(logits, -1) ** 2)
            ctx.add_aux(self.path, self.balance_loss_coeff * balance + self.z_coeff * z, family="mot")
            ctx.stats[self.path] = {"expert_usage": importance}
        wv = w.astype(x.dtype)
        mixed = None
        for i, expert in enumerate(self.experts):
            y = expert(p["experts"][str(i)], x, ctx) * wv[..., i : i + 1]
            mixed = y if mixed is None else mixed + y
        out = self.out_proj(p["out_proj"], self.out_norm(p["out_norm"], mixed, ctx), ctx)
        return x + out


class C2fMoT(Module):
    """C2f-style wrapper around stacked MoTBlocks (reference mot wrapper)."""

    def __init__(self, c1, c2, n=1, num_heads=8, top_k=2, window_size=7, n_points=4,
                 mlp_ratio=2.0, temperature=1.0, balance_loss_coeff=0.01, e=0.5,
                 use_spatial_router=True):
        super().__init__()
        from .layers import Conv

        self.c = int(c2 * e)
        self.cv1 = Conv(c1, 2 * self.c, 1)
        self.cv2 = Conv((2 + n) * self.c, c2, 1)
        self.m = ModuleList(
            [
                MoTBlock(self.c, num_heads, top_k, window_size, n_points, mlp_ratio=mlp_ratio,
                         temperature=temperature, balance_loss_coeff=balance_loss_coeff,
                         use_spatial_router=use_spatial_router, window_shift=bool(i % 2))
                for i in range(n)
            ]
        )

    def __call__(self, p, x, ctx):
        y = self.cv1(p["cv1"], x, ctx)
        ys = [y[..., : self.c], y[..., self.c :]]
        for i, m in enumerate(self.m):
            ys.append(m(p["m"][str(i)], ys[-1], ctx))
        return self.cv2(p["cv2"], jnp.concatenate(ys, -1), ctx)
