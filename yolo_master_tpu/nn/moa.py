"""Mixture-of-Attention (MoA): soft per-token routing over three attention
head-groups — local windowed / regional pooled-KV / global linear attention.

Reference: ultralytics/nn/modules/moa/ (block.py:17, heads.py:87-380,
router.py:17-100, wrappers.py:35,182). CNN-native [B,H,W,C] here (the torch
reference is [B,C,H,W]); README.md:366-380 describes the design.

TPU notes: all three heads are static-shape; window partition pads to the
window multiple; the Performer-style global head uses a fixed orthogonal
random-feature matrix stored as a (non-trainable) parameter, with the exact
O(N^2) path chosen statically for small N (shapes are known at trace time, so
the reference's runtime N<=512 switch + blend window becomes a Python branch).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .layers import (
    BatchNorm,
    Conv,
    ConvSeq,
    GroupNorm,
    Linear,
    PlainConv,
    avg_pool,
    silu,
)
from .module import Context, Module, ModuleList, Params, trunc_normal

LINEAR_ATTN_THRESHOLD = 512
LINEAR_ATTN_BLEND_WINDOW = 64
LINEAR_ATTN_ACTIVATION_LIMIT = 1e4


def _pad_hw(x, win):
    B, H, W, C = x.shape
    ph = (win - H % win) % win
    pw = (win - W % win) % win
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    return x, ph, pw


def window_partition(x, win):
    """[B,H,W,C] -> [B*nh*nw, win*win, C] (H,W divisible by win)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // win, win, W // win, win, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, win * win, C)


def window_reverse(wx, win, B, H, W):
    C = wx.shape[-1]
    x = wx.reshape(B, H // win, W // win, win, win, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, C)


def sdpa(q, k, v, scale, mask=None):
    """q,k,v: [..., N, hd] / [..., M, hd] -> [..., N, hd] (softmax attention).
    mask: optional [N, M] additive bias (-inf to block, e.g. the CDN group
    mask in RT-DETR denoising training)."""
    # Logits in the compute dtype (no fp32 materialization of [..., N, M] —
    # HBM-bound under bf16, see nn/layers.py AAttn); softmax reduces in fp32.
    attn = jnp.einsum("...nd,...md->...nm", q * scale, k)
    if mask is not None:
        attn = attn + mask.astype(attn.dtype)
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(v.dtype)
    return jnp.einsum("...nm,...md->...nd", attn, v)


class _LocalAttnHead(Module):
    """DW-biased QKV + window attention + dw7x7 PE on V (moa/heads.py:87-132)."""

    def __init__(self, dim, num_heads, head_dim=None, window_size=7):
        super().__init__()
        self.nh = num_heads
        self.hd = head_dim or max(dim // num_heads, 16)
        self.win = max(1, window_size)
        inner = self.hd * self.nh
        self.inner = inner
        self.qkv_dw = PlainConv(dim, dim, 3, g=dim)
        self.qkv_pw = PlainConv(dim, inner * 3, 1)
        self.proj = PlainConv(inner, dim, 1)
        self.pe = PlainConv(inner, inner, 7, g=inner)
        self.norm = GroupNorm(dim, 8)
        self.scale = self.hd**-0.5

    def __call__(self, p, x, ctx):
        B, H, W, C = x.shape
        qkv = self.qkv_pw(p["qkv_pw"], self.qkv_dw(p["qkv_dw"], x, ctx), ctx)
        q, k, v = jnp.split(qkv, 3, -1)  # each [B,H,W,inner]
        v = v + self.pe(p["pe"], v, ctx)
        win = self.win
        stack = jnp.stack([q, k, v], 0).reshape(3 * B, H, W, self.inner)
        stack, ph, pw = _pad_hw(stack, win)
        Hp, Wp = stack.shape[1:3]
        wq, wk, wv = jnp.split(window_partition(stack, win).reshape(3, -1, win * win, self.inner), 3, 0)
        def heads(t):
            n = t.shape[1]
            return t[0].reshape(-1, win * win, self.nh, self.hd).transpose(0, 2, 1, 3)
        out = sdpa(heads(wq), heads(wk), heads(wv), self.scale)  # [nw, nh, ww, hd]
        out = out.transpose(0, 2, 1, 3).reshape(-1, win * win, self.inner)
        out = window_reverse(out, win, B, Hp, Wp)[:, :H, :W]
        return self.norm(p["norm"], self.proj(p["proj"], out, ctx), ctx)


class _RegionalAttnHead(Module):
    """Full-res queries vs 2x-pooled KV (moa/heads.py:133-205)."""

    def __init__(self, dim, num_heads, head_dim=None, pool_stride=2):
        super().__init__()
        self.nh = num_heads
        self.hd = head_dim or max(dim // num_heads, 16)
        inner = self.hd * self.nh
        self.inner = inner
        self.pool_stride = pool_stride
        self.q_proj = PlainConv(dim, inner, 1)
        self.kv_proj = PlainConv(dim, inner * 2, 1)
        self.proj = PlainConv(inner, dim, 1)
        self.norm = GroupNorm(dim, 8)
        self.scale = self.hd**-0.5

    def __call__(self, p, x, ctx):
        B, H, W, C = x.shape
        if min(H, W) <= 1:
            kv = self.kv_proj(p["kv_proj"], x, ctx)
        else:
            pooled = avg_pool(x, self.pool_stride)
            kv = self.kv_proj(p["kv_proj"], pooled, ctx)
        H2, W2 = kv.shape[1:3]
        k, v = jnp.split(kv.reshape(B, H2 * W2, 2 * self.inner), 2, -1)
        q = self.q_proj(p["q_proj"], x, ctx).reshape(B, H * W, self.inner)
        def heads(t):
            return t.reshape(B, -1, self.nh, self.hd).transpose(0, 2, 1, 3)
        out = sdpa(heads(q), heads(k), heads(v), self.scale)
        out = out.transpose(0, 2, 1, 3).reshape(B, H, W, self.inner)
        return self.norm(p["norm"], self.proj(p["proj"], out, ctx), ctx)


class _GlobalAttnHead(Module):
    """Performer-style linear attention with fixed orthogonal random features;
    exact attention for small N with a smooth blend window (moa/heads.py:205-330)."""

    def __init__(self, dim, num_heads, head_dim=None, nb_features=64, rf_seed=131074):
        super().__init__()
        self.nh = num_heads
        self.hd = head_dim or max(dim // num_heads, 16)
        inner = self.hd * self.nh
        self.inner = inner
        self.qkv = PlainConv(dim, inner * 3, 1)
        self.proj = PlainConv(inner, dim, 1)
        self.norm = GroupNorm(dim, 8)
        self.scale = self.hd**-0.5
        eff_nb = min(nb_features, self.hd)
        rng = np.random.default_rng(rf_seed)
        rf = rng.standard_normal((self.hd, self.hd)).astype(np.float32)
        qmat, _ = np.linalg.qr(rf)
        self._rf_init = jnp.asarray(qmat[:eff_nb])  # [eff_nb, hd] seed value

    def init(self, key) -> Params:
        p = super().init(key)
        # the random-feature matrix is a persistent torch buffer
        # (moa/heads.py:251) — kept in the params tree so checkpoint import
        # carries the REFERENCE's features and outputs match bit-for-bit
        p["_rf_matrix"] = self._rf_init
        return p

    def _linear_attn(self, p, q, k, v):
        """q,k,v [B,nh,N,hd] -> [B,nh,N,hd], O(N)."""
        rf = p["_rf_matrix"].astype(jnp.float32)
        scale = rf.shape[0] ** -0.5
        qf = jnp.clip(jax.nn.relu(q.astype(jnp.float32) @ rf.T * scale) + 1e-6, None, LINEAR_ATTN_ACTIVATION_LIMIT)
        kf = jnp.clip(jax.nn.relu(k.astype(jnp.float32) @ rf.T * scale) + 1e-6, None, LINEAR_ATTN_ACTIVATION_LIMIT)
        kv = jnp.einsum("bhnf,bhnd->bhfd", kf, v.astype(jnp.float32))
        z = 1.0 / (jnp.einsum("bhnf,bhf->bhn", qf, jnp.sum(kf, 2)) + 1e-6)
        return (jnp.einsum("bhnf,bhfd->bhnd", qf, kv) * z[..., None]).astype(v.dtype)

    def __call__(self, p, x, ctx):
        B, H, W, C = x.shape
        N = H * W
        qkv = self.qkv(p["qkv"], x, ctx).reshape(B, N, 3 * self.inner)
        q, k, v = jnp.split(qkv, 3, -1)
        def heads(t):
            return t.reshape(B, N, self.nh, self.hd).transpose(0, 2, 1, 3)
        q, k, v = heads(q), heads(k), heads(v)
        lo = LINEAR_ATTN_THRESHOLD - LINEAR_ATTN_BLEND_WINDOW
        if N <= lo:
            out = sdpa(q, k, v, self.scale)
        elif N >= LINEAR_ATTN_THRESHOLD:
            out = self._linear_attn(p, q * self.scale, k, v)
        else:  # static blend window (shapes known at trace time)
            alpha = (N - lo) / LINEAR_ATTN_BLEND_WINDOW
            out = (1 - alpha) * sdpa(q, k, v, self.scale) + alpha * self._linear_attn(p, q * self.scale, k, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, H, W, self.inner)
        return self.norm(p["norm"], self.proj(p["proj"], out, ctx), ctx)


class _MoARouter(Module):
    """Per-token soft router over head-groups (moa/router.py:17-50);
    zero-init last conv -> near-uniform initial routing; annealable temperature."""

    def __init__(self, dim, num_groups, reduction=8, temperature=1.0):
        super().__init__()
        self.num_groups = num_groups
        self.temperature = max(temperature, 0.1)
        hidden = max(dim // reduction, num_groups * 2)
        self.router = ConvSeq(
            PlainConv(dim, hidden, 1), GroupNorm(hidden, 4), _SiLUm(), PlainConv(hidden, num_groups, 1, bias=True)
        )

    def init(self, key) -> Params:
        p = super().init(key)
        last = p["router"]["3"]
        last["w"] = jnp.zeros_like(last["w"])
        last["b"] = jnp.zeros_like(last["b"])
        return p

    def __call__(self, p, x, ctx):
        logits = self.router(p["router"], x, ctx).astype(jnp.float32) / self.temperature  # [B,H,W,G]
        return jax.nn.softmax(logits, -1), logits


class _SiLUm(Module):
    def init(self, key):
        return {}

    def __call__(self, p, x, ctx):
        return silu(x)


class MoABlock(Module):
    """Soft per-token mixture over local/regional/global attention + FFN
    (reference moa/block.py:17-220)."""

    NUM_GROUPS = 3

    def __init__(self, dim, num_heads=8, mlp_ratio=2.0, temperature=1.0, attn_drop=0.0,
                 shortcut=True, aux_loss_coeff=0.01, block_index=0, local_window_size=7,
                 sequential_heads=False):
        super().__init__()
        if num_heads <= 0 or num_heads % self.NUM_GROUPS != 0:
            raise ValueError(f"num_heads ({num_heads}) must be divisible by {self.NUM_GROUPS}")
        self.shortcut = shortcut
        self.aux_loss_coeff = aux_loss_coeff
        self.dim = dim
        head_dim = max(dim // num_heads, 16)
        hpg = num_heads // self.NUM_GROUPS
        rf_seed = block_index * 7919 + 2 * 65537
        self.local_head = _LocalAttnHead(dim, hpg, head_dim, window_size=local_window_size)
        self.region_head = _RegionalAttnHead(dim, hpg, head_dim)
        self.global_head = _GlobalAttnHead(dim, hpg, head_dim, rf_seed=rf_seed)
        self.router = _MoARouter(dim, self.NUM_GROUPS, temperature=temperature)
        self.fusion = Conv(dim, dim, 1, act=False)
        hidden = int(dim * mlp_ratio)
        self.ffn = ConvSeq(Conv(dim, hidden, 1), Conv(hidden, dim, 1, act=False))
        self.ls_init = 0.1 if shortcut else 1.0

    def init(self, key) -> Params:
        p = super().init(key)
        p["ls_attn"] = jnp.full((self.dim,), self.ls_init, jnp.float32)
        p["ls_ffn"] = jnp.full((self.dim,), self.ls_init, jnp.float32)
        return p

    def __call__(self, p, x, ctx):
        weights, logits = self.router(p["router"], x, ctx)  # [B,H,W,3]
        if ctx.training and self.aux_loss_coeff > 0:
            # GShard-scale balance regularizer (moa/router.py:51-100):
            # importance = mean token routing mass; E * sum(imp^2), coeff-scaled
            importance = jnp.mean(weights, axis=(0, 1, 2))
            aux = self.aux_loss_coeff * self.NUM_GROUPS * jnp.sum(importance**2)
            ctx.add_aux(self.path, aux, family="moa")
            ctx.stats[self.path] = {"expert_usage": importance}
        w = weights.astype(x.dtype)
        mixed = (
            w[..., 0:1] * self.local_head(p["local_head"], x, ctx)
            + w[..., 1:2] * self.region_head(p["region_head"], x, ctx)
            + w[..., 2:3] * self.global_head(p["global_head"], x, ctx)
        )
        mixed = self.fusion(p["fusion"], mixed, ctx)
        x = x + p["ls_attn"].astype(x.dtype) * mixed if self.shortcut else p["ls_attn"].astype(x.dtype) * mixed
        ff = self.ffn(p["ffn"], x, ctx)
        return x + p["ls_ffn"].astype(x.dtype) * ff if self.shortcut else p["ls_ffn"].astype(x.dtype) * ff


class C2fMoA(Module):
    """C2f-style wrapper around stacked MoABlocks (moa/wrappers.py:35-130)."""

    def __init__(self, c1, c2, n=1, num_heads=6, mlp_ratio=2.0, temperature=1.0,
                 shortcut=True, e=0.5, aux_loss_coeff=0.01, local_window_size=7,
                 sequential_heads=False):
        super().__init__()
        self.c = int(c2 * e)
        self.cv1 = Conv(c1, 2 * self.c, 1)
        self.cv2 = Conv((2 + n) * self.c, c2, 1)
        eff = num_heads
        while eff % MoABlock.NUM_GROUPS != 0:
            eff += 1
        self.m = ModuleList(
            [
                MoABlock(self.c, eff, mlp_ratio, temperature, shortcut=shortcut,
                         aux_loss_coeff=aux_loss_coeff, block_index=i,
                         local_window_size=local_window_size)
                for i in range(n)
            ]
        )

    def __call__(self, p, x, ctx):
        y = self.cv1(p["cv1"], x, ctx)
        ys = [y[..., : self.c], y[..., self.c :]]
        for i, m in enumerate(self.m):
            ys.append(m(p["m"][str(i)], ys[-1], ctx))
        return self.cv2(p["cv2"], jnp.concatenate(ys, -1), ctx)


class NeckMoAFusion(Module):
    """Cross-scale MoA fusion for the FPN/PAN neck (moa/wrappers.py:182-300):
    hi-res queries cross-attend into upsampled lo-res KV; a router blends
    cross-scale context with the self-scale path."""

    def __init__(self, ch, c_out, num_heads=4, shortcut=True, aux_loss_coeff=0.01):
        super().__init__()
        c_hi, c_lo = ch
        self.shortcut = shortcut and c_hi == c_out
        self.aux_loss_coeff = aux_loss_coeff
        head_dim = max(c_hi // num_heads, 16)
        inner = head_dim * num_heads
        self.nh, self.hd, self.inner = num_heads, head_dim, inner
        self.scale = head_dim**-0.5
        self.q_proj = PlainConv(c_hi, inner, 1)
        self.kv_proj = PlainConv(c_lo, inner * 2, 1)
        self.router = _MoARouter(c_hi, 2)
        self.out_proj = Conv(inner, c_out, 1, act=False)
        self.self_proj = Conv(c_hi, c_out, 1, act=False)

    def __call__(self, p, xs, ctx):
        hi, lo = xs
        B, H, W, _ = hi.shape
        from .layers import upsample_nearest

        if lo.shape[1] != H:
            lo = upsample_nearest(lo, H // lo.shape[1])
        q = self.q_proj(p["q_proj"], hi, ctx).reshape(B, H * W, self.inner)
        kv = self.kv_proj(p["kv_proj"], lo, ctx).reshape(B, H * W, 2 * self.inner)
        k, v = jnp.split(kv, 2, -1)
        def heads(t):
            return t.reshape(B, -1, self.nh, self.hd).transpose(0, 2, 1, 3)
        cross = sdpa(heads(q), heads(k), heads(v), self.scale)
        cross = cross.transpose(0, 2, 1, 3).reshape(B, H, W, self.inner)
        weights, _ = self.router(p["router"], hi, ctx)  # [B,H,W,2]
        if ctx.training and self.aux_loss_coeff > 0:
            importance = jnp.mean(weights, axis=(0, 1, 2))
            ctx.add_aux(self.path, self.aux_loss_coeff * 2 * jnp.sum(importance**2), family="moa")
        w = weights.astype(hi.dtype)
        out = w[..., 0:1] * self.out_proj(p["out_proj"], cross, ctx) + w[..., 1:2] * self.self_proj(
            p["self_proj"], hi, ctx
        )
        return hi + out if self.shortcut else out
