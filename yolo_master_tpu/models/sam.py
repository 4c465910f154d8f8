"""SAM — promptable segmentation, TPU-native (reference: ultralytics/models/
sam/model.py:1-169 + modules/{encoders,decoders,prompt_encoder,transformer}.py,
~11k LoC torch).

Architecture (SAM-ViT family, image-only; SAM2 video memory attention is a
follow-up):
  * ImageEncoderViT — 16x16 patchify, pre-norm transformer blocks with
    windowed attention + periodic global blocks, decomposed relative position
    bias, 1x1+3x3 neck to a 256-d embedding map
  * PromptEncoder — random-Fourier positional encoding; point/box prompts as
    PE + learned type embeddings; dense mask prompts via a conv downscaler;
    a learned no-mask embedding otherwise
  * MaskDecoder — two-way transformer (token->image and image->token
    attention), 4 mask tokens + IoU token, hypernetwork MLPs over an
    upscaled embedding, multimask output + IoU quality ranking

TPU-first recast: prompts are padded to a static (max_points) slot count with
a validity mask (jit-stable across prompt counts); the image embedding is
computed ONCE per image (set_image) and every prompt set reuses it — the
promptable-interaction loop costs only the tiny decoder.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.layers import LayerNorm, Linear, PlainConv, conv2d


def _gelu(x):
    # torch nn.GELU default is the EXACT erf form; jax.nn.gelu defaults to the
    # tanh approximation (~4e-4 divergence at unit scale)
    return jax.nn.gelu(x, approximate=False)
from ..nn.module import Context, Module, ModuleList, Params, trunc_normal


# ---------------------------------------------------------------------------
# Image encoder (ViT-det style, reference modules/encoders.py ImageEncoderViT)
# ---------------------------------------------------------------------------

class _MLP(Module):
    def __init__(self, c, hidden, act="gelu"):
        super().__init__()
        self.fc1 = Linear(c, hidden)
        self.fc2 = Linear(hidden, c)
        self.act = _gelu if act == "gelu" else jax.nn.relu

    def __call__(self, p, x, ctx):
        return self.fc2(p["fc2"], self.act(self.fc1(p["fc1"], x, ctx)), ctx)


def _window_partition(x, ws):
    B, H, W, C = x.shape
    ph, pw = (ws - H % ws) % ws, (ws - W % ws) % ws
    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    Hp, Wp = H + ph, W + pw
    x = x.reshape(B, Hp // ws, ws, Wp // ws, ws, C).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws, ws, C), (Hp, Wp)


def _window_unpartition(x, ws, hp_wp, hw):
    Hp, Wp = hp_wp
    H, W = hw
    B = x.shape[0] // (Hp // ws * Wp // ws)
    x = x.reshape(B, Hp // ws, Wp // ws, ws, ws, -1).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, Hp, Wp, -1)[:, :H, :W]


class _ViTAttention(Module):
    """MHSA with decomposed relative position bias (encoders.py Attention)."""

    def __init__(self, dim, num_heads, input_size):
        super().__init__()
        self.nh = num_heads
        self.hd = dim // num_heads
        self.qkv = Linear(dim, 3 * dim)
        self.proj = Linear(dim, dim)
        self.input_size = input_size

    def init(self, key) -> Params:
        p = super().init(key)
        h, w = self.input_size
        k1, k2 = jax.random.split(key)
        p["rel_h"] = trunc_normal(k1, (2 * h - 1, self.hd), std=0.02)
        p["rel_w"] = trunc_normal(k2, (2 * w - 1, self.hd), std=0.02)
        return p

    def _rel_bias(self, p, q, H, W):
        """Decomposed rel-pos (reference add_decomposed_rel_pos)."""
        def get(table, n):
            coords = jnp.arange(n)[:, None] - jnp.arange(n)[None, :] + (n - 1)
            return table[coords]  # [n, n, hd]

        rh = get(p["rel_h"][: 2 * H - 1], H)
        rw = get(p["rel_w"][: 2 * W - 1], W)
        B = q.shape[0]
        r_q = q.reshape(B, self.nh, H, W, self.hd)
        bias_h = jnp.einsum("bnhwc,hkc->bnhwk", r_q, rh)  # [B,nh,H,W,H]
        bias_w = jnp.einsum("bnhwc,wkc->bnhwk", r_q, rw)  # [B,nh,H,W,W]
        return (bias_h[..., :, None] + bias_w[..., None, :]).reshape(B, self.nh, H * W, H * W)

    def __call__(self, p, x, ctx):
        B, H, W, C = x.shape
        qkv = self.qkv(p["qkv"], x.reshape(B, H * W, C), ctx).reshape(B, H * W, 3, self.nh, self.hd)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))  # [B,nh,T,hd]
        attn = jnp.einsum("bntd,bnsd->bnts", q * self.hd**-0.5, k, preferred_element_type=jnp.float32)
        attn = attn + self._rel_bias(p, q.astype(jnp.float32), H, W)
        attn = jax.nn.softmax(attn, -1).astype(v.dtype)
        out = jnp.einsum("bnts,bnsd->bntd", attn, v).transpose(0, 2, 1, 3).reshape(B, H, W, C)
        return self.proj(p["proj"], out, ctx)


class _ViTBlock(Module):
    def __init__(self, dim, num_heads, mlp_ratio, window_size, input_size):
        super().__init__()
        self.ws = window_size
        size = (window_size, window_size) if window_size else input_size
        self.norm1 = LayerNorm(dim)
        self.attn = _ViTAttention(dim, num_heads, size)
        self.norm2 = LayerNorm(dim)
        self.mlp = _MLP(dim, int(dim * mlp_ratio))

    def __call__(self, p, x, ctx):
        h = self.norm1(p["norm1"], x, ctx)
        if self.ws:
            hw = h.shape[1:3]
            h, pad_hw = _window_partition(h, self.ws)
            h = self.attn(p["attn"], h, ctx)
            h = _window_unpartition(h, self.ws, pad_hw, hw)
        else:
            h = self.attn(p["attn"], h, ctx)
        x = x + h
        return x + self.mlp(p["mlp"], self.norm2(p["norm2"], x, ctx), ctx)


class ImageEncoderViT(Module):
    """ViT-det image encoder (reference encoders.py:1): patchify -> blocks
    (windowed except global_attn_indexes) -> 1x1+3x3 LN neck -> [B,h,w,256]."""

    def __init__(self, img_size=1024, patch=16, dim=768, depth=12, num_heads=12,
                 mlp_ratio=4.0, window_size=14, global_idx=(2, 5, 8, 11), out_chans=256):
        super().__init__()
        self.img_size, self.patch, self.dim = img_size, patch, dim
        self.grid = img_size // patch
        self.patch_embed = PlainConv(3, dim, patch, s=patch, p=0, bias=True)
        self.blocks = ModuleList([
            _ViTBlock(dim, num_heads, mlp_ratio, 0 if i in global_idx else window_size, (self.grid, self.grid))
            for i in range(depth)
        ])
        self.neck1 = PlainConv(dim, out_chans, 1)
        self.neck_ln1 = LayerNorm(out_chans, eps=1e-6)  # LayerNorm2d eps
        self.neck2 = PlainConv(out_chans, out_chans, 3)
        self.neck_ln2 = LayerNorm(out_chans, eps=1e-6)  # LayerNorm2d eps

    def init(self, key) -> Params:
        p = super().init(key)
        p["pos_embed"] = trunc_normal(jax.random.PRNGKey(7), (1, self.grid, self.grid, self.dim), std=0.02)
        return p

    def __call__(self, p, x, ctx):
        x = self.patch_embed(p["patch_embed"], x, ctx)  # [B,g,g,dim]
        x = x + p["pos_embed"].astype(x.dtype)
        for i, blk in enumerate(self.blocks):
            x = blk(p["blocks"][str(i)], x, ctx)
        x = self.neck_ln1(p["neck_ln1"], self.neck1(p["neck1"], x, ctx), ctx)
        return self.neck_ln2(p["neck_ln2"], self.neck2(p["neck2"], x, ctx), ctx)


# ---------------------------------------------------------------------------
# Prompt encoder (reference prompt_encoder.py PromptEncoder)
# ---------------------------------------------------------------------------

class PromptEncoder(Module):
    """Points/boxes/masks -> sparse [B,S,D] + dense [B,h,w,D] embeddings."""

    def __init__(self, embed_dim=256, image_embedding_size=(64, 64), mask_in_chans=16):
        super().__init__()
        self.dim = embed_dim
        self.size = image_embedding_size
        self.mask_down = ModuleList([
            PlainConv(1, mask_in_chans // 4, 2, s=2, p=0, bias=True),
            PlainConv(mask_in_chans // 4, mask_in_chans, 2, s=2, p=0, bias=True),
            PlainConv(mask_in_chans, embed_dim, 1, bias=True),
        ])
        # LayerNorm2d after each downscale conv (reference encoders.py:208-216)
        self.mask_norms = ModuleList([LayerNorm(mask_in_chans // 4, eps=1e-6), LayerNorm(mask_in_chans, eps=1e-6)])

    def init(self, key) -> Params:
        keys = jax.random.split(key, 8)
        p = super().init(keys[0])
        p["pe_gaussian"] = jax.random.normal(keys[1], (2, self.dim // 2)) * 1.0
        # type embeddings: [neg point, pos point, box tl, box br, pad]
        for i, name in enumerate(["pt_neg", "pt_pos", "box_tl", "box_br", "not_a_point"]):
            p[name] = jax.random.normal(keys[2 + i], (self.dim,)) * 0.02
        p["no_mask"] = jax.random.normal(keys[7], (self.dim,)) * 0.02
        return p

    def pe_encode(self, p, coords01):
        """Random-Fourier positional encoding of [..., 2] coords in [0,1]."""
        c = (2.0 * coords01 - 1.0) @ p["pe_gaussian"]
        c = 2 * jnp.pi * c
        return jnp.concatenate([jnp.sin(c), jnp.cos(c)], -1)

    def dense_pe(self, p):
        h, w = self.size
        gy, gx = jnp.meshgrid((jnp.arange(h) + 0.5) / h, (jnp.arange(w) + 0.5) / w, indexing="ij")
        return self.pe_encode(p, jnp.stack([gx, gy], -1))  # [h,w,D]

    def __call__(self, p, ctx, points=None, labels=None, boxes=None, masks=None, batch=1):
        """points [B,N,2] in [0,1]; labels [B,N] (1 pos, 0 neg, -1 pad);
        boxes [B,2,2] normalized corners or None; masks [B,256,256,1] or None."""
        sparse = []
        if points is not None:
            pe = self.pe_encode(p, points)
            typ = jnp.where(
                (labels == 1)[..., None], p["pt_pos"],
                jnp.where((labels == 0)[..., None], p["pt_neg"], p["not_a_point"]),
            )
            pe = jnp.where((labels >= 0)[..., None], pe + typ, typ)  # pad slots: pure type emb
            sparse.append(pe)
        if boxes is not None:
            be = self.pe_encode(p, boxes)  # [B,2,D]
            be = be + jnp.stack([p["box_tl"], p["box_br"]])[None]
            sparse.append(be)
        sparse_emb = jnp.concatenate(sparse, 1) if sparse else jnp.zeros((batch, 0, self.dim))

        if masks is not None:
            m = masks
            for i, conv in enumerate(self.mask_down):
                m = conv(p["mask_down"][str(i)], m, ctx)
                if i < 2:
                    m = _gelu(self.mask_norms[i](p["mask_norms"][str(i)], m, ctx))
            dense = m
        else:
            h, w = self.size
            dense = jnp.broadcast_to(p["no_mask"][None, None, None], (batch, h, w, self.dim))
        return sparse_emb, dense


# ---------------------------------------------------------------------------
# Two-way transformer mask decoder (reference transformer.py + decoders.py)
# ---------------------------------------------------------------------------

class _CrossAttn(Module):
    def __init__(self, dim, num_heads, downsample=2):
        super().__init__()
        self.nh = num_heads
        inner = dim // downsample
        self.hd = inner // num_heads
        self.q = Linear(dim, inner)
        self.k = Linear(dim, inner)
        self.v = Linear(dim, inner)
        self.o = Linear(inner, dim)

    def __call__(self, p, q, k, v, ctx):
        B = q.shape[0]

        def heads(t):
            return t.reshape(B, -1, self.nh, self.hd).transpose(0, 2, 1, 3)

        qh, kh, vh = heads(self.q(p["q"], q, ctx)), heads(self.k(p["k"], k, ctx)), heads(self.v(p["v"], v, ctx))
        attn = jax.nn.softmax(
            jnp.einsum("bntd,bnsd->bnts", qh * self.hd**-0.5, kh, preferred_element_type=jnp.float32), -1
        ).astype(vh.dtype)
        out = jnp.einsum("bnts,bnsd->bntd", attn, vh).transpose(0, 2, 1, 3).reshape(B, -1, self.nh * self.hd)
        return self.o(p["o"], out, ctx)


class _TwoWayBlock(Module):
    """Self-attn on tokens, token->image cross, MLP, image->token cross."""

    def __init__(self, dim, num_heads, mlp_dim, skip_first_pe=False):
        super().__init__()
        self.skip_first_pe = skip_first_pe
        self.self_attn = _CrossAttn(dim, num_heads, downsample=1)
        self.norm1 = LayerNorm(dim)
        self.cross_t2i = _CrossAttn(dim, num_heads)
        self.norm2 = LayerNorm(dim)
        self.mlp = _MLP(dim, mlp_dim, act="relu")  # TwoWayTransformer default is ReLU
        self.norm3 = LayerNorm(dim)
        self.cross_i2t = _CrossAttn(dim, num_heads)
        self.norm4 = LayerNorm(dim)

    def __call__(self, p, tokens, token_pe, img, img_pe, ctx):
        if self.skip_first_pe:
            # reference REPLACES queries on the first layer (no residual,
            # transformer.py:198-199)
            tokens = self.self_attn(p["self_attn"], tokens, tokens, tokens, ctx)
        else:
            q = tokens + token_pe
            tokens = tokens + self.self_attn(p["self_attn"], q, q, tokens, ctx)
        tokens = self.norm1(p["norm1"], tokens, ctx)
        tokens = self.norm2(
            p["norm2"], tokens + self.cross_t2i(p["cross_t2i"], tokens + token_pe, img + img_pe, img, ctx), ctx
        )
        tokens = self.norm3(p["norm3"], tokens + self.mlp(p["mlp"], tokens, ctx), ctx)
        img = self.norm4(p["norm4"], img + self.cross_i2t(p["cross_i2t"], img + img_pe, tokens + token_pe, tokens, ctx), ctx)
        return tokens, img


class _HyperMLP(Module):
    def __init__(self, c1, ch, c2, n=3):
        super().__init__()
        dims = [c1] + [ch] * (n - 1) + [c2]
        self.layers = ModuleList([Linear(dims[i], dims[i + 1]) for i in range(n)])

    def __call__(self, p, x, ctx):
        for i, l in enumerate(self.layers):
            x = l(p["layers"][str(i)], x, ctx)
            if i < len(self.layers) - 1:
                x = jax.nn.relu(x)
        return x


class MaskDecoder(Module):
    """Two-way transformer decoder with multimask output + IoU head
    (reference decoders.py MaskDecoder)."""

    def __init__(self, dim=256, num_heads=8, depth=2, num_multimask=3):
        super().__init__()
        self.dim = dim
        self.num_masks = num_multimask + 1
        self.blocks = ModuleList([_TwoWayBlock(dim, num_heads, 2048, skip_first_pe=i == 0) for i in range(depth)])
        self.final_t2i = _CrossAttn(dim, num_heads)
        self.final_norm = LayerNorm(dim)
        # 4x upscaler: two stride-2 transposed convs (kernels in init)
        self.ups_ln = LayerNorm(dim // 4, eps=1e-6)  # LayerNorm2d eps
        self.hyper = ModuleList([_HyperMLP(dim, dim, dim // 8) for _ in range(self.num_masks)])
        self.iou_head = _HyperMLP(dim, 256, self.num_masks)

    def init(self, key) -> Params:
        p = super().init(key)
        k1, k2, k3 = jax.random.split(key, 3)
        p["iou_token"] = trunc_normal(k1, (1, self.dim), std=0.02)
        p["mask_tokens"] = trunc_normal(k2, (self.num_masks, self.dim), std=0.02)
        # transposed-conv upscaler kernels (2x2 stride 2), HWOI->HWIO handled by conv_transpose
        p["upconv1"] = trunc_normal(k3, (2, 2, self.dim, self.dim // 4), std=0.02)
        p["upconv2"] = trunc_normal(jax.random.fold_in(k3, 1), (2, 2, self.dim // 4, self.dim // 8), std=0.02)
        p["upconv1_b"] = jnp.zeros((self.dim // 4,), jnp.float32)
        p["upconv2_b"] = jnp.zeros((self.dim // 8,), jnp.float32)
        return p

    def __call__(self, p, img_emb, img_pe, sparse_emb, dense_emb, ctx):
        """img_emb [B,h,w,D]; sparse [B,S,D]; dense [B,h,w,D] -> masks, iou."""
        B, h, w, D = img_emb.shape
        out_tokens = jnp.concatenate([p["iou_token"], p["mask_tokens"]], 0)  # [1+M, D]
        tokens = jnp.concatenate([jnp.broadcast_to(out_tokens[None], (B, *out_tokens.shape)), sparse_emb], 1)
        img = (img_emb + dense_emb).reshape(B, h * w, D)
        pe = jnp.broadcast_to(img_pe.reshape(1, h * w, D), (B, h * w, D))

        t_pe = tokens  # token PE = the initial tokens (reference point_embedding arg)
        for i, blk in enumerate(self.blocks):
            tokens, img = blk(p["blocks"][str(i)], tokens, t_pe, img, pe, ctx)
        tokens = self.final_norm(
            p["final_norm"], tokens + self.final_t2i(p["final_t2i"], tokens + t_pe, img + pe, img, ctx), ctx
        )
        iou_tok = tokens[:, 0]
        mask_toks = tokens[:, 1 : 1 + self.num_masks]

        # upscale image features 4x (two conv_transpose + GELU)
        src = img.reshape(B, h, w, D)
        up = jax.lax.conv_transpose(src, p["upconv1"].astype(src.dtype), (2, 2), "SAME",
                                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if "upconv1_b" in p:
            up = up + p["upconv1_b"].astype(up.dtype)
        up = _gelu(self.ups_ln(p["ups_ln"], up, ctx))
        up = jax.lax.conv_transpose(up, p["upconv2"].astype(up.dtype), (2, 2), "SAME",
                                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if "upconv2_b" in p:
            up = up + p["upconv2_b"].astype(up.dtype)
        up = _gelu(up)  # [B,4h,4w,D/8]

        hyper = jnp.stack(
            [self.hyper[i](p["hyper"][str(i)], mask_toks[:, i], ctx) for i in range(self.num_masks)], 1
        )  # [B,M,D/8]
        masks = jnp.einsum("bmc,bhwc->bmhw", hyper, up.astype(jnp.float32))
        iou = self.iou_head(p["iou_head"], iou_tok, ctx)
        return masks, iou


# ---------------------------------------------------------------------------
# SAM model + promptable predictor
# ---------------------------------------------------------------------------

class SAMModel(Module):
    """Encoder + prompt encoder + mask decoder (reference sam/model.py)."""

    def __init__(self, img_size=1024, encoder_dim=768, encoder_depth=12, encoder_heads=12,
                 window_size=14, global_idx=(2, 5, 8, 11), embed=256):
        super().__init__()
        self.img_size = img_size
        self.image_encoder = ImageEncoderViT(img_size, 16, encoder_dim, encoder_depth,
                                             encoder_heads, 4.0, window_size, global_idx, embed)
        self.prompt_encoder = PromptEncoder(embed, (img_size // 16, img_size // 16))
        self.mask_decoder = MaskDecoder(embed)

    def encode_image(self, p, x, ctx):
        return self.image_encoder(p["image_encoder"], x, ctx)

    def decode_prompts(self, p, img_emb, ctx, points=None, labels=None, boxes=None, masks=None):
        sparse, dense = self.prompt_encoder(
            p["prompt_encoder"], ctx, points=points, labels=labels, boxes=boxes, masks=masks,
            batch=img_emb.shape[0],
        )
        img_pe = self.prompt_encoder.dense_pe(p["prompt_encoder"])
        return self.mask_decoder(p["mask_decoder"], img_emb, img_pe, sparse, dense, ctx)

    def init_params(self, seed: int = 0) -> Params:
        self.finalize("sam")
        return self.init(jax.random.PRNGKey(seed))


def build_sam(variant: str = "vit_b_tiny", img_size: int = 1024) -> SAMModel:
    """SAM builder (reference sam/build.py): vit_b/l/h plus a tiny test
    variant. Weights import lands with the .pt converter."""
    cfgs = {
        "vit_b": dict(encoder_dim=768, encoder_depth=12, encoder_heads=12, global_idx=(2, 5, 8, 11)),
        "vit_l": dict(encoder_dim=1024, encoder_depth=24, encoder_heads=16, global_idx=(5, 11, 17, 23)),
        "vit_h": dict(encoder_dim=1280, encoder_depth=32, encoder_heads=16, global_idx=(7, 15, 23, 31)),
        "vit_b_tiny": dict(encoder_dim=96, encoder_depth=4, encoder_heads=4, global_idx=(1, 3), window_size=4),
    }
    if variant not in cfgs:
        raise KeyError(f"unknown SAM variant '{variant}' (choices: {list(cfgs)})")
    return SAMModel(img_size=img_size, **cfgs[variant])


class SAMPredictor:
    """Promptable predictor (reference models/sam/predict.py): encode the
    image once, then any number of point/box prompt sets reuse the embedding."""

    MAX_POINTS = 8  # static prompt-slot count (pad + mask, jit-stable)

    def __init__(self, model: Optional[SAMModel] = None, params: Optional[Params] = None,
                 variant: str = "vit_b_tiny", img_size: int = 1024, seed: int = 0):
        self.model = model or build_sam(variant, img_size)
        self.params = params if params is not None else self.model.init_params(seed)
        self._encode = jax.jit(lambda p, x: self.model.encode_image(p, x, Context(training=False)))
        self._decode = jax.jit(
            lambda p, emb, pts, lbl: self.model.decode_prompts(
                p, emb, Context(training=False), points=pts, labels=lbl
            )
        )
        self._decode_box = jax.jit(
            lambda p, emb, box: self.model.decode_prompts(p, emb, Context(training=False), boxes=box)
        )
        self._emb = None
        self._shape = None

    def set_image(self, image_bgr: np.ndarray):
        """Resize-pad to img_size, normalize, encode once."""
        import cv2

        s = self.model.img_size
        h0, w0 = image_bgr.shape[:2]
        r = s / max(h0, w0)
        nh, nw = round(h0 * r), round(w0 * r)
        im = cv2.resize(image_bgr, (nw, nh))[..., ::-1].astype(np.float32)
        im = (im - np.array([123.675, 116.28, 103.53])) / np.array([58.395, 57.12, 57.375])
        canvas = np.zeros((s, s, 3), np.float32)
        canvas[:nh, :nw] = im
        self._emb = self._encode(self.params, jnp.asarray(canvas)[None])
        self._shape = (h0, w0, r)
        return self

    def predict_points(self, points_xy: Sequence[Tuple[float, float]], labels: Sequence[int]):
        """Point prompts in ORIGINAL pixel coords; returns (masks [M,h0,w0] bool,
        iou [M]) ranked by predicted quality."""
        assert self._emb is not None, "call set_image first"
        h0, w0, r = self._shape
        s = self.model.img_size
        n = len(points_xy)
        assert n <= self.MAX_POINTS
        pts = np.zeros((1, self.MAX_POINTS, 2), np.float32)
        lbl = np.full((1, self.MAX_POINTS), -1, np.int32)
        for i, ((x, y), l) in enumerate(zip(points_xy, labels)):
            pts[0, i] = (x * r / s, y * r / s)
            lbl[0, i] = l
        masks, iou = self._decode(self.params, self._emb, jnp.asarray(pts), jnp.asarray(lbl))
        return self._postprocess(masks, iou)

    def predict_box(self, box_xyxy: Sequence[float]):
        h0, w0, r = self._shape
        s = self.model.img_size
        x1, y1, x2, y2 = box_xyxy
        box = np.array([[[x1 * r / s, y1 * r / s], [x2 * r / s, y2 * r / s]]], np.float32)
        masks, iou = self._decode_box(self.params, self._emb, jnp.asarray(box))
        return self._postprocess(masks, iou)

    def _postprocess(self, masks, iou):
        import cv2

        h0, w0, r = self._shape
        s = self.model.img_size
        m = np.asarray(masks[0])  # [M, s/4, s/4]
        order = np.argsort(-np.asarray(iou[0]))
        out = []
        for i in order:
            full = cv2.resize(m[i], (s, s), interpolation=cv2.INTER_LINEAR)
            nh, nw = round(h0 * r), round(w0 * r)
            out.append(cv2.resize(full[:nh, :nw], (w0, h0), interpolation=cv2.INTER_LINEAR) > 0)
        return np.stack(out), np.asarray(iou[0])[order]


class SAM:
    """User facade (reference models/sam/model.py SAM)."""

    def __init__(self, variant: str = "vit_b_tiny", img_size: int = 1024, seed: int = 0):
        self.predictor = SAMPredictor(variant=variant, img_size=img_size, seed=seed)

    def __call__(self, source, points=None, labels=None, bboxes=None):
        import cv2

        im = source if isinstance(source, np.ndarray) else cv2.imread(str(source))
        self.predictor.set_image(im)
        if points is not None:
            return self.predictor.predict_points(points, labels or [1] * len(points))
        if bboxes is not None:
            return self.predictor.predict_box(bboxes)
        raise ValueError("SAM needs points= or bboxes= prompts (everything-mode: use FastSAM)")


class FastSAM:
    """Everything-segmentation via the YOLO-Master seg model + prompt
    filtering (reference models/fastsam: a YOLO wrapper, not a ViT)."""

    def __init__(self, model: str = "yolo-master-seg", **kw):
        from .yolo import YOLO

        self.yolo = YOLO(model, **kw)

    def __call__(self, source, bboxes=None, points=None, conf=0.25, **kw):
        results = self.yolo.predict(source, conf=conf, **kw)
        if bboxes is None and points is None:
            return results
        # prompt filtering (reference FastSAMPrompt): keep detections whose
        # box contains the point / best-IoUs the prompt box
        for r in results:
            if r.boxes is None or len(r.boxes) == 0:
                continue
            keep = np.ones(len(r.boxes), bool)
            if points is not None:
                xyxy = r.boxes.xyxy
                keep = np.zeros(len(r.boxes), bool)
                for (px, py) in points:
                    inside = (xyxy[:, 0] <= px) & (px <= xyxy[:, 2]) & (xyxy[:, 1] <= py) & (py <= xyxy[:, 3])
                    keep |= inside
            if bboxes is not None:
                from ..utils.metrics import box_iou_np

                iou = box_iou_np(np.asarray([bboxes], np.float32), r.boxes.xyxy)
                best = iou[0].argmax()
                keep = np.zeros(len(r.boxes), bool)
                keep[best] = True
            r.filter(keep)
        return results
