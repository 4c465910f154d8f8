"""Open-vocabulary detection: YOLO-World / YOLOE heads + text alignment
(reference: ultralytics/nn/modules/head.py:836 WorldDetect, :973 YOLOEDetect,
nn/modules/block.py:758 ContrastiveHead, :784 BNContrastiveHead,
:1926 SAVPE, :1905 Residual; nn/text_model.py:22 TextModel family).

TPU-first recast: the class vocabulary lives as a ``txt_feats`` [K, embed]
leaf in the head's params — swapping vocabularies is pure param surgery
(one re-jit per vocabulary SIZE, none per vocabulary content), and exported
graphs carry their prompt set by construction. Region-text similarity is one
einsum against the (normalized) text bank; visual prompts aggregate masked
spatial features (SAVPE) into the same embedding space.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp

from .heads import Detect, _HeadOut
from .layers import BatchNorm, Conv, ConvSeq, DWConv, upsample_nearest
from .module import Context, Module, ModuleList, Params


def l2norm(x, axis=-1, eps=1e-12):
    return x * jax.lax.rsqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis, keepdims=True) + eps).astype(x.dtype)


class ContrastiveHead(Module):
    """Region-text similarity: l2-normalize both sides, scaled dot product
    (reference block.py:758; bias -10 keeps init cls loss consistent)."""

    def init(self, key) -> Params:
        return {
            "bias": jnp.full((1,), -10.0, jnp.float32),
            "logit_scale": jnp.full((), math.log(1 / 0.07), jnp.float32),
        }

    def __call__(self, p: Params, x, w, ctx: Context):
        """x [B,H,W,C] image embeddings; w [B,K,C] text embeddings -> [B,H,W,K]."""
        x = l2norm(x, -1)
        w = l2norm(w, -1)
        sim = jnp.einsum("bhwc,bkc->bhwk", x, w.astype(x.dtype))
        return sim * jnp.exp(p["logit_scale"]).astype(x.dtype) + p["bias"].astype(x.dtype)


class BNContrastiveHead(Module):
    """BatchNorm instead of image-side l2 normalization (reference
    block.py:784; logit_scale init -1.0 for stability)."""

    def __init__(self, embed: int):
        super().__init__()
        self.norm = BatchNorm(embed, eps=1e-5, momentum=0.1)

    def init(self, key) -> Params:
        p = super().init(key)
        p["bias"] = jnp.full((1,), -10.0, jnp.float32)
        p["logit_scale"] = jnp.full((), -1.0, jnp.float32)
        return p

    def __call__(self, p: Params, x, w, ctx: Context):
        x = self.norm(p["norm"], x, ctx)
        w = l2norm(w, -1)
        sim = jnp.einsum("bhwc,bkc->bhwk", x, w.astype(x.dtype))
        return sim * jnp.exp(p["logit_scale"]).astype(x.dtype) + p["bias"].astype(x.dtype)


class SwiGLUFFN(Module):
    """SwiGLU feed-forward (reference block.py SwiGLUFFN): w12 -> split,
    silu-gate, w3 projection."""

    def __init__(self, c: int, out: int, hidden_ratio: float = 2.0):
        super().__init__()
        from .layers import Linear

        h = int(c * hidden_ratio)
        self.w12 = Linear(c, 2 * h)
        self.w3 = Linear(h, out)

    def init(self, key) -> Params:
        p = super().init(key)
        # zero-init the out projection so the Residual wrapper starts as identity
        # (reference block.py:1916 Residual zero-init of m.w3)
        p["w3"]["w"] = jnp.zeros_like(p["w3"]["w"])
        p["w3"]["b"] = jnp.zeros_like(p["w3"]["b"])
        return p

    def __call__(self, p, x, ctx):
        a, b = jnp.split(self.w12(p["w12"], x, ctx), 2, -1)
        from .layers import silu

        return self.w3(p["w3"], silu(a) * b, ctx)


class SAVPE(Module):
    """Spatial-Aware Visual Prompt Embeddings (reference block.py:1926):
    binary prompt masks [B,Q,H,W] at the P3 grid attend over fused multi-scale
    features to produce [B,Q,embed] prompt embeddings."""

    def __init__(self, ch: Sequence[int], c3: int, embed: int):
        super().__init__()
        self.c = 16
        self.embed = embed
        self.cv1 = ModuleList([ConvSeq(Conv(x, c3, 3), Conv(c3, c3, 3)) for x in ch])
        self.cv2 = ModuleList([Conv(x, c3, 1) for x in ch])
        self.cv3 = _HeadOut(3 * c3, embed)
        self.cv4 = _HeadOut(3 * c3, self.c, k=3)
        self.cv5 = _HeadOut(1, self.c, k=3)
        self.cv6 = ConvSeq(Conv(2 * self.c, self.c, 3), _HeadOut(self.c, self.c, k=3))

    def __call__(self, p: Params, feats: List[jnp.ndarray], vp: jnp.ndarray, ctx: Context):
        """feats: [P3,P4,P5] NHWC; vp: [B,Q,H,W] binary masks at P3 res."""
        ups = [1, 2, 4]
        ys, xs = [], []
        for i in range(len(feats)):
            y = self.cv2[i](p["cv2"][str(i)], feats[i], ctx)
            x = self.cv1[i](p["cv1"][str(i)], feats[i], ctx)
            if ups[i] > 1:
                y = upsample_nearest(y, ups[i])
                x = upsample_nearest(x, ups[i])
            ys.append(y)
            xs.append(x)
        y = self.cv4(p["cv4"], jnp.concatenate(ys, -1), ctx)  # [B,H,W,c]
        x = self.cv3(p["cv3"], jnp.concatenate(xs, -1), ctx)  # [B,H,W,embed]

        B, H, W, C = x.shape
        Q = vp.shape[1]
        vpf = vp.reshape(B, Q, H * W, 1).astype(jnp.float32)
        ye = jnp.broadcast_to(y[:, None], (B, Q, H, W, self.c)).reshape(B * Q, H, W, self.c)
        vpe = self.cv5(p["cv5"], vp.reshape(B * Q, H, W, 1).astype(ye.dtype), ctx)
        score_feat = self.cv6(p["cv6"], jnp.concatenate([ye, vpe], -1), ctx)  # [BQ,H,W,c]
        score_feat = score_feat.reshape(B, Q, H * W, self.c).astype(jnp.float32)
        score = jnp.where(vpf > 0, score_feat, jnp.finfo(jnp.float32).min)
        score = jax.nn.softmax(score, axis=2)  # over spatial, masked to the prompt
        xg = x.reshape(B, H * W, self.c, C // self.c).astype(jnp.float32)
        agg = jnp.einsum("bqsc,bscd->bqcd", score, xg).reshape(B, Q, C)
        return l2norm(agg, -1)


class WorldDetect(Detect):
    """Text-conditioned detection head (reference head.py:836): the class
    branch produces embed-dim region features scored against the text bank by
    a contrastive head. The vocabulary is the params leaf ``txt_feats``."""

    contrastive_cls = ContrastiveHead

    def __init__(self, nc: int = 80, embed: int = 512, with_bn: bool = False,
                 reg_max: int = 16, end2end: bool = False, ch: Sequence[int] = (), legacy: bool = False):
        super().__init__(nc, reg_max=reg_max, end2end=end2end, ch=ch, legacy=legacy)
        self.embed = embed
        c3 = max(ch[0], min(nc, 100))
        if legacy:
            self.cv3 = ModuleList([ConvSeq(Conv(x, c3, 3), Conv(c3, c3, 3), _HeadOut(c3, embed)) for x in ch])
        else:
            self.cv3 = ModuleList(
                [
                    ConvSeq(
                        ConvSeq(DWConv(x, x, 3), Conv(x, c3, 1)),
                        ConvSeq(DWConv(c3, c3, 3), Conv(c3, c3, 1)),
                        _HeadOut(c3, embed),
                    )
                    for x in ch
                ]
            )
        head_cls = BNContrastiveHead if with_bn else ContrastiveHead
        self.cv4 = ModuleList([head_cls(embed) if with_bn else head_cls() for _ in ch])
        if end2end:
            self.one2one_cv3 = ModuleList(
                [ConvSeq(Conv(x, c3, 3), Conv(c3, c3, 3), _HeadOut(c3, embed)) for x in ch]
            )
            self.one2one_cv4 = ModuleList([head_cls(embed) if with_bn else head_cls() for _ in ch])

    def init(self, key) -> Params:
        p = super().init(key)
        # initial vocabulary: random normalized embeddings for nc classes —
        # replaced by set_classes() with real text embeddings
        p["txt_feats"] = l2norm(jax.random.normal(jax.random.PRNGKey(3), (self.nc, self.embed)), -1)
        return p

    def bias_init(self, p: Params) -> Params:
        # box branch bias only (cls is contrastive-scored; reference
        # WorldDetect.bias_init sets only cv2)
        strides = self.strides or (8, 16, 32)
        for branch in ("cv2", "one2one_cv2"):
            if branch not in p:
                continue
            for i, _ in enumerate(strides[: self.nl]):
                leaf = p[branch][str(i)]
                last = leaf[str(len(leaf) - 1)]
                last["b"] = jnp.full_like(last["b"], 1.0)
        return p

    def text_feats(self, p: Params, ctx: Context, batch: int) -> jnp.ndarray:
        """[B, K, embed] text bank (ctx.text_feats overrides the stored one)."""
        txt = getattr(ctx, "text_feats", None)
        if txt is None:
            txt = p["txt_feats"]
        if txt.ndim == 2:
            txt = jnp.broadcast_to(txt[None], (batch, *txt.shape))
        return txt

    def _forward_branch(self, p: Params, feats: List[jnp.ndarray], cv2_name: str, cv3_name: str, ctx: Context):
        b = feats[0].shape[0]
        txt = self.text_feats(p, ctx, b)
        cv4_name = "one2one_cv4" if cv3_name.startswith("one2one") else "cv4"
        cv2 = getattr(self, cv2_name)
        cv3 = getattr(self, cv3_name)
        cv4 = getattr(self, cv4_name)
        boxes, scores = [], []
        for i in range(self.nl):
            bx = cv2[i](p[cv2_name][str(i)], feats[i], ctx).reshape(b, -1, 4 * self.reg_max)
            emb = cv3[i](p[cv3_name][str(i)], feats[i], ctx)
            sc = cv4[i](p[cv4_name][str(i)], emb, txt, ctx)  # [B,H,W,K]
            scores.append(sc.reshape(b, -1, sc.shape[-1]))
            boxes.append(bx)
        return jnp.concatenate(boxes, 1), jnp.concatenate(scores, 1)


class YOLOEDetect(WorldDetect):
    """YOLOE head (reference head.py:973): BN contrastive scoring, a SwiGLU
    residual adapter on text prompts (reprta), and SAVPE visual prompts."""

    def __init__(self, nc: int = 80, embed: int = 512, with_bn: bool = True,
                 reg_max: int = 16, end2end: bool = False, ch: Sequence[int] = (), legacy: bool = False):
        super().__init__(nc, embed, True, reg_max, end2end, ch, legacy)
        c3 = max(ch[0], min(nc, 100))
        self.reprta = SwiGLUFFN(embed, embed)
        self.savpe = SAVPE(ch, c3, embed)

    def get_tpe(self, p: Params, tpe, ctx: Context):
        """Adapted+normalized text prompt embeddings (residual SwiGLU)."""
        return l2norm(tpe + self.reprta(p["reprta"], tpe, ctx), -1)

    def get_vpe(self, p: Params, feats, vp, ctx: Context):
        """Visual prompt embeddings from [B,Q,H,W] masks at P3 resolution."""
        return self.savpe(p["savpe"], feats, vp, ctx)

    def text_feats(self, p: Params, ctx: Context, batch: int) -> jnp.ndarray:
        txt = getattr(ctx, "text_feats", None)
        if txt is None:
            txt = p["txt_feats"]
        if txt.ndim == 2:
            txt = jnp.broadcast_to(txt[None], (batch, *txt.shape))
        return self.get_tpe(p, txt, ctx)
