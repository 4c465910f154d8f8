"""RT-DETR: real-time detection transformer (reference: ultralytics/models/
rtdetr/ + nn/modules/head.py:1419 RTDETRDecoder + models/utils/{ops,loss}.py).

TPU-native build of the decoder head + training stack:
  * multi-scale features -> 1x1 input projections -> flattened token memory
  * two-stage query selection: encoder score head picks top-nq anchors, whose
    encoded features + anchor boxes initialize the decoder queries
  * ndl multi-scale deformable-attention decoder layers (head-batched
    bilinear gathers over every level, grid_sample align_corners=False
    semantics) with iterative box refinement — weight-import parity with the
    torch reference decoder (tests/test_rtdetr_parity.py)
  * bipartite matching fully in-graph: focal+L1+GIoU cost matrix + greedy
    conflict-free assignment (the axon PJRT runtime has no host callbacks, so
    scipy Hungarian cannot live in the step; with nq >> #GT greedy is
    near-optimal — gap gated by tests vs scipy); DETR loss (VFL-style focal
    cls + L1 + GIoU) per decoder layer + encoder proposals
  * contrastive denoising (get_cdn_group): noised GT queries with group-
    isolation attention masking, built in-graph from the stashed ctx.gt batch
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.layers import BatchNorm, Conv, ConvSeq, LayerNorm, Linear, PlainConv, TorchMHA, silu
from ..nn.module import Context, Module, ModuleList, Params
from ..nn.mot import bilinear_sample
from ..ops.boxes import bbox_iou, xywh2xyxy


def inverse_sigmoid(x, eps=1e-5):
    x = jnp.clip(x, eps, 1 - eps)
    return jnp.log(x / (1 - x))


class MLP(Module):
    """n-layer ReLU MLP (reference nn/modules/transformer.py MLP)."""

    def __init__(self, c1, ch, c2, num_layers=3):
        super().__init__()
        dims = [c1] + [ch] * (num_layers - 1) + [c2]
        self.layers = ModuleList([Linear(dims[i], dims[i + 1]) for i in range(num_layers)])

    def __call__(self, p, x, ctx):
        for i, layer in enumerate(self.layers):
            x = layer(p["layers"][str(i)], x, ctx)
            if i < len(self.layers) - 1:
                x = jax.nn.relu(x)
        return x


class MSDeformAttn(Module):
    """Multi-scale deformable attention (reference transformer.py:462
    MSDeformAttn + utils.py:150 multi_scale_deformable_attn_pytorch), recast
    as head-batched bilinear gathers: one explicit gather per level with the
    heads folded into the batch axis, instead of grid_sample over a
    [bs*heads, C, H, W] view. Param names (sampling_offsets /
    attention_weights / value_proj / output_proj) mirror the torch module so
    reference checkpoints import mechanically."""

    def __init__(self, d_model=256, n_levels=3, n_heads=8, n_points=4):
        super().__init__()
        self.d, self.nl, self.nh, self.npt = d_model, n_levels, n_heads, n_points
        self.hd = d_model // n_heads
        self.sampling_offsets = Linear(d_model, n_heads * n_levels * n_points * 2)
        self.attention_weights = Linear(d_model, n_heads * n_levels * n_points)
        self.value_proj = Linear(d_model, d_model)
        self.output_proj = Linear(d_model, d_model)

    def init(self, key) -> Params:
        p = super().init(key)
        # reference _reset_parameters (transformer.py:513): zero offset
        # weights with a directional ring bias (head h points at angle
        # 2*pi*h/nh, point i at radius i+1); zero attention weights
        p["sampling_offsets"]["w"] = jnp.zeros_like(p["sampling_offsets"]["w"])
        thetas = jnp.arange(self.nh, dtype=jnp.float32) * (2.0 * math.pi / self.nh)
        grid = jnp.stack([jnp.cos(thetas), jnp.sin(thetas)], -1)  # [nh, 2]
        grid = grid / jnp.max(jnp.abs(grid), -1, keepdims=True)
        grid = jnp.tile(grid[:, None, None, :], (1, self.nl, self.npt, 1))
        grid = grid * (jnp.arange(self.npt, dtype=jnp.float32) + 1.0)[None, None, :, None]
        p["sampling_offsets"]["b"] = grid.reshape(-1)
        p["attention_weights"]["w"] = jnp.zeros_like(p["attention_weights"]["w"])
        p["attention_weights"]["b"] = jnp.zeros_like(p["attention_weights"]["b"])
        p["value_proj"]["b"] = jnp.zeros_like(p["value_proj"]["b"])
        p["output_proj"]["b"] = jnp.zeros_like(p["output_proj"]["b"])
        return p

    def __call__(self, p, query, refer_bbox, value_maps, ctx):
        """query [B,nq,D]; refer_bbox [B,nq,4] normalized xywh (the 4-coord
        reference path: offsets scale with the box wh); value_maps: list of
        [B,Hl,Wl,D] per-level maps."""
        B, nq, D = query.shape
        qf = query.astype(jnp.float32)
        off = self.sampling_offsets(p["sampling_offsets"], qf, ctx).reshape(B, nq, self.nh, self.nl * self.npt, 2)
        aw = self.attention_weights(p["attention_weights"], qf, ctx).reshape(B, nq, self.nh, self.nl * self.npt)
        aw = jax.nn.softmax(aw, -1)  # joint softmax over (levels x points)
        rb = refer_bbox.astype(jnp.float32)[:, :, None, None, :]  # [B,nq,1,1,4]
        # sampling_locations = ref_xy + off / n_points * ref_wh * 0.5
        loc = rb[..., :2] + off / self.npt * rb[..., 2:] * 0.5  # [B,nq,nh,nl*npt,2]

        samples = []
        for lvl, vm in enumerate(value_maps):
            H, W = vm.shape[1:3]
            v = self.value_proj(p["value_proj"], vm, ctx)  # [B,H,W,D]
            # heads -> batch: [B*nh, H, W, hd]
            vh = v.reshape(B, H, W, self.nh, self.hd).transpose(0, 3, 1, 2, 4).reshape(B * self.nh, H, W, self.hd)
            ll = loc[:, :, :, lvl * self.npt : (lvl + 1) * self.npt]  # [B,nq,nh,npt,2]
            # grid_sample(align_corners=False) pixel mapping: x = loc*W - 0.5
            sx = (ll[..., 0] * W - 0.5).transpose(0, 2, 1, 3).reshape(B * self.nh, nq, self.npt)
            sy = (ll[..., 1] * H - 0.5).transpose(0, 2, 1, 3).reshape(B * self.nh, nq, self.npt)
            s = bilinear_sample(vh, sx, sy)  # [B*nh, nq, npt, hd] zero-padded
            samples.append(s.reshape(B, self.nh, nq, self.npt, self.hd).transpose(0, 2, 1, 3, 4))
        sampled = jnp.concatenate(samples, 3)  # [B, nq, nh, nl*npt, hd]
        out = jnp.sum(sampled.astype(jnp.float32) * aw[..., None], 3)  # [B,nq,nh,hd]
        return self.output_proj(p["output_proj"], out.reshape(B, nq, D).astype(query.dtype), ctx)


class DeformableDecoderLayer(Module):
    """Self-attention + multi-scale deformable cross-attention + ReLU FFN
    (reference transformer.py:588 DeformableTransformerDecoderLayer,
    post-norm residuals; dropout=0 in the reference config)."""

    def __init__(self, d_model=256, n_heads=8, d_ffn=1024, n_levels=3, n_points=4):
        super().__init__()
        self.self_attn = TorchMHA(d_model, n_heads)
        self.norm1 = LayerNorm(d_model)
        self.cross_attn = MSDeformAttn(d_model, n_levels, n_heads, n_points)
        self.norm2 = LayerNorm(d_model)
        self.linear1 = Linear(d_model, d_ffn)
        self.linear2 = Linear(d_ffn, d_model)
        self.norm3 = LayerNorm(d_model)

    def __call__(self, p, embed, refer_bbox, value_maps, qpos, ctx, attn_mask=None):
        """embed [B,nq,D]; refer_bbox [B,nq,4] normalized xywh sigmoid-space;
        qpos [B,nq,D]; attn_mask [nq,nq] additive fp32 (CDN group isolation)."""
        q = embed + qpos
        sa = self.self_attn(p["self_attn"], q, q, embed, ctx, mask=attn_mask)
        embed = self.norm1(p["norm1"], embed + sa, ctx)
        ca = self.cross_attn(p["cross_attn"], embed + qpos, refer_bbox, value_maps, ctx)
        embed = self.norm2(p["norm2"], embed + ca, ctx)
        ff = self.linear2(p["linear2"], jax.nn.relu(self.linear1(p["linear1"], embed, ctx)), ctx)
        return self.norm3(p["norm3"], embed + ff, ctx)


class _DeformableDecoder(Module):
    """Container matching the torch ``decoder.layers.{i}`` key prefix
    (reference transformer.py:715 DeformableTransformerDecoder); the refine
    loop itself lives in RTDETRDecoder.__call__."""

    def __init__(self, layers):
        super().__init__()
        self.layers = ModuleList(layers)


class RTDETRDecoder(Module):
    """RT-DETR decoder head over [P3, P4, P5] features (reference
    head.py:1419). Structure, math and param naming mirror the torch module
    exactly (verified by weight-import parity, tests/test_rtdetr_parity.py):
    BN input projections, inf-masked logit-space anchor proposals, two-stage
    top-nq query selection, and ndl multi-scale deformable refine layers with
    the reference's look-forward-twice box recording in training."""

    def __init__(self, nc=80, ch=(256, 512, 1024), hd=256, nq=300, ndp=4, nh=8, ndl=6, d_ffn=1024):
        super().__init__()
        self.nc, self.nq, self.ndl, self.hd = nc, nq, ndl, hd
        self.nl = len(ch)
        self.input_proj = ModuleList([ConvSeq(PlainConv(c, hd, 1, bias=False), BatchNorm(hd)) for c in ch])
        self.decoder = _DeformableDecoder([DeformableDecoderLayer(hd, nh, d_ffn, self.nl, ndp) for _ in range(ndl)])
        self.query_pos_head = MLP(4, 2 * hd, hd, 2)
        self.enc_output = ConvSeq(Linear(hd, hd), LayerNorm(hd))
        self.enc_score_head = Linear(hd, nc)
        self.enc_bbox_head = MLP(hd, hd, 4, 3)
        self.dec_score_head = ModuleList([Linear(hd, nc) for _ in range(ndl)])
        self.dec_bbox_head = ModuleList([MLP(hd, hd, 4, 3) for _ in range(ndl)])
        self.strides = (8, 16, 32)

    def set_strides(self, strides):
        self.strides = tuple(strides)

    def init(self, key) -> Params:
        p = super().init(key)
        # reference _reset_parameters (head.py:1738): focal prior scaled by
        # nc/80 on the score heads; zeroed last bbox-MLP layers
        bias = float(-math.log((1 - 0.01) / 0.01)) / 80 * self.nc
        p["enc_score_head"]["b"] = jnp.full_like(p["enc_score_head"]["b"], bias)
        last = str(2)  # 3-layer bbox MLPs
        p["enc_bbox_head"]["layers"][last]["w"] = jnp.zeros_like(p["enc_bbox_head"]["layers"][last]["w"])
        p["enc_bbox_head"]["layers"][last]["b"] = jnp.zeros_like(p["enc_bbox_head"]["layers"][last]["b"])
        for i in range(self.ndl):
            p["dec_score_head"][str(i)]["b"] = jnp.full_like(p["dec_score_head"][str(i)]["b"], bias)
            bb = p["dec_bbox_head"][str(i)]["layers"][last]
            bb["w"] = jnp.zeros_like(bb["w"])
            bb["b"] = jnp.zeros_like(bb["b"])
        # class embedding for contrastive-denoising queries (reference
        # denoising_class_embed, nn.Embedding(nc, hd); padded dn slots carry
        # class 0 and are masked out of the loss)
        from ..nn.module import trunc_normal

        p["denoising_class_embed"] = {"weight": trunc_normal(jax.random.PRNGKey(11), (self.nc, self.hd), std=0.02)}
        return p

    def _anchors(self, shapes, grid_size=0.05, eps=1e-2):
        """Logit-space anchor proposals + validity mask (reference
        _generate_anchors, head.py:1614): per-level wh = grid_size * 2^i,
        anchors outside (eps, 1-eps) masked to +inf."""
        anchors = []
        for i, (h, w) in enumerate(shapes):
            gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32), indexing="ij")
            xy = jnp.stack([(gx + 0.5) / w, (gy + 0.5) / h], -1).reshape(-1, 2)
            wh = jnp.full((h * w, 2), grid_size * 2.0**i, jnp.float32)
            anchors.append(jnp.concatenate([xy, wh], -1))
        a = jnp.concatenate(anchors, 0)  # [T, 4] normalized xywh
        valid = jnp.all((a > eps) & (a < 1 - eps), -1, keepdims=True)  # [T,1]
        a = jnp.log(a / (1 - a))
        return jnp.where(valid, a, jnp.inf), valid.astype(jnp.float32)

    def __call__(self, p, feats: List[jnp.ndarray], ctx: Context, dn: Optional[dict] = None):
        """dn (training only): contrastive-denoising group — dict with
        cls [B,nd] int, boxes [B,nd,4] normalized xywh, attn_mask [nd+nq,nd+nq]
        additive (reference models/utils/ops.py:187 get_cdn_group)."""
        B = feats[0].shape[0]
        shapes = [(f.shape[1], f.shape[2]) for f in feats]
        tokens, proj_maps = [], []
        for i, f in enumerate(feats):
            t = self.input_proj[i](p["input_proj"][str(i)], f, ctx)
            proj_maps.append(t)
            tokens.append(t.reshape(B, -1, self.hd))
        memory = jnp.concatenate(tokens, 1)  # [B, T, D]

        anchors, valid = self._anchors(shapes)  # [T,4] logit-space, [T,1]
        enc_feat = self.enc_output(p["enc_output"], memory * valid[None].astype(memory.dtype), ctx)
        enc_scores_all = self.enc_score_head(p["enc_score_head"], enc_feat, ctx)  # [B,T,nc]

        # two-stage top-nq query selection by encoder confidence (clamped to
        # the token count for tiny eval inputs, like the reference's export k)
        conf = jnp.max(enc_scores_all.astype(jnp.float32), -1)
        nq = min(self.nq, conf.shape[1])
        _, top_idx = jax.lax.top_k(conf, nq)  # [B,nq]
        top_feat = jnp.take_along_axis(enc_feat, top_idx[..., None], 1)  # [B,nq,D]
        top_anchor = anchors[top_idx]  # [B,nq,4]
        # dynamic anchors + static content (logit space)
        ref_logit = (
            self.enc_bbox_head(p["enc_bbox_head"], top_feat, ctx).astype(jnp.float32) + top_anchor
        )
        enc_boxes = jax.nn.sigmoid(ref_logit)  # [B,nq,4]
        enc_scores = jnp.take_along_axis(enc_scores_all, top_idx[..., None], 1)  # [B,nq,nc]
        q = top_feat
        if ctx.training:
            ref_logit = jax.lax.stop_gradient(ref_logit)
            q = jax.lax.stop_gradient(q)

        nd = 0
        attn_mask = None
        dn_meta = None
        if dn is None and ctx.training and ctx.gt is not None:
            # contrastive denoising group from the stashed GT batch
            # (reference models/utils/ops.py:187; key derives from the step so
            # every data shard draws identical noise)
            key = jax.random.fold_in(jax.random.PRNGKey(777), jnp.asarray(ctx.step, jnp.uint32))
            s0 = self.strides[0]
            imgsz = (shapes[0][0] * s0, shapes[0][1] * s0)
            dn = get_cdn_group(ctx.gt["boxes"], ctx.gt["classes"], ctx.gt["mask"],
                               self.nc, nq, imgsz, key)
            dn_meta = dn
        if dn is not None:
            nd = dn["cls"].shape[1]
            dn_embed = p["denoising_class_embed"]["weight"][dn["cls"]].astype(q.dtype)  # [B,nd,hd]
            q = jnp.concatenate([dn_embed, q], 1)
            ref_logit = jnp.concatenate(
                [inverse_sigmoid(dn["boxes"].astype(jnp.float32), eps=1e-6), ref_logit], 1
            )
            attn_mask = dn["attn_mask"]

        # refine loop (reference DeformableTransformerDecoder.forward,
        # transformer.py:746): training records every layer with the
        # look-forward-twice box chain; eval computes only the last layer
        ref_boxes = jax.nn.sigmoid(ref_logit)
        dec_scores, dec_boxes = [], []
        last_refined = None
        layers = self.decoder.layers
        for i, layer in enumerate(layers):
            qpos = self.query_pos_head(p["query_pos_head"], ref_boxes.astype(q.dtype), ctx)
            q = layer(p["decoder"]["layers"][str(i)], q, ref_boxes, proj_maps, qpos, ctx, attn_mask=attn_mask)
            delta = self.dec_bbox_head[i](p["dec_bbox_head"][str(i)], q, ctx).astype(jnp.float32)
            refined = jax.nn.sigmoid(delta + inverse_sigmoid(ref_boxes))
            if ctx.training:
                dec_scores.append(self.dec_score_head[i](p["dec_score_head"][str(i)], q, ctx))
                if i == 0:
                    dec_boxes.append(refined)
                else:
                    dec_boxes.append(jax.nn.sigmoid(delta + inverse_sigmoid(last_refined)))
                last_refined = refined
                ref_boxes = jax.lax.stop_gradient(refined)
            elif i == len(layers) - 1:
                dec_scores.append(self.dec_score_head[i](p["dec_score_head"][str(i)], q, ctx))
                dec_boxes.append(refined)
            else:
                ref_boxes = refined

        all_boxes = jnp.stack(dec_boxes)  # [ndl|1, B, nd+nq, 4] normalized xywh
        all_scores = jnp.stack(dec_scores)  # [ndl|1, B, nd+nq, nc]
        out = {
            "dec_boxes": all_boxes[:, :, nd:],
            "dec_scores": all_scores[:, :, nd:],
            "enc_boxes": enc_boxes,
            "enc_scores": enc_scores,
            "hw_shapes": tuple(shapes),
        }
        if nd:
            out["dn_boxes"] = all_boxes[:, :, :nd]
            out["dn_scores"] = all_scores[:, :, :nd]
            if dn_meta is not None:
                out["dn_pos_mask"] = dn_meta["pos_mask"]
                out["dn_group_gt"] = dn_meta["group_gt"]
        return out

    def decode(self, preds, imgsz: Tuple[int, int]) -> jnp.ndarray:
        """Final-layer predictions as [B, nq, 4+nc] (xywh px + sigmoid scores)."""
        boxes = preds["dec_boxes"][-1] * jnp.array([imgsz[1], imgsz[0], imgsz[1], imgsz[0]], jnp.float32)
        scores = jax.nn.sigmoid(preds["dec_scores"][-1].astype(jnp.float32))
        return jnp.concatenate([boxes, scores], -1)


# ---------------------------------------------------------------------------
# Hungarian matching + DETR loss (reference models/utils/ops.py:15 + loss.py)
# ---------------------------------------------------------------------------

def hungarian_match(pred_boxes: np.ndarray, pred_scores: np.ndarray, gt_boxes: np.ndarray,
                    gt_cls: np.ndarray, cost_class: float = 2.0, cost_bbox: float = 5.0,
                    cost_giou: float = 2.0, alpha: float = 0.25, gamma: float = 2.0):
    """One image: focal-cost bipartite assignment (reference HungarianMatcher).

    pred_boxes [nq,4] normalized xywh; pred_scores [nq,nc] logits;
    gt_boxes [m,4] normalized xywh; gt_cls [m] int. Returns (pred_idx, gt_idx).
    """
    from scipy.optimize import linear_sum_assignment

    m = len(gt_boxes)
    if m == 0:
        return np.zeros(0, int), np.zeros(0, int)
    prob = 1 / (1 + np.exp(-pred_scores))  # [nq,nc]
    pc = prob[:, gt_cls.astype(int)]  # [nq,m]
    neg = (1 - alpha) * pc**gamma * (-np.log(1 - pc + 1e-8))
    pos = alpha * (1 - pc) ** gamma * (-np.log(pc + 1e-8))
    c_cls = pos - neg
    c_l1 = np.abs(pred_boxes[:, None] - gt_boxes[None]).sum(-1)
    pb = np.asarray(xywh2xyxy(jnp.asarray(pred_boxes)))
    gb = np.asarray(xywh2xyxy(jnp.asarray(gt_boxes)))
    giou = np.asarray(bbox_iou(jnp.asarray(pb)[:, None], jnp.asarray(gb)[None], xywh=False, GIoU=True))
    cost = cost_class * c_cls + cost_bbox * c_l1 + cost_giou * (1 - giou)
    cost = np.nan_to_num(cost, nan=1e6, posinf=1e6, neginf=-1e6)
    pi, gi = linear_sum_assignment(cost)
    return pi, gi


def detr_loss_single(pred_boxes, pred_scores, gt_boxes, gt_cls, pred_idx, gt_idx, nc,
                     cls_gain=1.0, l1_gain=5.0, giou_gain=2.0):
    """Per-image DETR loss given a fixed assignment (jnp; gradients flow).
    Focal-style VFL classification over all queries + L1/GIoU on matched."""
    nq = pred_boxes.shape[0]
    target_cls = jnp.full((nq,), nc, jnp.int32)
    target_cls = target_cls.at[pred_idx].set(gt_cls[gt_idx].astype(jnp.int32)) if len(pred_idx) else target_cls
    onehot = jax.nn.one_hot(target_cls, nc + 1)[:, :nc]
    prob = jax.nn.sigmoid(pred_scores.astype(jnp.float32))
    # focal BCE
    bce = -(onehot * jnp.log(prob + 1e-8) + (1 - onehot) * jnp.log(1 - prob + 1e-8))
    focal = jnp.where(onehot > 0, 0.25 * (1 - prob) ** 2, 0.75 * prob**2) * bce
    loss_cls = jnp.sum(focal) / max(len(pred_idx), 1)
    if len(pred_idx):
        pb = pred_boxes[pred_idx]
        gb = gt_boxes[gt_idx]
        loss_l1 = jnp.mean(jnp.abs(pb - gb)) * 4
        giou = bbox_iou(xywh2xyxy(pb), xywh2xyxy(gb), xywh=False, GIoU=True)
        loss_giou = jnp.mean(1 - giou)
    else:
        loss_l1 = loss_giou = jnp.zeros(())
    return cls_gain * loss_cls + l1_gain * loss_l1 + giou_gain * loss_giou


# ---------------------------------------------------------------------------
# Contrastive denoising (reference models/utils/ops.py:187 get_cdn_group):
# noised copies of the GT prepended as extra decoder queries, isolated from
# the real queries (and from other denoising groups) by an attention mask.
# Static shapes: groups are sized by max_gt, padded slots carry class 0
# and are masked out of the loss via pos_mask.
# ---------------------------------------------------------------------------

def get_cdn_group(gt_boxes, gt_cls, gt_mask, nc: int, nq: int, imgsz, key,
                  num_dn: int = 100, cls_noise_ratio: float = 0.5, box_noise_scale: float = 1.0):
    """Build the CDN query group.

    Args:
        gt_boxes: [B, m, 4] xyxy PIXELS (the batch contract).
        gt_cls: [B, m] int; gt_mask: [B, m] bool.
        imgsz: (H, W) for normalization.
        key: jax PRNG key.

    Returns dict(cls [B,nd], boxes [B,nd,4] normalized xywh,
    attn_mask [nd+nq, nd+nq] additive fp32, pos_mask [B,nd] bool (positive
    slots with a real GT), group_gt [B,nd] int (GT slot index per dn slot)).
    """
    B, m = gt_cls.shape
    g = max(1, num_dn // max(2 * m, 1))  # pos+neg pairs per group
    nd = 2 * g * m
    H, W = imgsz
    scale = jnp.array([W, H, W, H], jnp.float32)

    # xyxy px -> normalized xywh
    xy = (gt_boxes[..., :2] + gt_boxes[..., 2:]) / 2
    wh = jnp.clip(gt_boxes[..., 2:] - gt_boxes[..., :2], 1e-3, None)
    nboxes = jnp.concatenate([xy, wh], -1) / scale  # [B,m,4]

    k1, k2, k3 = jax.random.split(key, 3)
    # tile to [B, 2g, m, .]: even groups positive, odd negative
    tiled = jnp.tile(nboxes[:, None], (1, 2 * g, 1, 1))
    cls_t = jnp.tile(gt_cls[:, None], (1, 2 * g, 1))
    mask_t = jnp.tile(gt_mask[:, None], (1, 2 * g, 1))
    is_neg = (jnp.arange(2 * g) % 2 == 1)[None, :, None]  # [1,2g,1]

    # box noise (reference: pos |noise| < wh/2 * scale, neg in (1,2) x wh/2)
    rand = jax.random.uniform(k1, tiled.shape, minval=-1.0, maxval=1.0)
    half = tiled[..., 2:] / 2
    shift = jnp.concatenate([half, half], -1) * box_noise_scale
    noise_pos = rand * shift
    sign = jnp.sign(jax.random.uniform(k2, tiled.shape) - 0.5)
    noise_neg = sign * (1.0 + jax.random.uniform(k2, tiled.shape)) * shift
    noised = tiled + jnp.where(is_neg[..., None], noise_neg, noise_pos)
    noised = jnp.clip(noised, 1e-4, 1.0 - 1e-4)

    # class noise: flip to a random class with p = cls_noise_ratio * 0.5
    flip = jax.random.uniform(k3, cls_t.shape) < (cls_noise_ratio * 0.5)
    rand_cls = jax.random.randint(jax.random.fold_in(k3, 1), cls_t.shape, 0, max(nc, 1))
    noised_cls = jnp.where(flip & mask_t, rand_cls, cls_t)
    # padded slots -> class 0 (the embedding has nc rows like the reference's
    # nn.Embedding(nc, hd); pads are excluded from the loss via pos_mask)
    noised_cls = jnp.where(mask_t, noised_cls, 0)

    dn_cls = noised_cls.reshape(B, nd)
    dn_boxes = noised.reshape(B, nd, 4)
    pos_mask = (mask_t & ~jnp.broadcast_to(is_neg, mask_t.shape)).reshape(B, nd)
    group_gt = jnp.tile(jnp.arange(m)[None, None], (B, 2 * g, 1)).reshape(B, nd)

    # attention mask: real queries never see dn; dn group i never sees group j
    neg_inf = jnp.float32(-1e9)
    total = nd + nq
    mask = jnp.zeros((total, total), jnp.float32)
    mask = mask.at[nd:, :nd].set(neg_inf)  # match -> dn blocked
    gid = jnp.arange(nd) // (2 * m)  # pos+neg pair of a group share visibility
    blocked = gid[:, None] != gid[None, :]
    mask = mask.at[:nd, :nd].set(jnp.where(blocked, neg_inf, 0.0))
    return {"cls": dn_cls, "boxes": dn_boxes, "attn_mask": mask,
            "pos_mask": pos_mask, "group_gt": group_gt}


# ---------------------------------------------------------------------------
# Batched static-shape DETR loss (+ in-jit Hungarian via pure_callback)
# ---------------------------------------------------------------------------

def match_cost_matrix(pred_boxes, pred_scores, gt_boxes, gt_cls,
                      cost_class: float = 2.0, cost_bbox: float = 5.0, cost_giou: float = 2.0,
                      alpha: float = 0.25, gamma: float = 2.0):
    """[B, m, nq] focal-class + L1 + GIoU matching cost, fully in-graph
    (the jnp twin of hungarian_match's numpy cost)."""
    prob = jax.nn.sigmoid(pred_scores.astype(jnp.float32))  # [B,nq,nc]
    pc = jnp.take_along_axis(prob[:, None], gt_cls[:, :, None, None], -1)[..., 0]  # [B,m,nq]
    neg = (1 - alpha) * pc**gamma * (-jnp.log(1 - pc + 1e-8))
    pos = alpha * (1 - pc) ** gamma * (-jnp.log(pc + 1e-8))
    c_cls = pos - neg
    c_l1 = jnp.sum(jnp.abs(gt_boxes[:, :, None] - pred_boxes[:, None].astype(jnp.float32)), -1)
    giou = bbox_iou(xywh2xyxy(gt_boxes[:, :, None]), xywh2xyxy(pred_boxes[:, None].astype(jnp.float32)),
                    xywh=False, GIoU=True)
    cost = cost_class * c_cls + cost_bbox * c_l1 + cost_giou * (1 - giou)
    return jnp.nan_to_num(cost, nan=1e6, posinf=1e6, neginf=-1e6)


def greedy_assign(cost, gt_mask):
    """Conflict-free greedy assignment, static shapes, jit/TPU-native.

    The axon PJRT runtime has no host-callback support, so the scipy Hungarian
    cannot run inside the step; with nq >> num GTs (300 queries vs a handful
    of boxes) bidding conflicts are rare and greedy matching is near-optimal
    (exactness gap covered by tests vs scipy). cost [B, m, nq] -> idx [B, m].
    """
    B, m, nq = cost.shape

    def per_image(cost_i, mask_i):
        def body(taken, i):
            row = jnp.where(taken, jnp.inf, cost_i[i])
            j = jnp.argmin(row).astype(jnp.int32)
            taken = taken | (jax.nn.one_hot(j, nq, dtype=bool) & mask_i[i])
            return taken, jnp.where(mask_i[i], j, 0)

        _, idx = jax.lax.scan(body, jnp.zeros((nq,), bool), jnp.arange(m))
        return idx

    return jax.vmap(per_image)(jax.lax.stop_gradient(cost), gt_mask)


def batched_assign(pred_boxes, pred_scores, gt_boxes, gt_cls, gt_mask):
    """In-graph bipartite assignment: cost matrix + greedy conflict-free match."""
    cost = match_cost_matrix(pred_boxes, pred_scores, gt_boxes, gt_cls)
    cost = jnp.where(gt_mask[..., None], cost, 1e6)
    return greedy_assign(cost, gt_mask)


def detr_loss_batched(pred_boxes, pred_scores, gt_boxes, gt_cls, gt_mask, assign_idx,
                      nc: int, cls_gain=1.0, l1_gain=5.0, giou_gain=2.0):
    """Static-shape batched DETR loss given assignments.

    pred_boxes [B,nq,4] normalized xywh; pred_scores [B,nq,nc] logits;
    gt_boxes [B,m,4] normalized xywh; assign_idx [B,m] query per GT slot.
    """
    B, nq, _ = pred_boxes.shape
    maskf = gt_mask.astype(jnp.float32)
    num_gt = jnp.clip(jnp.sum(maskf), 1.0, None)

    sel = jax.nn.one_hot(assign_idx, nq) * maskf[..., None]  # [B,m,nq]
    tgt_scores = jnp.einsum("bmq,bmc->bqc", sel, jax.nn.one_hot(gt_cls, nc))  # [B,nq,nc]
    prob = jax.nn.sigmoid(pred_scores.astype(jnp.float32))
    bce = -(tgt_scores * jnp.log(prob + 1e-8) + (1 - tgt_scores) * jnp.log(1 - prob + 1e-8))
    focal = jnp.where(tgt_scores > 0, 0.25 * (1 - prob) ** 2, 0.75 * prob**2) * bce
    loss_cls = jnp.sum(focal) / num_gt

    matched = jnp.einsum("bmq,bqi->bmi", sel, pred_boxes.astype(jnp.float32))  # [B,m,4]
    l1 = jnp.sum(jnp.abs(matched - gt_boxes) * maskf[..., None]) / num_gt
    giou = bbox_iou(xywh2xyxy(matched), xywh2xyxy(gt_boxes), xywh=False, GIoU=True)
    loss_giou = jnp.sum((1.0 - giou) * maskf) / num_gt
    return cls_gain * loss_cls + l1_gain * l1 + giou_gain * loss_giou


def rtdetr_loss(preds, batch, imgsz, nc: int, dn_meta=None):
    """Full RT-DETR training loss: per-decoder-layer Hungarian-matched DETR
    loss + encoder-proposal loss + CDN denoising loss (known assignment)."""
    H, W = imgsz
    scale = jnp.array([W, H, W, H], jnp.float32)
    xy = (batch["boxes"][..., :2] + batch["boxes"][..., 2:]) / 2
    wh = jnp.clip(batch["boxes"][..., 2:] - batch["boxes"][..., :2], 0.0, None)
    gt_n = jnp.concatenate([xy, wh], -1) / scale  # [B,m,4] normalized xywh
    gt_cls = batch["classes"].astype(jnp.int32)
    gt_mask = batch["mask"]

    total = jnp.zeros(())
    ndl = preds["dec_boxes"].shape[0]
    for i in range(ndl):
        pb, ps = preds["dec_boxes"][i], preds["dec_scores"][i]
        idx = batched_assign(pb, ps, gt_n, gt_cls, gt_mask)
        total = total + detr_loss_batched(pb, ps, gt_n, gt_cls, gt_mask, idx, nc)
    # encoder proposals (reference aux "enc" loss)
    idx = batched_assign(preds["enc_boxes"], preds["enc_scores"], gt_n, gt_cls, gt_mask)
    total = total + detr_loss_batched(preds["enc_boxes"], preds["enc_scores"], gt_n, gt_cls, gt_mask, idx, nc)

    dn_loss = jnp.zeros(())
    if dn_meta is not None and "dn_boxes" in preds:
        # known assignment: dn slot j was generated from GT slot group_gt[j]
        pos = dn_meta["pos_mask"]  # [B,nd]
        ggt = dn_meta["group_gt"]  # [B,nd]
        gb = jnp.take_along_axis(gt_n, ggt[..., None], 1)  # [B,nd,4]
        gc = jnp.take_along_axis(gt_cls, ggt, 1)
        nd = pos.shape[1]
        ident = jnp.tile(jnp.arange(nd)[None], (pos.shape[0], 1))
        for i in range(preds["dn_boxes"].shape[0]):
            dn_loss = dn_loss + detr_loss_batched(
                preds["dn_boxes"][i], preds["dn_scores"][i], gb, gc, pos, ident, nc
            )
        dn_loss = dn_loss / preds["dn_boxes"].shape[0]
    return total / (ndl + 1), dn_loss
