"""SAM2 — video segmentation with streaming memory, TPU-native.

Reference: ultralytics/models/sam/modules/memory_attention.py:13-298
(MemoryAttentionLayer/MemoryAttention), modules/sam.py:91-1024 (SAM2Model
track_step/memory machinery), modules/blocks.py (CXBlock fuser,
MaskDownSampler), predict.py (SAM2VideoPredictor propagation loop).

TPU-first recast:
  * the memory bank is a FIXED-SIZE ring (1 conditioning slot + N-1 recent
    slots) with a validity mask, so one jitted ``track_step`` serves every
    frame — the reference rebuilds a python list of tensors per frame and
    re-traces shapes; here shapes never change.
  * RoPE is applied as a pure function of the (static) token grid; the
    per-layer sin/cos tables constant-fold into the compiled graph.
  * cross-attention keys/values are the 64-d memory features — the 4x
    narrower KV keeps the memory-attention matmuls MXU-dense but cheap, as
    in the reference (kv_in_dim=64).

Image encoder / prompt encoder / mask decoder are shared with SAM
(:mod:`.sam`) — SAM2's delta is exactly the memory stack, so that is what
lives here.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.layers import LayerNorm, Linear, PlainConv
from ..nn.module import Context, Module, ModuleList, Params, trunc_normal
from .sam import MaskDecoder, PromptEncoder, build_sam


# ---------------------------------------------------------------------------
# Rotary position embedding over a 2D token grid (reference blocks.py RoPEAttention)
# ---------------------------------------------------------------------------

def _rope_freqs(dim: int, end_x: int, end_y: int, theta: float = 10000.0):
    """Axial 2D rotary table: half the head dim rotates with x, half with y.
    Returns (cos, sin) of shape [end_x*end_y, dim//2]."""
    quarter = dim // 4
    freqs = 1.0 / (theta ** (jnp.arange(quarter, dtype=jnp.float32) / quarter))
    tx = jnp.tile(jnp.arange(end_x, dtype=jnp.float32), (end_y,))          # x-major flatten
    ty = jnp.repeat(jnp.arange(end_y, dtype=jnp.float32), end_x)
    ang = jnp.concatenate([jnp.outer(ty, freqs), jnp.outer(tx, freqs)], -1)  # [T, dim/2]
    return jnp.cos(ang), jnp.sin(ang)


def _apply_rope(x, cos, sin):
    """x [B,H,T,dh]; rotate pairs (even, odd) by the table (broadcast over B,H)."""
    x1, x2 = x[..., 0::2], x[..., 1::2]
    c, s = cos[None, None], sin[None, None]
    return jnp.stack([x1 * c - x2 * s, x1 * s + x2 * c], -1).reshape(x.shape)


class RoPEAttention(Module):
    """Multi-head attention with 2D rotary q/k embedding; the trailing
    ``num_k_exclude_rope`` key tokens (object pointers) skip rotation
    (reference blocks.py RoPEAttention, rope_k_repeat)."""

    def __init__(self, embedding_dim: int, num_heads: int, kv_in_dim: Optional[int] = None,
                 feat_size: Tuple[int, int] = (16, 16)):
        super().__init__()
        self.dim, self.heads = embedding_dim, num_heads
        self.dh = embedding_dim // num_heads
        kv = kv_in_dim or embedding_dim
        self.q_proj = Linear(embedding_dim, embedding_dim)
        self.k_proj = Linear(kv, embedding_dim)
        self.v_proj = Linear(kv, embedding_dim)
        self.out_proj = Linear(embedding_dim, embedding_dim)
        self.feat_size = feat_size

    def __call__(self, p, q, k, v, ctx, num_k_exclude_rope: int = 0):
        B, Tq, _ = q.shape
        Tk = k.shape[1]
        h, dh = self.heads, self.dh
        qh = self.q_proj(p["q_proj"], q, ctx).reshape(B, Tq, h, dh).transpose(0, 2, 1, 3)
        kh = self.k_proj(p["k_proj"], k, ctx).reshape(B, Tk, h, dh).transpose(0, 2, 1, 3)
        vh = self.v_proj(p["v_proj"], v, ctx).reshape(B, Tk, h, dh).transpose(0, 2, 1, 3)

        gx, gy = self.feat_size
        cos, sin = _rope_freqs(dh, gx, gy)
        T_spatial = gx * gy
        if Tq == T_spatial:
            qh = _apply_rope(qh, cos, sin)
        n_rope = Tk - num_k_exclude_rope
        if n_rope > 0 and n_rope % T_spatial == 0:
            # repeat the table across memory frames (rope_k_repeat)
            reps = n_rope // T_spatial
            kc = jnp.tile(cos, (reps, 1))
            ks = jnp.tile(sin, (reps, 1))
            k_rope = _apply_rope(kh[:, :, :n_rope], kc, ks)
            kh = jnp.concatenate([k_rope, kh[:, :, n_rope:]], 2)

        attn = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / math.sqrt(dh)
        out = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(attn, -1), vh)
        out = out.transpose(0, 2, 1, 3).reshape(B, Tq, self.dim)
        return self.out_proj(p["out_proj"], out, ctx)


# ---------------------------------------------------------------------------
# Memory attention (reference memory_attention.py:13-298)
# ---------------------------------------------------------------------------

class MemoryAttentionLayer(Module):
    """Pre-norm: self-attn (RoPE) -> cross-attn to memory (64-d KV, RoPE with
    obj-ptr exclusion) -> FFN."""

    def __init__(self, d_model=256, dim_feedforward=2048, mem_dim=64, feat_size=(16, 16)):
        super().__init__()
        self.self_attn = RoPEAttention(d_model, 1, feat_size=feat_size)
        self.cross_attn_image = RoPEAttention(d_model, 1, kv_in_dim=mem_dim, feat_size=feat_size)
        self.linear1 = Linear(d_model, dim_feedforward)
        self.linear2 = Linear(dim_feedforward, d_model)
        self.norm1 = LayerNorm(d_model)
        self.norm2 = LayerNorm(d_model)
        self.norm3 = LayerNorm(d_model)

    def __call__(self, p, tgt, memory, ctx, pos=None, num_obj_ptr_tokens: int = 0):
        t = self.norm1(p["norm1"], tgt, ctx)
        tgt = tgt + self.self_attn(p["self_attn"], t, t, t, ctx)
        t = self.norm2(p["norm2"], tgt, ctx)
        kv = memory if pos is None else memory + pos
        tgt = tgt + self.cross_attn_image(p["cross_attn_image"], t, kv, memory, ctx,
                                          num_k_exclude_rope=num_obj_ptr_tokens)
        t = self.norm3(p["norm3"], tgt, ctx)
        return tgt + self.linear2(p["linear2"], jax.nn.relu(self.linear1(p["linear1"], t, ctx)), ctx)


class MemoryAttention(Module):
    """Stack of memory-attention layers + final norm (memory_attention.py:171)."""

    def __init__(self, d_model=256, num_layers=4, mem_dim=64, feat_size=(16, 16)):
        super().__init__()
        self.layers = ModuleList([
            MemoryAttentionLayer(d_model, 4 * d_model, mem_dim, feat_size) for _ in range(num_layers)
        ])
        self.norm = LayerNorm(d_model)

    def __call__(self, p, curr, memory, ctx, pos=None, num_obj_ptr_tokens: int = 0):
        x = curr
        for i, layer in enumerate(self.layers):
            x = layer(p["layers"][str(i)], x, memory, ctx, pos=pos,
                      num_obj_ptr_tokens=num_obj_ptr_tokens)
        return self.norm(p["norm"], x, ctx)


# ---------------------------------------------------------------------------
# Memory encoder (reference blocks.py MaskDownSampler + CXBlock fuser + proj)
# ---------------------------------------------------------------------------

class _CXBlock(Module):
    """ConvNeXt-style fuser block: DW7x7 -> LN -> pw MLP -> layer-scale residual."""

    def __init__(self, dim: int):
        super().__init__()
        self.dim = dim
        self.dwconv = PlainConv(dim, dim, 7, g=dim, bias=True)
        self.norm = LayerNorm(dim)
        self.pw1 = Linear(dim, 4 * dim)
        self.pw2 = Linear(4 * dim, dim)

    def init(self, key) -> Params:
        p = super().init(key)
        p["gamma"] = 1e-6 * jnp.ones((self.dim,), jnp.float32)
        return p

    def __call__(self, p, x, ctx):
        y = self.dwconv(p["dwconv"], x, ctx)
        y = self.norm(p["norm"], y, ctx)
        y = self.pw2(p["pw2"], jax.nn.gelu(self.pw1(p["pw1"], y, ctx)), ctx)
        return x + p["gamma"].astype(x.dtype) * y


class MemoryEncoder(Module):
    """(image embedding, predicted mask) -> compact memory features.

    Mask is downsampled to embedding resolution by a stride-16 conv stack,
    added to a projected image embedding, fused, projected to mem_dim."""

    def __init__(self, dim=256, mem_dim=64, num_downsample=4, fuser_layers=2):
        super().__init__()
        # 4 stride-2 convs = 16x downsample of the 4x-upscaled decoder mask
        chans = [1] + [4, 16, 32, dim][:num_downsample]
        self.mask_down = ModuleList([
            PlainConv(chans[i], chans[i + 1], 3, s=2, bias=True) for i in range(num_downsample)
        ])
        self.mask_norms = ModuleList([LayerNorm(chans[i + 1]) for i in range(num_downsample)])
        self.mask_proj = PlainConv(chans[num_downsample], dim, 1, bias=True)
        self.pix_proj = PlainConv(dim, dim, 1, bias=True)
        self.fuser = ModuleList([_CXBlock(dim) for _ in range(fuser_layers)])
        self.out_proj = PlainConv(dim, mem_dim, 1, bias=True)

    def __call__(self, p, pix_feat, mask_logits, ctx):
        """pix_feat [B,h,w,D]; mask_logits [B,16h,16w,1] -> [B,h,w,mem_dim]."""
        m = jax.nn.sigmoid(mask_logits)
        for i, conv in enumerate(self.mask_down):
            m = conv(p["mask_down"][str(i)], m, ctx)
            m = self.mask_norms[i](p["mask_norms"][str(i)], m, ctx)
            m = jax.nn.gelu(m)
        m = self.mask_proj(p["mask_proj"], m, ctx)
        x = self.pix_proj(p["pix_proj"], pix_feat, ctx) + m
        for i, blk in enumerate(self.fuser):
            x = blk(p["fuser"][str(i)], x, ctx)
        return self.out_proj(p["out_proj"], x, ctx)


def _sine_pe_2d(h: int, w: int, dim: int):
    """Standard 2D sine/cosine positional encoding [h*w, dim]."""
    half = dim // 2
    freqs = 1.0 / (10000.0 ** (jnp.arange(half // 2, dtype=jnp.float32) / (half // 2)))
    ys = jnp.repeat(jnp.arange(h, dtype=jnp.float32), w)
    xs = jnp.tile(jnp.arange(w, dtype=jnp.float32), (h,))
    py = jnp.concatenate([jnp.sin(jnp.outer(ys, freqs)), jnp.cos(jnp.outer(ys, freqs))], -1)
    px = jnp.concatenate([jnp.sin(jnp.outer(xs, freqs)), jnp.cos(jnp.outer(xs, freqs))], -1)
    return jnp.concatenate([py, px], -1)


# ---------------------------------------------------------------------------
# SAM2 model (reference modules/sam.py:91 SAM2Model)
# ---------------------------------------------------------------------------

class SAM2Model(Module):
    """SAM + streaming-memory stack. The video delta over SAMModel:
    memory_attention conditions the current frame's embedding on the bank,
    memory_encoder writes the new frame back into it."""

    def __init__(self, img_size=256, num_maskmem=7, mem_dim=64,
                 encoder_kw: Optional[dict] = None):
        super().__init__()
        base = build_sam("vit_b_tiny", img_size=img_size) if encoder_kw is None else None
        if base is not None:
            self.image_encoder = base.image_encoder
        else:
            from .sam import ImageEncoderViT

            self.image_encoder = ImageEncoderViT(img_size, 16, **encoder_kw)
        self.img_size = img_size
        self.grid = img_size // 16
        self.num_maskmem = num_maskmem
        self.mem_dim = mem_dim
        dim = 256
        self.dim = dim
        self.prompt_encoder = PromptEncoder(dim, (self.grid, self.grid))
        self.mask_decoder = MaskDecoder(dim)
        self.memory_attention = MemoryAttention(dim, num_layers=2, mem_dim=mem_dim,
                                                feat_size=(self.grid, self.grid))
        self.memory_encoder = MemoryEncoder(dim, mem_dim)

    def init(self, key) -> Params:
        p = super().init(key)
        k1, k2 = jax.random.split(key)
        p["no_mem_embed"] = trunc_normal(k1, (1, 1, self.dim), std=0.02)
        # temporal position embedding per memory slot (maskmem_tpos_enc)
        p["maskmem_tpos_enc"] = trunc_normal(k2, (self.num_maskmem, 1, self.mem_dim), std=0.02)
        return p

    def init_params(self, seed: int = 0) -> Params:
        self.finalize("sam2")
        return self.init(jax.random.PRNGKey(seed))

    # -- bank helpers (fixed shapes) ----------------------------------------
    def empty_bank(self):
        T = self.grid * self.grid
        return {
            "feat": jnp.zeros((self.num_maskmem, T, self.mem_dim), jnp.float32),
            "valid": jnp.zeros((self.num_maskmem,), bool),
        }

    # -- core steps -----------------------------------------------------------
    def encode_image(self, p, x, ctx):
        return self.image_encoder(p["image_encoder"], x, ctx)

    def condition_on_memory(self, p, frame_emb, bank, ctx):
        """frame_emb [1,h,w,D] + bank -> memory-conditioned [1,h,w,D]
        (reference _prepare_memory_conditioned_features)."""
        B, h, w, D = frame_emb.shape
        curr = frame_emb.reshape(B, h * w, D)
        no_mem = jnp.logical_not(jnp.any(bank["valid"]))
        # memory tokens: every slot, invalid ones masked to zero features
        tpos = p["maskmem_tpos_enc"]  # [M,1,mem]
        feat = bank["feat"] + tpos  # temporal pos enc per slot
        feat = feat * bank["valid"][:, None, None]
        mem = feat.reshape(1, -1, self.mem_dim)
        pos = jnp.tile(_sine_pe_2d(h, w, self.mem_dim)[None], (1, self.num_maskmem, 1))
        attended = self.memory_attention(p["memory_attention"], curr, mem, ctx, pos=pos)
        out = jnp.where(no_mem, curr + p["no_mem_embed"], attended)
        return out.reshape(B, h, w, D)

    def decode_masks(self, p, pix_feat, ctx, points=None, labels=None, boxes=None):
        sparse, dense = self.prompt_encoder(
            p["prompt_encoder"], ctx, points=points, labels=labels, boxes=boxes,
            batch=pix_feat.shape[0])
        img_pe = self.prompt_encoder.dense_pe(p["prompt_encoder"])
        return self.mask_decoder(p["mask_decoder"], pix_feat, img_pe, sparse, dense, ctx)

    def encode_memory(self, p, frame_emb, best_mask_logits, ctx):
        """-> [T, mem_dim] memory features for the bank."""
        m = self.memory_encoder(p["memory_encoder"], frame_emb, best_mask_logits, ctx)
        return m.reshape(-1, self.mem_dim)

    def track_step(self, p, frame, bank, ctx, points=None, labels=None):
        """One frame: encode -> memory-condition -> decode -> new memory.

        Returns (mask_logits [1,4h,4w], iou [1], mem_feat [T,mem])."""
        emb = self.encode_image(p, frame, ctx)
        pix = self.condition_on_memory(p, emb, bank, ctx)
        if points is None:
            # track-only frames prompt with a padded empty point set
            points = jnp.zeros((1, 1, 2), jnp.float32)
            labels = jnp.full((1, 1), -1, jnp.int32)
        masks, iou = self.decode_masks(p, pix, ctx, points=points, labels=labels)
        best = jnp.argmax(iou[0])
        best_mask = masks[0, best][None, ..., None]  # [1,4h,4w,1]
        mem = self.encode_memory(p, emb, best_mask, ctx)
        return masks[0, best], iou[0, best], mem


class SAM2VideoPredictor:
    """Streaming video propagation (reference sam/predict.py
    SAM2VideoPredictor): prompt once, track through the frame stream with a
    rolling memory ring — slot 0 holds the conditioning (prompted) frame, the
    rest are the most recent frames."""

    MAX_POINTS = 8

    def __init__(self, model: Optional[SAM2Model] = None, params: Optional[Params] = None,
                 img_size: int = 256, seed: int = 0):
        self.model = model or SAM2Model(img_size=img_size)
        self.params = params if params is not None else self.model.init_params(seed)
        m = self.model

        def _prompted(p, frame, bank, pts, lbl):
            return m.track_step(p, frame, bank, Context(training=False), points=pts, labels=lbl)

        def _track(p, frame, bank):
            return m.track_step(p, frame, bank, Context(training=False))

        self._prompted = jax.jit(_prompted)
        self._track = jax.jit(_track)
        self.reset()

    def reset(self):
        self.bank = jax.tree_util.tree_map(lambda a: np.array(a), self.model.empty_bank())
        self._next_slot = 1  # slot 0 = conditioning frame
        self._prompted_once = False

    def _preprocess(self, frame_bgr: np.ndarray):
        import cv2

        s = self.model.img_size
        im = cv2.resize(frame_bgr, (s, s))[..., ::-1].astype(np.float32)
        im = (im - np.array([123.675, 116.28, 103.53])) / np.array([58.395, 57.12, 57.375])
        return jnp.asarray(im)[None], frame_bgr.shape[:2]

    def _write_bank(self, mem, cond: bool):
        slot = 0 if cond else self._next_slot
        if not self.bank["feat"].flags.writeable:
            self.bank["feat"] = np.array(self.bank["feat"])
            self.bank["valid"] = np.array(self.bank["valid"])
        self.bank["feat"][slot] = np.asarray(mem)
        self.bank["valid"][slot] = True
        if not cond:
            self._next_slot = 1 + (self._next_slot % (self.model.num_maskmem - 1))

    def add_prompt(self, frame_bgr: np.ndarray, points_xy: Sequence[Tuple[float, float]],
                   labels: Sequence[int]):
        """Prompt the conditioning frame; returns its mask [h0,w0] bool."""
        x, (h0, w0) = self._preprocess(frame_bgr)
        s = self.model.img_size
        pts = np.zeros((1, self.MAX_POINTS, 2), np.float32)
        lbl = np.full((1, self.MAX_POINTS), -1, np.int32)
        for i, ((px, py), l) in enumerate(zip(points_xy, labels)):
            pts[0, i] = (px / w0, py / h0)
            lbl[0, i] = l
        mask, iou, mem = self._prompted(self.params, x, self.bank,
                                        jnp.asarray(pts), jnp.asarray(lbl))
        self._write_bank(mem, cond=True)
        self._prompted_once = True
        return self._resize_mask(mask, h0, w0), float(iou)

    def propagate(self, frame_bgr: np.ndarray):
        """Track the prompted object into a new frame."""
        assert self._prompted_once, "call add_prompt on the first frame"
        x, (h0, w0) = self._preprocess(frame_bgr)
        mask, iou, mem = self._track(self.params, x, self.bank)
        self._write_bank(mem, cond=False)
        return self._resize_mask(mask, h0, w0), float(iou)

    @staticmethod
    def _resize_mask(mask_logits, h0, w0):
        import cv2

        m = np.asarray(mask_logits, np.float32)
        return cv2.resize(m, (w0, h0), interpolation=cv2.INTER_LINEAR) > 0

    def __call__(self, source, points=None, labels=None, stream: bool = False, max_frames: Optional[int] = None):
        """Run over a video source via the stream loaders: prompt on the first
        frame, propagate through the rest; yields (mask, iou) per frame."""
        from ..data.loaders import load_inference_source

        def gen():
            loader = load_inference_source(source, stream_frames=max_frames)
            n = 0
            for item in loader:
                frames = item if isinstance(item, list) else [item]
                for f in frames:
                    if max_frames is not None and n >= max_frames:
                        return
                    if not self._prompted_once:
                        yield self.add_prompt(f.image, points, labels or [1] * len(points))
                    else:
                        yield self.propagate(f.image)
                    n += 1

        return gen() if stream else list(gen())


class SAM2:
    """User facade (reference models/sam/model.py SAM with sam2 weights)."""

    def __init__(self, img_size: int = 256, seed: int = 0):
        self.predictor = SAM2VideoPredictor(img_size=img_size, seed=seed)

    def __call__(self, source, points=None, labels=None, **kw):
        return self.predictor(source, points=points, labels=labels, **kw)


# ---------------------------------------------------------------------------
# Streaming VOS evaluation (DAVIS-style J&F over a propagated video)
# ---------------------------------------------------------------------------

def region_similarity(pred: np.ndarray, gt: np.ndarray) -> float:
    """J = mask IoU (DAVIS region similarity)."""
    pred, gt = pred.astype(bool), gt.astype(bool)
    union = np.logical_or(pred, gt).sum()
    if union == 0:
        return 1.0  # both empty: perfect agreement
    return float(np.logical_and(pred, gt).sum() / union)


def boundary_f_measure(pred: np.ndarray, gt: np.ndarray, tol: int = 2) -> float:
    """F = boundary precision/recall F-measure with a tol-pixel band
    (DAVIS contour accuracy; morphological approximation of the official
    bipartite boundary matching)."""
    import cv2

    pred, gt = pred.astype(np.uint8), gt.astype(np.uint8)

    def boundary(m):
        er = cv2.erode(m, np.ones((3, 3), np.uint8))
        return (m ^ er).astype(bool)

    bp, bg = boundary(pred), boundary(gt)
    if not bp.any() and not bg.any():
        return 1.0
    if not bp.any() or not bg.any():
        return 0.0
    kernel = np.ones((2 * tol + 1, 2 * tol + 1), np.uint8)
    bg_band = cv2.dilate(bg.astype(np.uint8), kernel).astype(bool)
    bp_band = cv2.dilate(bp.astype(np.uint8), kernel).astype(bool)
    precision = (bp & bg_band).sum() / bp.sum()
    recall = (bg & bp_band).sum() / bg.sum()
    if precision + recall == 0:
        return 0.0
    return float(2 * precision * recall / (precision + recall))


def evaluate_vos(predictor: SAM2VideoPredictor, frames, gt_masks,
                 points=None, labels=None, tol: int = 2) -> dict:
    """Streaming VOS eval: prompt on frame 0 (from the GT mask centroid when
    no points are given), propagate through the rest, score per-frame J/F.

    Args:
        frames: iterable of BGR uint8 frames.
        gt_masks: same-length iterable of bool masks.

    Returns:
        {"J": mean region similarity, "F": mean boundary F, "J&F": mean of
         both, "per_frame": [(J_i, F_i), ...]} over the propagated frames
        (the prompted frame 0 is scored too, matching DAVIS semi-supervised
        protocol's exclusion only of the annotated first frame from ranking —
        we report it inside per_frame[0] but J/F means skip it).
    """
    predictor.reset()
    per_frame = []
    for i, (frame, gt) in enumerate(zip(frames, gt_masks)):
        gt = np.asarray(gt, bool)
        if i == 0:
            if points is None:
                ys, xs = np.nonzero(gt)
                if len(xs) == 0:
                    raise ValueError("frame-0 GT mask is empty; provide points")
                points = [(float(xs.mean()), float(ys.mean()))]
                labels = [1]
            mask, _ = predictor.add_prompt(frame, points, labels or [1] * len(points))
        else:
            mask, _ = predictor.propagate(frame)
        per_frame.append((region_similarity(mask, gt), boundary_f_measure(mask, gt, tol)))
    js = [j for j, _ in per_frame[1:]] or [per_frame[0][0]]
    fs = [f for _, f in per_frame[1:]] or [per_frame[0][1]]
    j_mean, f_mean = float(np.mean(js)), float(np.mean(fs))
    return {"J": j_mean, "F": f_mean, "J&F": (j_mean + f_mean) / 2, "per_frame": per_frame}
