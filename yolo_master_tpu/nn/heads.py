"""Detection heads (reference: ultralytics/nn/modules/head.py:37-264).

Layout: feature maps NHWC; concatenated predictions are anchors-last
[B, A, C] (the reference uses [B, C, A]).

The head returns a dict so the training loss, the end2end in-graph top-k
postprocess, and plain decoded inference all read from one structure:
  training:  {"one2many": {...}, ("one2one": {...})}
  inference: decoded [B, A, 4+nc] (plus raw dict for val-mode loss)
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops.anchors import dfl_decode, dist2bbox, make_anchors
from .layers import Conv, ConvSeq, DWConv
from .module import Context, Module, ModuleList, Params


class Detect(Module):
    """YOLO anchor-free detection head with DFL box regression.

    Matches reference head.py:37-264: per-scale box branch (cv2) producing
    4*reg_max DFL logits and class branch (cv3) producing nc logits; optional
    dual one2one head (end2end NMS-free mode) fed detached features.
    """

    def __init__(self, nc: int = 80, reg_max: int = 16, end2end: bool = False, ch: Sequence[int] = (), legacy: bool = False):
        super().__init__()
        self.nc = nc
        self.nl = len(ch)
        self.reg_max = reg_max
        self.no = nc + reg_max * 4
        self.ch = tuple(ch)
        self.end2end = end2end
        self.legacy = legacy
        self.max_det = 300
        self.agnostic_nms = False
        self.xyxy = False
        # strides are filled in by the model builder (stride probe), like the
        # reference's build-time stride computation.
        self.strides: Tuple[int, ...] = ()

        c2 = max(16, ch[0] // 4, reg_max * 4)
        c3 = max(ch[0], min(nc, 100))
        self.c2, self.c3 = c2, c3
        self.cv2 = ModuleList([ConvSeq(Conv(x, c2, 3), Conv(c2, c2, 3), _head_out(c2, 4 * reg_max)) for x in ch])
        if legacy:
            self.cv3 = ModuleList(
                [ConvSeq(Conv(x, c3, 3), Conv(c3, c3, 3), _head_out(c3, nc)) for x in ch]
            )
        else:
            self.cv3 = ModuleList(
                [
                    ConvSeq(
                        ConvSeq(DWConv(x, x, 3), Conv(x, c3, 1)),
                        ConvSeq(DWConv(c3, c3, 3), Conv(c3, c3, 1)),
                        _head_out(c3, nc),
                    )
                    for x in ch
                ]
            )
        if end2end:
            import copy as _copy

            self.one2one_cv2 = ModuleList([ConvSeq(Conv(x, c2, 3), Conv(c2, c2, 3), _head_out(c2, 4 * reg_max)) for x in ch])
            self.one2one_cv3 = ModuleList(
                [
                    ConvSeq(
                        ConvSeq(DWConv(x, x, 3), Conv(x, c3, 1)),
                        ConvSeq(DWConv(c3, c3, 3), Conv(c3, c3, 1)),
                        _head_out(c3, nc),
                    )
                    if not legacy
                    else ConvSeq(Conv(x, c3, 3), Conv(c3, c3, 3), _head_out(c3, nc))
                    for x in ch
                ]
            )

    def set_strides(self, strides: Sequence[int]):
        self.strides = tuple(int(s) for s in strides)

    def init(self, key) -> Params:
        p = super().init(key)
        return self.bias_init(p)

    def bias_init(self, p: Params) -> Params:
        """Detection bias init (reference head.py:196-210): box bias 2.0,
        cls bias log(5/nc/(640/stride)^2). Requires strides to be set."""
        strides = self.strides or (8, 16, 32)
        for branch, heads in (("cv2", True), ("cv3", False), ("one2one_cv2", True), ("one2one_cv3", False)):
            if branch not in p:
                continue
            for i, s in enumerate(strides[: self.nl]):
                leaf = p[branch][str(i)]
                last = leaf[str(len(leaf) - 1)]
                if heads:
                    last["b"] = jnp.full_like(last["b"], 2.0)
                else:
                    last["b"] = jnp.full_like(last["b"], math.log(5 / self.nc / (640 / s) ** 2))
        return p

    # ------------------------------------------------------------------
    def _forward_branch(self, p: Params, feats: List[jnp.ndarray], cv2_name: str, cv3_name: str, ctx: Context):
        """Run box+cls branches over all levels; returns concat [B, A, *]."""
        boxes, scores = [], []
        cv2 = getattr(self, cv2_name)
        cv3 = getattr(self, cv3_name)
        for i in range(self.nl):
            b = feats[i].shape[0]
            bx = cv2[i](p[cv2_name][str(i)], feats[i], ctx).reshape(b, -1, 4 * self.reg_max)
            sc = cv3[i](p[cv3_name][str(i)], feats[i], ctx).reshape(b, -1, self.nc)
            boxes.append(bx)
            scores.append(sc)
        return jnp.concatenate(boxes, 1), jnp.concatenate(scores, 1)

    def __call__(self, p: Params, feats: List[jnp.ndarray], ctx: Context):
        """Returns the full prediction dict; decode separately via ``decode``."""
        out = {}
        boxes, scores = self._forward_branch(p, feats, "cv2", "cv3", ctx)
        out["one2many"] = {"boxes": boxes, "scores": scores}
        if self.end2end:
            detached = [jax.lax.stop_gradient(f) for f in feats]
            b2, s2 = self._forward_branch(p, detached, "one2one_cv2", "one2one_cv3", ctx)
            out["one2one"] = {"boxes": b2, "scores": s2}
        out["hw_shapes"] = tuple((f.shape[1], f.shape[2]) for f in feats)
        return out

    def decode(self, preds: dict, hw_shapes=None, raw_scores: bool = False) -> jnp.ndarray:
        """DFL decode + anchor offset + stride scale + sigmoid scores.

        Returns [B, A, 4+nc]; boxes xywh (or xyxy·if end2end/xyxy) in input pixels.
        Reference: Detect._inference (head.py:176-194).

        raw_scores=True skips the sigmoid (class LOGITS in the score slots) —
        the NMS fast path selects candidates on logits (sigmoid is monotonic)
        and applies sigmoid only to the survivors.
        """
        branch = preds["one2one"] if self.end2end else preds["one2many"]
        hw_shapes = hw_shapes or preds["hw_shapes"]
        anchors, strides = make_anchors(hw_shapes, self.strides)
        # decode in fp32 regardless of trunk dtype: box coords at 640 scale
        # exceed bf16 mantissa resolution, and NMS IoU needs fp32 anyway
        dist = dfl_decode(branch["boxes"].astype(jnp.float32), self.reg_max)  # [B, A, 4]
        xywh = not self.end2end and not self.xyxy
        dbox = dist2bbox(dist, anchors[None], xywh=xywh) * strides[None]
        scores = branch["scores"].astype(jnp.float32)
        if not raw_scores:
            scores = jax.nn.sigmoid(scores)
        return jnp.concatenate([dbox, scores], -1)

    def decode_topk(self, preds: dict, k: int = 1024, hw_shapes=None) -> jnp.ndarray:
        """Latency fast path: select the top-k anchors by class-logit max
        FIRST, then DFL-decode only those k boxes (8400 -> k anchors, ~8x less
        decode work at k=1024). Returns [B, k, 4+nc] with xywh px boxes and
        raw LOGIT scores (feed to NMS with scores_are_logits=True).

        Equivalent to decode(raw_scores=True) followed by the NMS top-k
        prefilter (single-label path): argmax/max over classes commute with
        sigmoid, and NMS only ever reads the top max_nms candidates.
        """
        branch = preds["one2one"] if self.end2end else preds["one2many"]
        hw_shapes = hw_shapes or preds["hw_shapes"]
        anchors, strides = make_anchors(hw_shapes, self.strides)
        logits = branch["scores"].astype(jnp.float32)  # [B, A, nc]
        conf = jnp.max(logits, -1)
        k = min(k, conf.shape[1])
        _, idx = jax.lax.top_k(conf, k)  # [B, k]
        box_logits = jnp.take_along_axis(branch["boxes"].astype(jnp.float32), idx[..., None], 1)
        sel_logits = jnp.take_along_axis(logits, idx[..., None], 1)
        a_sel = anchors[idx]  # [B, k, 2]
        s_sel = strides[idx]
        dist = dfl_decode(box_logits, self.reg_max)
        dbox = dist2bbox(dist, a_sel, xywh=not self.end2end and not self.xyxy) * s_sel
        return jnp.concatenate([dbox, sel_logits], -1)

    def postprocess_end2end(self, decoded: jnp.ndarray, max_det: int = 300) -> jnp.ndarray:
        """In-graph top-k for NMS-free end2end mode (reference head.py:216-262).

        decoded: [B, A, 4+nc] with xyxy boxes. Returns [B, max_det, 6].
        """
        boxes, scores = decoded[..., :4], decoded[..., 4:]
        b, a, nc = scores.shape
        k = min(max_det, a)
        anchor_best = jnp.max(scores, -1)
        top_scores, top_idx = jax.lax.top_k(anchor_best, k)  # [B, k]
        sel_scores = jnp.take_along_axis(scores, top_idx[..., None], 1)  # [B,k,nc]
        flat = sel_scores.reshape(b, -1)
        final_scores, flat_idx = jax.lax.top_k(flat, k)
        anchor_sel = jnp.take_along_axis(top_idx, flat_idx // nc, 1)
        cls = (flat_idx % nc).astype(decoded.dtype)
        sel_boxes = jnp.take_along_axis(boxes, anchor_sel[..., None], 1)
        return jnp.concatenate([sel_boxes, final_scores[..., None], cls[..., None]], -1)


class v10Detect(Detect):
    """YOLOv10 NMS-free head (reference head.py:1763): dual-assignment
    end2end Detect whose light DW cls branch IS this implementation's modern
    (non-legacy) cv3 structure — Conv(x,x,3,g=x)+Conv(x,c3,1) twice + 1x1 —
    so the subclass only pins end2end=True."""

    def __init__(self, nc: int = 80, reg_max: int = 16, end2end: bool = True,
                 ch: Sequence[int] = (), legacy: bool = False):
        # end2end/legacy accepted for parse_model signature parity but pinned:
        # v10Detect is end2end by definition with the light (modern) cls head
        super().__init__(nc, reg_max=reg_max, end2end=True, ch=ch, legacy=False)


class _HeadOut(Module):
    """Final 1x1 conv with bias (plain nn.Conv2d in the reference head)."""

    def __init__(self, c1: int, c2: int, k: int = 1):
        super().__init__()
        self.c1, self.c2, self.k = c1, c2, k

    def init(self, key) -> Params:
        from .module import conv_bias_uniform, kaiming_uniform_conv

        k1, k2 = jax.random.split(key)
        fan_in = self.k * self.k * self.c1
        return {
            "w": kaiming_uniform_conv(k1, (self.k, self.k, self.c1, self.c2)),
            "b": conv_bias_uniform(k2, fan_in, self.c2),
        }

    def __call__(self, p: Params, x, ctx: Context):
        from .layers import conv2d

        return conv2d(x, p["w"], padding=self.k // 2) + p["b"].astype(x.dtype)


def _head_out(c1, c2):
    return _HeadOut(c1, c2)


class Classify(Module):
    """Classification head (reference head.py:783+): Conv -> GAP -> dropout -> linear."""

    def __init__(self, c1: int, c2: int, k=1, s=1, p=None, g=1):
        super().__init__()
        c_ = 1280
        self.conv = Conv(c1, c_, k, s, p, g)
        self.c_, self.c2 = c_, c2

    def init(self, key) -> Params:
        from .module import conv_bias_uniform

        k1, k2, k3 = jax.random.split(key, 3)
        bound = 1.0 / math.sqrt(self.c_)
        return {
            "conv": self.conv.init(k1),
            "linear": {
                "w": jax.random.uniform(k2, (self.c_, self.c2), jnp.float32, -bound, bound),
                "b": conv_bias_uniform(k3, self.c_, self.c2),
            },
        }

    def __call__(self, p: Params, x, ctx: Context):
        if isinstance(x, (list, tuple)):
            x = jnp.concatenate(x, -1)
        y = self.conv(p["conv"], x, ctx)
        y = jnp.mean(y, axis=(1, 2))
        logits = y @ p["linear"]["w"].astype(y.dtype) + p["linear"]["b"].astype(y.dtype)
        return logits if ctx.training else jax.nn.softmax(logits, -1)


class ConvTranspose2x(Module):
    """2x2 stride-2 transposed conv with bias (Proto upsample, reference block.py:101)."""

    def __init__(self, c1: int, c2: int):
        super().__init__()
        self.c1, self.c2 = c1, c2

    def init(self, key) -> Params:
        from .module import conv_bias_uniform, kaiming_uniform_conv

        k1, k2 = jax.random.split(key)
        return {
            "w": kaiming_uniform_conv(k1, (2, 2, self.c2, self.c1)),  # HWOI for transpose
            "b": conv_bias_uniform(k2, self.c1 * 4, self.c2),
        }

    def __call__(self, p: Params, x, ctx: Context):
        # k=2/s=2 transposed conv == matmul + depth-to-space:
        #   out[b, 2i+d, 2j+e, o] = sum_c x[b,i,j,c] * W[d,e,o,c]
        # with W = torch ConvTranspose2d weight (cin,cout,kh,kw) transposed to
        # (kh,kw,cout,cin) — exactly what import_state_dict produces. The
        # previous lax.conv_transpose(HWIO) call read the kernel with its
        # channel axes SWAPPED (silent for Proto's square cin==cout; caught by
        # the trained-weights mask-mAP parity gate, tests/test_task_val_parity).
        # HIGHEST precision: keep fp32 runs exact (the op is ~26 MFLOP, free).
        B, H, W, _ = x.shape
        w = p["w"].astype(x.dtype)  # [2, 2, cout, cin]
        y = jnp.einsum("bhwc,deoc->bhdweo", x, w, precision=jax.lax.Precision.HIGHEST)
        y = y.reshape(B, H * 2, W * 2, w.shape[2])
        return y + p["b"].astype(y.dtype)


class Proto(Module):
    """Mask prototype module (reference block.py:88-107)."""

    def __init__(self, c1: int, c_: int = 256, c2: int = 32):
        super().__init__()
        self.cv1 = Conv(c1, c_, 3)
        self.upsample = ConvTranspose2x(c_, c_)
        self.cv2 = Conv(c_, c_, 3)
        self.cv3 = Conv(c_, c2, 1)

    def __call__(self, p: Params, x, ctx: Context):
        y = self.cv1(p["cv1"], x, ctx)
        y = self.upsample(p["upsample"], y, ctx)
        y = self.cv2(p["cv2"], y, ctx)
        return self.cv3(p["cv3"], y, ctx)


class _ExtraBranch(ModuleList):
    """Per-level 2-conv + 1x1 branch used by Segment/Pose/OBB cv4."""

    def __init__(self, ch, c4, out):
        super().__init__([ConvSeq(Conv(x, c4, 3), Conv(c4, c4, 3), _head_out(c4, out)) for x in ch])


class Segment(Detect):
    """Instance segmentation head: Detect + mask coefficients + Proto
    (reference head.py:265-330)."""

    def __init__(self, nc=80, nm=32, npr=256, reg_max=16, end2end=False, ch=(), legacy=False):
        super().__init__(nc, reg_max, end2end, ch, legacy)
        self.nm, self.npr = nm, npr
        self.proto = Proto(ch[0], npr, nm)
        c4 = max(ch[0] // 4, nm)
        self.cv4 = _ExtraBranch(ch, c4, nm)
        if end2end:
            self.one2one_cv4 = _ExtraBranch(ch, c4, nm)

    def _extra(self, p, feats, name, ctx, out_dim):
        branch = getattr(self, name)
        outs = []
        for i in range(self.nl):
            b = feats[i].shape[0]
            outs.append(branch[i](p[name][str(i)], feats[i], ctx).reshape(b, -1, out_dim))
        return jnp.concatenate(outs, 1)

    def __call__(self, p, feats, ctx):
        out = super().__call__(p, feats, ctx)
        out["one2many"]["mask_coefficient"] = self._extra(p, feats, "cv4", ctx, self.nm)
        if self.end2end:
            detached = [jax.lax.stop_gradient(f) for f in feats]
            out["one2one"]["mask_coefficient"] = self._extra(p, detached, "one2one_cv4", ctx, self.nm)
        out["proto"] = self.proto(p["proto"], feats[0], ctx)  # [B, H/4?, W/4?, nm]
        return out

    def decode(self, preds, hw_shapes=None):
        base = super().decode(preds, hw_shapes)
        branch = preds["one2one"] if self.end2end else preds["one2many"]
        return jnp.concatenate([base, branch["mask_coefficient"].astype(base.dtype)], -1)


class Pose(Detect):
    """Keypoint head: Detect + per-anchor kpt regression (reference head.py:558-663)."""

    def __init__(self, nc=80, kpt_shape=(17, 3), reg_max=16, end2end=False, ch=(), legacy=False):
        super().__init__(nc, reg_max, end2end, ch, legacy)
        self.kpt_shape = tuple(kpt_shape)
        self.nk = kpt_shape[0] * kpt_shape[1]
        c4 = max(ch[0] // 4, self.nk)
        self.cv4 = _ExtraBranch(ch, c4, self.nk)
        if end2end:
            self.one2one_cv4 = _ExtraBranch(ch, c4, self.nk)

    _extra = Segment._extra

    def __call__(self, p, feats, ctx):
        out = super().__call__(p, feats, ctx)
        out["one2many"]["kpts"] = self._extra(p, feats, "cv4", ctx, self.nk)
        if self.end2end:
            detached = [jax.lax.stop_gradient(f) for f in feats]
            out["one2one"]["kpts"] = self._extra(p, detached, "one2one_cv4", ctx, self.nk)
        return out

    def kpts_decode(self, kpts: jnp.ndarray, hw_shapes) -> jnp.ndarray:
        """[B, A, nk] raw -> decoded keypoints in input pixels
        (reference head.py:644-663): xy*2 + anchor - 0.5, scaled by stride;
        visibility sigmoid for 3-dim kpts."""
        from ..ops.anchors import make_anchors

        anchors, strides = make_anchors(hw_shapes, self.strides)
        b, a = kpts.shape[:2]
        nkpt, ndim = self.kpt_shape
        y = kpts.reshape(b, a, nkpt, ndim)
        xy = (y[..., :2] * 2.0 + (anchors[None, :, None, :] - 0.5)) * strides[None, :, None, :]
        if ndim == 3:
            vis = jax.nn.sigmoid(y[..., 2:3].astype(jnp.float32)).astype(y.dtype)
            y = jnp.concatenate([xy, vis], -1)
        else:
            y = xy
        return y.reshape(b, a, self.nk)

    def decode(self, preds, hw_shapes=None):
        base = super().decode(preds, hw_shapes)
        hw_shapes = hw_shapes or preds["hw_shapes"]
        branch = preds["one2one"] if self.end2end else preds["one2many"]
        kpts = self.kpts_decode(branch["kpts"], hw_shapes)
        return jnp.concatenate([base, kpts.astype(base.dtype)], -1)


class OBB(Detect):
    """Oriented-box head: Detect + angle branch (reference head.py:428-520).

    Angle = (sigmoid(logits) - 0.25) * pi, range [-pi/4, 3pi/4]; boxes decoded
    with dist2rbox -> xywhr output.
    """

    def __init__(self, nc=80, ne=1, reg_max=16, end2end=False, ch=(), legacy=False):
        super().__init__(nc, reg_max, end2end, ch, legacy)
        self.ne = ne
        c4 = max(ch[0] // 4, ne)
        self.cv4 = _ExtraBranch(ch, c4, ne)
        if end2end:
            self.one2one_cv4 = _ExtraBranch(ch, c4, ne)

    _extra = Segment._extra

    def __call__(self, p, feats, ctx):
        out = super().__call__(p, feats, ctx)
        angle = self._extra(p, feats, "cv4", ctx, self.ne)
        out["one2many"]["angle"] = (jax.nn.sigmoid(angle.astype(jnp.float32)) - 0.25) * math.pi
        if self.end2end:
            detached = [jax.lax.stop_gradient(f) for f in feats]
            a2 = self._extra(p, detached, "one2one_cv4", ctx, self.ne)
            out["one2one"]["angle"] = (jax.nn.sigmoid(a2.astype(jnp.float32)) - 0.25) * math.pi
        return out

    def decode(self, preds, hw_shapes=None):
        """Returns [B, A, 4+nc+ne] with xywhr boxes (xywh in pixels, r appended)."""
        from ..ops.anchors import dfl_decode, make_anchors
        from ..ops.rotated import dist2rbox

        branch = preds["one2one"] if self.end2end else preds["one2many"]
        hw_shapes = hw_shapes or preds["hw_shapes"]
        anchors, strides = make_anchors(hw_shapes, self.strides)
        dist = dfl_decode(branch["boxes"], self.reg_max)
        rbox = dist2rbox(dist, branch["angle"].astype(dist.dtype), anchors[None]) * strides[None]
        scores = jax.nn.sigmoid(branch["scores"].astype(jnp.float32)).astype(rbox.dtype)
        return jnp.concatenate([rbox, scores, branch["angle"].astype(rbox.dtype)], -1)


class SemanticSegment(Module):
    """Per-pixel semantic segmentation head (reference head.py:1815-1900):
    classifier on P3 + auxiliary P4 head for deep supervision; inference
    returns P3-resolution logits (bilinear upsample at export)."""

    def __init__(self, nc: int = 19, ch: Sequence[int] = ()):
        super().__init__()
        self.nc = nc
        self.nl = len(ch)
        c_mid = ch[0]
        self.classifier = ConvSeq(Conv(c_mid, c_mid, 3), _head_out(c_mid, nc))
        self.aux_head = ConvSeq(Conv(ch[1], c_mid, 3), _head_out(c_mid, nc)) if len(ch) > 1 else None
        self.strides = (8, 16)

    def set_strides(self, strides):
        self.strides = tuple(strides)

    def __call__(self, p: Params, feats, ctx: Context):
        logits = self.classifier(p["classifier"], feats[0], ctx)  # [B, H/8, W/8, nc]
        out = {"logits": logits, "hw_shapes": tuple((f.shape[1], f.shape[2]) for f in feats)}
        if ctx.training and self.aux_head is not None:
            out["aux_logits"] = self.aux_head(p["aux_head"], feats[1], ctx)
        return out

    def decode(self, preds, hw_shapes=None):
        """Upsample logits to input resolution (bilinear, like export)."""
        logits = preds["logits"]
        B, H, W, C = logits.shape
        return jax.image.resize(logits, (B, H * 8, W * 8, C), method="bilinear")
