"""Model assembly: YAML graph -> module list -> task models.

Reference: ultralytics/nn/tasks.py parse_model (:1953-2172) and
DetectionModel/BaseModel (:122,500). Same graph semantics — rows of
``[from, repeats, module, args]``, compound depth/width/max-channel scaling,
a save-list of intermediate features consumed by Concat/Detect — rebuilt over
the functional Module framework (NHWC, explicit params pytree).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops.nms import non_max_suppression
from ..utils import LOGGER, find_model_yaml, guess_scale, make_divisible, yaml_load
from .heads import OBB, Classify, Detect, Pose, Segment, SemanticSegment, v10Detect
from .world import WorldDetect, YOLOEDetect
from .layers import (
    AIFI,
    A2C2f,
    Bottleneck,
    C2PSA,
    C2f,
    C3,
    C3k,
    C3k2,
    Concat,
    Conv,
    DWConv,
    HGBlock,
    HGStem,
    RepC3,
    RepConv,
    LightConv,
    MaxPool,
    SPPF,
    Upsample,
)
from .module import Context, Module, ModuleList, Params, apply_updates
from .moe import ES_MOE
from .moe.mixtures import A2C2fMoE, ABlockMoE, OptimizedMOEImproved
from .moe.ultimate import (
    AdaptiveCapacityMoE,
    HyperUltimateMoE,
    UltimateOptimizedMoE,
    UltraOptimizedMoE,
)
from .moe.dynamic import DyC2f, DyMoEBlock
from .moa import C2fMoA, MoABlock, NeckMoAFusion
from .mot import C2fMoT, MoTBlock
from .latent_mixture import LatentMixture, MultiScaleLatentMixture
from .moe.gated import (
    AdaptiveGateMoE,
    DetailAwareLowRankHybridAdaptiveGateMoE,
    DiversifiedExpertMoE,
    FusedAdaptiveGateMoE,
    GatedFusionMoE,
    HybridAdaptiveGateMoE,
    HybridAdaptiveGateMoEv2,
    LowRankHybridAdaptiveGateMoE,
    MultiHeadRouterMoE,
    OptimalHybridGateMoE,
    RefinedLowRankHybridAdaptiveGateMoE,
    ContextRefinedLowRankHybridAdaptiveGateMoE,
    VisualEnhancedAdaptiveGateMoE,
)

# Name -> class registry; the analog of parse_model's base set + the mixture
# registry (reference nn/mixture_registry.py:40-64). "nn.Upsample" kept as an
# alias so reference YAMLs load unchanged.
MODULE_REGISTRY: Dict[str, type] = {
    "Conv": Conv,
    "DWConv": DWConv,
    "Bottleneck": Bottleneck,
    "C2f": C2f,
    "C3": C3,
    "C3k": C3k,
    "C3k2": C3k2,
    "SPPF": SPPF,
    "HGStem": HGStem,
    "RepC3": RepC3,
    "RepConv": RepConv,
    "HGBlock": HGBlock,
    "LightConv": LightConv,
    "AIFI": AIFI,
    "C2PSA": C2PSA,
    "A2C2f": A2C2f,
    "Concat": Concat,
    "Upsample": Upsample,
    "nn.Upsample": Upsample,
    "MaxPool": MaxPool,
    "Detect": Detect,
    "v10Detect": v10Detect,
    "Segment": Segment,
    "Pose": Pose,
    "OBB": OBB,
    "Classify": Classify,
    "SemanticSegment": SemanticSegment,
    "WorldDetect": WorldDetect,
    "YOLOEDetect": YOLOEDetect,
    "RTDETRDecoder": "rtdetr",  # resolved lazily (circular import)
    "ES_MOE": ES_MOE,
    "A2C2fMoE": A2C2fMoE,
    "OptimizedMOEImproved": OptimizedMOEImproved,
    "ModularRouterExpertMoE": OptimizedMOEImproved,
    "C2fMoA": C2fMoA,
    "MoABlock": MoABlock,
    "NeckMoAFusion": NeckMoAFusion,
    "C2fMoT": C2fMoT,
    "MoTBlock": MoTBlock,
    "LatentMixture": LatentMixture,
    "MultiScaleLatentMixture": MultiScaleLatentMixture,
    "AdaptiveGateMoE": AdaptiveGateMoE,
    "FusedAdaptiveGateMoE": FusedAdaptiveGateMoE,
    "DetailAwareLowRankHybridAdaptiveGateMoE": DetailAwareLowRankHybridAdaptiveGateMoE,
    "MultiHeadRouterMoE": MultiHeadRouterMoE,
    "DiversifiedExpertMoE": DiversifiedExpertMoE,
    "HybridAdaptiveGateMoE": HybridAdaptiveGateMoE,
    "HybridAdaptiveGateMoEv2": HybridAdaptiveGateMoEv2,
    "LowRankHybridAdaptiveGateMoE": LowRankHybridAdaptiveGateMoE,
    "RefinedLowRankHybridAdaptiveGateMoE": RefinedLowRankHybridAdaptiveGateMoE,
    "ContextRefinedLowRankHybridAdaptiveGateMoE": ContextRefinedLowRankHybridAdaptiveGateMoE,
    "VisualEnhancedAdaptiveGateMoE": VisualEnhancedAdaptiveGateMoE,
    "OptimalHybridGateMoE": OptimalHybridGateMoE,
    "GatedFusionMoE": GatedFusionMoE,
    "UltraOptimizedMoE": UltraOptimizedMoE,
    "AdaptiveCapacityMoE": AdaptiveCapacityMoE,
    "HyperUltimateMoE": HyperUltimateMoE,
    "UltimateOptimizedMoE": UltimateOptimizedMoE,
    # OptimizedMOE (modules.py:742) = the Improved block with its legacy fixed
    # router/expert config; registered as a config-alias, not a copy.
    "OptimizedMOE": OptimizedMOEImproved,
    "DyC2f": DyC2f,
    "DyMoEBlock": DyMoEBlock,
}

REPEAT_MODULES = {C2f, C3, C3k, C3k2, C2PSA, A2C2f, A2C2fMoE, C2fMoA, C2fMoT, RepC3, DyC2f}
BASE_MODULES = {Conv, DWConv, Bottleneck, C2f, C3, C3k, C3k2, SPPF, C2PSA, A2C2f, Classify, RepC3, RepConv}
MIXTURE_MODULES = {
    ES_MOE, A2C2fMoE, OptimizedMOEImproved, C2fMoA, C2fMoT, MoABlock, MoTBlock,
    AdaptiveGateMoE, FusedAdaptiveGateMoE, HybridAdaptiveGateMoE, HybridAdaptiveGateMoEv2,
    LowRankHybridAdaptiveGateMoE, RefinedLowRankHybridAdaptiveGateMoE,
    DetailAwareLowRankHybridAdaptiveGateMoE,
    ContextRefinedLowRankHybridAdaptiveGateMoE, VisualEnhancedAdaptiveGateMoE,
    OptimalHybridGateMoE, GatedFusionMoE, MultiHeadRouterMoE, DiversifiedExpertMoE,
    UltraOptimizedMoE, AdaptiveCapacityMoE, HyperUltimateMoE, UltimateOptimizedMoE,
    DyC2f, DyMoEBlock,
}
HEAD_MODULES = {Detect, v10Detect, Segment, Pose, OBB, WorldDetect, YOLOEDetect}


class LayerSpec:
    """One graph node: module instance + wiring metadata."""

    def __init__(self, i: int, f, module: Module, type_name: str):
        self.i = i
        self.f = f  # int or list of ints ("from")
        self.module = module
        self.type_name = type_name


def parse_model(cfg: dict, ch: int = 3, scale: Optional[str] = None, verbose: bool = False):
    """Compile a model dict into (layers, save_list).

    Mirrors reference nn/tasks.py:1953-2172 scaling rules.
    """
    nc = cfg.get("nc", 80)
    scales = cfg.get("scales")
    reg_max = cfg.get("reg_max", 16)
    end2end = bool(cfg.get("end2end", False))
    depth, width, max_channels = cfg.get("depth_multiple", 1.0), cfg.get("width_multiple", 1.0), float("inf")
    if scales:
        if not scale:
            scale = next(iter(scales))
            LOGGER.warning(f"no model scale passed, assuming scale='{scale}'")
        depth, width, max_channels = scales[scale]

    legacy = True
    channels = [ch]
    layers: List[LayerSpec] = []
    save: List[int] = []
    for i, (f, n, mname, args) in enumerate(list(cfg["backbone"]) + list(cfg["head"])):
        if mname not in MODULE_REGISTRY:
            raise KeyError(f"unknown module '{mname}' in model yaml")
        m = MODULE_REGISTRY[mname]
        if m == "rtdetr":
            from ..models.rtdetr import RTDETRDecoder as m  # noqa: N813
        # literal resolution (reference parse_model runs ast.literal_eval on
        # string args, tasks.py:1972): YAML's bare None/True/False arrive as
        # strings from reference-authored YAMLs
        _LITERALS = {"None": None, "True": True, "False": False, "none": None, "true": True, "false": False}
        args = [_LITERALS.get(a, a) if isinstance(a, str) else a for a in args]
        args = [
            nc if a == "nc" else cfg.get("kpt_shape", (17, 3)) if a == "kpt_shape" else a for a in args
        ]
        n = max(round(n * depth), 1) if n > 1 else n

        if m in BASE_MODULES:
            c1, c2 = channels[f], args[0]
            if c2 != nc:
                c2 = make_divisible(min(c2, max_channels) * width, 8)
            args = [c1, c2, *args[1:]]
            if m in REPEAT_MODULES:
                args.insert(2, n)
                n = 1
            if m is C3k2:
                legacy = False
                if scale and scale in "mlx":
                    args[3] = True
            if m is A2C2f:
                legacy = False
                if scale and scale in "lx":
                    args.extend((True, 1.2))
        elif m in MIXTURE_MODULES:
            c1, c2 = channels[f], args[0]
            if c2 != nc:
                c2 = make_divisible(min(c2, max_channels) * width, 8)
            args = [c1, c2, *args[1:]]
            if m in REPEAT_MODULES:  # A2C2fMoE takes n like A2C2f
                args.insert(2, n)
                n = 1
            if m is A2C2fMoE:
                legacy = False
        elif m in (HGStem, HGBlock):
            # yaml args [cm, c2, ...]; c1 prepended (reference tasks.py:2036)
            c1, cm_, c2 = channels[f], args[0], args[1]
            args = [c1, cm_, c2, *args[2:]]
            if m is HGBlock:
                args.insert(4, n)  # repeats become the block's inner n
                n = 1
        elif m is AIFI:
            c2 = channels[f]
            args = [c2, *args]
        elif m in (LatentMixture, NeckMoAFusion):
            c1 = [channels[x] for x in f]
            c2 = args[0]
            if c2 != nc:
                c2 = make_divisible(min(c2, max_channels) * width, 8)
            args = [c1, c2, *args[1:]]
        elif getattr(m, "__name__", "") == "RTDETRDecoder":
            args = [args[0], [channels[x] for x in f], *args[1:]]  # nc, ch, ...
            c2 = None
        elif m is SemanticSegment:
            args = [args[0], [channels[x] for x in f]]  # nc, ch list (reference tasks.py:2135)
            c2 = None
        elif m is Concat:
            c2 = sum(channels[x] for x in f)
            args = []
        elif m in HEAD_MODULES:
            ch_list = [channels[x] for x in f]
            if m is Segment:  # npr is width-scaled (reference tasks.py:2130)
                args[2] = make_divisible(min(args[2], max_channels) * width, 8)
            args = [*args, reg_max, end2end, ch_list]
            kwargs = {"legacy": legacy}
            c2 = None
        elif m is Upsample:
            c2 = channels[f]
            args = [None, args[1] if len(args) > 1 else 2]
        else:
            c2 = channels[f]

        if m in HEAD_MODULES:
            mod = m(*args, **kwargs)
        elif n > 1:
            from .layers import ConvSeq

            mod = ConvSeq(*[m(*args) for _ in range(n)])
        else:
            mod = m(*args)
        spec = LayerSpec(i, f, mod, mname)
        layers.append(spec)
        save.extend(x % i for x in ([f] if isinstance(f, int) else f) if x != -1)
        if i == 0:
            channels = []
        channels.append(c2)
        if verbose:
            LOGGER.info(f"{i:>3} {str(f):>12} {n:>3} {mname:<12} {args}")
    return layers, sorted(set(save))


class BaseModel(Module):
    """Graph walker over parsed layers (reference nn/tasks.py BaseModel:122)."""

    def __init__(self, cfg, ch: int = 3, nc: Optional[int] = None, scale: Optional[str] = None, verbose: bool = False):
        super().__init__()
        if isinstance(cfg, (str,)) or hasattr(cfg, "exists"):
            self.yaml_file = find_model_yaml(cfg)
            scale = scale or guess_scale(cfg)
            cfg = yaml_load(self.yaml_file)
        self.cfg = dict(cfg)
        self.scale = scale
        if nc and nc != self.cfg.get("nc"):
            self.cfg["nc"] = nc
        self.nc = self.cfg.get("nc", 80)
        specs, self.save = parse_model(self.cfg, ch, scale=scale, verbose=verbose)
        self.specs = specs
        self.layers = ModuleList([s.module for s in specs])
        self._post_build()
        self.finalize()

    def _post_build(self):
        pass

    # -- forward -------------------------------------------------------------
    def forward_features(self, p: Params, x: jnp.ndarray, ctx: Context):
        """Walk the layer graph with the feature save-list.

        Returns the output of the last layer (a Detect dict for detection
        models) — reference BaseModel._predict_once.
        """
        saved: Dict[int, jnp.ndarray] = {}
        y = x
        lp = p["layers"]
        for spec in self.specs:
            f = spec.f
            if f != -1:
                if isinstance(f, int):
                    inp = y if f == -1 else saved[f % spec.i]
                else:
                    # negative j (other than -1) indexes relative to this layer
                    inp = [y if j == -1 else saved[j % spec.i] for j in f]
            else:
                inp = y
            y = spec.module(lp[str(spec.i)], inp, ctx)
            if spec.i in self.save:
                saved[spec.i] = y
        return y

    def forward_features_with_taps(self, p: Params, x: jnp.ndarray, ctx: Context, tap_indices):
        """Graph walk that additionally returns features at tap_indices
        (the functional FeatureHook analog, reference nn/distill_model.py:33)."""
        taps = {}
        saved: Dict[int, jnp.ndarray] = {}
        y = x
        lp = p["layers"]
        for spec in self.specs:
            f = spec.f
            if f != -1:
                inp = (y if f == -1 else saved[f % spec.i]) if isinstance(f, int) else [y if j == -1 else saved[j % spec.i] for j in f]
            else:
                inp = y
            y = spec.module(lp[str(spec.i)], inp, ctx)
            if spec.i in self.save:
                saved[spec.i] = y
            if spec.i in tap_indices:
                taps[spec.i] = y
        return y, taps

    def init_params(self, seed: int = 0) -> Params:
        return self.init(jax.random.PRNGKey(seed))

    def num_params(self, p: Params) -> int:
        return sum(x.size for x in jax.tree_util.tree_leaves(p))


class DetectionModel(BaseModel):
    """Detection task model (reference nn/tasks.py:500)."""

    task = "detect"

    def _post_build(self):
        head = self.specs[-1].module
        assert isinstance(head, Detect), "detection model must end with Detect"
        # plain reference, not a registered child (params live under layers.N)
        object.__setattr__(self, "head", head)
        # Stride probe: run shape inference on the graph (channels known; only
        # spatial scale matters). We derive strides from conv stride products
        # along the path to each Detect input — static, no forward needed.
        self.head_strides = self._infer_strides()
        head.set_strides(self.head_strides)
        self.stride = max(self.head_strides)

    def _infer_strides(self) -> Tuple[int, ...]:
        """Propagate cumulative stride through the graph."""
        strides: Dict[int, int] = {}
        cur = 1
        for spec in self.specs:
            f = spec.f
            if isinstance(spec.module, Detect):
                return tuple(strides[j] for j in f)
            src = cur if f == -1 else (strides[f] if isinstance(f, int) else None)
            if isinstance(f, list):
                src = max(strides[j] if j != -1 else cur for j in f)
            m = spec.module
            s = src
            if isinstance(m, (Conv, DWConv)) and not isinstance(m, Upsample):
                s = src * m.s
            elif isinstance(m, Upsample):
                s = src // m.scale
            elif isinstance(m, MaxPool):
                s = src * m.s
            elif hasattr(m, "mods"):  # ConvSeq of repeated (possibly strided) convs
                for sub in m.mods:
                    if isinstance(sub, (Conv, DWConv)):
                        s = s * sub.s
            strides[spec.i] = s
            cur = s
        raise RuntimeError("no Detect head found")

    # -- public entry points ---------------------------------------------------
    def forward_train(self, p: Params, x: jnp.ndarray, ctx: Context) -> dict:
        """Raw prediction dict for loss computation."""
        return self.forward_features(p, x, ctx)

    def forward_predict(self, p: Params, x: jnp.ndarray, ctx: Optional[Context] = None) -> jnp.ndarray:
        """Decoded [B, A, 4+nc] predictions (pre-NMS)."""
        ctx = ctx or Context(training=False)
        preds = self.forward_features(p, x, ctx)
        return self.head.decode(preds)


class ClassificationModel(BaseModel):
    """Classification task model (reference nn/tasks.py:842)."""

    task = "classify"

    def forward_train(self, p: Params, x: jnp.ndarray, ctx: Context) -> jnp.ndarray:
        return self.forward_features(p, x, ctx)

    def forward_predict(self, p: Params, x: jnp.ndarray, ctx: Optional[Context] = None) -> jnp.ndarray:
        ctx = ctx or Context(training=False)
        return self.forward_features(p, x, ctx)


class SegmentationModel(DetectionModel):
    """Instance segmentation model (reference nn/tasks.py:694)."""

    task = "segment"


class PoseModel(DetectionModel):
    """Pose/keypoint model (reference nn/tasks.py:799)."""

    task = "pose"


class OBBModel(DetectionModel):
    """Oriented-box model (reference nn/tasks.py:661)."""

    task = "obb"


# ---------------------------------------------------------------------------
# Task-specific loss dispatch (the init_criterion analog, reference
# nn/tasks.py DetectionModel.init_criterion / SegmentationModel / PoseModel /
# OBBModel). Each returns (total_loss, metrics_dict).
# ---------------------------------------------------------------------------

def _det_loss(model, preds, batch, aux_total, hyp):
    from .losses import composite_loss

    lb = composite_loss(
        preds,
        preds["hw_shapes"],
        model.head_strides,
        batch["boxes"],
        batch["classes"],
        batch["mask"],
        nc=model.nc,
        aux_total=aux_total,
        box_gain=hyp.get("box", 7.5),
        cls_gain=hyp.get("cls", 0.5),
        dfl_gain=hyp.get("dfl", 1.5),
        moe_gain=hyp.get("moe", 0.01),
        end2end=model.head.end2end,
    )
    return lb.total, {"loss": lb.total, "box_loss": lb.box, "cls_loss": lb.cls, "dfl_loss": lb.dfl, "aux_loss": lb.aux}


DetectionModel.compute_loss = _det_loss


def _seg_loss(model, preds, batch, aux_total, hyp):
    from .losses import detection_loss, segmentation_loss

    one2many = preds["one2many"]
    hw = preds["hw_shapes"]
    imgsz = (hw[0][0] * model.head_strides[0], hw[0][1] * model.head_strides[0])
    lb, assign = detection_loss(
        one2many, hw, model.head_strides, batch["boxes"], batch["classes"], batch["mask"],
        nc=model.nc, box_gain=hyp.get("box", 7.5), cls_gain=hyp.get("cls", 0.5),
        dfl_gain=hyp.get("dfl", 1.5), return_assign=True,
    )
    B = one2many["scores"].shape[0]
    seg = segmentation_loss(one2many["mask_coefficient"], preds["proto"], batch["masks"], assign, imgsz)
    seg = seg * hyp.get("box", 7.5) * B
    aux = hyp.get("moe", 0.01) * aux_total
    total = lb.total + seg + aux
    return total, {"loss": total, "box_loss": lb.box, "cls_loss": lb.cls, "dfl_loss": lb.dfl,
                   "seg_loss": seg, "aux_loss": aux}


SegmentationModel.compute_loss = _seg_loss


def _pose_loss(model, preds, batch, aux_total, hyp):
    from ..ops.anchors import make_anchors
    from .losses import detection_loss, pose_loss

    one2many = preds["one2many"]
    hw = preds["hw_shapes"]
    lb, assign = detection_loss(
        one2many, hw, model.head_strides, batch["boxes"], batch["classes"], batch["mask"],
        nc=model.nc, box_gain=hyp.get("box", 7.5), cls_gain=hyp.get("cls", 0.5),
        dfl_gain=hyp.get("dfl", 1.5), return_assign=True,
    )
    B = one2many["scores"].shape[0]
    anchors, stride_t = make_anchors(hw, model.head_strides)
    loc, obj = pose_loss(one2many["kpts"], batch["keypoints"], assign, anchors, stride_t, model.head.kpt_shape)
    loc = loc * hyp.get("pose", 12.0) * B
    obj = obj * hyp.get("kobj", 1.0) * B
    aux = hyp.get("moe", 0.01) * aux_total
    total = lb.total + loc + obj + aux
    return total, {"loss": total, "box_loss": lb.box, "cls_loss": lb.cls, "dfl_loss": lb.dfl,
                   "pose_loss": loc, "kobj_loss": obj, "aux_loss": aux}


PoseModel.compute_loss = _pose_loss


def _obb_loss(model, preds, batch, aux_total, hyp):
    from .losses import obb_loss

    lb = obb_loss(
        preds["one2many"], preds["hw_shapes"], model.head_strides,
        batch["rboxes"], batch["classes"], batch["mask"],
        nc=model.nc, box_gain=hyp.get("box", 7.5), cls_gain=hyp.get("cls", 0.5), dfl_gain=hyp.get("dfl", 1.5),
    )
    aux = hyp.get("moe", 0.01) * aux_total
    total = lb.total + aux
    return total, {"loss": total, "box_loss": lb.box, "cls_loss": lb.cls, "dfl_loss": lb.dfl, "aux_loss": aux}


OBBModel.compute_loss = _obb_loss


def _cls_loss(model, preds, batch, aux_total, hyp):
    from .losses import classification_loss

    ce = classification_loss(preds, batch["classes"])
    aux = hyp.get("moe", 0.01) * aux_total
    total = ce + aux
    return total, {"loss": total, "cls_loss": ce, "aux_loss": aux}


ClassificationModel.compute_loss = _cls_loss


class SemanticSegmentationModel(BaseModel):
    """Per-pixel semantic segmentation (reference nn/tasks.py:727) — a
    YOLO-Master addition (SURVEY.md §2.11)."""

    task = "semantic"

    def _post_build(self):
        head = self.specs[-1].module
        assert isinstance(head, SemanticSegment)
        object.__setattr__(self, "head", head)
        self.head_strides = (8, 16)
        head.set_strides(self.head_strides)

    def forward_train(self, p: Params, x: jnp.ndarray, ctx: Context) -> dict:
        return self.forward_features(p, x, ctx)

    def forward_predict(self, p: Params, x: jnp.ndarray, ctx: Optional[Context] = None) -> jnp.ndarray:
        ctx = ctx or Context(training=False)
        preds = self.forward_features(p, x, ctx)
        return self.head.decode(preds)


def _semantic_loss(model, preds, batch, aux_total, hyp):
    from .losses import semantic_loss

    seg = semantic_loss(preds, batch["sem_mask"], model.nc)
    aux = hyp.get("moe", 0.01) * aux_total
    total = seg * hyp.get("box", 7.5) + aux
    return total, {"loss": total, "seg_loss": seg, "aux_loss": aux}


SemanticSegmentationModel.compute_loss = _semantic_loss


class RTDETRDetectionModel(BaseModel):
    """RT-DETR detection model (reference nn/tasks.py:934)."""

    task = "detect"

    def _post_build(self):
        head = self.specs[-1].module
        object.__setattr__(self, "head", head)
        self.head_strides = (8, 16, 32)
        head.set_strides(self.head_strides)

    def forward_train(self, p: Params, x: jnp.ndarray, ctx: Context) -> dict:
        return self.forward_features(p, x, ctx)

    def forward_predict(self, p: Params, x: jnp.ndarray, ctx: Optional[Context] = None) -> jnp.ndarray:
        ctx = ctx or Context(training=False)
        preds = self.forward_features(p, x, ctx)
        return self.head.decode(preds, (x.shape[1], x.shape[2]))


class WorldModel(DetectionModel):
    """YOLO-World open-vocabulary detection (reference nn/tasks.py:1072):
    a DetectionModel whose head scores regions against a text-embedding
    vocabulary. Swap vocabularies with :meth:`set_classes` (param surgery)."""

    task = "detect"

    def set_classes(self, params: Params, texts, encoder=None) -> Params:
        """Encode class prompts and install them as the head vocabulary.

        Returns a NEW params tree with the replaced ``txt_feats`` leaf; also
        updates model/head nc to len(texts) (a vocabulary-size change re-jits
        once; same-size swaps are free)."""
        from .text_model import HashTextEncoder

        encoder = encoder or HashTextEncoder(embed=self.head.embed)
        txt = jnp.asarray(encoder.encode_text(list(texts)), jnp.float32)
        from .module import dict_copy

        params = dict_copy(params)
        params["layers"][str(self.specs[-1].i)]["txt_feats"] = txt
        self.nc = len(texts)
        self.head.nc = len(texts)
        self.names = dict(enumerate(texts))
        return params


class YOLOEModel(WorldModel):
    """YOLOE prompt-or-prompt-free detection (reference nn/tasks.py:1202):
    WorldModel + SwiGLU text adapter + SAVPE visual prompts."""

    def get_visual_pe(self, params: Params, x: jnp.ndarray, vp: jnp.ndarray, ctx: Optional[Context] = None):
        """[B,Q,embed] visual prompt embeddings from masks vp [B,Q,H/8,W/8]."""
        ctx = ctx or Context(training=False)
        feats = self._head_inputs(params, x, ctx)
        hp = params["layers"][str(self.specs[-1].i)]
        return self.head.get_vpe(hp, feats, vp, ctx)

    def _head_inputs(self, params: Params, x: jnp.ndarray, ctx: Context):
        """Run the graph up to (excluding) the head; return its input feats."""
        saved: Dict[int, jnp.ndarray] = {}
        y = x
        lp = params["layers"]
        for spec in self.specs[:-1]:
            f = spec.f
            if f != -1:
                inp = (y if f == -1 else saved[f % spec.i]) if isinstance(f, int) else [
                    y if j == -1 else saved[j % spec.i] for j in f
                ]
            else:
                inp = y
            y = spec.module(lp[str(spec.i)], inp, ctx)
            if spec.i in self.save:
                saved[spec.i] = y
        head_f = self.specs[-1].f
        return [y if j == -1 else saved[j] for j in head_f]


def _rtdetr_loss(model, preds, batch, aux_total, hyp):
    """RT-DETR training loss: per-layer Hungarian DETR loss + encoder loss +
    CDN denoising loss (reference models/rtdetr/train.py + models/utils/loss.py)."""
    from ..models.rtdetr import rtdetr_loss

    s0 = model.head.strides[0]
    h, w = preds["hw_shapes"][0]
    dn_meta = None
    if "dn_pos_mask" in preds:
        dn_meta = {"pos_mask": preds["dn_pos_mask"], "group_gt": preds["dn_group_gt"]}
    main, dn = rtdetr_loss(preds, batch, (h * s0, w * s0), model.nc, dn_meta)
    aux = hyp.get("moe", 0.01) * aux_total
    total = main + dn + aux
    return total, {"loss": total, "box_loss": main, "dn_loss": dn, "cls_loss": jnp.zeros(()),
                   "dfl_loss": jnp.zeros(()), "aux_loss": aux}


RTDETRDetectionModel.compute_loss = _rtdetr_loss
