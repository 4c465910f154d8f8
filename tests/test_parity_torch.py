"""Numeric parity vs the PyTorch reference (the core correctness gate).

Builds the reference DetectionModel on CPU, copies its randomly-initialized
weights into our functional tree via the checkpoint importer, feeds both the
same input, and compares decoded predictions to float tolerance — the analog
of BASELINE config 1 ("boxes/scores/classes matching the PyTorch reference").
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-model torch parity takes minutes on CPU

REF_YAML = "/root/reference/ultralytics/cfg/models/master/v0/det/yolo-master-n.yaml"


@pytest.fixture(scope="module")
def pair(torch_reference):
    import torch

    from yolo_master_tpu.nn.tasks import DetectionModel as JaxModel
    from yolo_master_tpu.utils.torch_import import import_state_dict

    torch.manual_seed(0)
    from ultralytics.nn.tasks import DetectionModel as TorchModel

    tm = TorchModel(REF_YAML, verbose=False)
    tm.eval()
    jm = JaxModel("yolo-master-n")
    params = jm.init_params(0)
    params = import_state_dict(params, tm.state_dict(), strict=True)
    return tm, jm, params


def test_decoded_predictions_match(pair):
    import jax.numpy as jnp
    import torch

    tm, jm, params = pair
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 3, 64, 64), dtype=np.float32) * 0.25 + 0.5
    with torch.no_grad():
        ty, _ = tm(torch.from_numpy(x))
    ty = ty.numpy()  # [B, 4+nc, A]

    jx = jnp.asarray(x.transpose(0, 2, 3, 1))  # NCHW -> NHWC
    jy = np.asarray(jm.forward_predict(params, jx))  # [B, A, 4+nc]
    jy = jy.transpose(0, 2, 1)

    assert ty.shape == jy.shape
    # boxes are in pixel units (up to 64), scores in [0,1]
    box_err = np.abs(ty[:, :4] - jy[:, :4]).max()
    score_err = np.abs(ty[:, 4:] - jy[:, 4:]).max()
    assert box_err < 2e-3, f"box decode mismatch: {box_err}"
    assert score_err < 1e-5, f"score mismatch: {score_err}"


def test_backbone_feature_parity(pair):
    """Check an intermediate feature (post ES_MOE layer 3) matches."""
    import jax.numpy as jnp
    import torch

    tm, jm, params = pair
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 3, 64, 64), dtype=np.float32)

    feats = {}

    def hook(mod, inp, out):
        feats["l3"] = out.detach().numpy()

    h = tm.model[3].register_forward_hook(hook)
    with torch.no_grad():
        tm(torch.from_numpy(x))
    h.remove()

    from yolo_master_tpu.nn.module import Context

    ctx = Context(training=False)
    jx = jnp.asarray(x.transpose(0, 2, 3, 1))
    saved = {}
    y = jx
    lp = params["layers"]
    for spec in jm.specs[:4]:
        y = spec.module(lp[str(spec.i)], y, ctx)
    jf = np.asarray(y).transpose(0, 3, 1, 2)
    err = np.abs(feats["l3"] - jf).max()
    assert err < 1e-4, f"layer-3 feature mismatch: {err}"


def test_tal_assigner_parity(torch_reference):
    """Same inputs through the torch TaskAlignedAssigner and ours."""
    import jax.numpy as jnp
    import torch

    from ultralytics.utils.tal import TaskAlignedAssigner as TorchTAL

    from yolo_master_tpu.nn.assigner import task_aligned_assign

    rng = np.random.default_rng(7)
    B, A, M, nc = 2, 84, 6, 4
    # anchor points on an 8x8 grid + 4x4 grid + 2x2 grid (strides 8/16/32), 64px img
    pts = []
    for s, g in ((8, 8), (16, 4), (32, 2)):
        xs = (np.arange(g) + 0.5) * s
        gx, gy = np.meshgrid(xs, xs)
        pts.append(np.stack([gx, gy], -1).reshape(-1, 2))
    anc = np.concatenate(pts).astype(np.float32)
    pd_scores = rng.uniform(0, 1, (B, A, nc)).astype(np.float32)
    ctr = rng.uniform(8, 56, (B, A, 2))
    wh = rng.uniform(8, 40, (B, A, 2))
    pd_boxes = np.concatenate([ctr - wh / 2, ctr + wh / 2], -1).astype(np.float32)
    gctr = rng.uniform(12, 52, (B, M, 2))
    gwh = rng.uniform(10, 36, (B, M, 2))
    gt_boxes = np.concatenate([gctr - gwh / 2, gctr + gwh / 2], -1).astype(np.float32)
    gt_labels = rng.integers(0, nc, (B, M)).astype(np.int64)
    mask = np.ones((B, M), bool)
    mask[0, 4:] = False  # padded slots
    gt_boxes_t = gt_boxes * mask[..., None]  # torch detects valid GT by sum>0

    torch_tal = TorchTAL(topk=10, num_classes=nc, alpha=0.5, beta=6.0, stride=[8, 16, 32])
    tl, tb, ts, tfg, tgi = torch_tal(
        torch.from_numpy(pd_scores),
        torch.from_numpy(pd_boxes),
        torch.from_numpy(anc),
        torch.from_numpy(gt_labels[..., None]),
        torch.from_numpy(gt_boxes_t),
        torch.from_numpy(mask[..., None].astype(np.float32)),
    )

    res = task_aligned_assign(
        jnp.asarray(pd_scores),
        jnp.asarray(pd_boxes),
        jnp.asarray(anc),
        jnp.asarray(gt_labels),
        jnp.asarray(gt_boxes_t),
        jnp.asarray(mask),
        num_classes=nc,
        topk=10,
        alpha=0.5,
        beta=6.0,
        strides=(8, 16, 32),
    )
    # exact fg parity is impossible on zero-align tie-break anchors (top-k over
    # exact-zero metrics is tie-broken differently by torch.topk vs lax.top_k);
    # those anchors carry zero target-score weight in BOTH frameworks, so the
    # loss-relevant quantities must match exactly:
    ts_np = ts.numpy()
    assert np.allclose(np.asarray(res.target_scores), ts_np, atol=1e-5), "target_scores mismatch"
    weighted = ts_np.sum(-1) > 0  # anchors that contribute to box/dfl loss
    mfg = np.asarray(res.fg_mask)
    assert np.array_equal(mfg & weighted, tfg.numpy() & weighted), "weighted fg mismatch"
    fg = tfg.numpy() & weighted
    assert np.allclose(np.asarray(res.target_bboxes)[fg], tb.numpy()[fg], atol=1e-5)


def test_detection_loss_parity(pair):
    """Same raw head outputs + targets through both loss stacks."""
    import jax.numpy as jnp
    import torch

    tm, jm, params = pair
    from ultralytics.cfg import get_cfg
    from ultralytics.utils.loss import v8DetectionLoss

    tm.args = get_cfg()  # default hyp: box 7.5, cls 0.5, dfl 1.5
    torch_loss = v8DetectionLoss(tm)

    rng = np.random.default_rng(3)
    B, nc, reg_max = 2, 80, 16
    hw = [(8, 8), (4, 4), (2, 2)]
    A = sum(h * w for h, w in hw)
    boxes_raw = rng.standard_normal((B, A, 4 * reg_max)).astype(np.float32)
    scores_raw = (rng.standard_normal((B, A, nc)) - 3).astype(np.float32)

    # 3 GT in image 0, 1 GT in image 1 (normalized xywh, 64px image)
    batch_idx = np.array([0, 0, 0, 1], np.float32)
    cls = np.array([1, 5, 20, 3], np.float32)
    xywh = np.array(
        [[0.3, 0.3, 0.25, 0.3], [0.7, 0.6, 0.3, 0.4], [0.5, 0.8, 0.2, 0.15], [0.4, 0.4, 0.5, 0.5]], np.float32
    )
    tpreds = {
        "boxes": torch.from_numpy(boxes_raw.transpose(0, 2, 1)),
        "scores": torch.from_numpy(scores_raw.transpose(0, 2, 1)),
        "feats": [torch.zeros(B, 1, h, w) for h, w in hw],
    }
    tbatch = {
        "batch_idx": torch.from_numpy(batch_idx),
        "cls": torch.from_numpy(cls),
        "bboxes": torch.from_numpy(xywh),
    }
    tloss, titems = torch_loss.loss(tpreds, tbatch)

    from yolo_master_tpu.nn.losses import detection_loss

    # our padded-GT layout, boxes in input pixels (64)
    M = 4
    gt_boxes = np.zeros((B, M, 4), np.float32)
    gt_cls = np.zeros((B, M), np.int32)
    gt_mask = np.zeros((B, M), bool)
    from yolo_master_tpu.ops.boxes import xywh2xyxy

    for i in range(4):
        b = int(batch_idx[i])
        slot = int(gt_mask[b].sum())
        gt_boxes[b, slot] = np.asarray(xywh2xyxy(jnp.asarray(xywh[i] * 64.0)))
        gt_cls[b, slot] = int(cls[i])
        gt_mask[b, slot] = True

    lb = detection_loss(
        {"boxes": jnp.asarray(boxes_raw), "scores": jnp.asarray(scores_raw)},
        hw,
        (8, 16, 32),
        jnp.asarray(gt_boxes),
        jnp.asarray(gt_cls),
        jnp.asarray(gt_mask),
        nc=nc,
        reg_max=reg_max,
    )
    ours = np.array([float(lb.box), float(lb.cls), float(lb.dfl)])
    theirs = (titems * B).numpy() if titems.numel() == 3 else titems.numpy()
    # torch returns loss*batch_size; items are pre-batch-scale
    got_total = float(lb.total)
    assert np.allclose(ours, theirs, rtol=2e-4, atol=2e-4), f"{ours} vs {theirs}"
    assert np.isclose(got_total, float(tloss.sum()), rtol=2e-4), f"{got_total} vs {float(tloss.sum())}"


def test_yolo26_master_parity(torch_reference):
    """Full yolo26-master-n (A2C2fMoE + SPPF + C2PSA + attn-C3k2 + end2end
    reg_max=1 head) eval parity against the torch reference."""
    import jax.numpy as jnp
    import torch

    from ultralytics.nn.tasks import DetectionModel as TorchModel

    from yolo_master_tpu.nn.tasks import DetectionModel as JaxModel
    from yolo_master_tpu.utils.torch_import import import_state_dict

    torch.manual_seed(1)
    tm = TorchModel("/root/reference/ultralytics/cfg/models/26/yolo26-master-n.yaml", verbose=False)
    tm.eval()
    jm = JaxModel("yolo26-master-n")
    params = import_state_dict(jm.init_params(0), tm.state_dict(), strict=True)

    rng = np.random.default_rng(5)
    x = rng.standard_normal((1, 3, 64, 64), dtype=np.float32) * 0.3 + 0.5
    # bypass the in-head top-k (tie ordering under random init is arbitrary);
    # compare the raw decoded [B, A, 4+nc] tensors instead
    tm.model[-1].postprocess = lambda p: p
    with torch.no_grad():
        ty = tm(torch.from_numpy(x))
    ty = (ty[0] if isinstance(ty, tuple) else ty).numpy()  # [B, A, 4+nc]

    from yolo_master_tpu.nn.module import Context

    jx = jnp.asarray(x.transpose(0, 2, 3, 1))
    preds = jm.forward_train(params, jx, Context(training=False))
    jy = np.asarray(jm.head.decode(preds))

    assert ty.shape == jy.shape
    assert np.abs(ty[..., :4] - jy[..., :4]).max() < 5e-3, "decoded box mismatch"
    assert np.abs(ty[..., 4:] - jy[..., 4:]).max() < 1e-5, "decoded score mismatch"


def test_v0_10_gated_family_parity(torch_reference):
    """v0_10 VisualEnhancedAdaptiveGateMoE — the released-EsMoE-weights
    architecture (reference model-zoo/models.json:5, cfg/models/master/v0_10)
    — decoded-output parity with imported weights (VERDICT r2 item 2). This
    exercises the whole gated chain: SE split, DualStreamGateRouter, low-rank
    fused experts, complexity gate, detail gate, context mixer, refinement."""
    import jax.numpy as jnp
    import torch

    from ultralytics.nn.tasks import DetectionModel as TorchModel

    from yolo_master_tpu.nn.module import Context
    from yolo_master_tpu.nn.tasks import DetectionModel as JaxModel
    from yolo_master_tpu.utils.torch_import import import_state_dict

    torch.manual_seed(0)
    tm = TorchModel(
        "/root/reference/ultralytics/cfg/models/master/v0_10/det/yolo-master-n.yaml", verbose=False
    )
    tm.eval()
    jm = JaxModel("yolo-master-v0_10-n")
    params = import_state_dict(jm.init_params(0), tm.state_dict(), strict=True)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 3, 64, 64), dtype=np.float32) * 0.25 + 0.5
    with torch.no_grad():
        ty = tm(torch.from_numpy(x))
    ty = (ty[0] if isinstance(ty, (tuple, list)) else ty).numpy()  # [B, 4+nc, A]

    jx = jnp.asarray(x.transpose(0, 2, 3, 1))
    jy = np.asarray(jm.forward_predict(params, jx, Context(training=False))).transpose(0, 2, 1)
    assert ty.shape == jy.shape
    box_err = np.abs(ty[:, :4] - jy[:, :4]).max()
    score_err = np.abs(ty[:, 4:] - jy[:, 4:]).max()
    assert box_err < 5e-3, f"v0_10 box decode mismatch: {box_err}"
    assert score_err < 1e-5, f"v0_10 score mismatch: {score_err}"


def test_hgnet_blocks_parity(torch_reference):
    """HGStem/HGBlock (RT-DETR's HGNetV2 backbone pieces) match the reference
    modules with imported weights (reference nn/modules/block.py:110,146)."""
    import torch

    from yolo_master_tpu.nn.layers import HGBlock as JHGBlock
    from yolo_master_tpu.nn.layers import HGStem as JHGStem
    from yolo_master_tpu.nn.module import Context
    from yolo_master_tpu.utils.torch_import import import_state_dict

    from ultralytics.nn.modules.block import HGBlock as THGBlock
    from ultralytics.nn.modules.block import HGStem as THGStem

    import jax
    import jax.numpy as jnp

    def align_bn(mod):
        # built ultralytics models re-init every BN to eps=1e-3 (what our
        # BatchNorm implements); standalone torch modules keep the 1e-5
        # default — align for an apples-to-apples comparison
        for m_ in mod.modules():
            if isinstance(m_, torch.nn.BatchNorm2d):
                m_.eps = 1e-3
        return mod

    torch.manual_seed(0)
    x = np.random.default_rng(0).standard_normal((2, 32, 32, 3)).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))

    ts = align_bn(THGStem(3, 16, 32).eval())
    js = JHGStem(3, 16, 32).finalize("s")
    ps = import_state_dict(js.init(jax.random.PRNGKey(0)), ts.state_dict(), strict=True)
    with torch.no_grad():
        ref = ts(xt).numpy().transpose(0, 2, 3, 1)
    out = np.asarray(js(ps, jnp.asarray(x), Context(training=False)))
    assert np.abs(out - ref).max() < 2e-5, f"HGStem maxerr {np.abs(out - ref).max()}"

    for light in (False, True):
        tb = align_bn(THGBlock(32, 16, 64, k=3, n=3, lightconv=light, shortcut=False).eval())
        jb = JHGBlock(32, 16, 64, k=3, n=3, lightconv=light, shortcut=False).finalize("b")
        pb = import_state_dict(jb.init(jax.random.PRNGKey(1)), tb.state_dict(), strict=True)
        xb = np.random.default_rng(1).standard_normal((2, 8, 8, 32)).astype(np.float32)
        with torch.no_grad():
            refb = tb(torch.from_numpy(xb.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
        outb = np.asarray(jb(pb, jnp.asarray(xb), Context(training=False)))
        err = np.abs(outb - refb).max()
        assert err < 2e-5, f"HGBlock(light={light}) maxerr {err}"


@pytest.mark.slow
@pytest.mark.parametrize("gen,block", [
    ("v0_1", "OptimizedMOEImproved"),
    ("v0_3", "UltimateOptimizedMoE"),
    ("v0_4", "AdaptiveGateMoE"),
    ("v0_5", "FusedAdaptiveGateMoE"),
    ("v0_6", "HybridAdaptiveGateMoE"),
    ("v0_7", "LowRankHybridAdaptiveGateMoE"),
    ("v0_8", "RefinedLowRankHybridAdaptiveGateMoE"),
    ("v0_9", "DetailAwareLowRankHybridAdaptiveGateMoE"),
    ("v0_13", "MultiHeadRouterMoE"),
    ("v0_14", "DiversifiedExpertMoE"),
    ("v0_15", "GatedFusionMoE"),
])
def test_generation_block_parity(torch_reference, gen, block):
    """Decoded-output parity for the four generation blocks added in round 3
    (Fused v0.5, DetailAwareLowRankHybrid v0.9, MultiHeadRouter v0.13,
    DiversifiedExpert v0.14) — same weight-import harness as the v0_10 gate
    (reference cfg/models/master/<gen>/det/yolo-master-n.yaml)."""
    import jax.numpy as jnp
    import torch

    from ultralytics.nn.tasks import DetectionModel as TorchModel

    from yolo_master_tpu.nn.module import Context
    from yolo_master_tpu.nn.tasks import DetectionModel as JaxModel
    from yolo_master_tpu.utils.torch_import import import_state_dict

    torch.manual_seed(0)
    tm = TorchModel(
        f"/root/reference/ultralytics/cfg/models/master/{gen}/det/yolo-master-n.yaml", verbose=False
    )
    tm.eval()
    assert any(type(m).__name__ == block for m in tm.modules()), f"{gen} yaml no longer uses {block}"
    jm = JaxModel(f"yolo-master-{gen}-n")
    params = import_state_dict(jm.init_params(0), tm.state_dict(), strict=True)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 3, 64, 64), dtype=np.float32) * 0.25 + 0.5
    with torch.no_grad():
        ty = tm(torch.from_numpy(x))
    ty = (ty[0] if isinstance(ty, (tuple, list)) else ty).numpy()

    jx = jnp.asarray(x.transpose(0, 2, 3, 1))
    jy = np.asarray(jm.forward_predict(params, jx, Context(training=False))).transpose(0, 2, 1)
    assert ty.shape == jy.shape
    box_err = np.abs(ty[:, :4] - jy[:, :4]).max()
    score_err = np.abs(ty[:, 4:] - jy[:, 4:]).max()
    assert box_err < 5e-3, f"{gen} box decode mismatch: {box_err}"
    assert score_err < 1e-5, f"{gen} score mismatch: {score_err}"


@pytest.mark.slow
def test_moa_mot_blocks_parity(torch_reference):
    """Decoded-output parity for the MoA (C2fMoA) and MoT (C2fMoT) mixture
    blocks via the v0_10 moa-mot model (reference
    cfg/models/master/v0_10/det/yolo-master-moa-mot-n.yaml, nn/modules/moa +
    mot) — the last mixture families without a weight-import gate."""
    import jax.numpy as jnp
    import torch

    from ultralytics.nn.tasks import DetectionModel as TorchModel

    from yolo_master_tpu.nn.module import Context
    from yolo_master_tpu.nn.tasks import DetectionModel as JaxModel
    from yolo_master_tpu.utils.torch_import import import_state_dict

    torch.manual_seed(0)
    tm = TorchModel(
        "/root/reference/ultralytics/cfg/models/26/yolo26-master-moa-mot-n.yaml", verbose=False
    )
    tm.eval()
    names = {type(m).__name__ for m in tm.modules()}
    assert {"C2fMoA", "C2fMoT"} <= names, f"moa-mot yaml changed: {sorted(names)[:20]}"
    jm = JaxModel("yolo26-master-moa-mot-n")
    params = import_state_dict(jm.init_params(0), tm.state_dict(), strict=True)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 3, 64, 64), dtype=np.float32) * 0.25 + 0.5
    # yolo26 head is end2end: bypass the in-head top-k (tie ordering under
    # random init is arbitrary) and compare raw decoded [B, A, 4+nc]
    tm.model[-1].postprocess = lambda p: p
    with torch.no_grad():
        ty = tm(torch.from_numpy(x))
    ty = (ty[0] if isinstance(ty, (tuple, list)) else ty).numpy()

    jx = jnp.asarray(x.transpose(0, 2, 3, 1))
    preds = jm.forward_train(params, jx, Context(training=False))
    jy = np.asarray(jm.head.decode(preds))
    assert ty.shape == jy.shape
    box_err = np.abs(ty[..., :4] - jy[..., :4]).max()
    score_err = np.abs(ty[..., 4:] - jy[..., 4:]).max()
    assert box_err < 5e-3, f"moa-mot box decode mismatch: {box_err}"
    assert score_err < 1e-5, f"moa-mot score mismatch: {score_err}"


@pytest.mark.slow
def test_latent_mixture_parity(torch_reference):
    """Decoded parity for the LatentMixture family (yolo26-master-latent,
    reference cfg/models/26/yolo26-master-latent-n.yaml, nn/modules/
    latent_mixture.py) — completes the per-family weight-import matrix."""
    import jax.numpy as jnp
    import torch

    from ultralytics.nn.tasks import DetectionModel as TorchModel

    from yolo_master_tpu.nn.module import Context
    from yolo_master_tpu.nn.tasks import DetectionModel as JaxModel
    from yolo_master_tpu.utils.torch_import import import_state_dict

    torch.manual_seed(0)
    tm = TorchModel("/root/reference/ultralytics/cfg/models/26/yolo26-master-latent-n.yaml", verbose=False)
    tm.eval()
    assert any("LatentMixture" in type(m).__name__ for m in tm.modules())
    jm = JaxModel("yolo26-master-latent-n")
    params = import_state_dict(jm.init_params(0), tm.state_dict(), strict=True)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 3, 64, 64), dtype=np.float32) * 0.25 + 0.5
    tm.model[-1].postprocess = lambda p: p  # end2end: compare raw decode
    with torch.no_grad():
        ty = tm(torch.from_numpy(x))
    ty = (ty[0] if isinstance(ty, (tuple, list)) else ty).numpy()

    jx = jnp.asarray(x.transpose(0, 2, 3, 1))
    preds = jm.forward_train(params, jx, Context(training=False))
    jy = np.asarray(jm.head.decode(preds))
    assert ty.shape == jy.shape
    assert np.abs(ty[..., :4] - jy[..., :4]).max() < 5e-3
    assert np.abs(ty[..., 4:] - jy[..., 4:]).max() < 1e-5


@pytest.mark.slow
@pytest.mark.parametrize("task,ours,ref_yaml", [
    ("seg", "yolo-master-v0_10-seg-n",
     "/root/reference/ultralytics/cfg/models/master/v0_10/seg/yolo-master-seg-n.yaml"),
    ("pose", "yolo-master-v0_10-pose-n",
     "/root/reference/ultralytics/cfg/models/master/v0_10/pose/yolo-master-pose-n.yaml"),
    ("obb", "yolo-master-v0_10-obb-n",
     "/root/reference/ultralytics/cfg/models/master/v0_10/obb/yolo-master-obb-n.yaml"),
])
def test_task_head_parity(torch_reference, task, ours, ref_yaml):
    """Raw multi-output parity for the Segment/Pose/OBB task heads on the
    v0_10 released-weights backbone (reference nn/modules/head.py:265,428,558)
    — the detection-variant parity gates never exercise mask/kpt/angle
    branches."""
    import jax.numpy as jnp
    import torch

    from ultralytics.nn.tasks import OBBModel as TOBB
    from ultralytics.nn.tasks import PoseModel as TPose
    from ultralytics.nn.tasks import SegmentationModel as TSeg

    from yolo_master_tpu.nn.module import Context
    from yolo_master_tpu.nn.tasks import OBBModel as JOBB
    from yolo_master_tpu.nn.tasks import PoseModel as JPose
    from yolo_master_tpu.nn.tasks import SegmentationModel as JSeg
    from yolo_master_tpu.utils.torch_import import import_state_dict

    tcls, jcls = {"seg": (TSeg, JSeg), "pose": (TPose, JPose), "obb": (TOBB, JOBB)}[task]
    torch.manual_seed(0)
    tm = tcls(ref_yaml, verbose=False)
    tm.eval()
    jm = jcls(ours)
    params = import_state_dict(jm.init_params(0), tm.state_dict(), strict=True)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 3, 64, 64), dtype=np.float32) * 0.25 + 0.5
    with torch.no_grad():
        ty = tm(torch.from_numpy(x))
    jx = jnp.asarray(x.transpose(0, 2, 3, 1))
    ctx = Context(training=False)
    jpreds = jm.forward_train(params, jx, ctx)
    j_main = np.asarray(jm.head.decode(jpreds)).transpose(0, 2, 1)

    if task == "seg":
        # torch seg eval returns ((main, protos), extras_dict)
        t_main = ty[0][0].numpy()
        protos = ty[0][1].numpy()
        j_protos = np.asarray(jpreds["proto"]).transpose(0, 3, 1, 2)
        assert j_protos.shape == protos.shape, (j_protos.shape, protos.shape)
        # protos sit at the end of the full 24-layer v0_10 graph: same
        # accumulated-fp allowance as the decoded main output
        assert np.abs(j_protos - protos).max() < 5e-3
    else:
        t_main = (ty[0] if isinstance(ty, (tuple, list)) else ty).numpy()
    assert t_main.shape == j_main.shape, (t_main.shape, j_main.shape)
    err = np.abs(t_main - j_main).max()
    # pose kpt columns are pixel-scale (up to 64) through a longer decode
    # chain — allow proportionally more absolute slack there
    assert err < (1e-2 if task == "pose" else 5e-3), f"{task} head output mismatch: {err}"


@pytest.mark.slow
def test_classify_head_parity(torch_reference):
    """Classification-model logits parity on the v0_10 backbone (reference
    nn/modules/head.py:783 Classify) — completes the task-head matrix."""
    import jax.numpy as jnp
    import torch

    from ultralytics.nn.tasks import ClassificationModel as TCls

    from yolo_master_tpu.nn.module import Context
    from yolo_master_tpu.nn.tasks import ClassificationModel as JCls
    from yolo_master_tpu.utils.torch_import import import_state_dict

    torch.manual_seed(0)
    tm = TCls("/root/reference/ultralytics/cfg/models/master/v0_10/cls/yolo-master-cls-n.yaml", verbose=False)
    tm.eval()
    jm = JCls("yolo-master-v0_10-cls-n")
    params = import_state_dict(jm.init_params(0), tm.state_dict(), strict=True)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 64, 64), dtype=np.float32) * 0.25 + 0.5
    with torch.no_grad():
        ty = tm(torch.from_numpy(x))
    ty = (ty[0] if isinstance(ty, (tuple, list)) else ty).numpy()
    jy = np.asarray(jm.forward_predict(params, jnp.asarray(x.transpose(0, 2, 3, 1)), Context(training=False)))
    assert ty.shape == jy.shape, (ty.shape, jy.shape)
    err = np.abs(ty - jy).max()
    assert err < 1e-3, f"classify parity mismatch: {err}"


@pytest.mark.slow
@pytest.mark.parametrize("name,ours,ref_yaml,block", [
    ("uomoe", "yolo-master-uomoe-n",
     "/root/reference/ultralytics/cfg/models/master/v0_1/det/yolo-master-n-uomoe.yaml",
     "UltraOptimizedMoE"),
    ("v0_2", "yolo-master-v0_2-n",
     "/root/reference/ultralytics/cfg/models/master/exp/yolo-master-v0_2.yaml",
     None),
    ("v0_11", "yolo-master-v0_11-n",
     "/root/reference/ultralytics/cfg/models/master/exp/yolo-master-v0_11.yaml",
     "HybridAdaptiveGateMoEv2"),
])
def test_exp_generation_parity(torch_reference, name, ours, ref_yaml, block):
    """Decoded parity for the experimental-tree generations (reference
    cfg/models/master/exp/ + the v0_1 UoMoE variant) — UltraOptimizedMoE,
    v0_2, HybridAdaptiveGateMoEv2 families."""
    import jax.numpy as jnp
    import torch

    from ultralytics.nn.tasks import DetectionModel as TorchModel

    from yolo_master_tpu.nn.module import Context
    from yolo_master_tpu.nn.tasks import DetectionModel as JaxModel
    from yolo_master_tpu.utils.torch_import import import_state_dict

    torch.manual_seed(0)
    tm = TorchModel(ref_yaml, verbose=False)
    tm.eval()
    if block:
        assert any(type(m).__name__ == block for m in tm.modules()), f"{name}: {block} absent"
    jm = JaxModel(ours)
    params = import_state_dict(jm.init_params(0), tm.state_dict(), strict=True)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 3, 64, 64), dtype=np.float32) * 0.25 + 0.5
    with torch.no_grad():
        ty = tm(torch.from_numpy(x))
    ty = (ty[0] if isinstance(ty, (tuple, list)) else ty).numpy()

    jx = jnp.asarray(x.transpose(0, 2, 3, 1))
    jy = np.asarray(jm.forward_predict(params, jx, Context(training=False))).transpose(0, 2, 1)
    assert ty.shape == jy.shape
    assert np.abs(ty[:, :4] - jy[:, :4]).max() < 5e-3
    assert np.abs(ty[:, 4:] - jy[:, 4:]).max() < 1e-5
