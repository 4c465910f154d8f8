"""End-to-end mAP-pipeline parity vs the PyTorch reference (VERDICT r2 item 1).

The north star is "COCO mAP within 0.1 of the reference"; module-level parity
does not compose into that claim by itself — NMS keep sets, unletterboxing,
10-IoU matching, and AP integration can each drift. This module runs the
reference's REAL validation stack (ultralytics/engine/validator.py:144 +
models/yolo/detect/val.py) and this repo's DetectionValidator on the SAME
synthetic dataset with the SAME imported weights and gates mAP equality, plus
the two sub-gates that localize any drift:

  * NMS keep-set equality vs reference non_max_suppression
    (reference utils/nms.py:13-171) on identical decoded predictions;
  * ap_per_class parity vs reference utils/metrics.py:800 on fixed-seed stats.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REF_YAML = "/root/reference/ultralytics/cfg/models/master/v0/det/yolo-master-n.yaml"
IMGSZ = 192
N_IMAGES = 96
NC = 80  # model classes (drawn classes use 0..7)

# VERDICT r4 next #4: the RELEASED architecture — v0_10 EsMoE-N is the block
# in the reference's downloadable checkpoints (model-zoo/models.json:5) — at
# deploy-adjacent resolution. Same harness, second config.
REF_YAML_V010 = "/root/reference/ultralytics/cfg/models/master/v0_10/det/yolo-master-n.yaml"
IMGSZ_V010 = 320


# ---------------------------------------------------------------------------
# synthetic dataset: colored rectangles on noise, varied aspect ratios
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def synth_dataset(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("synthdet")
    img_dir = root / "images" / "val"
    lbl_dir = root / "labels" / "val"
    img_dir.mkdir(parents=True)
    lbl_dir.mkdir(parents=True)
    rng = np.random.default_rng(1234)
    palette = rng.integers(40, 255, (8, 3))
    for i in range(N_IMAGES):
        h0 = int(rng.integers(120, 280))
        w0 = int(rng.integers(120, 280))
        im = rng.integers(0, 60, (h0, w0, 3)).astype(np.uint8)
        rows = []
        for _ in range(int(rng.integers(1, 5))):
            c = int(rng.integers(0, 8))
            bw = int(rng.integers(w0 // 8, w0 // 2))
            bh = int(rng.integers(h0 // 8, h0 // 2))
            x1 = int(rng.integers(0, w0 - bw))
            y1 = int(rng.integers(0, h0 - bh))
            cv2.rectangle(im, (x1, y1), (x1 + bw, y1 + bh), palette[c].tolist(), -1)
            xc, yc = (x1 + bw / 2) / w0, (y1 + bh / 2) / h0
            rows.append(f"{c} {xc:.6f} {yc:.6f} {bw / w0:.6f} {bh / h0:.6f}")
        cv2.imwrite(str(img_dir / f"{i:05d}.png"), im)
        (lbl_dir / f"{i:05d}.txt").write_text("\n".join(rows) + "\n")
    names = {i: f"class{i}" for i in range(NC)}
    yaml_path = root / "data.yaml"
    lines = [f"path: {root}", "train: images/val", "val: images/val", "names:"]
    lines += [f"  {k}: {v}" for k, v in names.items()]
    yaml_path.write_text("\n".join(lines) + "\n")
    return yaml_path


def _train_pair(ref_yaml, our_name, imgsz, synth_dataset, steps=300, lr=3e-3):
    """Reference torch model BRIEFLY TRAINED on the synthetic set (random
    init produces constant bias-dominated scores — keep sets would be empty
    or pure ties and the mAP gate would compare 0 with 0), plus our model
    with the identical imported weights."""
    import cv2
    import torch

    from yolo_master_tpu.data.letterbox import letterbox
    from yolo_master_tpu.nn.tasks import DetectionModel as JaxModel
    from yolo_master_tpu.utils.torch_import import import_state_dict

    torch.manual_seed(0)
    from ultralytics.cfg import get_cfg
    from ultralytics.nn.tasks import DetectionModel as TorchModel
    from ultralytics.utils.loss import v8DetectionLoss

    tm = TorchModel(ref_yaml, verbose=False)
    tm.args = get_cfg()
    criterion = v8DetectionLoss(tm)

    # load the whole synthetic set once (96 imgs: fits easily)
    img_dir = synth_dataset.parent / "images" / "val"
    lbl_dir = synth_dataset.parent / "labels" / "val"
    imgs, targets = [], []
    for i, f in enumerate(sorted(img_dir.glob("*.png"))):
        im = cv2.imread(str(f))
        lb, ratio, pad = letterbox(im, imgsz, scaleup=False)
        imgs.append(lb[..., ::-1].astype(np.float32).transpose(2, 0, 1) / 255.0)
        h0, w0 = im.shape[:2]
        for line in (lbl_dir / (f.stem + ".txt")).read_text().splitlines():
            c, xc, yc, w, h = map(float, line.split())
            # normalized-in-original -> normalized-in-letterboxed
            xc = (xc * w0 * ratio[0] + pad[0]) / imgsz
            yc = (yc * h0 * ratio[1] + pad[1]) / imgsz
            targets.append([i, c, xc, yc, w * w0 * ratio[0] / imgsz, h * h0 * ratio[1] / imgsz])
    X = torch.from_numpy(np.stack(imgs))
    T = torch.tensor(targets, dtype=torch.float32)

    # 300 steps @3e-3 measured to reach max score ~0.97 with ~140 above-conf
    # candidates per image on this set (shorter runs leave every score under
    # the 0.001 val threshold and the gate would compare 0 with 0)
    opt = torch.optim.Adam(tm.parameters(), lr=lr)
    tm.train()
    g = torch.Generator().manual_seed(3)
    for step in range(steps):
        sel = torch.randperm(len(X), generator=g)[:8]
        rows = torch.cat([T[T[:, 0] == int(s)] for s in sel])
        remap = {int(s): j for j, s in enumerate(sel)}
        bidx = torch.tensor([remap[int(r)] for r in rows[:, 0]], dtype=torch.float32)
        batch = {"batch_idx": bidx, "cls": rows[:, 1], "bboxes": rows[:, 2:6]}
        preds = tm(X[sel])
        loss, _ = criterion(preds, batch)
        opt.zero_grad()
        loss.sum().backward()
        opt.step()
    tm.eval()
    jm = JaxModel(our_name)
    params = import_state_dict(jm.init_params(0), tm.state_dict(), strict=True)
    return tm, jm, params


@pytest.fixture(scope="module")
def pair(torch_reference, synth_dataset):
    return _train_pair(REF_YAML, "yolo-master-n", IMGSZ, synth_dataset)


def _stub_torchvision():
    """The image has no torchvision; the reference validator imports it and
    its NMS routes through torchvision.ops.nms when the module is loaded.
    Provide a stub backed by the reference's own TorchNMS.nms (documented to
    match torchvision behavior exactly, reference utils/nms.py:246)."""
    import sys
    import types

    if "torchvision" in sys.modules:
        return
    from ultralytics.utils.nms import TorchNMS

    import importlib.machinery

    tv = types.ModuleType("torchvision")
    ops = types.ModuleType("torchvision.ops")
    ops.nms = lambda boxes, scores, iou_thres: TorchNMS.nms(boxes, scores, iou_thres)
    tv.ops = ops
    tv.__version__ = "0.19.0"
    # a real ModuleSpec so later importlib.util.find_spec("torchvision")
    # probes (e.g. transformers feature detection) don't raise
    tv.__spec__ = importlib.machinery.ModuleSpec("torchvision", loader=None)
    ops.__spec__ = importlib.machinery.ModuleSpec("torchvision.ops", loader=None)
    tv.__ymt_stub__ = True  # marker so the module teardown can uninstall it
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.ops"] = ops


@pytest.fixture(scope="module", autouse=True)
def _uninstall_torchvision_stub():
    """Remove the stub after this module's tests: a lingering fake torchvision
    makes transformers' find_spec availability probe succeed and then crash on
    real imports (seen as an ordering-dependent failure in the CLIP parity
    test)."""
    import sys

    yield
    tv = sys.modules.get("torchvision")
    if tv is not None and getattr(tv, "__ymt_stub__", False):
        sys.modules.pop("torchvision", None)
        sys.modules.pop("torchvision.ops", None)


def _run_reference_val(tm, data_yaml, tmp_dir, imgsz=IMGSZ):
    from pathlib import Path

    _stub_torchvision()
    from ultralytics.models.yolo.detect import DetectionValidator as RefValidator

    args = dict(
        model=None,
        data=str(data_yaml),
        imgsz=imgsz,
        batch=8,
        rect=False,
        device="cpu",
        plots=False,
        save_json=False,
        save_txt=False,
        save_hybrid=False,
        verbose=False,
        half=False,
        task="detect",
        mode="val",
        workers=0,
    )
    v = RefValidator(save_dir=Path(tmp_dir), args=args)
    stats = v(model=tm)
    return stats


def _assert_map_parity(tm, jm, params, synth_dataset, tmp_path, imgsz):
    from yolo_master_tpu.engine.validator import DetectionValidator

    ref_stats = _run_reference_val(tm, synth_dataset, tmp_path, imgsz=imgsz)
    ref_map = float(ref_stats["metrics/mAP50-95(B)"])
    ref_map50 = float(ref_stats["metrics/mAP50(B)"])

    ours = DetectionValidator(
        model=jm, params=params, data=str(synth_dataset), imgsz=imgsz,
        batch=8, max_nms=30000,
    )()
    # the pipeline must do real work for the gate to mean anything
    assert ours["mAP50"] > 0.003, f"degenerate pipeline: ours mAP50={ours['mAP50']}"
    assert abs(ours["mAP50-95"] - ref_map) <= 2e-3, (
        f"mAP50-95 drift: ours {ours['mAP50-95']:.5f} vs ref {ref_map:.5f}"
    )
    assert abs(ours["mAP50"] - ref_map50) <= 2e-3, (
        f"mAP50 drift: ours {ours['mAP50']:.5f} vs ref {ref_map50:.5f}"
    )


def test_full_pipeline_map_parity(pair, synth_dataset, tmp_path):
    """The reference's whole val stack vs ours on identical weights + data."""
    tm, jm, params = pair
    _assert_map_parity(tm, jm, params, synth_dataset, tmp_path, IMGSZ)


def test_full_pipeline_map_parity_v010_320(torch_reference, synth_dataset, tmp_path):
    """Same full-val gate on the RELEASED architecture (v0_10 EsMoE-N — the
    block family in the reference's downloadable checkpoints,
    model-zoo/models.json:5) at 320px (VERDICT r4 next #4). Weight-import
    decoded-output parity for this family lives in test_parity_torch.py:265;
    this closes the loop through BOTH full validators at deploy-adjacent
    scale."""
    tm, jm, params = _train_pair(REF_YAML_V010, "yolo-master-v0_10-n", IMGSZ_V010, synth_dataset)
    _assert_map_parity(tm, jm, params, synth_dataset, tmp_path, IMGSZ_V010)


def test_nms_keepset_parity(pair, synth_dataset, torch_reference):
    """Identical decoded predictions through reference non_max_suppression and
    ours: keep sets (boxes/scores/classes) must match. Inputs are structured
    synthetic images (noise inputs produce bias-dominated exact score ties,
    whose greedy order is tie-break-arbitrary in both stacks); rows are
    compared lexicographically sorted to stay robust to residual ties."""
    import cv2
    import jax.numpy as jnp
    import torch

    from ultralytics.utils.nms import non_max_suppression as ref_nms

    from yolo_master_tpu.data.letterbox import letterbox
    from yolo_master_tpu.nn.module import Context
    from yolo_master_tpu.ops.nms import non_max_suppression as our_nms

    tm, jm, params = pair
    img_dir = synth_dataset.parent / "images" / "val"
    files = sorted(img_dir.glob("*.png"))[:4]
    imgs = []
    for f in files:
        im = cv2.imread(str(f))
        lb, _, _ = letterbox(im, IMGSZ, scaleup=False)
        imgs.append(lb[..., ::-1].astype(np.float32) / 255.0)
    x = np.stack(imgs)
    decoded = np.asarray(jm.forward_predict(params, jnp.asarray(x), Context(training=False)))
    # [B, A, 4+nc] xywh — the shared input for both NMS stacks
    ref_out = ref_nms(
        torch.from_numpy(decoded.transpose(0, 2, 1).copy()),
        conf_thres=0.001, iou_thres=0.7, multi_label=True, max_det=300,
        max_nms=30000, max_time_img=600.0,  # disable the CPU time-budget guard
    )
    ours = our_nms(
        jnp.asarray(decoded), nc=NC, conf_thres=0.001, iou_thres=0.7,
        max_det=300, max_nms=30000, multi_label=True,
    )
    ours = {k: np.asarray(v) for k, v in ours.items()}

    def lex(rows):  # sort [n, 6] rows by (-conf, cls, x1, y1) for tie robustness
        order = np.lexsort((rows[:, 1], rows[:, 0], rows[:, 5], -rows[:, 4]))
        return rows[order]

    total = 0
    for b, ref_det in enumerate(ref_out):
        ref_det = ref_det.numpy()  # [n, 6] x1,y1,x2,y2,conf,cls
        n = int(ours["valid"][b].sum())
        assert n == len(ref_det), f"img {b}: keep count {n} vs {len(ref_det)}"
        total += n
        ours_det = np.concatenate(
            [ours["boxes"][b, :n], ours["scores"][b, :n, None], ours["classes"][b, :n, None]], -1
        )
        a, r = lex(ours_det), lex(ref_det)
        np.testing.assert_allclose(a[:, 4], r[:, 4], atol=1e-5, err_msg=f"img {b} scores")
        np.testing.assert_array_equal(a[:, 5].astype(int), r[:, 5].astype(int), err_msg=f"img {b} classes")
        np.testing.assert_allclose(a[:, :4], r[:, :4], atol=1e-3, err_msg=f"img {b} boxes")
    assert total > 50, f"keep sets too small to be meaningful ({total})"


def test_ap_per_class_parity(torch_reference):
    """Fixed-seed match stats through reference ap_per_class and ours."""
    from ultralytics.utils.metrics import ap_per_class as ref_ap

    from yolo_master_tpu.utils.metrics import ap_per_class as our_ap

    rng = np.random.default_rng(3)
    D, L, nc = 2000, 600, 12
    conf = rng.uniform(0.001, 1.0, D).astype(np.float32)
    pred_cls = rng.integers(0, nc, D).astype(np.float32)
    target_cls = rng.integers(0, nc, L).astype(np.float32)
    # tp correlated with conf so the PR curves are non-trivial
    base = rng.uniform(0, 1, D) < conf * 0.8
    tp = np.zeros((D, 10), bool)
    for j in range(10):
        tp[:, j] = base & (rng.uniform(0, 1, D) < 1.0 - j * 0.08)
    tp = np.sort(tp, axis=1)[:, ::-1]  # monotone over IoU thresholds

    r_tp, r_fp, r_p, r_r, r_f1, r_ap, r_cls, *_ = ref_ap(tp, conf, pred_cls, target_cls)
    ours = our_ap(tp, conf, pred_cls, target_cls)

    np.testing.assert_array_equal(ours["classes"], r_cls)
    np.testing.assert_allclose(ours["ap"], r_ap, atol=1e-9)
    np.testing.assert_allclose(ours["precision"], r_p, atol=1e-9)
    np.testing.assert_allclose(ours["recall"], r_r, atol=1e-9)
    np.testing.assert_allclose(ours["f1"], r_f1, atol=1e-9)
