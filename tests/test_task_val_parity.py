"""Task-level full-val parity vs the PyTorch reference (VERDICT r3 item 5).

`tests/test_map_parity.py` gates the detect mAP pipeline end-to-end against the
reference's own validator; this module extends that harness to the other three
box-metric tasks, each against the reference's REAL task validator on the SAME
briefly-trained weights and the SAME synthetic dataset:

  * segment — mask mAP via proto expansion + crop + mask_iou
    (reference models/yolo/segment/val.py + utils/ops.py:500 process_mask);
  * pose — OKS mAP with the COCO sigma table and the 0.53 area factor
    (reference models/yolo/pose/val.py + utils/metrics.py:201 kpt_iou);
  * obb — probIoU matching behind rotated fast-NMS
    (reference models/yolo/obb/val.py + utils/nms.py:150-153,193).

The torch models are the reference's own v0 task nano models trained for a few
hundred steps on the synthetic set through the reference's own dataloader and
loss (random init gives bias-dominated constant scores: keep sets would be
empty/tied and every gate would compare 0 with 0); our models run the identical
imported weights.
"""

import numpy as np
import pytest

from test_map_parity import _stub_torchvision  # noqa: F401 (shared stub helper)

pytestmark = pytest.mark.slow

IMGSZ = 160
N_IMAGES = 64
REF_CFG = "/root/reference/ultralytics/cfg/models/master/v0"


# ---------------------------------------------------------------------------
# synthetic datasets
# ---------------------------------------------------------------------------
def _write_yaml(root, extra=""):
    (root / "data.yaml").write_text(
        f"path: {root}\ntrain: images/val\nval: images/val\nnames:\n  0: a\n  1: b\n  2: c\n  3: d\n{extra}"
    )
    return root / "data.yaml"


def _dirs(root):
    img = root / "images" / "val"
    lbl = root / "labels" / "val"
    img.mkdir(parents=True)
    lbl.mkdir(parents=True)
    return img, lbl


def _grid_slots(rng, n):
    """Non-overlapping placement slots (2x2 grid) so overlap_mask semantics
    can't diverge between the stacks."""
    slots = [(gx, gy) for gx in (0, 1) for gy in (0, 1)]
    rng.shuffle(slots)
    return slots[:n]


@pytest.fixture(scope="module")
def seg_dataset(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("synthseg")
    img_dir, lbl_dir = _dirs(root)
    rng = np.random.default_rng(7)
    palette = rng.integers(60, 255, (4, 3))
    for i in range(N_IMAGES):
        h0 = int(rng.integers(120, 220))
        w0 = int(rng.integers(120, 220))
        im = rng.integers(0, 50, (h0, w0, 3)).astype(np.uint8)
        rows = []
        for gx, gy in _grid_slots(rng, int(rng.integers(1, 4))):
            c = int(rng.integers(0, 4))
            # convex polygon (irregular pentagon) inside its grid cell
            cx = (gx + 0.5) * w0 / 2 + rng.uniform(-w0 * 0.05, w0 * 0.05)
            cy = (gy + 0.5) * h0 / 2 + rng.uniform(-h0 * 0.05, h0 * 0.05)
            r = rng.uniform(0.12, 0.2) * min(h0, w0)
            ang = rng.uniform(0, 2 * np.pi)
            pts = np.stack(
                [cx + r * np.cos(ang + 2 * np.pi * k / 5) for k in range(5)]
                + [cy + r * np.sin(ang + 2 * np.pi * k / 5) for k in range(5)]
            ).reshape(2, 5).T
            pts[:, 0] = pts[:, 0].clip(0, w0 - 1)
            pts[:, 1] = pts[:, 1].clip(0, h0 - 1)
            cv2.fillPoly(im, [pts.astype(np.int32)], palette[c].tolist())
            norm = (pts / [w0, h0]).reshape(-1)
            rows.append(f"{c} " + " ".join(f"{v:.6f}" for v in norm))
        cv2.imwrite(str(img_dir / f"{i:05d}.png"), im)
        (lbl_dir / f"{i:05d}.txt").write_text("\n".join(rows) + "\n")
    return _write_yaml(root)


@pytest.fixture(scope="module")
def pose_dataset(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("synthpose")
    img_dir, lbl_dir = _dirs(root)
    rng = np.random.default_rng(11)
    # deterministic 17-kpt template laid out on a 0..1 box grid
    tmpl = np.stack([np.linspace(0.1, 0.9, 17), (np.arange(17) % 5) / 5.0 + 0.1], -1)
    palette = rng.integers(60, 255, (4, 3))
    for i in range(N_IMAGES):
        h0 = int(rng.integers(120, 220))
        w0 = int(rng.integers(120, 220))
        im = rng.integers(0, 50, (h0, w0, 3)).astype(np.uint8)
        rows = []
        for gx, gy in _grid_slots(rng, int(rng.integers(1, 3))):
            c = int(rng.integers(0, 4))
            bw = rng.uniform(0.25, 0.42) * w0 / 1.0
            bh = rng.uniform(0.25, 0.42) * h0 / 1.0
            x1 = gx * w0 / 2 + rng.uniform(0.02, 0.06) * w0
            y1 = gy * h0 / 2 + rng.uniform(0.02, 0.06) * h0
            bw = min(bw, w0 / 2 - (x1 - gx * w0 / 2) - 2)
            bh = min(bh, h0 / 2 - (y1 - gy * h0 / 2) - 2)
            cv2.rectangle(im, (int(x1), int(y1)), (int(x1 + bw), int(y1 + bh)), palette[c].tolist(), -1)
            kx = x1 + tmpl[:, 0] * bw
            ky = y1 + tmpl[:, 1] * bh
            for j in range(17):
                cv2.circle(im, (int(kx[j]), int(ky[j])), 2, (255, 255, 255), -1)
            xc, yc = (x1 + bw / 2) / w0, (y1 + bh / 2) / h0
            kcols = " ".join(f"{kx[j] / w0:.6f} {ky[j] / h0:.6f} 2" for j in range(17))
            rows.append(f"{c} {xc:.6f} {yc:.6f} {bw / w0:.6f} {bh / h0:.6f} {kcols}")
        cv2.imwrite(str(img_dir / f"{i:05d}.png"), im)
        (lbl_dir / f"{i:05d}.txt").write_text("\n".join(rows) + "\n")
    return _write_yaml(root, extra="kpt_shape: [17, 3]\nflip_idx: " + str(list(range(17))) + "\n")


@pytest.fixture(scope="module")
def obb_dataset(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("synthobb")
    img_dir, lbl_dir = _dirs(root)
    rng = np.random.default_rng(13)
    palette = rng.integers(60, 255, (4, 3))
    for i in range(N_IMAGES):
        h0 = int(rng.integers(120, 220))
        w0 = int(rng.integers(120, 220))
        im = rng.integers(0, 50, (h0, w0, 3)).astype(np.uint8)
        rows = []
        for gx, gy in _grid_slots(rng, int(rng.integers(1, 4))):
            c = int(rng.integers(0, 4))
            cx = (gx + 0.5) * w0 / 2
            cy = (gy + 0.5) * h0 / 2
            rw = rng.uniform(0.14, 0.22) * min(h0, w0)
            rh = rng.uniform(0.5, 0.8) * rw
            ang = rng.uniform(0, 180)
            pts = cv2.boxPoints(((cx, cy), (rw * 2, rh * 2), ang))
            pts[:, 0] = pts[:, 0].clip(0, w0 - 1)
            pts[:, 1] = pts[:, 1].clip(0, h0 - 1)
            cv2.fillPoly(im, [pts.astype(np.int32)], palette[c].tolist())
            norm = (pts / [w0, h0]).reshape(-1)
            rows.append(f"{c} " + " ".join(f"{v:.6f}" for v in norm))
        cv2.imwrite(str(img_dir / f"{i:05d}.png"), im)
        (lbl_dir / f"{i:05d}.txt").write_text("\n".join(rows) + "\n")
    return _write_yaml(root)


# ---------------------------------------------------------------------------
# reference-side helpers
# ---------------------------------------------------------------------------
def _train_ref_model(tm, task, data_yaml, steps, lr=3e-3, seed=0):
    """Train the torch model on batches from the reference's OWN val-mode
    dataset + loss so every task-specific batch field (overlap masks, norm
    keypoints, xywhr boxes) is in exactly the format its loss expects."""
    import torch

    from ultralytics.cfg import get_cfg
    from ultralytics.data import build_dataloader, build_yolo_dataset
    from ultralytics.data.utils import check_det_dataset

    torch.manual_seed(seed)
    cfg = get_cfg(overrides=dict(task=task, imgsz=IMGSZ, data=str(data_yaml), mode="train"))
    tm.args = cfg
    data = check_det_dataset(str(data_yaml))
    ds = build_yolo_dataset(cfg, str(data_yaml.parent / "images" / "val"), batch=8, data=data, mode="val", rect=False)
    dl = build_dataloader(ds, batch=8, workers=0, shuffle=True, rank=-1)
    opt = torch.optim.Adam(tm.parameters(), lr=lr)
    tm.train()
    done = 0
    while done < steps:
        for batch in dl:
            batch["img"] = batch["img"].float() / 255.0
            loss, _ = tm.loss(batch)
            opt.zero_grad()
            loss.sum().backward()
            opt.step()
            done += 1
            if done >= steps:
                break
    tm.eval()
    return tm


def _run_ref_val(tm, task, data_yaml, tmp_dir):
    from pathlib import Path

    _stub_torchvision()
    from ultralytics.models.yolo.obb import OBBValidator as RefOBB
    from ultralytics.models.yolo.pose import PoseValidator as RefPose
    from ultralytics.models.yolo.segment import SegmentationValidator as RefSeg

    cls = {"segment": RefSeg, "pose": RefPose, "obb": RefOBB}[task]
    args = dict(
        model=None, data=str(data_yaml), imgsz=IMGSZ, batch=8, rect=False,
        device="cpu", plots=False, save_json=False, save_txt=False,
        save_hybrid=False, verbose=False, half=False, task=task, mode="val",
        workers=0,
    )
    v = cls(save_dir=Path(tmp_dir), args=args)
    return v(model=tm)


def _import_pair(torch_cls, jax_cls, ref_yaml, ours_name):
    """Both models built at nc=4 to match the synthetic datasets (the
    reference trainer would apply the same data-driven nc override)."""
    tm = torch_cls(ref_yaml, nc=4, verbose=False)
    jm = jax_cls(ours_name, nc=4)
    return tm, jm


# ---------------------------------------------------------------------------
# gates
# ---------------------------------------------------------------------------
def test_rotated_nms_keepset_parity(torch_reference):
    """Identical decoded rotated predictions through the reference's rotated
    NMS branch (fast_nms over batch_probiou, utils/nms.py:150-153) and our
    rotated_non_max_suppression: keep sets must match."""
    import jax.numpy as jnp
    import torch

    from ultralytics.utils.nms import non_max_suppression as ref_nms

    from yolo_master_tpu.ops.nms import rotated_non_max_suppression

    rng = np.random.default_rng(5)
    B, A, nc = 3, 400, 6
    xy = rng.uniform(30, 600, (B, A, 2))
    wh = rng.uniform(8, 90, (B, A, 2))
    scores = rng.uniform(0, 1, (B, A, nc)) ** 3  # continuous, no ties
    angle = rng.uniform(-np.pi / 4, 3 * np.pi / 4, (B, A, 1))
    pred = np.concatenate([xy, wh, scores, angle], -1).astype(np.float32)

    ref_out = ref_nms(
        torch.from_numpy(pred.transpose(0, 2, 1).copy()),
        conf_thres=0.25, iou_thres=0.45, multi_label=True, max_det=300,
        max_nms=4096, rotated=True, nc=nc, max_time_img=600.0,
    )
    ours = rotated_non_max_suppression(
        jnp.asarray(pred), nc=nc, conf_thres=0.25, iou_thres=0.45,
        max_det=300, max_nms=A * nc, multi_label=True,
    )
    ours = {k: np.asarray(v) for k, v in ours.items()}

    total = 0
    for b, rdet in enumerate(ref_out):
        rdet = rdet.numpy()  # [n, 7] x,y,w,h,conf,cls,angle
        n = int(ours["valid"][b].sum())
        assert n == len(rdet), f"img {b}: keep count {n} vs {len(rdet)}"
        total += n
        od = np.concatenate(
            [ours["rboxes"][b, :n, :4], ours["scores"][b, :n, None],
             ours["classes"][b, :n, None], ours["rboxes"][b, :n, 4:5]], -1
        )

        def lex(rows):
            order = np.lexsort((rows[:, 0], rows[:, 5], -rows[:, 4]))
            return rows[order]

        a, r = lex(od), lex(rdet)
        np.testing.assert_allclose(a[:, 4], r[:, 4], atol=1e-5, err_msg=f"img {b} scores")
        np.testing.assert_array_equal(a[:, 5].astype(int), r[:, 5].astype(int), err_msg=f"img {b} classes")
        np.testing.assert_allclose(a[:, :4], r[:, :4], atol=1e-3, err_msg=f"img {b} boxes")
        np.testing.assert_allclose(a[:, 6], r[:, 6], atol=1e-4, err_msg=f"img {b} angles")
    assert total > 30, f"keep sets too small to be meaningful ({total})"


def test_segment_val_parity(torch_reference, seg_dataset, tmp_path):
    from ultralytics.nn.tasks import SegmentationModel as TSeg

    from yolo_master_tpu.engine.validators_task import SegmentationValidator
    from yolo_master_tpu.nn.tasks import SegmentationModel as JSeg
    from yolo_master_tpu.utils.torch_import import import_state_dict

    tm, jm = _import_pair(TSeg, JSeg, f"{REF_CFG}/seg/yolo-master-seg-n.yaml", "yolo-master-seg-n")
    _train_ref_model(tm, "segment", seg_dataset, steps=260)
    params = import_state_dict(jm.init_params(0), tm.state_dict(), strict=True)

    ref = _run_ref_val(tm, "segment", seg_dataset, tmp_path)
    ours = SegmentationValidator(jm, params=params, data=str(seg_dataset), imgsz=IMGSZ, batch=8)()

    assert ours["mAP50"] > 0.05, f"degenerate box pipeline: {ours}"
    assert ours["mask_mAP50"] > 0.05, f"degenerate mask pipeline: {ours}"
    for ok, rk in [("mAP50", "metrics/mAP50(B)"), ("mAP50-95", "metrics/mAP50-95(B)"),
                   ("mask_mAP50", "metrics/mAP50(M)"), ("mask_mAP50-95", "metrics/mAP50-95(M)")]:
        assert abs(ours[ok] - float(ref[rk])) <= 5e-3, (
            f"{ok} drift: ours {ours[ok]:.5f} vs ref {float(ref[rk]):.5f}"
        )


def test_pose_val_parity(torch_reference, pose_dataset, tmp_path):
    from ultralytics.nn.tasks import PoseModel as TPose

    from yolo_master_tpu.engine.validators_task import PoseValidator
    from yolo_master_tpu.nn.tasks import PoseModel as JPose
    from yolo_master_tpu.utils.torch_import import import_state_dict

    tm, jm = _import_pair(TPose, JPose, f"{REF_CFG}/pose/yolo-master-pose-n.yaml", "yolo-master-pose-n")
    _train_ref_model(tm, "pose", pose_dataset, steps=300)
    params = import_state_dict(jm.init_params(0), tm.state_dict(), strict=True)

    ref = _run_ref_val(tm, "pose", pose_dataset, tmp_path)
    ours = PoseValidator(jm, params=params, data=str(pose_dataset), imgsz=IMGSZ, batch=8)()

    assert ours["mAP50"] > 0.05, f"degenerate box pipeline: {ours}"
    for ok, rk in [("mAP50", "metrics/mAP50(B)"), ("mAP50-95", "metrics/mAP50-95(B)"),
                   ("pose_mAP50", "metrics/mAP50(P)"), ("pose_mAP50-95", "metrics/mAP50-95(P)")]:
        assert abs(ours[ok] - float(ref[rk])) <= 5e-3, (
            f"{ok} drift: ours {ours[ok]:.5f} vs ref {float(ref[rk]):.5f}"
        )


def test_obb_val_parity(torch_reference, obb_dataset, tmp_path):
    from ultralytics.nn.tasks import OBBModel as TOBB

    from yolo_master_tpu.engine.validators_task import OBBValidator
    from yolo_master_tpu.nn.tasks import OBBModel as JOBB
    from yolo_master_tpu.utils.torch_import import import_state_dict

    tm, jm = _import_pair(TOBB, JOBB, f"{REF_CFG}/obb/yolo-master-obb-n.yaml", "yolo-master-obb-n")
    _train_ref_model(tm, "obb", obb_dataset, steps=260)
    params = import_state_dict(jm.init_params(0), tm.state_dict(), strict=True)

    ref = _run_ref_val(tm, "obb", obb_dataset, tmp_path)
    ours = OBBValidator(jm, params=params, data=str(obb_dataset), imgsz=IMGSZ, batch=8)()

    assert ours["mAP50"] > 0.05, f"degenerate obb pipeline: {ours}"
    for ok, rk in [("mAP50", "metrics/mAP50(B)"), ("mAP50-95", "metrics/mAP50-95(B)")]:
        assert abs(ours[ok] - float(ref[rk])) <= 5e-3, (
            f"{ok} drift: ours {ours[ok]:.5f} vs ref {float(ref[rk]):.5f}"
        )
