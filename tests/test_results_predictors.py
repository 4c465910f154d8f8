"""Results API containers (Masks/Keypoints/Probs/OBB) + per-task predictors
(VERDICT r1 row 5 + task predict routing)."""

import jax.numpy as jnp
import numpy as np
import pytest

from yolo_master_tpu.engine.results import OBB, Boxes, Keypoints, Masks, Probs, Results

ORIG = (100, 200)  # h, w


def _img():
    return np.full((*ORIG, 3), 90, np.uint8)


def test_boxes_track_layout():
    b6 = Boxes(np.array([[10, 10, 50, 60, 0.9, 2]]), ORIG)
    assert not b6.is_track and b6.id is None
    assert b6.conf[0] == pytest.approx(0.9) and b6.cls[0] == 2
    b7 = Boxes(np.array([[10, 10, 50, 60, 7, 0.8, 1]]), ORIG)
    assert b7.is_track and b7.id[0] == 7
    assert b7.conf[0] == pytest.approx(0.8) and b7.cls[0] == 1
    assert np.allclose(b7.xyxy, [[10, 10, 50, 60]])


def test_masks_polygons_and_normalized():
    m = np.zeros((1, *ORIG), bool)
    m[0, 20:40, 30:70] = True
    masks = Masks(m, ORIG)
    seg = masks.xy[0]
    assert len(seg) >= 4
    assert seg[:, 0].min() >= 29 and seg[:, 0].max() <= 70
    segn = masks.xyn[0]
    assert segn[:, 0].max() <= 1.0 and segn[:, 1].max() <= 1.0


def test_keypoints_conf_and_norm():
    k = Keypoints(np.array([[[100, 50, 0.9], [20, 10, 0.1]]]), ORIG)
    assert k.has_visible and k.conf.shape == (1, 2)
    assert np.allclose(k.xyn[0, 0], [0.5, 0.5])


def test_probs_topk():
    p = Probs(np.array([0.1, 0.6, 0.3]))
    assert p.top1 == 1 and p.top1conf == pytest.approx(0.6)
    assert p.top5 == [1, 2, 0]


def test_obb_corners_and_aabb():
    # axis-aligned at angle 0: corners == box corners
    o = OBB(np.array([[50, 30, 40, 20, 0.0, 0.9, 0]]), ORIG)
    pts = o.xyxyxyxy[0]
    assert sorted(pts[:, 0].tolist()) == [30, 30, 70, 70]
    assert np.allclose(o.xyxy[0], [30, 20, 70, 40])
    # 90deg rotation swaps w/h in the AABB
    o90 = OBB(np.array([[50, 30, 40, 20, np.pi / 2, 0.9, 0]]), ORIG)
    aabb = o90.xyxy[0]
    assert (aabb[2] - aabb[0]) == pytest.approx(20, abs=1e-4)
    assert (aabb[3] - aabb[1]) == pytest.approx(40, abs=1e-4)


def test_results_summary_save_txt_csv_crop(tmp_path):
    boxes = np.array([[10, 10, 50, 60, 0.9, 0]])
    m = np.zeros((1, *ORIG), bool)
    m[0, 10:60, 10:50] = True
    k = np.array([[[30, 30, 1.0], [40, 50, 0.8]]])
    r = Results(_img(), path="x.jpg", names={0: "thing"}, boxes=boxes, masks=m, keypoints=k)
    s = r.summary(normalize=True)
    assert s[0]["name"] == "thing" and "segments" in s[0] and "keypoints" in s[0]
    csv = r.to_csv()
    assert csv.startswith("name,") and "thing" in csv

    txt = tmp_path / "labels.txt"
    r.save_txt(str(txt), save_conf=True)
    row = txt.read_text().split()
    assert row[0] == "0" and float(row[-1]) == pytest.approx(0.9)

    crops = r.save_crop(str(tmp_path / "crops"), "x.jpg")
    assert len(crops) == 1

    img = r.plot()
    assert img.shape == r.orig_img.shape and img.dtype == np.uint8


def test_results_obb_and_probs_summary():
    r = Results(_img(), names={1: "b"}, obb=np.array([[50, 30, 40, 20, 0.1, 0.7, 1]]))
    s = r.summary()
    assert s[0]["name"] == "b" and "x1" in s[0]["box"] and "x4" in s[0]["box"]
    rp = Results(_img(), names={2: "c"}, probs=np.array([0.1, 0.2, 0.7]))
    assert rp.summary()[0]["name"] == "c"
    assert len(rp.plot())


# ---------------------------------------------------------------------------
# Task predictors over tiny models
# ---------------------------------------------------------------------------

def _mini_backbone():
    return [
        [-1, 1, "Conv", [16, 3, 2]],
        [-1, 1, "Conv", [32, 3, 2]],
        [-1, 1, "Conv", [32, 3, 2]],
        [-1, 1, "Conv", [32, 3, 2]],
        [-1, 1, "Conv", [32, 3, 2]],
    ]


def _scene():
    img = np.full((120, 160, 3), 110, np.uint8)
    img[30:80, 40:120] = (0, 0, 230)
    return img


def test_segmentation_predictor_returns_masks():
    from yolo_master_tpu.engine.predictors_task import SegmentationPredictor
    from yolo_master_tpu.nn.tasks import SegmentationModel

    cfg = {"nc": 1, "backbone": _mini_backbone(), "head": [[[2, 3, 4], 1, "Segment", ["nc", 8, 32]]]}
    model = SegmentationModel(cfg)
    pred = SegmentationPredictor(model, model.init_params(0), imgsz=96, conf=1e-6, max_det=4, max_nms=256)
    r = pred(_scene())[0]
    assert r.boxes is not None and len(r.boxes) > 0
    assert r.masks is not None and r.masks.data.shape[1:] == (120, 160)


def test_pose_predictor_returns_keypoints():
    from yolo_master_tpu.engine.predictors_task import PosePredictor
    from yolo_master_tpu.nn.tasks import PoseModel

    cfg = {"nc": 1, "kpt_shape": [3, 3],
           "backbone": _mini_backbone(), "head": [[[2, 3, 4], 1, "Pose", ["nc", "kpt_shape"]]]}
    model = PoseModel(cfg)
    pred = PosePredictor(model, model.init_params(0), imgsz=96, conf=1e-6, max_det=4, max_nms=256)
    r = pred(_scene())[0]
    assert r.keypoints is not None and r.keypoints.data.shape[1:] == (3, 3)
    assert r.keypoints.xy[..., 0].max() <= 160


def test_obb_predictor_returns_obb():
    from yolo_master_tpu.engine.predictors_task import OBBPredictor
    from yolo_master_tpu.nn.tasks import OBBModel

    cfg = {"nc": 1, "backbone": _mini_backbone(), "head": [[[2, 3, 4], 1, "OBB", ["nc", 1]]]}
    model = OBBModel(cfg)
    pred = OBBPredictor(model, model.init_params(0), imgsz=96, conf=1e-6, max_det=4, max_nms=256)
    r = pred(_scene())[0]
    assert r.obb is not None and r.boxes is None
    assert r.obb.xywhr.shape[-1] == 5


def test_classification_predictor_returns_probs():
    from yolo_master_tpu.engine.predictors_task import ClassificationPredictor
    from yolo_master_tpu.nn.tasks import ClassificationModel

    cfg = {"nc": 4, "backbone": _mini_backbone(), "head": [[-1, 1, "Classify", ["nc"]]]}
    model = ClassificationModel(cfg)
    pred = ClassificationPredictor(model, model.init_params(0), imgsz=64)
    r = pred(_scene())[0]
    assert r.probs is not None and len(r.probs) == 4
    assert r.probs.data.sum() == pytest.approx(1.0, abs=1e-4)


def test_facade_fuse_is_exact():
    """YOLO.fuse() (BN fold + s2d stem rewrite) must not change predictions."""
    from yolo_master_tpu.models import YOLO

    cfg = {"nc": 1, "backbone": _mini_backbone(), "head": [[[2, 3, 4], 1, "Detect", ["nc"]]]}
    img = _scene()
    m = YOLO(cfg, task="detect")
    r0 = m.predict(img, imgsz=96, conf=1e-6, max_det=4, max_nms=256)[0]
    m.fuse()
    r1 = m.predict(img, imgsz=96, conf=1e-6, max_det=4, max_nms=256)[0]
    assert len(r0) == len(r1)
    if len(r0):
        np.testing.assert_allclose(r0.boxes.xyxy, r1.boxes.xyxy, atol=0.1)
        np.testing.assert_allclose(r0.boxes.conf, r1.boxes.conf, atol=1e-3)


def test_results_verbose_and_to_df():
    """verbose() class-count string (reference results.py:658) + to_df."""
    boxes = np.array([[10, 10, 50, 60, 0.9, 0], [20, 20, 40, 40, 0.8, 0], [5, 5, 30, 30, 0.7, 1]])
    r = Results(_img(), names={0: "person", 1: "bus"}, boxes=boxes)
    assert r.verbose() == "2 persons, 1 bus, "
    df = r.to_df()
    assert list(df["name"]) == ["person", "person", "bus"]
    empty = Results(_img(), names={}, boxes=np.zeros((0, 6)))
    assert "no detections" in empty.verbose()
    rp = Results(_img(), names={2: "c"}, probs=np.array([0.1, 0.2, 0.7]))
    assert rp.verbose().startswith("c 0.70")
