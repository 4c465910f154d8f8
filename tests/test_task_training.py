"""Per-task end-to-end training smokes (VERDICT r1 #4): seg/pose/obb/cls/
semantic each train a few epochs through the shared trainer loop via the
task_map routing (reference models/yolo/model.py:88 task_map), with the
task loss, dataset, and validator wired end-to-end."""

import numpy as np
import pytest


class Stub:
    pass


def _mini_backbone():
    return [
        [-1, 1, "Conv", [16, 3, 2]],
        [-1, 1, "Conv", [32, 3, 2]],
        [-1, 1, "Conv", [32, 3, 2]],
        [-1, 1, "Conv", [32, 3, 2]],
        [-1, 1, "Conv", [32, 3, 2]],
    ]


def _train(model, data, trainer_cls, epochs=3, **kw):
    yolo = Stub()
    yolo.model = model
    yolo.params = model.init_params(0)
    trainer = trainer_cls(
        yolo, data=data, epochs=epochs, batch=4, imgsz=96, max_gt=8,
        optimizer="SGD", lr0=0.01, warmup_epochs=0, nbs=4, amp=False,
        patience=1000, close_mosaic=0, hyp={"mosaic": 0.0}, **kw,
    )
    return trainer, trainer.train()


@pytest.fixture(scope="module")
def det_style_root(tmp_path_factory):
    """Images with one colored rectangle + per-task labels for seg/pose/obb."""
    import cv2

    root = tmp_path_factory.mktemp("task_train_ds")
    rng = np.random.default_rng(3)
    recs = {}
    for split, n in (("train", 8), ("val", 4)):
        (root / "images" / split).mkdir(parents=True)
        (root / "labels" / split).mkdir(parents=True)
        for i in range(n):
            img = np.full((96, 96, 3), 120, np.uint8)
            x1, y1 = int(rng.integers(5, 40)), int(rng.integers(5, 40))
            w, h = int(rng.integers(30, 45)), int(rng.integers(25, 40))
            cv2.rectangle(img, (x1, y1), (x1 + w, y1 + h), (0, 0, 220), -1)
            cv2.imwrite(str(root / "images" / split / f"{i:02d}.jpg"), img)
            recs[(split, i)] = (x1, y1, w, h)
    (root / "data.yaml").write_text(f"path: {root}\ntrain: images/train\nval: images/val\nnames:\n  0: thing\n")
    return root, recs


def _write_labels(root, recs, fmt):
    for (split, i), (x1, y1, w, h) in recs.items():
        xs = np.array([x1, x1 + w, x1 + w, x1]) / 96
        ys = np.array([y1, y1, y1 + h, y1 + h]) / 96
        xc, yc = (x1 + w / 2) / 96, (y1 + h / 2) / 96
        if fmt == "seg":  # polygon corners
            row = "0 " + " ".join(f"{x:.4f} {y:.4f}" for x, y in zip(xs, ys))
        elif fmt == "obb":
            row = "0 " + " ".join(f"{x:.4f} {y:.4f}" for x, y in zip(xs, ys))
        elif fmt == "pose":  # box + 3 kpts (two corners + center)
            row = (f"0 {xc:.4f} {yc:.4f} {w/96:.4f} {h/96:.4f} "
                   f"{xs[0]:.4f} {ys[0]:.4f} 1 {xc:.4f} {yc:.4f} 1 {xs[2]:.4f} {ys[2]:.4f} 1")
        (root / "labels" / split / f"{i:02d}.txt").write_text(row)


@pytest.mark.slow
def test_segment_training(det_style_root, tmp_path):
    from yolo_master_tpu.engine.trainers_task import SegmentationTrainer
    from yolo_master_tpu.nn.tasks import SegmentationModel

    root, recs = det_style_root
    _write_labels(root, recs, "seg")
    cfg = {"nc": 1, "backbone": _mini_backbone(), "head": [[[2, 3, 4], 1, "Segment", ["nc", 8, 32]]]}
    trainer, out = _train(SegmentationModel(cfg), str(root / "data.yaml"), SegmentationTrainer,
                          save_dir=str(tmp_path / "seg"))
    assert {"mask_mAP50", "fitness"} <= set(out)
    assert (tmp_path / "seg" / "last.npz").exists()


@pytest.mark.slow
def test_pose_training(det_style_root, tmp_path):
    from yolo_master_tpu.engine.trainers_task import PoseTrainer
    from yolo_master_tpu.nn.tasks import PoseModel

    root, recs = det_style_root
    _write_labels(root, recs, "pose")
    cfg = {"nc": 1, "kpt_shape": [3, 3], "backbone": _mini_backbone(),
           "head": [[[2, 3, 4], 1, "Pose", ["nc", [3, 3]]]]}
    trainer, out = _train(PoseModel(cfg), str(root / "data.yaml"), PoseTrainer,
                          kpt_shape=(3, 3), save_dir=str(tmp_path / "pose"))
    assert {"pose_mAP50", "fitness"} <= set(out)


@pytest.mark.slow
def test_obb_training(det_style_root, tmp_path):
    from yolo_master_tpu.engine.trainers_task import OBBTrainer
    from yolo_master_tpu.nn.tasks import OBBModel

    root, recs = det_style_root
    _write_labels(root, recs, "obb")
    cfg = {"nc": 1, "backbone": _mini_backbone(), "head": [[[2, 3, 4], 1, "OBB", ["nc", 1]]]}
    trainer, out = _train(OBBModel(cfg), str(root / "data.yaml"), OBBTrainer,
                          save_dir=str(tmp_path / "obb"))
    assert "mAP50" in out


@pytest.mark.slow
def test_classify_training(tmp_path):
    import cv2

    from yolo_master_tpu.engine.trainers_task import ClassificationTrainer
    from yolo_master_tpu.nn.tasks import ClassificationModel

    root = tmp_path / "clsds"
    for split, n in (("train", 6), ("val", 3)):
        for ci, cname in enumerate(["dark", "bright"]):
            (root / split / cname).mkdir(parents=True)
            for i in range(n):
                img = np.full((96, 96, 3), 40 + 170 * ci, np.uint8)
                cv2.imwrite(str(root / split / cname / f"{i}.jpg"), img)
    cfg = {"nc": 2, "backbone": _mini_backbone()[:3], "head": [[-1, 1, "Classify", ["nc"]]]}
    trainer, out = _train(ClassificationModel(cfg), str(root), ClassificationTrainer,
                          epochs=8, save_dir=str(tmp_path / "cls"))
    assert out["top1"] >= 0.99, f"trivial two-tone classification must be learned: {out}"


@pytest.mark.slow
def test_semantic_training(tmp_path):
    import cv2

    from yolo_master_tpu.engine.trainers_task import SemanticTrainer
    from yolo_master_tpu.nn.tasks import SemanticSegmentationModel

    root = tmp_path / "semds"
    rng = np.random.default_rng(5)
    for split, n in (("train", 8), ("val", 4)):
        (root / "images" / split).mkdir(parents=True)
        (root / "labels" / split).mkdir(parents=True)
        for i in range(n):
            img = np.full((96, 96, 3), 120, np.uint8)
            m = np.zeros((96, 96), np.uint8)
            x1, y1 = int(rng.integers(5, 40)), int(rng.integers(5, 40))
            w, h = int(rng.integers(30, 45)), int(rng.integers(25, 40))
            cv2.rectangle(img, (x1, y1), (x1 + w, y1 + h), (0, 0, 220), -1)
            m[y1 : y1 + h, x1 : x1 + w] = 1
            cv2.imwrite(str(root / "images" / split / f"{i:02d}.jpg"), img)
            cv2.imwrite(str(root / "labels" / split / f"{i:02d}.png"), m)
    (root / "data.yaml").write_text(f"path: {root}\ntrain: images/train\nval: images/val\nnames:\n  0: bg\n  1: thing\n")
    cfg = {"nc": 2, "backbone": _mini_backbone()[:4], "head": [[[2, 3], 1, "SemanticSegment", ["nc"]]]}
    trainer, out = _train(SemanticSegmentationModel(cfg), str(root / "data.yaml"), SemanticTrainer,
                          epochs=10, save_dir=str(tmp_path / "sem"))
    assert out["pixel_acc"] > 0.6, f"semantic training failed to learn: {out}"


def test_yolo_facade_task_trainer_routing():
    from yolo_master_tpu.engine.trainers_task import TASK_TRAINERS

    assert set(TASK_TRAINERS) == {
        "detect", "segment", "pose", "obb", "classify", "semantic", "rtdetr", "world", "yoloe",
    }
