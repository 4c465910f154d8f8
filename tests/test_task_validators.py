"""Task dataset + validator gates on synthetic data (seg polygons, pose
keypoints, DOTA-style OBB corners, folder classification)."""

import numpy as np
import pytest


@pytest.fixture(scope="session")
def task_data_root(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("task_ds")
    rng = np.random.default_rng(0)
    for split in ("train", "val"):
        for sub in ("images", "labels"):
            (root / sub / split).mkdir(parents=True)
        for i in range(4):
            img = np.full((96, 96, 3), 120, np.uint8)
            x1, y1 = int(rng.integers(5, 40)), int(rng.integers(5, 40))
            w, h = int(rng.integers(25, 40)), int(rng.integers(25, 40))
            cv2.rectangle(img, (x1, y1), (x1 + w, y1 + h), (0, 0, 220), -1)
            cv2.imwrite(str(root / "images" / split / f"{i:02d}.jpg"), img)
            xc, yc = (x1 + w / 2) / 96, (y1 + h / 2) / 96
            # seg polygon = the rectangle corners
            seg = f"0 {x1/96:.4f} {y1/96:.4f} {(x1+w)/96:.4f} {y1/96:.4f} {(x1+w)/96:.4f} {(y1+h)/96:.4f} {x1/96:.4f} {(y1+h)/96:.4f}"
            # pose: box + 3 kpts at corners/center
            kpts = f"{x1/96:.4f} {y1/96:.4f} 1 {xc:.4f} {yc:.4f} 1 {(x1+w)/96:.4f} {(y1+h)/96:.4f} 1"
            pose = f"0 {xc:.4f} {yc:.4f} {w/96:.4f} {h/96:.4f} {kpts}"
            obb = seg  # same corner syntax
            (root / "labels" / split / f"{i:02d}.txt").write_text("\n".join([seg]))
            (root / f"labels_pose_{split}_{i:02d}").write_text(pose)  # unused marker
    (root / "data.yaml").write_text(f"path: {root}\ntrain: images/train\nval: images/val\nnames:\n  0: thing\n")
    return root


def test_segment_dataset_and_validator(task_data_root):
    from yolo_master_tpu.data.dataset import SegmentDataset
    from yolo_master_tpu.engine.validators_task import SegmentationValidator
    from yolo_master_tpu.nn.tasks import SegmentationModel

    cfg = {
        "nc": 1,
        "backbone": [
            [-1, 1, "Conv", [16, 3, 2]],
            [-1, 1, "Conv", [32, 3, 2]],
            [-1, 1, "Conv", [32, 3, 2]],
            [-1, 1, "Conv", [32, 3, 2]],
            [-1, 1, "Conv", [32, 3, 2]],
        ],
        "head": [[[2, 3, 4], 1, "Segment", ["nc", 8, 32]]],
    }
    model = SegmentationModel(cfg)
    p = model.init_params(0)
    ds = SegmentDataset(str(task_data_root / "data.yaml"), split="val", imgsz=96, max_gt=8)
    batch = next(iter(__import__("yolo_master_tpu.data.dataset", fromlist=["DataLoader"]).DataLoader(ds, 2, shuffle=False).epoch(0)))
    assert batch["masks"].shape[2:] == (24, 24)
    assert batch["masks"][batch["mask"]].sum() > 0, "polygon must rasterize"
    v = SegmentationValidator(model, data=str(task_data_root / "data.yaml"), imgsz=96, batch=2, max_gt=8)
    out = v(params=p, dataset=ds)
    assert {"mAP50", "mask_mAP50", "fitness"} <= set(out)


def test_pose_dataset_shapes(task_data_root):
    import cv2

    from yolo_master_tpu.data.dataset import DataLoader, PoseDataset

    # write pose labels over the same images
    for split in ("val",):
        for f in sorted((task_data_root / "labels" / split).glob("*.txt")):
            seg = f.read_text().split()
            xs = np.asarray([float(v) for v in seg[1::2]])
            ys = np.asarray([float(v) for v in seg[2::2]])
            xc, yc = xs.mean(), ys.mean()
            w, h = xs.max() - xs.min(), ys.max() - ys.min()
            kpts = f"{xs[0]:.4f} {ys[0]:.4f} 1 {xc:.4f} {yc:.4f} 1 {xs[2]:.4f} {ys[2]:.4f} 1"
            f.write_text(f"0 {xc:.4f} {yc:.4f} {w:.4f} {h:.4f} {kpts}")
    ds = PoseDataset(str(task_data_root / "data.yaml"), split="val", imgsz=96, max_gt=8, kpt_shape=(3, 3))
    batch = next(iter(DataLoader(ds, 2, shuffle=False).epoch(0)))
    assert batch["keypoints"].shape == (2, 8, 3, 3)
    valid = batch["keypoints"][batch["mask"]]
    assert (valid[..., :2] >= 0).all() and (valid[..., :2] <= 96).all()


def test_obb_dataset_and_validator(task_data_root, tmp_path):
    from yolo_master_tpu.data.dataset import DataLoader, OBBDataset
    from yolo_master_tpu.engine.validators_task import OBBValidator
    from yolo_master_tpu.nn.tasks import OBBModel

    # restore corner labels for obb (pose test overwrote val labels)
    import cv2

    for split in ("val",):
        for i, f in enumerate(sorted((task_data_root / "labels" / split).glob("*.txt"))):
            img = cv2.imread(str(task_data_root / "images" / split / f"{f.stem}.jpg"))
            f.write_text("0 0.2 0.2 0.6 0.2 0.6 0.5 0.2 0.5")
    ds = OBBDataset(str(task_data_root / "data.yaml"), split="val", imgsz=96, max_gt=8)
    batch = next(iter(DataLoader(ds, 2, shuffle=False).epoch(0)))
    rb = batch["rboxes"][batch["mask"]]
    assert (rb[:, 2] >= rb[:, 3]).all(), "canonical xywhr keeps w >= h"

    cfg = {
        "nc": 1,
        "backbone": [
            [-1, 1, "Conv", [16, 3, 2]],
            [-1, 1, "Conv", [32, 3, 2]],
            [-1, 1, "Conv", [32, 3, 2]],
            [-1, 1, "Conv", [32, 3, 2]],
            [-1, 1, "Conv", [32, 3, 2]],
        ],
        "head": [[[2, 3, 4], 1, "OBB", ["nc", 1]]],
    }
    model = OBBModel(cfg)
    out = OBBValidator(model, data=str(task_data_root / "data.yaml"), imgsz=96, batch=2, max_gt=8)(
        params=model.init_params(0), dataset=ds
    )
    assert "mAP50" in out


def test_classification_dataset(tmp_path):
    import cv2

    from yolo_master_tpu.data.dataset import ClassificationDataset, DataLoader

    for ci, cname in enumerate(["cats", "dogs"]):
        (tmp_path / "train" / cname).mkdir(parents=True)
        for i in range(3):
            img = np.full((64, 64, 3), 60 + 120 * ci, np.uint8)
            cv2.imwrite(str(tmp_path / "train" / cname / f"{i}.jpg"), img)
    ds = ClassificationDataset(str(tmp_path / "train"), imgsz=32)
    assert len(ds) == 6 and ds.names == {0: "cats", 1: "dogs"}
    batch = next(iter(DataLoader(ds, 4, shuffle=True).epoch(0)))
    assert batch["images"].shape == (4, 32, 32, 3)
    assert set(np.unique(batch["classes"])) <= {0, 1}
