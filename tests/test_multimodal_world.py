"""Multimodal + grounding datasets and the WorldTrainer task routing
(VERDICT r1 row 39; reference data/dataset.py:322,418 + yolo/world/train.py)."""

import json

import numpy as np
import pytest


@pytest.fixture(scope="module")
def det_root(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("mm_ds")
    for split, n in (("train", 6), ("val", 2)):
        (root / "images" / split).mkdir(parents=True)
        (root / "labels" / split).mkdir(parents=True)
        for i in range(n):
            img = np.full((96, 96, 3), 120, np.uint8)
            cv2.rectangle(img, (20, 20), (70, 60), (0, 0, 220), -1)
            cv2.imwrite(str(root / "images" / split / f"{i:02d}.jpg"), img)
            (root / "labels" / split / f"{i:02d}.txt").write_text("0 0.47 0.42 0.52 0.42\n")
    (root / "data.yaml").write_text(
        f"path: {root}\ntrain: images/train\nval: images/val\nnames:\n  0: red box\n")
    return root


def test_multimodal_dataset_texts(det_root):
    from yolo_master_tpu.data.multimodal import YOLOMultiModalDataset

    ds = YOLOMultiModalDataset(str(det_root / "data.yaml"), split="train", imgsz=96,
                               neg_prompts=["cat", "dog", "plane"], neg_samples=2)
    texts = ds.sample_texts(seed=1)
    assert texts[0] == "red box" and len(texts) == 3
    # positives stable across epochs
    assert ds.sample_texts(seed=2)[0] == "red box"


def test_grounding_dataset_phrase_table(det_root, tmp_path):
    from yolo_master_tpu.data.multimodal import GroundingDataset

    caption = "a red box next to a blue ball"
    ann = {
        "images": [{"id": 1, "file_name": "images/train/00.jpg", "height": 96, "width": 96,
                    "caption": caption}],
        "annotations": [
            {"image_id": 1, "bbox": [20, 20, 50, 40], "tokens_positive": [[2, 9]]},   # "red box"
            {"image_id": 1, "bbox": [5, 5, 10, 10], "tokens_positive": [[20, 29]]},   # "blue ball"
        ],
    }
    jf = tmp_path / "grounding.json"
    jf.write_text(json.dumps(ann))
    ds = GroundingDataset(json_file=str(jf), img_root=str(det_root), imgsz=96)
    assert ds.nc == 2 and ds.phrase_table == ["red box", "blue ball"]
    assert len(ds) == 1
    lbl = ds.labels[0]
    assert set(lbl[:, 0].astype(int)) == {0, 1}


@pytest.mark.slow
def test_world_trainer_routes_and_trains(det_root):
    from yolo_master_tpu.engine.trainers_task import TASK_TRAINERS, WorldTrainer
    from yolo_master_tpu.nn.tasks import WorldModel

    assert TASK_TRAINERS["world"] is WorldTrainer

    cfg = {
        "nc": 1,
        "backbone": [
            [-1, 1, "Conv", [16, 3, 2]],
            [-1, 1, "Conv", [32, 3, 2]],
            [-1, 1, "Conv", [32, 3, 2]],
            [-1, 1, "Conv", [32, 3, 2]],
            [-1, 1, "Conv", [32, 3, 2]],
        ],
        "head": [[[2, 3, 4], 1, "WorldDetect", ["nc", 64, False]]],
    }

    class Stub:
        pass

    yolo = Stub()
    yolo.model = WorldModel(cfg)
    yolo.params = yolo.model.init_params(0)
    yolo.names = {0: "red box"}
    trainer = WorldTrainer(
        yolo, data=str(det_root / "data.yaml"), epochs=2, batch=4, imgsz=96, max_gt=8,
        optimizer="SGD", lr0=0.01, warmup_epochs=0, nbs=4, amp=False,
        patience=1000, close_mosaic=0, hyp={"mosaic": 0.0}, val=False,
        neg_prompts=["cat", "dog"], neg_samples=1,
    )
    # vocabulary installed: nc grew to 1 positive + 1 negative prompt
    assert yolo.model.nc == 2
    out = trainer.train()
    assert "best_fitness" in out
