"""CLI e2e: every mode of the reference CLI contract (SURVEY §3.5 / VERDICT
r1 #9 "CLI all 6 modes green"). track mode is covered in test_breadth.py."""

import numpy as np
import pytest

from yolo_master_tpu.cfg.cli import entrypoint


@pytest.fixture()
def synth_root(tmp_path):
    import cv2

    root = tmp_path / "ds"
    for split, n in (("train", 8), ("val", 4)):
        (root / f"images/{split}").mkdir(parents=True)
        (root / f"labels/{split}").mkdir(parents=True)
        for i in range(n):
            img = np.full((64, 64, 3), 120, np.uint8)
            cv2.rectangle(img, (14, 14), (44, 44), (0, 0, 220), -1)
            cv2.imwrite(str(root / f"images/{split}/{i:03d}.jpg"), img)
            (root / f"labels/{split}/{i:03d}.txt").write_text("0 0.453 0.453 0.469 0.469")
    (root / "data.yaml").write_text(
        f"path: {root}\ntrain: images/train\nval: images/val\nnames:\n  0: red\n"
    )
    return root


def test_cli_predict_mode(synth_root):
    rc = entrypoint(["detect", "predict", f"source={synth_root / 'images/val'}",
                     "imgsz=64", "conf=0.001", "max_det=4", "max_nms=64"])
    assert rc == 0


def test_cli_export_mode(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    rc = entrypoint(["export", "format=npz", "imgsz=64"])
    assert rc == 0
    assert list(tmp_path.glob("*.npz")), "export must write the artifact"


@pytest.mark.slow
def test_cli_train_then_val_mode(synth_root, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    rc = entrypoint(["detect", "train", f"data={synth_root / 'data.yaml'}",
                     "epochs=1", "batch=8", "imgsz=64", "max_gt=4", "val=False",
                     "warmup_epochs=0", "name=clismoke"])
    assert rc == 0
    assert (tmp_path / "runs/detect/clismoke/last.npz").exists()
    rc = entrypoint(["detect", "val", f"data={synth_root / 'data.yaml'}",
                     "imgsz=64", "batch=4", "max_det=8", "max_nms=64"])
    assert rc == 0


@pytest.mark.slow
def test_cli_benchmark_mode(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    rc = entrypoint(["benchmark", "imgsz=64"])
    assert rc == 0
