"""utils batch (autobatch / model_info / SettingsManager / Profile) +
data converters (COCO->YOLO, autosplit, tile splitting)."""

import json

import numpy as np
import pytest


def test_autobatch_binary_search():
    import jax
    import jax.numpy as jnp

    from yolo_master_tpu.utils.autobatch import autobatch

    def build_step(bs):
        def step(x):
            return (x @ jnp.ones((512, 512), jnp.float32)).sum()

        return step

    def args_fn(bs):
        return (jax.ShapeDtypeStruct((bs, 4096, 512), jnp.float32),)

    # tiny budget: [bs,4096,512] f32 = 8MB/batch-row; 100MB budget -> bs<=8
    b = autobatch(build_step, args_fn, fraction=1.0, hbm_bytes=100 * 1024**2, max_batch=64)
    assert 4 <= b <= 8, b


def test_model_info_gflops():
    from yolo_master_tpu.nn.tasks import DetectionModel
    from yolo_master_tpu.utils.info import model_info

    cfg = {
        "nc": 2,
        "backbone": [[-1, 1, "Conv", [16, 3, 2]], [-1, 1, "Conv", [32, 3, 2]],
                     [-1, 1, "Conv", [32, 3, 2]], [-1, 1, "Conv", [32, 3, 2]], [-1, 1, "Conv", [32, 3, 2]]],
        "head": [[[2, 3, 4], 1, "Detect", ["nc"]]],
    }
    m = DetectionModel(cfg)
    out = model_info(m, m.init_params(0), imgsz=64, verbose=False)
    assert out["params"] > 1000 and out["gflops"] > 0


def test_settings_manager(tmp_path):
    from yolo_master_tpu.utils.settings import SettingsManager

    path = tmp_path / "settings.json"
    s = SettingsManager(path)
    assert path.exists() and s["sync"] is False
    s.update(tensorboard=True)
    s2 = SettingsManager(path)  # reload round-trip
    assert s2["tensorboard"] is True
    with pytest.raises(KeyError):
        s.update(bogus=1)
    s.reset()
    assert SettingsManager(path)["tensorboard"] is False


def test_coco_converter_and_autosplit(tmp_path):
    import cv2

    from yolo_master_tpu.data.converter import autosplit, convert_coco

    ann = {
        "images": [{"id": 1, "file_name": "a.jpg", "width": 100, "height": 50}],
        "annotations": [
            {"image_id": 1, "category_id": 1, "bbox": [10, 10, 20, 20], "iscrowd": 0},  # coco91 id 1 = person -> 0
            {"image_id": 1, "category_id": 90, "bbox": [50, 20, 10, 10], "iscrowd": 0},  # toothbrush -> 79
            {"image_id": 1, "category_id": 1, "bbox": [0, 0, 5, 5], "iscrowd": 1},  # crowd: dropped
        ],
    }
    jpath = tmp_path / "instances.json"
    jpath.write_text(json.dumps(ann))
    out = convert_coco(str(jpath), str(tmp_path / "labels"))
    rows = (tmp_path / "labels" / "a.txt").read_text().splitlines()
    assert len(rows) == 2
    cls0, xc, yc, w, h = rows[0].split()
    assert cls0 == "0" and abs(float(xc) - 0.2) < 1e-4 and abs(float(h) - 0.4) < 1e-4
    assert rows[1].split()[0] == "79"

    imgs = tmp_path / "ds" / "images"
    imgs.mkdir(parents=True)
    for i in range(10):
        cv2.imwrite(str(imgs / f"{i}.jpg"), np.zeros((8, 8, 3), np.uint8))
    files = autosplit(str(imgs), weights=(0.8, 0.2, 0.0))
    train = (tmp_path / "ds" / "autosplit_train.txt").read_text().splitlines()
    val = (tmp_path / "ds" / "autosplit_val.txt").read_text().splitlines()
    assert len(train) == 8 and len(val) == 2


def test_tile_splitter(tmp_path):
    import cv2

    from yolo_master_tpu.data.converter import split_images_and_labels

    root = tmp_path / "big"
    (root / "images" / "train").mkdir(parents=True)
    (root / "labels" / "train").mkdir(parents=True)
    img = np.zeros((200, 300, 3), np.uint8)
    cv2.imwrite(str(root / "images" / "train" / "x.jpg"), img)
    # one object centered at (50, 50), one at (250, 150)
    (root / "labels" / "train" / "x.txt").write_text(
        f"0 {50/300:.6f} {50/200:.6f} 0.1 0.1\n1 {250/300:.6f} {150/200:.6f} 0.1 0.1"
    )
    out = split_images_and_labels(str(root), "train", crop_size=128, gap=28)
    from pathlib import Path

    tiles = sorted(Path(out).glob("labels/train/*.txt"))
    assert len(tiles) >= 2
    all_rows = [r for t in tiles for r in t.read_text().splitlines()]
    assert any(r.startswith("0 ") for r in all_rows) and any(r.startswith("1 ") for r in all_rows)
    # tile coords re-normalized into [0, 1]
    for r in all_rows:
        vals = [float(v) for v in r.split()[1:]]
        assert all(0 <= v <= 1 for v in vals)


def test_profile_timer():
    import time

    from yolo_master_tpu.utils.info import Profile

    p = Profile()
    for _ in range(3):
        with p:
            time.sleep(0.01)
    assert p.n == 3 and 8 < p.avg_ms < 100


def test_trainer_autobatch_batch_minus_one(tmp_path):
    """batch=-1 resolves via the dry memory_analysis() search over the real
    compiled train step (reference trainer batch=-1 -> AutoBatch)."""
    import jax.numpy as jnp

    from yolo_master_tpu.engine.trainer import DetectionTrainer
    from yolo_master_tpu.nn.tasks import DetectionModel

    cfg = {"nc": 1, "backbone": [[-1, 1, "Conv", [8, 3, 2]], [-1, 1, "Conv", [16, 3, 2]]],
           "head": [[[1], 1, "Detect", ["nc"]]]}

    class Stub:
        pass

    yolo = Stub()
    yolo.model = DetectionModel(cfg)
    yolo.params = yolo.model.init_params(0)
    b = DetectionTrainer._autobatch(yolo, imgsz=32, max_gt=4, hyp={}, mesh=None,
                                    compute_dtype=jnp.float32, amp=False)
    assert b >= 1 and (b & (b - 1)) == 0, f"expected a power-of-two batch, got {b}"


def test_patches_unicode_io(tmp_path):
    """imread/imwrite must survive non-ASCII paths (reference utils/patches.py)."""
    import numpy as np

    from yolo_master_tpu.utils.patches import imread, imwrite, save_with_retry

    p = tmp_path / "图像_ünïcode.png"
    img = (np.random.default_rng(0).random((16, 16, 3)) * 255).astype(np.uint8)
    assert imwrite(str(p), img)
    back = imread(str(p))
    np.testing.assert_array_equal(back, img)
    assert imread(str(tmp_path / "missing.png")) is None

    calls = []

    def flaky(path):
        calls.append(path)
        if len(calls) < 3:
            raise OSError("transient")
        (tmp_path / "out.txt").write_text("ok")

    save_with_retry(flaky, "x", retries=3, delay=0.0)
    assert len(calls) == 3 and (tmp_path / "out.txt").exists()


def test_tqdm_and_checks():
    import io

    from yolo_master_tpu.utils.checks import check_imgsz, check_suffix, check_version
    from yolo_master_tpu.utils.tqdm import TQDM

    buf = io.StringIO()
    buf.isatty = lambda: True
    out = list(TQDM(range(5), total=5, desc="t", file=buf, mininterval=0.0))
    assert out == [0, 1, 2, 3, 4] and "5/5" in buf.getvalue()
    # silent when not a tty
    quiet = io.StringIO()
    list(TQDM(range(3), file=quiet))
    assert quiet.getvalue() == ""

    assert check_imgsz(640) == 640
    assert check_imgsz(100, stride=32) == 128
    assert check_imgsz([640, 481]) == [640, 512]
    assert check_version("2.3.1+cpu", ">=2.0,<3.0")
    assert not check_version("1.9.0", ">=2.0")
    with pytest.raises(ModuleNotFoundError):
        check_version("1.0", ">=2.0", hard=True)
    check_suffix("m.tflite", [".tflite"])
    with pytest.raises(ValueError, match="suffix"):
        check_suffix("m.onnx", [".tflite"])


def test_dataset_zoo_name_resolution(tmp_path, monkeypatch):
    """data="VisDrone.yaml" resolves to the bundled config; a relative `path:`
    falls back to settings datasets_dir (reference checks.py check_file)."""
    import numpy as np

    from yolo_master_tpu.data.dataset import (
        DATASETS_ZOO,
        YOLODataset,
        resolve_data_yaml,
        resolve_dataset_root,
    )

    # zoo is populated and every config parses with names/nc consistent
    import yaml as _yaml
    zoo = sorted(DATASETS_ZOO.glob("*.yaml"))
    assert len(zoo) >= 30
    for f in zoo:
        cfg = _yaml.safe_load(f.read_text())
        assert cfg.get("val") or cfg.get("train"), f.name
        assert len(cfg["names"]) == cfg["nc"], f.name

    assert resolve_data_yaml("VisDrone.yaml") == DATASETS_ZOO / "VisDrone.yaml"
    import pytest
    with pytest.raises(FileNotFoundError):
        resolve_data_yaml("not-a-dataset.yaml")

    # relative path: resolves against settings datasets_dir when not local
    import yolo_master_tpu.utils.settings as S
    monkeypatch.setattr(S, "_SETTINGS", {"datasets_dir": str(tmp_path)})
    root = tmp_path / "VisDrone"
    (root / "images/val").mkdir(parents=True)
    (root / "labels/val").mkdir(parents=True)
    import cv2
    cv2.imwrite(str(root / "images/val/0.jpg"), np.full((32, 32, 3), 99, np.uint8))
    (root / "labels/val/0.txt").write_text("3 0.5 0.5 0.5 0.5")
    cfg = _yaml.safe_load((DATASETS_ZOO / "VisDrone.yaml").read_text())
    assert resolve_dataset_root(cfg, DATASETS_ZOO / "VisDrone.yaml") == root
    ds = YOLODataset("VisDrone.yaml", split="val", imgsz=32, max_gt=4)
    assert len(ds.img_files) == 1 and ds.nc == 10 and ds.names[3] == "car"
