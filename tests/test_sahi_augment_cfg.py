"""Direct gates for previously indirectly-tested subsystems: Sparse-SAHI
tiling (engine/sahi.py), augmentation geometry (data/dataset.py), default.yaml
integrity (reference test_default_config_integrity), and the parallel mesh
helpers (parallel/mesh.py)."""

import random

import numpy as np
import pytest

import jax
import jax.numpy as jnp


# -- SAHI ---------------------------------------------------------------------

def test_tile_grid_covers_image():
    from yolo_master_tpu.engine.sahi import tile_grid

    for h, w, s, ov in ((1300, 1900, 640, 0.2), (640, 640, 640, 0.2), (700, 701, 512, 0.25)):
        tiles = tile_grid(h, w, s, ov)
        cover = np.zeros((h, w), bool)
        for x0, y0 in tiles:
            assert 0 <= x0 and 0 <= y0, "tile starts must be non-negative"
            cover[y0 : y0 + s, x0 : x0 + s] = True
        assert cover.all(), f"grid must cover the full {h}x{w} image"


def test_sparse_sahi_skips_empty_tiles_and_detects():
    """A 4K-ish image with one bright object: the objectness gate must skip
    most tiles and the detector still finds the object region."""
    from yolo_master_tpu.engine.sahi import SparseSAHIPredictor
    from yolo_master_tpu.nn.tasks import DetectionModel

    cfg = {"nc": 1, "backbone": [[-1, 1, "Conv", [8, 3, 2]], [-1, 1, "Conv", [16, 3, 2]]],
           "head": [[[1], 1, "Detect", ["nc"]]]}
    m = DetectionModel(cfg)
    p = m.init_params(0)
    img = np.full((1280, 1920, 3), 114, np.uint8)
    img[200:380, 300:520] = (0, 0, 230)

    sahi = SparseSAHIPredictor(m, p, imgsz=320, slice_size=640, overlap_ratio=0.2,
                               objectness_threshold=0.999, conf=1e-6, max_det=32)
    r = sahi(img)
    assert sahi.last_stats["tiles"] >= 6
    assert sahi.last_stats["skip_ratio"] > 0, "objectness gate must skip some tiles"
    assert r.orig_img.shape == img.shape


# -- augmentations ------------------------------------------------------------

@pytest.fixture()
def ds(tmp_path):
    import cv2

    from yolo_master_tpu.data.dataset import YOLODataset

    root = tmp_path / "ds"
    (root / "images/train").mkdir(parents=True)
    (root / "labels/train").mkdir(parents=True)
    for i in range(9):
        img = np.full((96, 128, 3), 120, np.uint8)
        cv2.rectangle(img, (10 + 5 * i, 20), (40 + 5 * i, 60), (0, 0, 220), -1)
        cv2.imwrite(str(root / f"images/train/{i:02d}.jpg"), img)
        cx, cy = (25 + 5 * i) / 128, 40 / 96
        (root / f"labels/train/{i:02d}.txt").write_text(f"0 {cx:.4f} {cy:.4f} {30 / 128:.4f} {40 / 96:.4f}")
    (root / "data.yaml").write_text(f"path: {root}\ntrain: images/train\nval: images/train\nnames:\n  0: x\n")
    return root


def test_mosaic4_and_mosaic9_label_bounds(ds):
    from yolo_master_tpu.data.dataset import YOLODataset

    for hyp in ({"mosaic": 1.0}, {"mosaic": 1.0, "mosaic9": 1.0}):
        d = YOLODataset(str(ds / "data.yaml"), split="train", imgsz=96, max_gt=16,
                        augment=True, hyp={**hyp, "fliplr": 0.0, "mixup": 0.0, "cutmix": 0.0})
        rng = random.Random(0)
        im, lbl = d.load_sample(0, rng)
        assert im.shape == (96, 96, 3)
        assert len(lbl) >= 1, "mosaic must carry labels through"
        # labels are [cls, x1, y1, x2, y2] pixels of the imgsz frame
        assert (lbl[:, 1:] >= -1e-3).all() and (lbl[:, 1:] <= 96 + 1e-3).all()
        assert (lbl[:, 3] > lbl[:, 1]).all() and (lbl[:, 4] > lbl[:, 2]).all()


def test_fliplr_label_symmetry(ds):
    from yolo_master_tpu.data.dataset import YOLODataset

    base = dict(split="train", imgsz=96, max_gt=8)
    d0 = YOLODataset(str(ds / "data.yaml"), augment=True,
                     hyp={"mosaic": 0.0, "fliplr": 0.0, "hsv_h": 0, "hsv_s": 0, "hsv_v": 0,
                          "scale": 0.0, "translate": 0.0, "degrees": 0.0, "shear": 0.0}, **base)
    d1 = YOLODataset(str(ds / "data.yaml"), augment=True,
                     hyp={"mosaic": 0.0, "fliplr": 1.0, "hsv_h": 0, "hsv_s": 0, "hsv_v": 0,
                          "scale": 0.0, "translate": 0.0, "degrees": 0.0, "shear": 0.0}, **base)
    im0, l0 = d0.load_sample(0, random.Random(0))
    im1, l1 = d1.load_sample(0, random.Random(0))
    np.testing.assert_array_equal(im1, im0[:, ::-1])
    # pixel xyxy: flipped x1 = W - x2
    assert abs((96 - l0[0, 3]) - l1[0, 1]) < 1e-3, "flipped x1 must mirror x2"
    assert abs(l0[0, 2] - l1[0, 2]) < 1e-3, "y unchanged by horizontal flip"


def test_mixup_and_cutmix_merge_labels():
    from yolo_master_tpu.data.dataset import cutmix, mixup

    rng = random.Random(0)
    im1 = np.zeros((64, 64, 3), np.float32)
    im2 = np.ones((64, 64, 3), np.float32) * 200
    b1 = np.array([[5, 5, 20, 20]], np.float32)
    b2 = np.array([[30, 30, 60, 60]], np.float32)
    im, boxes, cls = mixup(im1, b1, np.zeros(1), im2, b2, np.ones(1), rng)
    assert len(boxes) == 2 and set(cls.tolist()) == {0.0, 1.0}
    assert 0 < im.mean() < 200, "mixup must blend pixel values"

    im, boxes, cls = cutmix(im1, b1, np.zeros(1), im2, b2, np.ones(1), rng)
    assert im.shape == im1.shape and len(boxes) >= 1


def test_letterbox_roundtrip():
    from yolo_master_tpu.data.letterbox import letterbox

    img = np.random.default_rng(0).integers(0, 255, (480, 640, 3)).astype(np.uint8)
    lb, ratio, pad = letterbox(img, (320, 320))
    assert lb.shape == (320, 320, 3)
    # a point at the original image center maps inside the letterboxed content
    cx, cy = 320 * ratio[0] + pad[0], 240 * ratio[1] + pad[1]
    assert 0 <= cx < 320 and 0 <= cy < 320


# -- default.yaml integrity ----------------------------------------------------

def test_default_cfg_integrity_and_cli_typing():
    """Every default.yaml key survives a parse round-trip through the CLI's
    typed parser, and typed keys are registered (reference
    tests/test_default_config_integrity)."""
    from yolo_master_tpu.cfg import get_default_cfg
    from yolo_master_tpu.cfg.cli import BOOL_KEYS, FLOAT_KEYS, INT_KEYS, parse_args, parse_value

    cfg = get_default_cfg()
    assert len(cfg) >= 150, f"default.yaml shrank to {len(cfg)} keys"
    for key in ("epochs", "batch", "imgsz", "lr0", "momentum", "conf", "iou", "moe_gain",
                "mosaic", "task", "mode", "model", "optimizer"):
        assert key in cfg, f"core key '{key}' missing from default.yaml"
    for k in INT_KEYS | FLOAT_KEYS:
        if k in cfg and cfg[k] is not None:
            assert isinstance(parse_value(k, str(cfg[k])), (int, float))
    for k in BOOL_KEYS:
        assert parse_value(k, "true") is True and parse_value(k, "0") is False

    # typed override + did-you-mean rejection
    out = parse_args(["detect", "predict", "conf=0.5", "epochs=3"])
    assert out["conf"] == 0.5 and out["epochs"] == 3
    with pytest.raises(SystemExit, match="did you mean"):
        parse_args(["detect", "predict", "confs=0.5"])


# -- parallel mesh -------------------------------------------------------------

def test_make_mesh_and_expert_parallel():
    from yolo_master_tpu.parallel.mesh import expert_parallel_dryrun, make_mesh, shard_batch

    mesh = make_mesh(8, axes=("data",))
    assert mesh.devices.size == 8
    s = shard_batch(mesh)
    x = jax.device_put(jnp.zeros((16, 4)), s)
    assert len(x.sharding.device_set) == 8

    mesh2 = make_mesh(8, axes=("data", "expert"), shape=(2, 4))
    assert mesh2.shape == {"data": 2, "expert": 4}

    loss = expert_parallel_dryrun(8)
    assert np.isfinite(loss)
