"""End-to-end training smoke: overfit a tiny synthetic dataset
(the analog of the reference's coco8 1-epoch train smokes, SURVEY.md §4)."""

import numpy as np
import pytest

MINI_CFG = {
    "nc": 2,
    "backbone": [
        [-1, 1, "Conv", [16, 3, 2]],
        [-1, 1, "Conv", [32, 3, 2]],
        [-1, 1, "C3k2", [32, False, 0.25]],
        [-1, 1, "ES_MOE", [32]],
        [-1, 1, "Conv", [64, 3, 2]],
        [-1, 1, "C3k2", [64, False, 0.25]],
        [-1, 1, "Conv", [64, 3, 2]],
        [-1, 1, "C3k2", [64, True]],
    ],
    "head": [
        [-1, 1, "Upsample", [None, 2, "nearest"]],
        [[-1, 5], 1, "Concat", [1]],
        [-1, 1, "C3k2", [64, True]],
        [[10], 1, "Detect", ["nc"]],
    ],
}


@pytest.fixture(scope="session")
def synth_dataset(tmp_path_factory):
    """Colored-rectangle detection dataset: class 0 = red box, 1 = blue box."""
    import cv2

    root = tmp_path_factory.mktemp("synth_ds")
    rng = np.random.default_rng(0)
    for split, n in (("train", 16), ("val", 8)):
        (root / f"images/{split}").mkdir(parents=True)
        (root / f"labels/{split}").mkdir(parents=True)
        for i in range(n):
            img = np.full((96, 96, 3), 120, np.uint8)
            lines = []
            for _ in range(int(rng.integers(1, 3))):
                cls = int(rng.integers(0, 2))
                w, h = int(rng.integers(25, 45)), int(rng.integers(25, 45))
                x1, y1 = int(rng.integers(0, 96 - w)), int(rng.integers(0, 96 - h))
                color = (0, 0, 220) if cls == 0 else (220, 0, 0)
                cv2.rectangle(img, (x1, y1), (x1 + w, y1 + h), color, -1)
                lines.append(f"{cls} {(x1 + w / 2) / 96:.4f} {(y1 + h / 2) / 96:.4f} {w / 96:.4f} {h / 96:.4f}")
            cv2.imwrite(str(root / f"images/{split}/{i:03d}.jpg"), img)
            (root / f"labels/{split}/{i:03d}.txt").write_text("\n".join(lines))
    (root / "data.yaml").write_text(
        f"path: {root}\ntrain: images/train\nval: images/val\nnames:\n  0: red\n  1: blue\n"
    )
    return str(root / "data.yaml")


@pytest.mark.slow
def test_overfit_synthetic(synth_dataset, tmp_path):
    from yolo_master_tpu.engine.trainer import DetectionTrainer
    from yolo_master_tpu.nn.tasks import DetectionModel

    class Stub:
        pass

    model = DetectionModel(MINI_CFG)
    yolo = Stub()
    yolo.model = model
    yolo.params = model.init_params(0)
    trainer = DetectionTrainer(
        yolo,
        data=synth_dataset,
        epochs=150,
        batch=8,
        imgsz=96,
        max_gt=8,
        optimizer="SGD",
        warmup_epochs=0,
        lr0=0.02,
        lrf=0.1,
        nbs=8,  # no accumulation: keep the round-1 regression baseline
        amp=False,
        save_dir=str(tmp_path / "run"),
        hyp={"mosaic": 0.0},
        patience=1000,
        val=False,
    )
    trainer.train()

    from yolo_master_tpu.engine.validator import DetectionValidator

    v = DetectionValidator(model=model, data=synth_dataset, imgsz=96, batch=8, max_gt=8)
    out = v(params=trainer.state.ema_params)
    assert out["mAP50"] > 0.8, f"overfit failed: {out}"
    assert (tmp_path / "run" / "last.npz").exists()


def test_dataloader_fixed_shapes(synth_dataset):
    from yolo_master_tpu.data.dataset import DataLoader, YOLODataset

    ds = YOLODataset(synth_dataset, split="train", imgsz=96, max_gt=8, augment=True, hyp={"mosaic": 1.0})
    loader = DataLoader(ds, 4, shuffle=True)
    shapes = set()
    for batch in loader.epoch(0):
        shapes.add(batch["images"].shape)
        assert batch["boxes"].shape == (4, 8, 4)
        assert batch["images"].min() >= 0 and batch["images"].max() <= 1.0
        # all valid boxes inside the canvas
        m = batch["mask"]
        assert (batch["boxes"][m] >= 0).all() and (batch["boxes"][m] <= 96).all()
    assert shapes == {(4, 96, 96, 3)}


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    from yolo_master_tpu.nn.tasks import DetectionModel
    from yolo_master_tpu.utils.checkpoint import load_params_npz, save_params_npz

    model = DetectionModel(MINI_CFG)
    p = model.init_params(3)
    path = tmp_path / "w.npz"
    save_params_npz(p, str(path))
    p2 = load_params_npz(str(path))
    import jax

    leaves1 = jax.tree_util.tree_leaves(p)
    leaves2 = jax.tree_util.tree_leaves(p2)
    assert len(leaves1) == len(leaves2)
    for a, b in zip(leaves1, leaves2):
        assert jnp.allclose(a, b)


@pytest.mark.slow
def test_train_adamw_accumulate_bf16(synth_dataset, tmp_path):
    """Round-2 trainer parity features in one smoke: optimizer=AdamW, grad
    accumulation to nbs (2 loader batches per step), bf16 amp, cosine LR,
    warmup momentum/bias-lr, Gini moe-gain schedule + routing history."""
    from yolo_master_tpu.engine.trainer import DetectionTrainer
    from yolo_master_tpu.nn.tasks import DetectionModel

    class Stub:
        pass

    model = DetectionModel(MINI_CFG)
    yolo = Stub()
    yolo.model = model
    yolo.params = model.init_params(0)
    trainer = DetectionTrainer(
        yolo,
        data=synth_dataset,
        epochs=30,
        batch=4,
        imgsz=96,
        max_gt=8,
        optimizer="AdamW",
        lr0=0.002,
        cos_lr=True,
        warmup_epochs=1.0,
        nbs=8,  # accumulate = 2
        amp=True,
        save_dir=str(tmp_path / "run2"),
        hyp={"mosaic": 0.0},
        patience=1000,
        val=False,
        close_mosaic=0,
    )
    assert trainer.accumulate == 2
    out = trainer.train()
    # the ES_MOE block must have produced routing stats + history
    assert (tmp_path / "run2" / "routing_history.csv").exists()
    from yolo_master_tpu.engine.validator import DetectionValidator

    v = DetectionValidator(model=model, data=synth_dataset, imgsz=96, batch=8, max_gt=8)
    m = v(params=trainer.state.ema_params)
    assert m["mAP50"] > 0.3, f"AdamW+accumulate+bf16 training failed to learn: {m}"


def test_multitrainer_dataset_series(synth_dataset, tmp_path):
    """data=[a, b] fine-tunes one base model per dataset in series
    (reference MultiTrainer, engine/trainer.py:1564 / model.py:872)."""
    import json

    from yolo_master_tpu.models.yolo import YOLO

    import jax
    import jax.numpy as jnp

    yolo = YOLO(dict(MINI_CFG), task="detect", nc=2)
    base_snapshot = jax.tree_util.tree_map(jnp.copy, yolo.params)
    sweep = tmp_path / "multi"
    out = yolo.train(
        data=[synth_dataset, synth_dataset],  # repeat dataset -> deduped run name
        epochs=1, batch=8, imgsz=96, max_gt=8, optimizer="SGD",
        warmup_epochs=0, nbs=8, amp=False, val=False,
        hyp={"mosaic": 0.0}, save_dir=str(sweep),
    )
    names = list(out)
    assert len(names) == 2 and names[1] == names[0] + "-2"
    assert all("error" not in m for m in out.values())
    payload = json.loads((sweep / "multitrain_results.json").read_text())
    assert set(payload["runs"]) == set(names) and payload["mean"]
    assert (sweep / "multitrain_results.png").exists()
    for n in names:
        assert (sweep / n / "last.npz").exists()
    # base model left unchanged after the sweep (runs trained on copies)
    for a, b in zip(jax.tree_util.tree_leaves(yolo.params), jax.tree_util.tree_leaves(base_snapshot)):
        assert jnp.array_equal(a, b)
