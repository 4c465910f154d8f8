"""Prefetching input pipeline (VERDICT r2 item 6 — the InfiniteDataLoader +
worker-process analog, reference data/build.py:43-126)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("tinyset")
    for split in ("train", "val"):
        (root / "images" / split).mkdir(parents=True)
        (root / "labels" / split).mkdir(parents=True)
        rng = np.random.default_rng(0)
        for i in range(10):
            im = rng.integers(0, 255, (96, 128, 3)).astype(np.uint8)
            cv2.imwrite(str(root / "images" / split / f"{i}.png"), im)
            (root / "labels" / split / f"{i}.txt").write_text("0 0.5 0.5 0.4 0.4\n")
    yml = root / "data.yaml"
    yml.write_text(f"path: {root}\ntrain: images/train\nval: images/val\nnames:\n  0: thing\n")
    return str(yml)


def _collect(loader, epoch=0):
    return [{k: np.asarray(v) for k, v in b.items()} for b in loader.epoch(epoch)]


def test_prefetch_deterministic_across_worker_counts(tiny_dataset):
    """Per-sample RNG streams: identical batches at any worker/prefetch depth."""
    from yolo_master_tpu.data.dataset import PrefetchLoader, YOLODataset

    ds = YOLODataset(tiny_dataset, split="train", imgsz=64, max_gt=8, augment=True)
    a = _collect(PrefetchLoader(ds, 4, seed=3, workers=1, prefetch=1))
    b = _collect(PrefetchLoader(ds, 4, seed=3, workers=4, prefetch=3))
    assert len(a) == len(b) == 3  # 10 imgs, bs 4, wrap-padded tail
    for ba, bb in zip(a, b):
        assert set(ba) == set(bb)
        for k in ba:
            np.testing.assert_array_equal(ba[k], bb[k], err_msg=k)


def test_prefetch_matches_dataloader_shapes_val(tiny_dataset):
    from yolo_master_tpu.data.dataset import DataLoader, PrefetchLoader, YOLODataset

    ds = YOLODataset(tiny_dataset, split="val", imgsz=64, max_gt=8, augment=False)
    sync = _collect(DataLoader(ds, 4, shuffle=False))
    pre = _collect(PrefetchLoader(ds, 4, shuffle=False, workers=2, prefetch=2))
    assert len(sync) == len(pre)
    for bs, bp in zip(sync, pre):
        for k in bs:
            assert bs[k].shape == bp[k].shape
    # val has no augmentation randomness: batches must be identical outright
    for bs, bp in zip(sync, pre):
        np.testing.assert_array_equal(bs["images"], bp["images"])
        np.testing.assert_array_equal(bs["boxes"], bp["boxes"])


def test_prefetch_device_put_sharding(tiny_dataset):
    """Producer-side device_put stages batches as committed jax arrays."""
    import jax

    from yolo_master_tpu.data.dataset import PrefetchLoader, YOLODataset
    from yolo_master_tpu.parallel.mesh import make_mesh, shard_batch

    ds = YOLODataset(tiny_dataset, split="val", imgsz=64, max_gt=8, augment=False)
    mesh = make_mesh(8, axes=("data",))
    loader = PrefetchLoader(ds, 8, shuffle=False, workers=2, prefetch=2, sharding=shard_batch(mesh))
    batches = list(loader.epoch(0))
    assert batches
    for b in batches:
        assert isinstance(b["images"], jax.Array)
        assert b["images"].sharding.is_equivalent_to(shard_batch(mesh), b["images"].ndim)


def test_trainer_uses_prefetch_loader(tiny_dataset, tmp_path):
    """workers>0 (the default) routes training through the prefetch pipeline
    end to end (1 tiny epoch)."""
    from yolo_master_tpu.data.dataset import PrefetchLoader
    from yolo_master_tpu.engine.trainer import DetectionTrainer as Trainer
    from yolo_master_tpu.models.yolo import YOLO

    cfg = {
        "nc": 1,
        "backbone": [[-1, 1, "Conv", [8, 3, 2]], [-1, 1, "Conv", [16, 3, 2]]],
        "head": [[[1], 1, "Detect", ["nc"]]],
    }
    yolo = YOLO(cfg)
    tr = Trainer(yolo, data=tiny_dataset, epochs=1, batch=4, imgsz=64, max_gt=8,
                 save_dir=str(tmp_path / "run"), val=False, workers=2, prefetch=2,
                 warmup_epochs=0)
    assert isinstance(tr.loader, PrefetchLoader)
    out = tr.train()
    assert "best_fitness" in out
    assert (tmp_path / "run" / "last.npz").exists()


def test_cache_ram_and_disk_identical(tiny_dataset):
    """cache=ram|disk must yield byte-identical samples to uncached reads, and
    the ram copy must be isolated from in-place augment writes (reference
    base.py cache_images)."""
    import random
    from pathlib import Path

    from yolo_master_tpu.data.dataset import YOLODataset

    base = YOLODataset(tiny_dataset, split="val", imgsz=64, max_gt=8, augment=False)
    ram = YOLODataset(tiny_dataset, split="val", imgsz=64, max_gt=8, augment=False, cache="ram")
    disk = YOLODataset(tiny_dataset, split="val", imgsz=64, max_gt=8, augment=False, cache="disk")
    for idx in (0, 3, 7):
        im0, lb0 = base.load_sample(idx, random.Random(0))
        im1, _ = ram.load_sample(idx, random.Random(0))
        im2, _ = disk.load_sample(idx, random.Random(0))
        assert np.array_equal(im0, im1) and np.array_equal(im0, im2)
    # disk cache blobs exist and serve the second read
    cache_files = list(Path(disk.img_files[0]).parent.glob(".ymt_cache_*.npy"))
    assert cache_files
    im2b, _ = disk.load_sample(0, random.Random(0))
    im1b, _ = ram.load_sample(0, random.Random(0))
    im0b, _ = base.load_sample(0, random.Random(0))
    assert np.array_equal(im0b, im1b) and np.array_equal(im0b, im2b)
    # ram isolation: mutating a returned image must not poison the cache
    im1b[:] = 0
    im1c, _ = ram.load_sample(0, random.Random(0))
    assert np.array_equal(im0b, im1c)
    with pytest.raises(ValueError):
        YOLODataset(tiny_dataset, split="val", cache="gpu")
