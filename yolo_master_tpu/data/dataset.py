"""YOLO-format detection dataset + host-side loader.

Reference: ultralytics/data/dataset.py:52 (YOLODataset), data/build.py (loaders),
data/augment.py (Mosaic/RandomHSV/RandomFlip/LetterBox).

TPU-first contract: the loader yields *fixed-shape* numpy batches —
images [B,H,W,3] float32 RGB /255, GT padded to max_gt per image as
xyxy pixel boxes + class ids + validity mask — so the jitted train step never
recompiles. Augmentations run on host (numpy/cv2), mirroring the reference's
CPU dataloader workers.
"""

from __future__ import annotations

import math
import random
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from ..utils import LOGGER, yaml_load
from .letterbox import letterbox

IMG_FORMATS = {"bmp", "jpeg", "jpg", "png", "tif", "tiff", "webp"}


DATASETS_ZOO = Path(__file__).resolve().parent.parent / "cfg" / "datasets"


def resolve_data_yaml(data: str | Path) -> Path:
    """Resolve a dataset yaml by path or by zoo name (reference: check_file in
    ultralytics/utils/checks.py — ``data="VisDrone.yaml"`` finds the bundled
    config when no local file matches)."""
    p = Path(data)
    if p.exists():
        return p
    zoo = DATASETS_ZOO / p.name
    if p.suffix in (".yaml", ".yml") and len(p.parts) == 1 and zoo.exists():
        return zoo
    raise FileNotFoundError(
        f"dataset yaml '{data}' not found (not a file, and no bundled config named "
        f"'{p.name}' under {DATASETS_ZOO})"
    )


def resolve_dataset_root(cfg: dict, yaml_path: Path) -> Path:
    """Dataset root: absolute `path:` as-is; relative tried against the yaml's
    directory, then against the settings ``datasets_dir`` (the reference's
    convention for bundled configs whose data lives under ~/datasets)."""
    root = Path(cfg.get("path", yaml_path.parent))
    if root.is_absolute():
        return root
    local = yaml_path.parent / root
    if local.exists():
        return local
    from ..utils.settings import get_settings

    shared = Path(get_settings()["datasets_dir"]) / root
    return shared if shared.exists() else local


def img2label_path(img_path: str) -> str:
    """images/... -> labels/... with .txt (reference data/utils.py)."""
    p = Path(img_path)
    parts = list(p.parts)
    for i in range(len(parts) - 1, -1, -1):
        if parts[i] == "images":
            parts[i] = "labels"
            break
    return str(Path(*parts).with_suffix(".txt"))


class YOLODataset:
    """Detection dataset over a dataset yaml ({path, train, val, names})."""

    def __init__(self, data: str | dict, split: str = "train", imgsz: int = 640, max_gt: int = 128,
                 augment: bool = False, hyp: Optional[dict] = None, cache: Optional[str] = None):
        if isinstance(data, (str, Path)):
            yaml_path = resolve_data_yaml(data)
            cfg = yaml_load(yaml_path)
            root = resolve_dataset_root(cfg, yaml_path)
        else:
            cfg = dict(data)
            root = Path(cfg.get("path", "."))
        self.names = cfg.get("names", {})
        if isinstance(self.names, list):
            self.names = dict(enumerate(self.names))
        self.nc = len(self.names)
        split_dir = cfg.get(split) or cfg.get("val")
        img_dir = root / split_dir
        self.img_files = sorted(str(f) for f in Path(img_dir).rglob("*") if f.suffix.lower().lstrip(".") in IMG_FORMATS)
        if not self.img_files:
            raise FileNotFoundError(f"no images found in {img_dir}")
        self.labels = [self._load_label(img2label_path(f)) for f in self.img_files]
        self.imgsz = imgsz
        self.max_gt = max_gt
        self.augment = augment
        self.hyp = {"fliplr": 0.5, "flipud": 0.0, "hsv_h": 0.015, "hsv_s": 0.7, "hsv_v": 0.4,
                    "mosaic": 1.0, "scale": 0.5, "translate": 0.1, "degrees": 0.0, "shear": 0.0,
                    "mixup": 0.0, "cutmix": 0.0, "copy_paste": 0.0, **(hyp or {})}
        self.mosaic_enabled = True  # trainer flips this off for close_mosaic
        self._shapes = None
        # decoded-image caching (reference base.py cache_images, cache=ram|disk):
        # ram keeps decoded BGR arrays in-process; disk persists .npy blobs so
        # later epochs skip jpeg decode (the usual CPU bottleneck)
        self.cache = None if cache in (None, False, "false", "") else str(cache).lower()
        if self.cache not in (None, "ram", "disk"):
            raise ValueError(f"cache must be ram|disk|None, got {cache!r}")
        self._ram: dict = {}

    @property
    def shapes(self):
        """[(h0, w0)] original image shapes, read lazily from headers (PIL)
        — lets the validator unletterbox without re-decoding images."""
        if self._shapes is None:
            from PIL import Image

            shapes = []
            for f in self.img_files:
                with Image.open(f) as im:
                    w, h = im.size
                shapes.append((h, w))
            self._shapes = shapes
        return self._shapes

    @staticmethod
    def _load_label(path: str) -> np.ndarray:
        """[N, 5] rows of (cls, xc, yc, w, h) normalized."""
        p = Path(path)
        if not p.exists():
            return np.zeros((0, 5), np.float32)
        rows = []
        for line in p.read_text().splitlines():
            vals = line.split()
            if len(vals) >= 5:
                rows.append([float(v) for v in vals[:5]])
        return np.asarray(rows, np.float32) if rows else np.zeros((0, 5), np.float32)

    def __len__(self):
        return len(self.img_files)

    def _imread(self, idx: int) -> np.ndarray:
        """Decoded BGR image for img_files[idx], honoring the cache mode."""
        import cv2

        def decode(path: str) -> np.ndarray:
            im = cv2.imread(path)
            if im is None:
                raise FileNotFoundError(path)
            return im

        if self.cache == "ram":
            im = self._ram.get(idx)
            if im is None:
                im = decode(self.img_files[idx])
                self._ram[idx] = im
            return im.copy()  # augments write in place
        if self.cache == "disk":
            p = Path(self.img_files[idx])
            npy = p.parent / f".ymt_cache_{p.stem}.npy"
            if npy.exists():
                return np.load(npy)
            im = decode(str(p))
            try:
                np.save(npy, im)
            except OSError:  # read-only dataset dir: degrade to no cache
                pass
            return im
        return decode(self.img_files[idx])

    def _rect_resize(self, im: np.ndarray) -> np.ndarray:
        """Reference base.load_image rect_mode resize: long side -> imgsz with
        CEIL dims, INTER_LINEAR, both up- and down-scaling (base.py:250-262).
        The subsequent letterbox then sees r==1 and only pads — mirroring the
        reference composition is required for val pixel/mAP parity."""
        import cv2

        h0, w0 = im.shape[:2]
        r = self.imgsz / max(h0, w0)
        if r != 1:
            w1 = min(math.ceil(w0 * r), self.imgsz)
            h1 = min(math.ceil(h0 * r), self.imgsz)
            im = cv2.resize(im, (w1, h1), interpolation=cv2.INTER_LINEAR)
        return im

    # -- single-sample pipeline -------------------------------------------------
    def load_sample(self, idx: int, rng: random.Random) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (image HWC RGB float-ready uint8, labels [N,5] cls+xyxy px)."""
        import cv2

        im = self._imread(idx)
        h0, w0 = im.shape[:2]
        lbl = self.labels[idx].copy()

        use_mosaic = self.augment and self.mosaic_enabled and self.hyp["mosaic"] > 0 and rng.random() < self.hyp["mosaic"]
        if use_mosaic:
            if self.hyp.get("mosaic9", 0) > 0 and rng.random() < self.hyp["mosaic9"]:
                im, lbl = self._mosaic9(idx, rng)
            else:
                im, lbl = self._mosaic4(idx, rng)
            h0, w0 = im.shape[:2]
            # mosaic labels already in pixel xyxy
            boxes_px = lbl[:, 1:5]
            cls = lbl[:, 0]
        else:
            im = self._rect_resize(im)  # val/train pixel parity, see helper
            h1, w1 = im.shape[:2]
            # cls,xc,yc,w,h normalized -> xyxy px in RESIZED space (the
            # reference denormalizes by the resized shape)
            cls = lbl[:, 0]
            xc, yc, w, h = lbl[:, 1] * w1, lbl[:, 2] * h1, lbl[:, 3] * w1, lbl[:, 4] * h1
            boxes_px = np.stack([xc - w / 2, yc - h / 2, xc + w / 2, yc + h / 2], -1) if len(lbl) else np.zeros((0, 4), np.float32)

        im_lb, ratio, pad = letterbox(im, self.imgsz, scaleup=self.augment)
        boxes_px = boxes_px * ratio[0]
        boxes_px[:, [0, 2]] += pad[0]
        boxes_px[:, [1, 3]] += pad[1]

        if self.augment:
            h = self.hyp
            if h.get("degrees") or h.get("shear") or h.get("translate") or h.get("scale"):
                im_lb, boxes_px, cls = random_perspective(
                    im_lb, boxes_px, cls, rng, degrees=h["degrees"], translate=h["translate"],
                    scale=h["scale"], shear=h["shear"],
                )
            if h.get("mixup", 0) > 0 and rng.random() < h["mixup"]:
                im2, lbl2 = self._plain_sample(rng.randrange(len(self)), rng)  # BGR donor
                im_lb, boxes_px, cls = mixup(im_lb, boxes_px, cls, im2, lbl2[:, 1:5], lbl2[:, 0], rng)
            if h.get("cutmix", 0) > 0 and rng.random() < h["cutmix"]:
                im2, lbl2 = self._plain_sample(rng.randrange(len(self)), rng)
                im_lb, boxes_px, cls = cutmix(im_lb, boxes_px, cls, im2, lbl2[:, 1:5], lbl2[:, 0], rng)
            if h.get("copy_paste", 0) > 0 and rng.random() < h["copy_paste"]:
                im2, lbl2 = self._plain_sample(rng.randrange(len(self)), rng)
                im_lb, boxes_px, cls = copy_paste(im_lb, boxes_px, cls, im2, lbl2[:, 1:5], lbl2[:, 0], rng)
            im_lb, boxes_px = self._augment_hsv_flip(im_lb, boxes_px, rng)

        im_rgb = im_lb[..., ::-1].astype(np.uint8)
        out = np.concatenate([cls[:, None], boxes_px], -1) if len(cls) else np.zeros((0, 5), np.float32)
        return im_rgb, out

    def _plain_sample(self, idx: int, rng: random.Random):
        """Donor sample for mixup/cutmix/copy-paste: letterboxed, no recursion."""
        import cv2

        im = self._imread(idx)
        h0, w0 = im.shape[:2]
        lbl = self.labels[idx]
        if isinstance(lbl, list):
            lbl = np.zeros((0, 5), np.float32)
        lbl = np.asarray(lbl, np.float32).reshape(-1, lbl.shape[-1] if getattr(lbl, "ndim", 1) == 2 else 5)[:, :5]
        cls = lbl[:, 0] if len(lbl) else np.zeros((0,), np.float32)
        xc, yc, w, h = (lbl[:, 1] * w0, lbl[:, 2] * h0, lbl[:, 3] * w0, lbl[:, 4] * h0) if len(lbl) else (0, 0, 0, 0)
        boxes = np.stack([xc - w / 2, yc - h / 2, xc + w / 2, yc + h / 2], -1) if len(lbl) else np.zeros((0, 4), np.float32)
        im_lb, ratio, pad = letterbox(im, self.imgsz, scaleup=True)
        boxes = boxes * ratio[0]
        if len(boxes):
            boxes[:, [0, 2]] += pad[0]
            boxes[:, [1, 3]] += pad[1]
        out = np.concatenate([cls[:, None], boxes], -1) if len(cls) else np.zeros((0, 5), np.float32)
        return im_lb, out

    def _mosaic4(self, idx: int, rng: random.Random):
        """4-image mosaic (reference data/augment.py:422 Mosaic), output 2*imgsz
        canvas center-cropped to imgsz-scale space by the later letterbox."""
        import cv2

        s = self.imgsz
        yc = int(rng.uniform(s * 0.5, s * 1.5))
        xc = int(rng.uniform(s * 0.5, s * 1.5))
        idxs = [idx] + [rng.randrange(len(self)) for _ in range(3)]
        canvas = np.full((s * 2, s * 2, 3), 114, np.uint8)
        all_labels = []
        for i, ix in enumerate(idxs):
            im = self._imread(ix)
            h0, w0 = im.shape[:2]
            r = s / max(h0, w0)
            if r != 1:
                im = cv2.resize(im, (int(w0 * r), int(h0 * r)), interpolation=cv2.INTER_LINEAR)
            h, w = im.shape[:2]
            if i == 0:
                x1a, y1a, x2a, y2a = max(xc - w, 0), max(yc - h, 0), xc, yc
                x1b, y1b, x2b, y2b = w - (x2a - x1a), h - (y2a - y1a), w, h
            elif i == 1:
                x1a, y1a, x2a, y2a = xc, max(yc - h, 0), min(xc + w, s * 2), yc
                x1b, y1b, x2b, y2b = 0, h - (y2a - y1a), min(w, x2a - x1a), h
            elif i == 2:
                x1a, y1a, x2a, y2a = max(xc - w, 0), yc, xc, min(s * 2, yc + h)
                x1b, y1b, x2b, y2b = w - (x2a - x1a), 0, w, min(y2a - y1a, h)
            else:
                x1a, y1a, x2a, y2a = xc, yc, min(xc + w, s * 2), min(s * 2, yc + h)
                x1b, y1b, x2b, y2b = 0, 0, min(w, x2a - x1a), min(y2a - y1a, h)
            canvas[y1a:y2a, x1a:x2a] = im[y1b:y2b, x1b:x2b]
            padw, padh = x1a - x1b, y1a - y1b
            lbl = self.labels[ix]
            if len(lbl):
                cls = lbl[:, 0:1]
                bx = lbl[:, 1:5].copy()
                bw, bh = bx[:, 2] * w, bx[:, 3] * h
                bxc, byc = bx[:, 0] * w + padw, bx[:, 1] * h + padh
                xyxy = np.stack([bxc - bw / 2, byc - bh / 2, bxc + bw / 2, byc + bh / 2], -1)
                all_labels.append(np.concatenate([cls, xyxy], -1))
        if all_labels:
            lbl = np.concatenate(all_labels, 0)
            lbl[:, 1:5] = lbl[:, 1:5].clip(0, 2 * s)
            # drop degenerate boxes
            wh = lbl[:, 3:5] - lbl[:, 1:3]
            lbl = lbl[(wh > 2).all(1)]
        else:
            lbl = np.zeros((0, 5), np.float32)
        return canvas, lbl

    def _mosaic9(self, idx: int, rng: random.Random):
        """9-image mosaic (reference data/augment.py Mosaic n=9): 3x3 grid of
        per-cell-fitted images on a 3*imgsz canvas; labels offset per cell."""
        import cv2

        s = self.imgsz
        idxs = [idx] + [rng.randrange(len(self)) for _ in range(8)]
        canvas = np.full((s * 3, s * 3, 3), 114, np.uint8)
        all_labels = []
        for i, ix in enumerate(idxs):
            im = self._imread(ix)
            h0, w0 = im.shape[:2]
            r = s / max(h0, w0)
            im = cv2.resize(im, (int(w0 * r), int(h0 * r)), interpolation=cv2.INTER_LINEAR)
            h, w = im.shape[:2]
            ox, oy = (i % 3) * s, (i // 3) * s  # cell origin
            # jitter placement inside the cell
            dx = rng.randrange(max(s - w, 0) + 1)
            dy = rng.randrange(max(s - h, 0) + 1)
            canvas[oy + dy: oy + dy + h, ox + dx: ox + dx + w] = im
            lbl = self.labels[ix]
            if len(lbl):
                cls = lbl[:, 0:1]
                bw, bh = lbl[:, 3] * w, lbl[:, 4] * h
                bxc = lbl[:, 1] * w + ox + dx
                byc = lbl[:, 2] * h + oy + dy
                xyxy = np.stack([bxc - bw / 2, byc - bh / 2, bxc + bw / 2, byc + bh / 2], -1)
                all_labels.append(np.concatenate([cls, xyxy], -1))
        if all_labels:
            lbl = np.concatenate(all_labels, 0)
            lbl[:, 1:5] = lbl[:, 1:5].clip(0, 3 * s)
            wh = lbl[:, 3:5] - lbl[:, 1:3]
            lbl = lbl[(wh > 2).all(1)]
        else:
            lbl = np.zeros((0, 5), np.float32)
        return canvas, lbl

    def _augment_hsv_flip(self, im: np.ndarray, boxes: np.ndarray, rng: random.Random):
        """RandomHSV + RandomFlip (reference augment.py:1403,1480). im is BGR."""
        import cv2

        h = self.hyp
        if h.get("albumentations"):
            im = self._albumentations(im, rng)
        if h.get("bgr", 0) and rng.random() < h["bgr"]:
            im = im[..., ::-1]  # channel flip (reference augment.py bgr)
        if h["hsv_h"] or h["hsv_s"] or h["hsv_v"]:
            r = np.array([rng.uniform(-1, 1) for _ in range(3)]) * [h["hsv_h"], h["hsv_s"], h["hsv_v"]] + 1
            hue, sat, val = cv2.split(cv2.cvtColor(im, cv2.COLOR_BGR2HSV))
            x = np.arange(256)
            lut_h = ((x * r[0]) % 180).astype(im.dtype)
            lut_s = np.clip(x * r[1], 0, 255).astype(im.dtype)
            lut_v = np.clip(x * r[2], 0, 255).astype(im.dtype)
            im = cv2.cvtColor(cv2.merge((cv2.LUT(hue, lut_h), cv2.LUT(sat, lut_s), cv2.LUT(val, lut_v))), cv2.COLOR_HSV2BGR)
        if rng.random() < h["fliplr"]:
            im = im[:, ::-1]
            if len(boxes):
                w = im.shape[1]
                boxes = boxes.copy()
                boxes[:, [0, 2]] = w - boxes[:, [2, 0]]
        if rng.random() < h["flipud"]:
            im = im[::-1]
            if len(boxes):
                hgt = im.shape[0]
                boxes = boxes.copy()
                boxes[:, [1, 3]] = hgt - boxes[:, [3, 1]]
        return np.ascontiguousarray(im), boxes

    _warned_album = False

    def _albumentations(self, im: np.ndarray, rng: random.Random) -> np.ndarray:
        """Pixel-level extras routed through albumentations when installed
        (reference augment.py:1184 Albumentations: Blur/MedianBlur/ToGray/
        CLAHE at p=0.01); silently skipped (with one warning) otherwise."""
        try:
            import albumentations as A  # noqa: N812
        except ImportError:
            if not YOLODataset._warned_album:
                from ..utils import LOGGER

                LOGGER.warning("albumentations not installed; albumentations=True ignored")
                YOLODataset._warned_album = True
            return im
        if not hasattr(self, "_album_tf"):
            self._album_tf = A.Compose([
                A.Blur(p=0.01), A.MedianBlur(p=0.01), A.ToGray(p=0.01), A.CLAHE(p=0.01),
                A.RandomBrightnessContrast(p=0.0), A.ImageCompression(quality_range=(75, 100), p=0.0),
            ])
        return self._album_tf(image=im)["image"]


def collate(samples: List[Tuple[np.ndarray, np.ndarray]], max_gt: int) -> Dict[str, np.ndarray]:
    """Stack into fixed-shape batch; pad GT to max_gt."""
    B = len(samples)
    H, W = samples[0][0].shape[:2]
    images = np.zeros((B, H, W, 3), np.float32)
    boxes = np.zeros((B, max_gt, 4), np.float32)
    classes = np.zeros((B, max_gt), np.int32)
    mask = np.zeros((B, max_gt), bool)
    for i, (im, lbl) in enumerate(samples):
        images[i] = im.astype(np.float32) / 255.0
        n = min(len(lbl), max_gt)
        if n:
            boxes[i, :n] = lbl[:n, 1:5]
            classes[i, :n] = lbl[:n, 0].astype(np.int32)
            mask[i, :n] = True
    return {"images": images, "boxes": boxes, "classes": classes, "mask": mask}


def _default_collate(ds, samples):
    if hasattr(ds, "collate_batch"):
        return ds.collate_batch(samples)
    return collate(samples, ds.max_gt)


class DataLoader:
    """Infinite (train) or single-pass (val) fixed-shape batch iterator.

    ``process_shard=(rank, world)`` is the DistributedSampler analog for
    multi-process runs (reference data/build.py): every process derives the
    SAME seeded global batch order, then yields only its rank's contiguous
    bs/world slice of each global batch — parallel.launch.global_batch
    reassembles the shards into one mesh-sharded global array in rank order.
    """

    def __init__(self, dataset: YOLODataset, batch_size: int, shuffle: bool = True, seed: int = 0,
                 drop_last: bool = False, process_shard=None):
        self.ds = dataset
        self.bs = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.process_shard = process_shard
        if process_shard is not None:
            rank, world = process_shard
            assert batch_size % world == 0, f"batch {batch_size} not divisible by {world} processes"

    def __len__(self):
        n = len(self.ds)
        return n // self.bs if self.drop_last else math.ceil(n / self.bs)

    def _shard(self, idxs):
        if self.process_shard is None:
            return idxs
        rank, world = self.process_shard
        per = len(idxs) // world
        return idxs[rank * per : (rank + 1) * per]

    def epoch(self, epoch: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        rng = random.Random(self.seed + epoch)
        order = list(range(len(self.ds)))
        if self.shuffle:
            rng.shuffle(order)
        for start in range(0, len(order), self.bs):
            idxs = order[start : start + self.bs]
            if len(idxs) < self.bs:
                if self.drop_last:
                    break
                idxs = idxs + order[: self.bs - len(idxs)]  # wrap to keep static shape
            samples = [self.ds.load_sample(i, rng) for i in self._shard(idxs)]
            yield _default_collate(self.ds, samples)


class PrefetchLoader:
    """Threaded prefetching loader — the TPU-side analog of the reference's
    ``InfiniteDataLoader`` + worker processes (data/build.py:43-126).

    The synchronous :class:`DataLoader` decodes+augments on the consumer
    thread, so a real chip starves between steps. Here:

      * ``workers`` threads decode/augment samples concurrently (cv2 and
        numpy release the GIL for the heavy parts);
      * up to ``prefetch`` ready batches are staged ahead of the consumer;
      * with ``sharding`` set, finished batches are ``jax.device_put`` on the
        producer side so host->device transfer overlaps the running step.

    Batches are deterministic regardless of thread timing: each sample draws
    from its own RNG stream keyed by (seed, epoch, position) instead of the
    shared sequential stream the synchronous loader threads through
    ``load_sample``.
    """

    def __init__(self, dataset: YOLODataset, batch_size: int, shuffle: bool = True, seed: int = 0,
                 drop_last: bool = False, workers: int = 4, prefetch: int = 3, sharding=None,
                 process_shard=None):
        self.ds = dataset
        self.bs = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.workers = max(1, workers)
        self.prefetch = max(1, prefetch)
        self.sharding = sharding
        # (rank, world) DistributedSampler analog — see DataLoader docstring.
        # Per-sample RNG streams are keyed by GLOBAL batch position, so the
        # assembled global batch is bit-identical regardless of world size.
        self.process_shard = process_shard
        if process_shard is not None:
            assert batch_size % process_shard[1] == 0, f"batch {batch_size} not divisible by {process_shard[1]} processes"

    def __len__(self):
        n = len(self.ds)
        return n // self.bs if self.drop_last else math.ceil(n / self.bs)

    def _batch_indices(self, epoch: int):
        rng = random.Random(self.seed + epoch)
        order = list(range(len(self.ds)))
        if self.shuffle:
            rng.shuffle(order)
        out = []
        for start in range(0, len(order), self.bs):
            idxs = order[start : start + self.bs]
            if len(idxs) < self.bs:
                if self.drop_last:
                    break
                idxs = idxs + order[: self.bs - len(idxs)]  # wrap: static shapes
            out.append(idxs)
        return out

    def epoch(self, epoch: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        import collections
        from concurrent.futures import ThreadPoolExecutor

        batches = self._batch_indices(epoch)
        base = (self.seed + epoch) * 1_000_003

        def build(bi_idxs):
            bi, idxs = bi_idxs
            j0 = 0
            if self.process_shard is not None:  # rank's slice; keep GLOBAL rng keys
                rank, world = self.process_shard
                per = len(idxs) // world
                j0, idxs = rank * per, idxs[rank * per : (rank + 1) * per]

            def one(j_i):
                j, i = j_i
                return self.ds.load_sample(i, random.Random(base + bi * self.bs + j0 + j))
            samples = list(sample_pool.map(one, enumerate(idxs)))
            batch = _default_collate(self.ds, samples)
            if self.sharding is not None:
                import jax

                batch = jax.device_put(batch, self.sharding)
            return batch

        with ThreadPoolExecutor(self.workers) as sample_pool, \
                ThreadPoolExecutor(self.prefetch) as batch_pool:
            futs = collections.deque()
            it = iter(enumerate(batches))
            for _ in range(self.prefetch):
                nxt = next(it, None)
                if nxt is None:
                    break
                futs.append(batch_pool.submit(build, nxt))
            while futs:
                f = futs.popleft()
                nxt = next(it, None)
                if nxt is not None:
                    futs.append(batch_pool.submit(build, nxt))
                yield f.result()


# ---------------------------------------------------------------------------
# Task-specific datasets (reference data/dataset.py:52-974: YOLODataset task
# modes + ClassificationDataset). Label formats:
#   segment: "cls x1 y1 x2 y2 ..." normalized polygon per row
#   pose:    "cls xc yc w h kx ky kv ..." normalized keypoints
#   obb:     "cls x1 y1 x2 y2 x3 y3 x4 y4" normalized corner points
# ---------------------------------------------------------------------------

class SegmentDataset(YOLODataset):
    """Instance segmentation dataset: polygons -> binary masks + boxes."""

    def __init__(self, *args, mask_ratio: int = 4, **kw):
        self.mask_ratio = mask_ratio
        super().__init__(*args, **kw)

    @staticmethod
    def _load_label(path: str) -> np.ndarray:
        # keep raw polygon rows (variable length) as object array
        p = Path(path)
        if not p.exists():
            return []
        rows = []
        for line in p.read_text().splitlines():
            vals = [float(v) for v in line.split()]
            if len(vals) >= 7:  # cls + >=3 points
                rows.append(np.asarray(vals, np.float32))
        return rows  # variable-length rows: plain list of float32 arrays

    @staticmethod
    def _resample_polygon(poly: np.ndarray, n: int = 1000) -> np.ndarray:
        """Reference utils/ops.py:454 resample_segments: close the ring and
        linearly interpolate to n points, keeping the original vertices.
        Rasterizing the DENSE ring (then int32-truncating every point, like
        the reference's polygon2mask) places boundary pixels differently from
        rasterizing the sparse corner list — a measured ~2 px/instance gt-mask
        drift that shows up at the strict mask-mAP50-95 IoU thresholds."""
        if len(poly) >= n:
            s = np.concatenate([poly, poly[0:1]], 0)
            x = np.linspace(0, len(s) - 1, n)
        else:
            s = np.concatenate([poly, poly[0:1]], 0)
            xp0 = np.arange(len(s))
            x = np.linspace(0, len(s) - 1, n - len(s))
            x = np.insert(x, np.searchsorted(x, xp0), xp0)
        xp = np.arange(len(s))
        return np.stack([np.interp(x, xp, s[:, 0]), np.interp(x, xp, s[:, 1])], -1).astype(np.float32)

    def load_sample(self, idx: int, rng: random.Random):
        import cv2

        im = self._rect_resize(self._imread(idx))
        h0, w0 = im.shape[:2]  # resized dims; labels denormalize against them
        rows = self.labels[idx]
        im_lb, ratio, pad = letterbox(im, self.imgsz, scaleup=self.augment)
        H = W = self.imgsz
        mh, mw = H // self.mask_ratio, W // self.mask_ratio
        boxes, cls, masks = [], [], []
        for row in rows:
            c = row[0]
            poly = row[1:].reshape(-1, 2) * [w0, h0]
            poly = self._resample_polygon(poly) * ratio[0] + [pad[0], pad[1]]
            x1, y1 = poly.min(0)
            x2, y2 = poly.max(0)
            boxes.append([x1, y1, x2, y2])
            cls.append(c)
            # reference protocol (data/utils.py:349 polygon2mask): rasterize at
            # FULL letterboxed resolution with int32-truncated coords, then
            # cv2.resize (INTER_LINEAR) down to the mask grid — rasterizing
            # directly at mask resolution shifts boundary pixels and breaks
            # mask-mAP parity vs the reference validator
            m = np.zeros((H, W), np.uint8)
            cv2.fillPoly(m, [poly.astype(np.int32)], 1)
            if self.mask_ratio != 1:
                m = cv2.resize(m, (mw, mh))
            masks.append(m)
        im_rgb = im_lb[..., ::-1].astype(np.uint8)
        lbl = np.concatenate([np.asarray(cls, np.float32)[:, None], np.asarray(boxes, np.float32)], -1) if cls else np.zeros((0, 5), np.float32)
        mk = np.stack(masks) if masks else np.zeros((0, mh, mw), np.uint8)
        return im_rgb, lbl, mk

    def collate_batch(self, samples):
        B = len(samples)
        H = W = self.imgsz
        mh, mw = H // self.mask_ratio, W // self.mask_ratio
        out = {
            "images": np.zeros((B, H, W, 3), np.float32),
            "boxes": np.zeros((B, self.max_gt, 4), np.float32),
            "classes": np.zeros((B, self.max_gt), np.int32),
            "mask": np.zeros((B, self.max_gt), bool),
            "masks": np.zeros((B, self.max_gt, mh, mw), np.float32),
        }
        for i, (im, lbl, mk) in enumerate(samples):
            out["images"][i] = im.astype(np.float32) / 255.0
            n = min(len(lbl), self.max_gt)
            if n:
                out["boxes"][i, :n] = lbl[:n, 1:5]
                out["classes"][i, :n] = lbl[:n, 0].astype(np.int32)
                out["mask"][i, :n] = True
                out["masks"][i, :n] = mk[:n]
        return out


class PoseDataset(YOLODataset):
    """Keypoint dataset (reference data/dataset.py pose mode)."""

    def __init__(self, *args, kpt_shape=(17, 3), **kw):
        self.kpt_shape = tuple(kpt_shape)
        super().__init__(*args, **kw)

    def load_sample(self, idx: int, rng: random.Random):
        import cv2

        im = self._rect_resize(self._imread(idx))
        h0, w0 = im.shape[:2]  # resized dims (labels denormalize against them)
        lbl = self.labels[idx]
        nk, nd = self.kpt_shape
        im_lb, ratio, pad = letterbox(im, self.imgsz, scaleup=self.augment)
        boxes, cls, kpts = [], [], []
        for row in lbl:
            c, xc, yc, w, h = row[:5]
            bx = np.array([(xc - w / 2) * w0, (yc - h / 2) * h0, (xc + w / 2) * w0, (yc + h / 2) * h0])
            bx = bx * ratio[0] + [pad[0], pad[1], pad[0], pad[1]]
            k = row[5 : 5 + nk * nd].reshape(nk, nd).copy() if len(row) >= 5 + nk * nd else np.zeros((nk, nd), np.float32)
            k[:, 0] = k[:, 0] * w0 * ratio[0] + pad[0]
            k[:, 1] = k[:, 1] * h0 * ratio[1] + pad[1]
            boxes.append(bx)
            cls.append(c)
            kpts.append(k)
        im_rgb = im_lb[..., ::-1].astype(np.uint8)
        lbl5 = np.concatenate([np.asarray(cls, np.float32)[:, None], np.asarray(boxes, np.float32)], -1) if cls else np.zeros((0, 5), np.float32)
        kp = np.stack(kpts) if kpts else np.zeros((0, nk, nd), np.float32)
        return im_rgb, lbl5, kp

    @staticmethod
    def _load_label(path: str) -> np.ndarray:
        p = Path(path)
        if not p.exists():
            return []
        return [np.asarray([float(v) for v in line.split()], np.float32) for line in p.read_text().splitlines() if line.strip()]

    def collate_batch(self, samples):
        B = len(samples)
        H = W = self.imgsz
        nk, nd = self.kpt_shape
        out = {
            "images": np.zeros((B, H, W, 3), np.float32),
            "boxes": np.zeros((B, self.max_gt, 4), np.float32),
            "classes": np.zeros((B, self.max_gt), np.int32),
            "mask": np.zeros((B, self.max_gt), bool),
            "keypoints": np.zeros((B, self.max_gt, nk, nd), np.float32),
        }
        for i, (im, lbl, kp) in enumerate(samples):
            out["images"][i] = im.astype(np.float32) / 255.0
            n = min(len(lbl), self.max_gt)
            if n:
                out["boxes"][i, :n] = lbl[:n, 1:5]
                out["classes"][i, :n] = lbl[:n, 0].astype(np.int32)
                out["mask"][i, :n] = True
                out["keypoints"][i, :n] = kp[:n]
        return out


class OBBDataset(YOLODataset):
    """Oriented-box dataset: 4-corner labels -> xywhr (reference obb mode +
    data/split_dota.py conventions)."""

    @staticmethod
    def _load_label(path: str) -> np.ndarray:
        p = Path(path)
        if not p.exists():
            return np.zeros((0, 9), np.float32)
        rows = []
        for line in p.read_text().splitlines():
            vals = line.split()
            if len(vals) >= 9:
                rows.append([float(v) for v in vals[:9]])
        return np.asarray(rows, np.float32) if rows else np.zeros((0, 9), np.float32)

    def load_sample(self, idx: int, rng: random.Random):
        import cv2

        im = self._rect_resize(self._imread(idx))
        h0, w0 = im.shape[:2]  # resized dims (labels denormalize against them)
        lbl = self.labels[idx]
        im_lb, ratio, pad = letterbox(im, self.imgsz, scaleup=self.augment)
        rboxes, cls = [], []
        for row in lbl:
            c = row[0]
            pts = row[1:9].reshape(4, 2) * [w0, h0]
            pts = pts * ratio[0] + [pad[0], pad[1]]
            (cx, cy), (w, h), ang = cv2.minAreaRect(pts.astype(np.float32))
            r = np.deg2rad(ang)
            # canonical xywhr: keep w >= h, r in [-pi/4, 3pi/4) like the decode range
            if h > w:
                w, h = h, w
                r += np.pi / 2
            rboxes.append([cx, cy, w, h, r])
            cls.append(c)
        im_rgb = im_lb[..., ::-1].astype(np.uint8)
        rb = np.asarray(rboxes, np.float32) if rboxes else np.zeros((0, 5), np.float32)
        return im_rgb, np.asarray(cls, np.float32), rb

    def collate_batch(self, samples):
        B = len(samples)
        H = W = self.imgsz
        out = {
            "images": np.zeros((B, H, W, 3), np.float32),
            "rboxes": np.zeros((B, self.max_gt, 5), np.float32),
            "classes": np.zeros((B, self.max_gt), np.int32),
            "mask": np.zeros((B, self.max_gt), bool),
        }
        for i, (im, cls, rb) in enumerate(samples):
            out["images"][i] = im.astype(np.float32) / 255.0
            n = min(len(cls), self.max_gt)
            if n:
                out["rboxes"][i, :n] = rb[:n]
                out["classes"][i, :n] = cls[:n].astype(np.int32)
                out["mask"][i, :n] = True
        return out


class SemanticDataset(YOLODataset):
    """Per-pixel semantic segmentation dataset (reference data/dataset.py:692
    SemanticDataset): images + same-stem PNG masks of integer class ids under
    the labels dir. Batches carry ``sem_mask`` [B, H, W] int32 (letterbox
    padding marked 255 = out-of-range, which one-hots to all-zeros in the
    BCE-Dice loss)."""

    @staticmethod
    def _load_label(path: str) -> np.ndarray:
        return np.zeros((0, 5), np.float32)  # masks are read in load_sample

    def load_sample(self, idx: int, rng: random.Random):
        import cv2

        im = self._imread(idx)
        mask_path = str(Path(img2label_path(self.img_files[idx])).with_suffix(".png"))
        m = cv2.imread(mask_path, cv2.IMREAD_GRAYSCALE)
        if m is None:
            m = np.zeros(im.shape[:2], np.uint8)
        s = self.imgsz
        h0, w0 = im.shape[:2]
        r = min(s / h0, s / w0)
        nh, nw = round(h0 * r), round(w0 * r)
        im = cv2.resize(im, (nw, nh), interpolation=cv2.INTER_LINEAR)
        m = cv2.resize(m, (nw, nh), interpolation=cv2.INTER_NEAREST)
        canvas = np.full((s, s, 3), 114, np.uint8)
        mcanvas = np.full((s, s), 255, np.uint8)
        top, left = (s - nh) // 2, (s - nw) // 2
        canvas[top : top + nh, left : left + nw] = im
        mcanvas[top : top + nh, left : left + nw] = m
        if self.augment and rng.random() < 0.5:
            canvas, mcanvas = canvas[:, ::-1], mcanvas[:, ::-1]
        return np.ascontiguousarray(canvas), np.ascontiguousarray(mcanvas)

    def collate_batch(self, samples):
        B = len(samples)
        H = W = self.imgsz
        out = {
            "images": np.zeros((B, H, W, 3), np.float32),
            "sem_mask": np.zeros((B, H, W), np.int32),
        }
        for i, (im, m) in enumerate(samples):
            out["images"][i] = im.astype(np.float32) / 255.0
            out["sem_mask"][i] = m.astype(np.int32)
        return out


class ClassificationDataset:
    """Folder-per-class dataset (reference data/dataset.py:974)."""

    def __init__(self, root: str, imgsz: int = 224, augment: bool = False):
        self.root = Path(root)
        self.imgsz = imgsz
        self.augment = augment
        classes = sorted(d.name for d in self.root.iterdir() if d.is_dir())
        self.names = dict(enumerate(classes))
        self.samples = []
        for ci, cname in enumerate(classes):
            for f in sorted((self.root / cname).rglob("*")):
                if f.suffix.lower().lstrip(".") in IMG_FORMATS:
                    self.samples.append((str(f), ci))
        self.max_gt = 0

    def __len__(self):
        return len(self.samples)

    def load_sample(self, idx: int, rng: random.Random):
        import cv2

        path, ci = self.samples[idx]
        im = cv2.imread(path)
        im = cv2.resize(im, (self.imgsz, self.imgsz), interpolation=cv2.INTER_LINEAR)
        if self.augment and rng.random() < 0.5:
            im = im[:, ::-1]
        return np.ascontiguousarray(im[..., ::-1]), ci

    def collate_batch(self, samples):
        B = len(samples)
        out = {
            "images": np.zeros((B, self.imgsz, self.imgsz, 3), np.float32),
            "classes": np.zeros((B,), np.int32),
        }
        for i, (im, ci) in enumerate(samples):
            out["images"][i] = im.astype(np.float32) / 255.0
            out["classes"][i] = ci
        return out


# ---------------------------------------------------------------------------
# Extended augmentations (reference data/augment.py: RandomPerspective:1036,
# MixUp:762, CutMix:863, CopyPaste:1856). Applied inside YOLODataset.load_sample
# when enabled by hyp; all operate on (BGR image, labels [N,5] cls+xyxy px).
# ---------------------------------------------------------------------------

def random_perspective(im, boxes, cls, rng, degrees=0.0, translate=0.1, scale=0.5, shear=0.0, perspective=0.0, border=114):
    """Affine warp + box transform (reference augment.py:1036 RandomPerspective)."""
    import cv2

    h, w = im.shape[:2]
    C = np.eye(3)
    C[0, 2], C[1, 2] = -w / 2, -h / 2
    R = np.eye(3)
    a = rng.uniform(-degrees, degrees)
    s = rng.uniform(1 - scale, 1 + scale)
    R[:2] = cv2.getRotationMatrix2D(angle=a, center=(0, 0), scale=s)
    S = np.eye(3)
    S[0, 1] = np.tan(np.deg2rad(rng.uniform(-shear, shear)))
    S[1, 0] = np.tan(np.deg2rad(rng.uniform(-shear, shear)))
    T = np.eye(3)
    T[0, 2] = rng.uniform(0.5 - translate, 0.5 + translate) * w
    T[1, 2] = rng.uniform(0.5 - translate, 0.5 + translate) * h
    M = T @ S @ R @ C
    im = cv2.warpAffine(im, M[:2], dsize=(w, h), borderValue=(border, border, border))
    if len(boxes):
        n = len(boxes)
        pts = np.ones((n * 4, 3))
        pts[:, :2] = boxes[:, [0, 1, 2, 1, 2, 3, 0, 3]].reshape(n * 4, 2)
        pts = pts @ M.T
        pts = pts[:, :2].reshape(n, 8)
        new = np.stack([pts[:, 0::2].min(1), pts[:, 1::2].min(1), pts[:, 0::2].max(1), pts[:, 1::2].max(1)], -1)
        new = new.clip([0, 0, 0, 0], [w, h, w, h])
        # candidate filter: area/aspect sanity (reference box_candidates)
        w1 = boxes[:, 2] - boxes[:, 0]
        h1 = boxes[:, 3] - boxes[:, 1]
        w2 = new[:, 2] - new[:, 0]
        h2 = new[:, 3] - new[:, 1]
        ar = np.maximum(w2 / (h2 + 1e-9), h2 / (w2 + 1e-9))
        keep = (w2 > 2) & (h2 > 2) & (w2 * h2 / (w1 * h1 * s * s + 1e-9) > 0.1) & (ar < 100)
        boxes, cls = new[keep], cls[keep]
    return im, boxes, cls


def mixup(im1, boxes1, cls1, im2, boxes2, cls2, rng):
    """Beta(32,32) image blend + label union (reference augment.py:762 MixUp)."""
    r = rng.betavariate(32.0, 32.0)
    im = (im1.astype(np.float32) * r + im2.astype(np.float32) * (1 - r)).astype(np.uint8)
    return im, np.concatenate([boxes1, boxes2], 0), np.concatenate([cls1, cls2], 0)


def cutmix(im1, boxes1, cls1, im2, boxes2, cls2, rng):
    """Paste a random window of image 2 into image 1, transferring labels whose
    centers fall inside (reference augment.py:863 CutMix)."""
    h, w = im1.shape[:2]
    lam = rng.betavariate(1.0, 1.0)
    cw, ch = int(w * np.sqrt(1 - lam)), int(h * np.sqrt(1 - lam))
    if cw < 2 or ch < 2:
        return im1, boxes1, cls1
    x1 = rng.randrange(max(w - cw, 1))
    y1 = rng.randrange(max(h - ch, 1))
    im = im1.copy()
    im[y1 : y1 + ch, x1 : x1 + cw] = im2[y1 : y1 + ch, x1 : x1 + cw]
    if len(boxes2):
        cx = (boxes2[:, 0] + boxes2[:, 2]) / 2
        cy = (boxes2[:, 1] + boxes2[:, 3]) / 2
        inside = (cx >= x1) & (cx < x1 + cw) & (cy >= y1) & (cy < y1 + ch)
        b2 = boxes2[inside].clip([x1, y1, x1, y1], [x1 + cw, y1 + ch, x1 + cw, y1 + ch])
        boxes1 = np.concatenate([boxes1, b2], 0)
        cls1 = np.concatenate([cls1, cls2[inside]], 0)
    return im, boxes1, cls1


def copy_paste(im, boxes, cls, src_im, src_boxes, src_cls, rng, p=0.5):
    """Copy box crops from a donor image (box-level simplification of the
    reference's mask-based CopyPaste, augment.py:1856)."""
    h, w = im.shape[:2]
    im = im.copy()
    new_boxes, new_cls = [], []
    for b, c in zip(src_boxes, src_cls):
        if rng.random() > p:
            continue
        x1, y1, x2, y2 = [int(v) for v in b]
        bw, bh = x2 - x1, y2 - y1
        if bw < 4 or bh < 4 or bw >= w or bh >= h:
            continue
        nx = rng.randrange(max(w - bw, 1))
        ny = rng.randrange(max(h - bh, 1))
        crop = src_im[y1:y2, x1:x2]
        im[ny : ny + crop.shape[0], nx : nx + crop.shape[1]] = crop
        new_boxes.append([nx, ny, nx + bw, ny + bh])
        new_cls.append(c)
    if new_boxes:
        boxes = np.concatenate([boxes, np.asarray(new_boxes, np.float32)], 0)
        cls = np.concatenate([cls, np.asarray(new_cls, np.float32)], 0)
    return im, boxes, cls
