"""Dataset converters (reference: ultralytics/data/converter.py —
COCO json -> YOLO txt labels, class-map remapping, segmentation polygons;
plus autosplit from data/split.py and DOTA image/label slicing from
data/split_dota.py)."""

from __future__ import annotations

import json
import random
from collections import defaultdict
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..utils import LOGGER
from ..utils.coco import COCO80_TO_COCO91

COCO91_TO_COCO80 = {c91: i for i, c91 in enumerate(COCO80_TO_COCO91)}


def convert_coco(
    annotations_json: str,
    save_dir: str,
    use_segments: bool = False,
    cls91to80: bool = True,
) -> str:
    """COCO instances json -> YOLO labels dir (one txt per image,
    ``cls xc yc w h`` normalized, or polygon rows with use_segments).
    Reference converter.py convert_coco."""
    data = json.loads(Path(annotations_json).read_text())
    images = {im["id"]: im for im in data["images"]}
    by_img: Dict[int, list] = defaultdict(list)
    for a in data["annotations"]:
        if a.get("iscrowd", 0):
            continue
        by_img[a["image_id"]].append(a)

    out_dir = Path(save_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    n = 0
    from ..utils.tqdm import TQDM

    for img_id, anns in TQDM(by_img.items(), desc="convert_coco", unit="img"):
        im = images[img_id]
        w, h = im["width"], im["height"]
        rows = []
        for a in anns:
            cid = a["category_id"]
            cls = COCO91_TO_COCO80.get(cid) if cls91to80 else cid - 1
            if cls is None:
                continue
            if use_segments and a.get("segmentation"):
                seg = a["segmentation"]
                if isinstance(seg, list) and seg:
                    pts = np.asarray(seg[0], np.float64).reshape(-1, 2) / [w, h]
                    rows.append(f"{cls} " + " ".join(f"{v:.6f}" for v in pts.reshape(-1)))
                    continue
            x, y, bw, bh = a["bbox"]
            rows.append(f"{cls} {(x + bw / 2) / w:.6f} {(y + bh / 2) / h:.6f} {bw / w:.6f} {bh / h:.6f}")
        stem = Path(im["file_name"]).stem
        (out_dir / f"{stem}.txt").write_text("\n".join(rows))
        n += 1
    LOGGER.info(f"converted {n} images' annotations -> {out_dir}")
    return str(out_dir)


def autosplit(
    image_dir: str,
    weights: Tuple[float, float, float] = (0.9, 0.1, 0.0),
    annotated_only: bool = False,
    seed: int = 0,
) -> List[str]:
    """Write autosplit_{train,val,test}.txt image lists (reference
    data/split.py autosplit)."""
    from .dataset import IMG_FORMATS, img2label_path

    root = Path(image_dir)
    files = sorted(f for f in root.rglob("*") if f.suffix.lower().lstrip(".") in IMG_FORMATS)
    if annotated_only:
        files = [f for f in files if Path(img2label_path(str(f))).exists()]
    rng = random.Random(seed)
    rng.shuffle(files)
    n = len(files)
    cuts = (round(n * weights[0]), round(n * (weights[0] + weights[1])))
    splits = {"train": files[: cuts[0]], "val": files[cuts[0] : cuts[1]], "test": files[cuts[1] :]}
    out = []
    for name, fs in splits.items():
        p = root.parent / f"autosplit_{name}.txt"
        p.write_text("\n".join(str(f) for f in fs))
        out.append(str(p))
    LOGGER.info(f"autosplit {n} images -> {[f'{k}:{len(v)}' for k, v in splits.items()]}")
    return out


def split_images_and_labels(
    data_root: str,
    split: str = "train",
    crop_size: int = 1024,
    gap: int = 200,
    save_dir: Optional[str] = None,
) -> str:
    """Slice large images + labels into overlapping tiles (reference
    data/split_dota.py split_trainval): windows of crop_size with stride
    crop_size-gap; labels whose box CENTER falls in a window are kept,
    re-normalized to the tile."""
    import cv2

    from .dataset import IMG_FORMATS, img2label_path

    root = Path(data_root)
    img_dir = root / "images" / split
    out_root = Path(save_dir or (root.parent / f"{root.name}_split"))
    (out_root / "images" / split).mkdir(parents=True, exist_ok=True)
    (out_root / "labels" / split).mkdir(parents=True, exist_ok=True)
    stride = crop_size - gap
    n_tiles = 0
    for f in sorted(img_dir.rglob("*")):
        if f.suffix.lower().lstrip(".") not in IMG_FORMATS:
            continue
        im = cv2.imread(str(f))
        h, w = im.shape[:2]
        lbl_path = Path(img2label_path(str(f)))
        rows = []
        if lbl_path.exists():
            for line in lbl_path.read_text().splitlines():
                v = line.split()
                if len(v) >= 5:
                    rows.append([float(x) for x in v])
        xs = list(range(0, max(w - gap, 1), stride)) or [0]
        ys = list(range(0, max(h - gap, 1), stride)) or [0]
        for y0 in ys:
            for x0 in xs:
                x1, y1 = min(x0 + crop_size, w), min(y0 + crop_size, h)
                tw, th = x1 - x0, y1 - y0
                if tw < crop_size // 4 or th < crop_size // 4:
                    continue
                tile_rows = []
                for r in rows:
                    cls = int(r[0])
                    if len(r) == 5:  # xc yc w h normalized
                        cx, cy, bw, bh = r[1] * w, r[2] * h, r[3] * w, r[4] * h
                        if not (x0 <= cx < x1 and y0 <= cy < y1):
                            continue
                        tile_rows.append(
                            f"{cls} {(cx - x0) / tw:.6f} {(cy - y0) / th:.6f} {bw / tw:.6f} {bh / th:.6f}"
                        )
                    else:  # polygon/corner rows (seg/obb): all points normalized
                        pts = np.asarray(r[1:], np.float64).reshape(-1, 2) * [w, h]
                        c = pts.mean(0)
                        if not (x0 <= c[0] < x1 and y0 <= c[1] < y1):
                            continue
                        pts = (pts - [x0, y0]) / [tw, th]
                        tile_rows.append(f"{cls} " + " ".join(f"{v:.6f}" for v in pts.reshape(-1)))
                if not tile_rows:
                    continue
                stem = f"{f.stem}__{x0}_{y0}"
                cv2.imwrite(str(out_root / "images" / split / f"{stem}.jpg"), im[y0:y1, x0:x1])
                (out_root / "labels" / split / f"{stem}.txt").write_text("\n".join(tile_rows))
                n_tiles += 1
    LOGGER.info(f"split {split}: wrote {n_tiles} tiles to {out_root}")
    return str(out_root)
