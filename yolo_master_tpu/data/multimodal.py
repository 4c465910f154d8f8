"""Text-conditioned datasets: multimodal + grounding.

Reference: ultralytics/data/dataset.py:322 (YOLOMultiModalDataset) and :418
(GroundingDataset) — the data side of YOLO-World/YOLOE training. Multimodal
adds per-epoch text prompts over standard YOLO labels; grounding reads
COCO-style JSON where each annotation's class is a caption phrase
(tokens_positive spans), giving per-image open vocabularies.

TPU-first notes: text embeddings are computed host-side by the (pluggable)
text encoder and enter the jitted step as dense [V, embed] arrays; per-image
grounding vocabularies are remapped onto a fixed global phrase table so
class ids and the embedding bank have static shapes across the epoch.
"""

from __future__ import annotations

import json
import random
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..utils import LOGGER
from .dataset import IMG_FORMATS, YOLODataset


class YOLOMultiModalDataset(YOLODataset):
    """Standard YOLO labels + the text channel: class names become prompts,
    optionally mixed with sampled negative prompts each epoch
    (reference dataset.py:349 update_labels_info / category_freq)."""

    def __init__(self, *args, neg_prompts: Optional[Sequence[str]] = None,
                 neg_samples: int = 0, **kwargs):
        super().__init__(*args, **kwargs)
        self.class_texts = [str(self.names[i]) for i in sorted(self.names)]
        self.neg_prompts = list(neg_prompts or [])
        self.neg_samples = min(neg_samples, len(self.neg_prompts))

    def sample_texts(self, seed: int = 0) -> List[str]:
        """Epoch vocabulary: all class prompts + sampled negatives. Positive
        ids stay stable (negatives append after), so labels never remap."""
        rng = random.Random(seed)
        neg = rng.sample(self.neg_prompts, self.neg_samples) if self.neg_samples else []
        return self.class_texts + neg


class GroundingDataset(YOLODataset):
    """COCO-grounding JSON -> YOLO-style samples with a global phrase table
    (reference dataset.py:418 GroundingDataset.get_labels).

    Expected JSON: {"images": [{id, file_name, height, width, caption}],
    "annotations": [{image_id, bbox [x,y,w,h], tokens_positive [[s,e],...]}]}.
    Each annotation's phrase = caption[s:e] spans joined; phrases dedupe into
    a dataset-wide table whose indices are the class ids."""

    def __init__(self, data: str | dict = ".", split: str = "train", json_file: str = "",
                 img_root: str = "", imgsz: int = 640, max_gt: int = 128,
                 augment: bool = False, hyp: Optional[dict] = None, task: str = "detect"):
        assert task in {"detect", "segment"}, "GroundingDataset supports detect/segment"
        self.json_file = str(json_file)
        root = Path(img_root or Path(self.json_file).parent)
        with open(self.json_file) as f:
            ann = json.load(f)

        phrases: Dict[str, int] = {}
        per_image: Dict[int, list] = {}
        images = {im["id"]: im for im in ann["images"]}
        for a in ann["annotations"]:
            im = images.get(a["image_id"])
            if im is None:
                continue
            caption = im.get("caption", "")
            spans = a.get("tokens_positive") or []
            phrase = " ".join(caption[s:e] for s, e in spans).strip().lower()
            if not phrase:
                phrase = a.get("category_name", "object")
            cid = phrases.setdefault(phrase, len(phrases))
            x, y, w, h = a["bbox"]
            iw, ih = im["width"], im["height"]
            # normalized cls,xc,yc,w,h rows (the YOLO label contract)
            per_image.setdefault(a["image_id"], []).append(
                [cid, (x + w / 2) / iw, (y + h / 2) / ih, w / iw, h / ih])

        self.img_files = []
        self.labels = []
        for img_id, rows in per_image.items():
            f = root / images[img_id]["file_name"]
            if f.suffix.lower().lstrip(".") not in IMG_FORMATS or not f.exists():
                continue
            self.img_files.append(str(f))
            self.labels.append(np.asarray(rows, np.float32))
        if not self.img_files:
            raise FileNotFoundError(f"no grounding images resolved under {root}")

        self.phrase_table = [p for p, _ in sorted(phrases.items(), key=lambda kv: kv[1])]
        self.names = dict(enumerate(self.phrase_table))
        self.nc = len(self.phrase_table)
        self.imgsz, self.max_gt, self.augment = imgsz, max_gt, augment
        self.hyp = {"fliplr": 0.5, "flipud": 0.0, "hsv_h": 0.015, "hsv_s": 0.7, "hsv_v": 0.4,
                    "mosaic": 1.0, "scale": 0.5, "translate": 0.1, "degrees": 0.0, "shear": 0.0,
                    "mixup": 0.0, "cutmix": 0.0, "copy_paste": 0.0, **(hyp or {})}
        self.mosaic_enabled = True
        LOGGER.info(f"GroundingDataset: {len(self.img_files)} images, {self.nc} phrases")

    def sample_texts(self, seed: int = 0) -> List[str]:
        return list(self.phrase_table)
