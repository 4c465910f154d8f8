"""Results API (reference: ultralytics/engine/results.py:184-1593).

Host-side numpy containers for per-image detections with the same user-facing
accessors as the reference (`.boxes.xyxy`, `.boxes.conf`, `.boxes.cls`,
`plot/save/summary/to_json`). Device->host boundary happens exactly once, when
the fixed-shape NMS output is trimmed by its validity mask.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, List, Optional

import numpy as np


class Boxes:
    """Detection boxes: data [N, 6] = (x1, y1, x2, y2, conf, cls), pixel units
    of the original image (reference results.py:885)."""

    def __init__(self, data: np.ndarray, orig_shape):
        self.data = np.asarray(data, np.float32).reshape(-1, 6)
        self.orig_shape = tuple(orig_shape)

    def __len__(self):
        return len(self.data)

    def __getitem__(self, i):
        return Boxes(self.data[i], self.orig_shape)

    @property
    def xyxy(self):
        return self.data[:, :4]

    @property
    def conf(self):
        return self.data[:, 4]

    @property
    def cls(self):
        return self.data[:, 5]

    @property
    def xywh(self):
        b = self.data[:, :4]
        return np.concatenate([(b[:, :2] + b[:, 2:4]) / 2, b[:, 2:4] - b[:, :2]], -1)

    @property
    def xyxyn(self):
        h, w = self.orig_shape
        return self.xyxy / np.array([w, h, w, h], np.float32)

    @property
    def xywhn(self):
        h, w = self.orig_shape
        return self.xywh / np.array([w, h, w, h], np.float32)


class Results:
    """Per-image inference result (reference results.py:184)."""

    def __init__(
        self,
        orig_img: np.ndarray,
        path: str = "",
        names: Optional[Dict[int, str]] = None,
        boxes: Optional[np.ndarray] = None,
        probs: Optional[np.ndarray] = None,
        masks: Optional[np.ndarray] = None,
        keypoints: Optional[np.ndarray] = None,
        speed: Optional[Dict[str, float]] = None,
    ):
        self.orig_img = orig_img
        self.orig_shape = orig_img.shape[:2]
        self.path = str(path)
        self.names = names or {}
        self.boxes = Boxes(boxes, self.orig_shape) if boxes is not None else None
        self.probs = probs
        self.masks = masks
        self.keypoints = keypoints
        self.speed = speed or {}

    def __len__(self):
        return len(self.boxes) if self.boxes is not None else 0

    def filter(self, keep) -> "Results":
        """Keep only the detections selected by a boolean/index array (used by
        FastSAM prompt filtering and the classes= post-filter)."""
        import numpy as np

        if self.boxes is not None:
            self.boxes = Boxes(self.boxes.data[np.asarray(keep)], self.orig_shape)
        if self.masks is not None:
            self.masks = self.masks[np.asarray(keep)]
        return self

    def summary(self, normalize: bool = False, decimals: int = 5) -> List[dict]:
        out = []
        if self.boxes is None:
            return out
        xy = self.boxes.xyxyn if normalize else self.boxes.xyxy
        for i in range(len(self.boxes)):
            c = int(self.boxes.cls[i])
            out.append(
                {
                    "name": self.names.get(c, str(c)),
                    "class": c,
                    "confidence": round(float(self.boxes.conf[i]), decimals),
                    "box": {
                        "x1": round(float(xy[i, 0]), decimals),
                        "y1": round(float(xy[i, 1]), decimals),
                        "x2": round(float(xy[i, 2]), decimals),
                        "y2": round(float(xy[i, 3]), decimals),
                    },
                }
            )
        return out

    def to_json(self, normalize: bool = False, decimals: int = 5) -> str:
        return json.dumps(self.summary(normalize, decimals), indent=2)

    def plot(self, line_width: Optional[int] = None, font_scale: float = 0.5) -> np.ndarray:
        """Draw boxes on a copy of the original image (BGR, like the reference)."""
        import cv2

        img = self.orig_img.copy()
        lw = line_width or max(round(sum(img.shape[:2]) / 2 * 0.003), 2)
        if self.boxes is not None:
            for i in range(len(self.boxes)):
                x1, y1, x2, y2 = self.boxes.xyxy[i].astype(int)
                c = int(self.boxes.cls[i])
                color = _class_color(c)
                cv2.rectangle(img, (x1, y1), (x2, y2), color, lw)
                label = f"{self.names.get(c, c)} {self.boxes.conf[i]:.2f}"
                cv2.putText(img, label, (x1, max(y1 - 4, 12)), cv2.FONT_HERSHEY_SIMPLEX, font_scale, color, 1)
        return img

    def save(self, filename: str) -> str:
        import cv2

        Path(filename).parent.mkdir(parents=True, exist_ok=True)
        cv2.imwrite(str(filename), self.plot())
        return str(filename)


def _class_color(c: int):
    rng = np.random.default_rng(c + 3)
    return tuple(int(v) for v in rng.integers(64, 255, 3))
