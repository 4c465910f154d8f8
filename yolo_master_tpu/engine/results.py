"""Results API (reference: ultralytics/engine/results.py:184-1593).

Host-side numpy containers for per-image detections with the same user-facing
accessors as the reference (`.boxes.xyxy`, `.masks.xy`, `.keypoints.xy`,
`.probs.top5`, `.obb.xyxyxyxy`, `plot/save/save_txt/save_crop/summary/
to_json/to_csv`). Device->host boundary happens exactly once, when the
fixed-shape NMS output is trimmed by its validity mask.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, List, Optional

import numpy as np


class Boxes:
    """Detection boxes: data [N, 6] = (x1, y1, x2, y2, conf, cls), pixel units
    of the original image (reference results.py:885). With track ids the data
    is [N, 7] = (x1, y1, x2, y2, id, conf, cls), matching the reference's
    is_track layout."""

    def __init__(self, data: np.ndarray, orig_shape):
        data = np.asarray(data, np.float32)
        self.data = data.reshape(-1, data.shape[-1] if data.ndim > 1 else 6)
        self.is_track = self.data.shape[-1] == 7
        self.orig_shape = tuple(orig_shape)

    def __len__(self):
        return len(self.data)

    def __getitem__(self, i):
        return Boxes(self.data[i], self.orig_shape)

    @property
    def xyxy(self):
        return self.data[:, :4]

    @property
    def id(self):
        return self.data[:, 4] if self.is_track else None

    @property
    def conf(self):
        return self.data[:, -2]

    @property
    def cls(self):
        return self.data[:, -1]

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


class Masks:
    """Instance masks: data [N, H, W] bool/float in original-image resolution
    (reference results.py:1071)."""

    def __init__(self, data: np.ndarray, orig_shape):
        self.data = np.asarray(data)
        self.orig_shape = tuple(orig_shape)

    def __len__(self):
        return len(self.data)

    def __getitem__(self, i):
        return Masks(self.data[i][None] if np.isscalar(i) or isinstance(i, (int, np.integer)) else self.data[i], self.orig_shape)

    @property
    def xy(self) -> List[np.ndarray]:
        """Polygon segments (pixel coords) per mask — largest external contour
        (the reference's masks2segments 'largest' strategy)."""
        import cv2

        segs = []
        for m in self.data:
            cnts, _ = cv2.findContours((m > 0.5).astype(np.uint8), cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
            if cnts:
                seg = max(cnts, key=cv2.contourArea).reshape(-1, 2).astype(np.float32)
            else:
                seg = np.zeros((0, 2), np.float32)
            segs.append(seg)
        return segs

    @property
    def xyn(self) -> List[np.ndarray]:
        h, w = self.orig_shape
        return [s / np.array([w, h], np.float32) if len(s) else s for s in self.xy]


class Keypoints:
    """Pose keypoints: data [N, K, 2|3] (x, y[, conf]) in original-image pixels
    (reference results.py:1175)."""

    def __init__(self, data: np.ndarray, orig_shape):
        self.data = np.asarray(data, np.float32)
        if self.data.ndim == 2:
            self.data = self.data[None]
        self.orig_shape = tuple(orig_shape)
        self.has_visible = self.data.shape[-1] == 3

    def __len__(self):
        return len(self.data)

    def __getitem__(self, i):
        return Keypoints(self.data[i], self.orig_shape)

    @property
    def xy(self):
        return self.data[..., :2]

    @property
    def xyn(self):
        h, w = self.orig_shape
        return self.xy / np.array([w, h], np.float32)

    @property
    def conf(self):
        return self.data[..., 2] if self.has_visible else None


class Probs:
    """Classification probabilities: data [nc] (reference results.py:1269)."""

    def __init__(self, data: np.ndarray, orig_shape=None):
        self.data = np.asarray(data, np.float32).reshape(-1)
        self.orig_shape = orig_shape

    def __len__(self):
        return len(self.data)

    @property
    def top1(self) -> int:
        return int(self.data.argmax())

    @property
    def top5(self) -> List[int]:
        return np.argsort(-self.data)[:5].tolist()

    @property
    def top1conf(self) -> float:
        return float(self.data[self.top1])

    @property
    def top5conf(self):
        return self.data[self.top5]


class OBB:
    """Oriented boxes: data [N, 7] = (cx, cy, w, h, angle, conf, cls), pixels
    of the original image, angle in radians (reference results.py:1355)."""

    def __init__(self, data: np.ndarray, orig_shape):
        self.data = np.asarray(data, np.float32).reshape(-1, 7)
        self.orig_shape = tuple(orig_shape)

    def __len__(self):
        return len(self.data)

    def __getitem__(self, i):
        return OBB(self.data[i], self.orig_shape)

    @property
    def xywhr(self):
        return self.data[:, :5]

    @property
    def conf(self):
        return self.data[:, 5]

    @property
    def cls(self):
        return self.data[:, 6]

    @property
    def xyxyxyxy(self):
        """Corner points [N, 4, 2] (reference ops.xywhr2xyxyxyxy)."""
        cx, cy, w, h, r = (self.data[:, i] for i in range(5))
        cos, sin = np.cos(r), np.sin(r)
        dx1, dy1 = w / 2 * cos, w / 2 * sin
        dx2, dy2 = -h / 2 * sin, h / 2 * cos
        c = np.stack([cx, cy], -1)[:, None]  # [N,1,2]
        v1 = np.stack([dx1, dy1], -1)[:, None]
        v2 = np.stack([dx2, dy2], -1)[:, None]
        signs = np.array([[1, 1], [1, -1], [-1, -1], [-1, 1]], np.float32)[None]  # [1,4,2]
        return c + signs[..., :1] * v1 + signs[..., 1:] * v2

    @property
    def xyxy(self):
        """Axis-aligned enclosing boxes [N, 4]."""
        pts = self.xyxyxyxy
        return np.concatenate([pts.min(1), pts.max(1)], -1)


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
        obb: Optional[np.ndarray] = None,
        speed: Optional[Dict[str, float]] = None,
    ):
        self.orig_img = orig_img
        self.orig_shape = orig_img.shape[:2]
        self.path = str(path)
        self.names = names or {}
        self.boxes = Boxes(boxes, self.orig_shape) if boxes is not None else None
        self.probs = Probs(probs, self.orig_shape) if probs is not None else None
        self.masks = Masks(masks, self.orig_shape) if masks is not None else None
        self.keypoints = Keypoints(keypoints, self.orig_shape) if keypoints is not None else None
        self.obb = OBB(obb, self.orig_shape) if obb is not None else None
        self.speed = speed or {}

    def __len__(self):
        for v in (self.boxes, self.obb, self.masks, self.keypoints):
            if v is not None:
                return len(v)
        return 0

    def filter(self, keep) -> "Results":
        """Keep only the detections selected by a boolean/index array (used by
        FastSAM prompt filtering and the classes= post-filter)."""
        keep = np.asarray(keep)
        if self.boxes is not None:
            self.boxes = Boxes(self.boxes.data[keep], self.orig_shape)
        if self.masks is not None:
            self.masks = Masks(self.masks.data[keep], self.orig_shape)
        if self.keypoints is not None:
            self.keypoints = Keypoints(self.keypoints.data[keep], self.orig_shape)
        if self.obb is not None:
            self.obb = OBB(self.obb.data[keep], self.orig_shape)
        return self

    def summary(self, normalize: bool = False, decimals: int = 5) -> List[dict]:
        out: List[dict] = []
        if self.probs is not None:
            return [{
                "name": self.names.get(self.probs.top1, str(self.probs.top1)),
                "class": self.probs.top1,
                "confidence": round(self.probs.top1conf, decimals),
            }]
        container = self.obb if self.obb is not None else self.boxes
        if container is None:
            return out
        h, w = self.orig_shape
        norm = np.array([w, h], np.float32)
        for i in range(len(container)):
            c = int(container.cls[i])
            row: Dict[str, Any] = {
                "name": self.names.get(c, str(c)),
                "class": c,
                "confidence": round(float(container.conf[i]), decimals),
            }
            if self.obb is not None:
                pts = self.obb.xyxyxyxy[i] / (norm if normalize else 1.0)
                row["box"] = {f"{k}{j+1}": round(float(pts[j, a]), decimals)
                              for j in range(4) for a, k in enumerate("xy")}
            else:
                xy = (self.boxes.xyxyn if normalize else self.boxes.xyxy)[i]
                row["box"] = {"x1": round(float(xy[0]), decimals), "y1": round(float(xy[1]), decimals),
                              "x2": round(float(xy[2]), decimals), "y2": round(float(xy[3]), decimals)}
            if self.boxes is not None and self.boxes.is_track:
                row["track_id"] = int(self.boxes.id[i])
            if self.masks is not None and i < len(self.masks):
                seg = self.masks[i].xy[0]
                if normalize and len(seg):
                    seg = seg / norm
                row["segments"] = {"x": np.round(seg[:, 0], decimals).tolist(),
                                   "y": np.round(seg[:, 1], decimals).tolist()}
            if self.keypoints is not None and i < len(self.keypoints):
                k = self.keypoints.data[i]
                kxy = k[:, :2] / (norm if normalize else 1.0)
                row["keypoints"] = {"x": np.round(kxy[:, 0], decimals).tolist(),
                                    "y": np.round(kxy[:, 1], decimals).tolist()}
                if self.keypoints.has_visible:
                    row["keypoints"]["visible"] = np.round(k[:, 2], decimals).tolist()
            out.append(row)
        return out

    def to_json(self, normalize: bool = False, decimals: int = 5) -> str:
        return json.dumps(self.summary(normalize, decimals), indent=2)

    def to_csv(self, normalize: bool = False, decimals: int = 5) -> str:
        """Flat CSV of the summary rows (reference results.py to_csv)."""
        rows = self.summary(normalize, decimals)
        if not rows:
            return ""
        def flat(r):
            o = {}
            for k, v in r.items():
                if isinstance(v, dict):
                    for k2, v2 in v.items():
                        o[f"{k}_{k2}"] = v2 if not isinstance(v2, list) else " ".join(map(str, v2))
                else:
                    o[k] = v
            return o
        flats = [flat(r) for r in rows]
        cols = list(dict.fromkeys(k for f in flats for k in f))
        lines = [",".join(cols)]
        for f in flats:
            lines.append(",".join(str(f.get(c, "")) for c in cols))
        return "\n".join(lines) + "\n"

    def save_txt(self, txt_file: str, save_conf: bool = False) -> str:
        """YOLO-format label lines (reference results.py:771): cls xywhn [conf],
        seg polygons for masks, xywhr-normalized for obb, top5 for probs."""
        lines = []
        h, w = self.orig_shape
        if self.probs is not None:
            lines = [f"{self.probs.data[i]:.2f} {self.names.get(i, i)}" for i in self.probs.top5]
        elif self.obb is not None:
            for i in range(len(self.obb)):
                pts = (self.obb.xyxyxyxy[i] / np.array([w, h], np.float32)).reshape(-1)
                vals = " ".join(f"{v:.6f}" for v in pts)
                line = f"{int(self.obb.cls[i])} {vals}"
                if save_conf:
                    line += f" {self.obb.conf[i]:.6f}"
                lines.append(line)
        elif self.boxes is not None:
            for i in range(len(self.boxes)):
                if self.masks is not None and i < len(self.masks):
                    seg = self.masks[i].xyn[0].reshape(-1)
                    coords = " ".join(f"{v:.6f}" for v in seg)
                else:
                    coords = " ".join(f"{v:.6f}" for v in self.boxes.xywhn[i])
                line = f"{int(self.boxes.cls[i])} {coords}"
                if self.keypoints is not None and i < len(self.keypoints):
                    kn = self.keypoints.data[i].copy()
                    kn[:, 0] /= w
                    kn[:, 1] /= h
                    line += " " + " ".join(f"{v:.6f}" for v in kn.reshape(-1))
                if save_conf:
                    line += f" {self.boxes.conf[i]:.6f}"
                lines.append(line)
        Path(txt_file).parent.mkdir(parents=True, exist_ok=True)
        Path(txt_file).write_text("\n".join(lines) + ("\n" if lines else ""))
        return str(txt_file)

    def save_crop(self, save_dir: str, file_name: str = "im.jpg") -> List[str]:
        """Save one cropped image per detection under save_dir/<class-name>/
        (reference results.py:820)."""
        import cv2

        saved = []
        if self.boxes is None:
            return saved
        stem, suffix = Path(file_name).stem, Path(file_name).suffix or ".jpg"
        for i in range(len(self.boxes)):
            x1, y1, x2, y2 = self.boxes.xyxy[i].astype(int)
            x1, y1 = max(x1, 0), max(y1, 0)
            crop = self.orig_img[y1:y2, x1:x2]
            if crop.size == 0:
                continue
            c = int(self.boxes.cls[i])
            d = Path(save_dir) / self.names.get(c, str(c))
            d.mkdir(parents=True, exist_ok=True)
            out = str(d / f"{stem}{i}{suffix}")
            from ..utils.patches import imwrite

            imwrite(out, crop)
            saved.append(out)
        return saved

    # COCO17 skeleton (reference utils/plotting.py skeleton)
    _SKELETON = [(15, 13), (13, 11), (16, 14), (14, 12), (11, 12), (5, 11), (6, 12),
                 (5, 6), (5, 7), (6, 8), (7, 9), (8, 10), (1, 2), (0, 1), (0, 2),
                 (1, 3), (2, 4), (3, 5), (4, 6)]

    def plot(self, line_width: Optional[int] = None, font_scale: float = 0.5,
             mask_alpha: float = 0.4) -> np.ndarray:
        """Draw detections on a copy of the original image (BGR)."""
        import cv2

        img = self.orig_img.copy()
        lw = line_width or max(round(sum(img.shape[:2]) / 2 * 0.003), 2)
        if self.masks is not None and len(self.masks):
            overlay = img.astype(np.float32)
            for i, m in enumerate(self.masks.data):
                color = np.array(_class_color(int(self.boxes.cls[i]) if self.boxes is not None and i < len(self.boxes) else i), np.float32)
                mm = (np.asarray(m) > 0.5)[..., None]
                overlay = np.where(mm, overlay * (1 - mask_alpha) + color * mask_alpha, overlay)
            img = overlay.astype(np.uint8)
        if self.obb is not None:
            for i in range(len(self.obb)):
                c = int(self.obb.cls[i])
                color = _class_color(c)
                pts = self.obb.xyxyxyxy[i].astype(np.int32)
                cv2.polylines(img, [pts.reshape(-1, 1, 2)], True, color, lw)
                label = f"{self.names.get(c, c)} {self.obb.conf[i]:.2f}"
                cv2.putText(img, label, (int(pts[:, 0].min()), max(int(pts[:, 1].min()) - 4, 12)),
                            cv2.FONT_HERSHEY_SIMPLEX, font_scale, color, 1)
        if self.boxes is not None:
            for i in range(len(self.boxes)):
                x1, y1, x2, y2 = self.boxes.xyxy[i].astype(int)
                c = int(self.boxes.cls[i])
                color = _class_color(c)
                cv2.rectangle(img, (x1, y1), (x2, y2), color, lw)
                label = f"{self.names.get(c, c)} {self.boxes.conf[i]:.2f}"
                if self.boxes.is_track:
                    label = f"id:{int(self.boxes.id[i])} {label}"
                cv2.putText(img, label, (x1, max(y1 - 4, 12)), cv2.FONT_HERSHEY_SIMPLEX, font_scale, color, 1)
        if self.keypoints is not None:
            for k in self.keypoints.data:
                vis = k[:, 2] > 0.25 if k.shape[-1] == 3 else np.ones(len(k), bool)
                for j, (x, y) in enumerate(k[:, :2].astype(int)):
                    if vis[j]:
                        cv2.circle(img, (x, y), max(lw, 2), (0, 255, 0), -1)
                if len(k) == 17:  # COCO skeleton
                    for a, b in self._SKELETON:
                        if vis[a] and vis[b]:
                            cv2.line(img, tuple(k[a, :2].astype(int)), tuple(k[b, :2].astype(int)), (255, 128, 0), max(lw - 1, 1))
        if self.probs is not None:
            label = ", ".join(f"{self.names.get(i, i)} {self.probs.data[i]:.2f}" for i in self.probs.top5)
            cv2.putText(img, label, (8, 24), cv2.FONT_HERSHEY_SIMPLEX, font_scale, (255, 255, 255), 2)
        return img

    def save(self, filename: str) -> str:
        import cv2

        Path(filename).parent.mkdir(parents=True, exist_ok=True)
        from ..utils.patches import imwrite

        imwrite(str(filename), self.plot())
        return str(filename)

    def verbose(self) -> str:
        """Per-image log string (reference results.py:658): '2 persons, 1 bus, '
        style class counts, or top-5 for classification."""
        if self.probs is not None:
            return ", ".join(f"{self.names.get(i, i)} {self.probs.data[i]:.2f}" for i in self.probs.top5) + ", "
        container = self.obb if self.obb is not None else self.boxes
        if container is None or len(container) == 0:
            return "(no detections), "
        counts: Dict[int, int] = {}
        for c in container.cls.astype(int):
            counts[int(c)] = counts.get(int(c), 0) + 1
        return "".join(
            f"{n} {self.names.get(c, str(c))}{'s' if n > 1 else ''}, " for c, n in sorted(counts.items())
        )

    def to_df(self, normalize: bool = False, decimals: int = 5):
        """Summary rows as a pandas DataFrame (reference results.py to_df);
        requires the optional pandas dependency."""
        import pandas as pd

        return pd.DataFrame(self.summary(normalize=normalize, decimals=decimals))


def _class_color(c: int):
    # single palette source shared with solutions/demos (utils/annotator.py)
    from ..utils.annotator import color

    return color(c)
