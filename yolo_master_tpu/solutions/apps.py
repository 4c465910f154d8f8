"""Solutions apps, batch 2 (reference: ultralytics/solutions/ — parking
management, analytics, AI-gym workout counting, trackzone, object blur/crop,
vision-eye, security alarm, instance-seg overlay).

All apps consume the framework's track rows [N, 7] = (x1,y1,x2,y2,tid,conf,cls)
or Results objects; they hold only host-side numpy state (no device work)."""

from __future__ import annotations

from collections import defaultdict
from pathlib import Path
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np


def _point_in_polygon(pt, poly) -> bool:
    """Ray casting; poly [[x,y], ...]."""
    x, y = pt
    inside = False
    n = len(poly)
    for i in range(n):
        x1, y1 = poly[i]
        x2, y2 = poly[(i + 1) % n]
        if (y1 > y) != (y2 > y) and x < (x2 - x1) * (y - y1) / (y2 - y1 + 1e-12) + x1:
            inside = not inside
    return inside


class ParkingManagement:
    """Occupancy of polygonal parking slots (reference solutions/parking_management.py)."""

    def __init__(self, slots: Sequence[Sequence[Tuple[float, float]]]):
        self.slots = [np.asarray(s, np.float32) for s in slots]
        self.occupied: List[bool] = [False] * len(self.slots)

    def update(self, tracks: np.ndarray) -> Dict[str, int]:
        centers = [((r[0] + r[2]) / 2, (r[1] + r[3]) / 2) for r in np.asarray(tracks).reshape(-1, 7)]
        self.occupied = [any(_point_in_polygon(c, slot) for c in centers) for slot in self.slots]
        filled = sum(self.occupied)
        return {"occupied": filled, "available": len(self.slots) - filled}


class Analytics:
    """Per-frame class-count aggregation for line/bar/pie charts (reference
    solutions/analytics.py). Emits the chart DATA; rendering is the caller's
    choice (matplotlib optional)."""

    def __init__(self, names: Optional[Dict[int, str]] = None):
        self.names = names or {}
        self.history: List[Dict[int, int]] = []

    def update(self, tracks: np.ndarray) -> Dict[str, int]:
        counts: Dict[int, int] = defaultdict(int)
        for r in np.asarray(tracks).reshape(-1, 7):
            counts[int(r[6])] += 1
        self.history.append(dict(counts))
        return {self.names.get(c, str(c)): n for c, n in counts.items()}

    def series(self) -> Dict[str, List[int]]:
        """Per-class count time series over all frames."""
        classes = sorted({c for h in self.history for c in h})
        return {self.names.get(c, str(c)): [h.get(c, 0) for h in self.history] for c in classes}

    def to_csv(self, path: str) -> str:
        s = self.series()
        keys = list(s)
        rows = ["frame," + ",".join(keys)]
        for i in range(len(self.history)):
            rows.append(f"{i}," + ",".join(str(s[k][i]) for k in keys))
        Path(path).write_text("\n".join(rows))
        return path


class AIGym:
    """Workout rep counting from pose keypoints (reference solutions/ai_gym.py):
    joint-angle thresholds drive an up/down state machine per track."""

    def __init__(self, kpts: Tuple[int, int, int] = (5, 7, 9), up_angle: float = 145.0, down_angle: float = 90.0):
        self.kpts = kpts  # (first, mid, last) joint indices, e.g. shoulder-elbow-wrist
        self.up_angle, self.down_angle = up_angle, down_angle
        self.count: Dict[int, int] = defaultdict(int)
        self.stage: Dict[int, str] = {}

    @staticmethod
    def joint_angle(a, b, c) -> float:
        """Angle ABC in degrees."""
        v1, v2 = np.asarray(a, np.float64) - b, np.asarray(c, np.float64) - b
        cos = np.dot(v1, v2) / max(np.linalg.norm(v1) * np.linalg.norm(v2), 1e-9)
        return float(np.degrees(np.arccos(np.clip(cos, -1, 1))))

    def update(self, keypoints: np.ndarray, track_ids: Sequence[int]) -> Dict[int, int]:
        """keypoints [N, K, >=2] pixel coords per tracked person."""
        for kp, tid in zip(np.asarray(keypoints), track_ids):
            a, b, c = self.kpts
            ang = self.joint_angle(kp[a, :2], kp[b, :2], kp[c, :2])
            st = self.stage.get(tid, "up")
            if ang < self.down_angle and st == "up":
                self.stage[tid] = "down"
            elif ang > self.up_angle and self.stage.get(tid) == "down":
                self.stage[tid] = "up"
                self.count[tid] += 1
        return dict(self.count)


class TrackZone:
    """Track objects only inside a polygonal zone (reference solutions/trackzone.py)."""

    def __init__(self, zone: Sequence[Tuple[float, float]]):
        self.zone = np.asarray(zone, np.float32)
        self.in_zone_ids: set = set()

    def update(self, tracks: np.ndarray) -> np.ndarray:
        rows = np.asarray(tracks).reshape(-1, 7)
        keep = [
            _point_in_polygon(((r[0] + r[2]) / 2, (r[1] + r[3]) / 2), self.zone) for r in rows
        ]
        kept = rows[np.asarray(keep, bool)] if len(rows) else rows
        self.in_zone_ids = {int(r[4]) for r in kept}
        self._kept = kept
        return kept

    def render(self, frame, tracks=None):
        """Zone polygon + in-zone tracks via the shared annotator."""
        from ..utils.annotator import Annotator

        ann = Annotator(frame)
        ann.polygon(self.zone, col=(0, 200, 255), fill_alpha=0.12)
        rows = tracks if tracks is not None else getattr(self, "_kept", None)
        if rows is not None and len(rows):
            ann.tracks(rows)
        ann.counts({"in zone": len(self.in_zone_ids)})
        return ann.result()


class ObjectBlurrer:
    """Blur detected regions (reference solutions/object_blurrer.py)."""

    def __init__(self, blur_ratio: float = 0.5):
        self.k = max(3, int(blur_ratio * 50) | 1)

    def apply(self, image: np.ndarray, boxes: np.ndarray) -> np.ndarray:
        import cv2

        out = image.copy()
        H, W = image.shape[:2]
        for x1, y1, x2, y2 in np.asarray(boxes).reshape(-1, 4).astype(int):
            x1, y1 = max(0, x1), max(0, y1)
            x2, y2 = min(W, x2), min(H, y2)
            if x2 > x1 and y2 > y1:
                out[y1:y2, x1:x2] = cv2.blur(out[y1:y2, x1:x2], (self.k, self.k))
        return out


class ObjectCropper:
    """Crop detections to arrays / files (reference solutions/object_cropper.py)."""

    def __init__(self, save_dir: Optional[str] = None):
        self.save_dir = Path(save_dir) if save_dir else None
        self.n = 0

    def crop(self, image: np.ndarray, boxes: np.ndarray) -> List[np.ndarray]:
        import cv2

        H, W = image.shape[:2]
        crops = []
        for x1, y1, x2, y2 in np.asarray(boxes).reshape(-1, 4).astype(int):
            x1, y1 = max(0, x1), max(0, y1)
            x2, y2 = min(W, max(x2, x1 + 1)), min(H, max(y2, y1 + 1))
            crop = image[y1:y2, x1:x2]
            crops.append(crop)
            if self.save_dir:
                self.save_dir.mkdir(parents=True, exist_ok=True)
                self.n += 1
                cv2.imwrite(str(self.save_dir / f"crop_{self.n:05d}.jpg"), crop)
        return crops


class VisionEye:
    """Map object centers to a fixed vantage point (reference
    solutions/vision_eye.py): returns (center, distance_px) per object."""

    def __init__(self, eye_point: Tuple[float, float]):
        self.eye = np.asarray(eye_point, np.float32)

    def update(self, tracks: np.ndarray) -> List[dict]:
        out = []
        for r in np.asarray(tracks).reshape(-1, 7):
            c = np.array([(r[0] + r[2]) / 2, (r[1] + r[3]) / 2], np.float32)
            out.append({"track_id": int(r[4]), "center": tuple(c), "dist_px": float(np.linalg.norm(c - self.eye))})
        return out


class SecurityAlarm:
    """Fire a callback when the detection count crosses a threshold
    (reference solutions/security_alarm.py; the email sender becomes a
    pluggable callback — no SMTP in this image)."""

    def __init__(self, records: int = 5, notify: Optional[Callable[[int], None]] = None):
        self.records = records
        self.notify = notify or (lambda n: None)
        self.triggered = False

    def update(self, tracks: np.ndarray) -> bool:
        n = len(np.asarray(tracks).reshape(-1, 7))
        if n >= self.records and not self.triggered:
            self.triggered = True
            self.notify(n)
        elif n < self.records:
            self.triggered = False
        return self.triggered


class InstanceSegmentationOverlay:
    """Blend instance masks over the frame (reference solutions/instance_segmentation.py)."""

    def __init__(self, alpha: float = 0.5):
        self.alpha = alpha

    def apply(self, image: np.ndarray, masks: np.ndarray, classes: Sequence[int]) -> np.ndarray:
        out = image.astype(np.float32)
        rng = np.random.default_rng(0)
        palette = rng.integers(60, 255, (80, 3)).astype(np.float32)
        for m, c in zip(np.asarray(masks), classes):
            color = palette[int(c) % 80]
            mm = m.astype(bool)
            out[mm] = (1 - self.alpha) * out[mm] + self.alpha * color
        return out.astype(np.uint8)
