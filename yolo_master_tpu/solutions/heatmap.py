"""Heatmap solution (reference: ultralytics/solutions/heatmap.py): accumulate
detection footprints over frames into a colorized density map."""

from __future__ import annotations

import numpy as np


class Heatmap:
    def __init__(self, shape, decay: float = 0.99):
        self.acc = np.zeros(shape[:2], np.float32)
        self.decay = decay

    def update(self, detections: np.ndarray) -> np.ndarray:
        self.acc *= self.decay
        h, w = self.acc.shape
        for row in np.asarray(detections).reshape(-1, detections.shape[-1]):
            x1, y1, x2, y2 = [int(v) for v in row[:4]]
            x1, y1 = max(x1, 0), max(y1, 0)
            x2, y2 = min(x2, w), min(y2, h)
            if x2 > x1 and y2 > y1:
                self.acc[y1:y2, x1:x2] += 1.0
        return self.acc

    def render(self, img: np.ndarray | None = None, alpha: float = 0.5) -> np.ndarray:
        import cv2

        norm = (255 * self.acc / max(self.acc.max(), 1e-6)).astype(np.uint8)
        colored = cv2.applyColorMap(norm, cv2.COLORMAP_JET)
        if img is None:
            return colored
        return cv2.addWeighted(img, 1 - alpha, colored, alpha, 0)
