"""Distance calculation solution (reference: ultralytics/solutions/distance_calculation.py)."""

from __future__ import annotations

import numpy as np


class DistanceCalculator:
    def __init__(self, pixels_per_meter: float = 10.0):
        self.ppm = pixels_per_meter

    def pairwise(self, tracks: np.ndarray) -> dict:
        """Distances (meters) between every pair of tracked centroids."""
        rows = np.asarray(tracks).reshape(-1, 7)
        centers = {int(r[4]): np.array([(r[0] + r[2]) / 2, (r[1] + r[3]) / 2]) for r in rows}
        out = {}
        ids = sorted(centers)
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                out[(a, b)] = float(np.linalg.norm(centers[a] - centers[b]) / self.ppm)
        return out
