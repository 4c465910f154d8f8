"""Speed estimation solution (reference: ultralytics/solutions/speed_estimation.py):
track centroid displacement over time, scaled by pixels-per-meter."""

from __future__ import annotations

from typing import Dict

import numpy as np


class SpeedEstimator:
    def __init__(self, pixels_per_meter: float = 10.0, fps: float = 30.0, smooth: float = 0.5):
        self.ppm = pixels_per_meter
        self.fps = fps
        self.smooth = smooth
        self._last: Dict[int, np.ndarray] = {}
        self.speeds: Dict[int, float] = {}

    def update(self, tracks: np.ndarray) -> Dict[int, float]:
        """tracks [N,7]; returns km/h per track id."""
        for row in np.asarray(tracks).reshape(-1, 7):
            tid = int(row[4])
            center = np.array([(row[0] + row[2]) / 2, (row[1] + row[3]) / 2])
            prev = self._last.get(tid)
            if prev is not None:
                dist_m = np.linalg.norm(center - prev) / self.ppm
                kmh = dist_m * self.fps * 3.6
                old = self.speeds.get(tid, kmh)
                self.speeds[tid] = self.smooth * old + (1 - self.smooth) * kmh
            self._last[tid] = center
        return dict(self.speeds)

    def render(self, frame, tracks):
        """Boxes labeled with smoothed speeds (km/h) via the shared annotator."""
        import numpy as np

        from ..utils.annotator import Annotator

        ann = Annotator(frame)
        for row in np.asarray(tracks).reshape(-1, 7):
            tid = int(row[4])
            spd = self.speeds.get(tid)
            label = f"#{tid} {spd:.1f} km/h" if spd is not None else f"#{tid}"  # speeds already km/h
            ann.box_label(row[:4], label, idx=tid)
        return ann.result()
