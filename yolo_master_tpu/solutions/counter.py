"""Object counting solutions (reference: ultralytics/solutions/object_counter.py
+ region_counter.py). Consume tracked detections ([N,7] rows of
x1,y1,x2,y2,track_id,score,cls)."""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np


def _side_of_line(pt, a, b) -> float:
    return (b[0] - a[0]) * (pt[1] - a[1]) - (b[1] - a[1]) * (pt[0] - a[0])


class ObjectCounter:
    """Line-crossing counter: in/out counts per class as tracks cross a line."""

    def __init__(self, line: Sequence[Tuple[float, float]], names: Dict[int, str] | None = None):
        assert len(line) == 2
        self.line = (tuple(line[0]), tuple(line[1]))
        self.names = names or {}
        self.in_count = 0
        self.out_count = 0
        self.per_class: Dict[int, Dict[str, int]] = {}
        self._last_side: Dict[int, float] = {}
        self._counted: set = set()

    def update(self, tracks: np.ndarray):
        for row in np.asarray(tracks).reshape(-1, 7):
            x1, y1, x2, y2, tid, _, cls = row
            tid, cls = int(tid), int(cls)
            center = ((x1 + x2) / 2, (y1 + y2) / 2)
            side = _side_of_line(center, *self.line)
            prev = self._last_side.get(tid)
            if prev is not None and tid not in self._counted and prev * side < 0:
                self._counted.add(tid)
                entry = self.per_class.setdefault(cls, {"in": 0, "out": 0})
                if side > 0:
                    self.in_count += 1
                    entry["in"] += 1
                else:
                    self.out_count += 1
                    entry["out"] += 1
            self._last_side[tid] = side
        return {"in": self.in_count, "out": self.out_count, "per_class": self.per_class}

    def render(self, frame, tracks=None):
        """Draw the counting line, tracked boxes, and in/out totals onto a BGR
        frame (reference object_counter display; shared utils/annotator.py)."""
        from ..utils.annotator import Annotator

        ann = Annotator(frame, names=self.names)
        ann.line(self.line[0], self.line[1], col=(0, 255, 255))
        if tracks is not None and len(tracks):
            ann.tracks(tracks)
        ann.counts({"in": self.in_count, "out": self.out_count})
        return ann.result()


class RegionCounter:
    """Counts objects currently inside polygonal regions."""

    def __init__(self, regions: Dict[str, Sequence[Tuple[float, float]]]):
        self.regions = {k: np.asarray(v, np.float32) for k, v in regions.items()}

    @staticmethod
    def _inside(pt, poly) -> bool:
        # ray casting
        x, y = pt
        inside = False
        n = len(poly)
        for i in range(n):
            x1, y1 = poly[i]
            x2, y2 = poly[(i + 1) % n]
            if (y1 > y) != (y2 > y) and x < (x2 - x1) * (y - y1) / (y2 - y1 + 1e-9) + x1:
                inside = not inside
        return inside

    def count(self, detections: np.ndarray) -> Dict[str, int]:
        out = {k: 0 for k in self.regions}
        for row in np.asarray(detections).reshape(-1, detections.shape[-1]):
            center = ((row[0] + row[2]) / 2, (row[1] + row[3]) / 2)
            for name, poly in self.regions.items():
                if self._inside(center, poly):
                    out[name] += 1
        return out
