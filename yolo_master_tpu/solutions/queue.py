"""Queue management solution (reference: ultralytics/solutions/queue_management.py):
count tracked objects dwelling inside a queue region."""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import numpy as np

from .counter import RegionCounter


class QueueManager:
    def __init__(self, region: Sequence[Tuple[float, float]], min_frames: int = 3):
        self.region = RegionCounter({"queue": region})
        self.min_frames = min_frames
        self._dwell: Dict[int, int] = {}

    def update(self, tracks: np.ndarray) -> dict:
        inside_ids = []
        for row in np.asarray(tracks).reshape(-1, 7):
            tid = int(row[4])
            center = ((row[0] + row[2]) / 2, (row[1] + row[3]) / 2)
            if RegionCounter._inside(center, self.region.regions["queue"]):
                self._dwell[tid] = self._dwell.get(tid, 0) + 1
                inside_ids.append(tid)
            else:
                self._dwell.pop(tid, None)
        queued = [t for t in inside_ids if self._dwell.get(t, 0) >= self.min_frames]
        self.count = len(queued)
        return {"count": len(queued), "ids": queued}

    def render(self, frame, tracks=None):
        """Region polygon + queue depth onto a BGR frame (shared annotator)."""
        from ..utils.annotator import Annotator

        ann = Annotator(frame)
        ann.polygon(self.region.regions["queue"], col=(255, 160, 0), fill_alpha=0.15)
        if tracks is not None and len(tracks):
            ann.tracks(tracks)
        ann.counts({"queue": getattr(self, "count", 0)})
        return ann.result()
