"""ByteTrack multi-object tracker (reference: ultralytics/trackers/byte_tracker.py).

Two-stage association: high-confidence detections match tracked tracks by IoU
(Hungarian), low-confidence detections rescue still-unmatched tracks, then
new tracks start from strong unmatched detections. Host-side numpy — tracking
consumes the device NMS outputs.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from .kalman_filter import KalmanFilterXYAH
from .matching import fuse_score, iou_distance, linear_assignment


class TrackState:
    New, Tracked, Lost, Removed = 0, 1, 2, 3


class STrack:
    shared_kalman = KalmanFilterXYAH()
    _count = 0

    def __init__(self, xyxy, score, cls):
        self._xyxy = np.asarray(xyxy, np.float32)
        self.score = float(score)
        self.cls = int(cls)
        self.kalman_filter: Optional[KalmanFilterXYAH] = None
        self.mean = None
        self.covariance = None
        self.state = TrackState.New
        self.is_activated = False
        self.track_id = 0
        self.frame_id = 0
        self.start_frame = 0
        self.tracklet_len = 0

    # -- geometry ----------------------------------------------------------
    @property
    def xyah(self):
        x1, y1, x2, y2 = self._xyxy
        w, h = x2 - x1, y2 - y1
        return np.array([x1 + w / 2, y1 + h / 2, w / max(h, 1e-6), h], np.float32)

    @property
    def xyxy(self):
        if self.mean is None:
            return self._xyxy
        cx, cy, a, h = self.mean[:4]
        w = a * h
        return np.array([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], np.float32)

    # -- lifecycle ----------------------------------------------------------
    @staticmethod
    def next_id():
        STrack._count += 1
        return STrack._count

    def activate(self, kalman_filter, frame_id):
        self.kalman_filter = kalman_filter
        self.track_id = self.next_id()
        self.mean, self.covariance = kalman_filter.initiate(self.xyah)
        self.tracklet_len = 0
        self.state = TrackState.Tracked
        self.is_activated = frame_id == 1
        self.frame_id = frame_id
        self.start_frame = frame_id

    def re_activate(self, new_track, frame_id, new_id=False):
        self.mean, self.covariance = self.kalman_filter.update(self.mean, self.covariance, new_track.xyah)
        self.tracklet_len = 0
        self.state = TrackState.Tracked
        self.is_activated = True
        self.frame_id = frame_id
        self.score = new_track.score
        self.cls = new_track.cls
        if new_id:
            self.track_id = self.next_id()

    def update(self, new_track, frame_id):
        self.frame_id = frame_id
        self.tracklet_len += 1
        self.mean, self.covariance = self.kalman_filter.update(self.mean, self.covariance, new_track.xyah)
        self.state = TrackState.Tracked
        self.is_activated = True
        self.score = new_track.score
        self.cls = new_track.cls

    def predict(self):
        mean = self.mean.copy()
        if self.state != TrackState.Tracked:
            mean[7] = 0  # zero height velocity while lost
        self.mean, self.covariance = self.kalman_filter.predict(mean, self.covariance)

    def mark_lost(self):
        self.state = TrackState.Lost

    def mark_removed(self):
        self.state = TrackState.Removed

    @property
    def end_frame(self):
        return self.frame_id


class BYTETracker:
    def __init__(self, track_high_thresh=0.45, track_low_thresh=0.1, new_track_thresh=0.6,
                 track_buffer=30, match_thresh=0.8, fuse_score_flag=True, frame_rate=30, **_):
        self.tracked_stracks: List[STrack] = []
        self.lost_stracks: List[STrack] = []
        self.removed_stracks: List[STrack] = []
        self.frame_id = 0
        self.track_high_thresh = track_high_thresh
        self.track_low_thresh = track_low_thresh
        self.new_track_thresh = new_track_thresh
        self.match_thresh = match_thresh
        self.fuse = fuse_score_flag
        self.max_time_lost = int(frame_rate / 30.0 * track_buffer)
        self.kalman_filter = KalmanFilterXYAH()

    def reset(self):
        self.__init__(self.track_high_thresh, self.track_low_thresh, self.new_track_thresh,
                      self.max_time_lost, self.match_thresh, self.fuse)
        STrack._count = 0

    def _make_tracks(self, boxes, scores, classes):
        return [STrack(b, s, c) for b, s, c in zip(boxes, scores, classes)]

    def _second_association_cost(self, tracks, detections):
        return iou_distance(tracks, detections)

    def update(self, boxes: np.ndarray, scores: np.ndarray, classes: np.ndarray) -> np.ndarray:
        """One frame. Returns [N, 7] rows (x1,y1,x2,y2,track_id,score,cls)."""
        self.frame_id += 1
        high = scores >= self.track_high_thresh
        low = (scores > self.track_low_thresh) & ~high
        dets_high = self._make_tracks(boxes[high], scores[high], classes[high])
        dets_low = self._make_tracks(boxes[low], scores[low], classes[low])

        unconfirmed = [t for t in self.tracked_stracks if not t.is_activated]
        tracked = [t for t in self.tracked_stracks if t.is_activated]
        pool = _join(tracked, self.lost_stracks)
        for t in pool:
            t.predict()

        # stage 1: high-conf IoU association
        cost = iou_distance(pool, dets_high)
        if self.fuse:
            cost = fuse_score(cost, dets_high)
        matches, u_track, u_det = linear_assignment(cost, self.match_thresh)
        activated, refind, lost, removed = [], [], [], []
        for it, idet in matches:
            track, det = pool[it], dets_high[idet]
            if track.state == TrackState.Tracked:
                track.update(det, self.frame_id)
                activated.append(track)
            else:
                track.re_activate(det, self.frame_id)
                refind.append(track)

        # stage 2: rescue with low-conf detections
        r_tracked = [pool[i] for i in u_track if pool[i].state == TrackState.Tracked]
        cost = self._second_association_cost(r_tracked, dets_low)
        matches2, u_track2, _ = linear_assignment(cost, 0.5)
        for it, idet in matches2:
            track, det = r_tracked[it], dets_low[idet]
            track.update(det, self.frame_id)
            activated.append(track)
        for i in u_track2:
            if r_tracked[i].state != TrackState.Lost:
                r_tracked[i].mark_lost()
                lost.append(r_tracked[i])

        # unconfirmed tracks vs remaining high dets
        remaining = [dets_high[i] for i in u_det]
        cost = iou_distance(unconfirmed, remaining)
        if self.fuse:
            cost = fuse_score(cost, remaining)
        matches3, u_unconf, u_det3 = linear_assignment(cost, 0.7)
        for it, idet in matches3:
            unconfirmed[it].update(remaining[idet], self.frame_id)
            activated.append(unconfirmed[it])
        for i in u_unconf:
            unconfirmed[i].mark_removed()
            removed.append(unconfirmed[i])

        # new tracks
        for i in u_det3:
            det = remaining[i]
            if det.score >= self.new_track_thresh:
                det.activate(self.kalman_filter, self.frame_id)
                activated.append(det)

        # expire lost tracks
        for t in self.lost_stracks:
            if self.frame_id - t.end_frame > self.max_time_lost:
                t.mark_removed()
                removed.append(t)

        self.tracked_stracks = [t for t in self.tracked_stracks if t.state == TrackState.Tracked]
        self.tracked_stracks = _join(self.tracked_stracks, activated)
        self.tracked_stracks = _join(self.tracked_stracks, refind)
        self.lost_stracks = _sub(self.lost_stracks, self.tracked_stracks)
        self.lost_stracks.extend(lost)
        self.lost_stracks = _sub(self.lost_stracks, removed)
        self.removed_stracks.extend(removed)

        out = [
            np.concatenate([t.xyxy, [t.track_id, t.score, t.cls]])
            for t in self.tracked_stracks
            if t.is_activated
        ]
        return np.asarray(out, np.float32).reshape(-1, 7)


def _join(a, b):
    seen = {id(t) for t in a}
    return a + [t for t in b if id(t) not in seen]


def _sub(a, b):
    ids = {t.track_id for t in b}
    return [t for t in a if t.track_id not in ids]
