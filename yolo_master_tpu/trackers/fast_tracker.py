"""FastTracker: occlusion-aware ByteTrack (reference: ultralytics/trackers/
fast_tracker.py, FastTracker paper arXiv:2508.14370).

Four additions over the BYTE association loop, all on unmatched tracks only:
  * occlusion detection — an unmatched tracked box whose area is covered
    > ``occ_cover_thresh`` by an active neighbor is flagged occluded;
  * Kalman rollback — on occlusion onset the track's velocity/position are
    restored from a bounded ring-buffer of pre-occlusion Kalman snapshots,
    the height is enlarged once (widening the re-find region) and velocity
    is dampened so the hidden track coasts instead of drifting;
  * grace windows — an occluded track survives ``active_occ_to_lost_thresh``
    unmatched frames before going Lost, and once lost stays re-findable
    ``occ_reappear_window`` frames beyond the normal track_buffer;
  * spawn suppression — new detections overlapping an active track above
    ``init_iou_suppress`` IoU never spawn (ghost-ID prevention).
"""

from __future__ import annotations

from collections import deque
from typing import List

import numpy as np

from .byte_tracker import BYTETracker, STrack, TrackState, _join, _sub
from .matching import bbox_ioa, fuse_score, iou_distance, linear_assignment


class FastSTrack(STrack):
    """STrack + bounded Kalman-state history and occlusion bookkeeping."""

    def __init__(self, xyxy, score, cls, history_len: int = 16):
        super().__init__(xyxy, score, cls)
        self.mean_history: deque = deque(maxlen=history_len)
        self.not_matched = 0
        self.is_occluded = False
        self.occluded_len = 0
        self.last_occluded_frame = -1
        self.was_recently_occluded = False

    def _push_history(self):
        if self.mean is not None:
            self.mean_history.append((self.mean.copy(), self.covariance.copy()))

    def activate(self, kalman_filter, frame_id):
        super().activate(kalman_filter, frame_id)
        self._push_history()

    def re_activate(self, new_track, frame_id, new_id=False):
        super().re_activate(new_track, frame_id, new_id)
        self.is_occluded = False
        self.occluded_len = 0
        self.not_matched = 0
        self.was_recently_occluded = False
        self.last_occluded_frame = -1
        self._push_history()

    def update(self, new_track, frame_id):
        super().update(new_track, frame_id)
        self.is_occluded = False
        self.occluded_len = 0
        self.not_matched = 0
        self._push_history()


class FASTTracker(BYTETracker):
    """Occlusion-aware BYTE tracker (reference fast_tracker.py:104)."""

    def __init__(self, *args, reset_velocity_offset_occ: int = 5, reset_pos_offset_occ: int = 3,
                 enlarge_bbox_occ: float = 1.1, dampen_motion_occ: float = 0.5,
                 active_occ_to_lost_thresh: int = 10, init_iou_suppress: float = 0.7,
                 occ_cover_thresh: float = 0.7, occ_reappear_window: int = 40, **kw):
        super().__init__(*args, **kw)
        self.reset_velocity_offset_occ = reset_velocity_offset_occ
        self.reset_pos_offset_occ = reset_pos_offset_occ
        self.enlarge_bbox_occ = enlarge_bbox_occ
        self.dampen_motion_occ = dampen_motion_occ
        self.active_occ_to_lost_thresh = active_occ_to_lost_thresh
        self.init_iou_suppress = init_iou_suppress
        self.occ_cover_thresh = occ_cover_thresh
        self.occ_reappear_window = occ_reappear_window
        self._history_len = max(reset_velocity_offset_occ, reset_pos_offset_occ) + 4

    def _make_tracks(self, boxes, scores, classes):
        return [FastSTrack(b, s, c, self._history_len) for b, s, c in zip(boxes, scores, classes)]

    def update(self, boxes: np.ndarray, scores: np.ndarray, classes: np.ndarray) -> np.ndarray:
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

        # stage 2: low-conf rescue, then occlusion handling on the rest
        r_tracked = [pool[i] for i in u_track if pool[i].state == TrackState.Tracked]
        matches2, u_track2, _ = linear_assignment(iou_distance(r_tracked, dets_low), 0.5)
        for it, idet in matches2:
            r_tracked[it].update(dets_low[idet], self.frame_id)
            activated.append(r_tracked[it])
        self._handle_occlusions(r_tracked, u_track2, activated, lost)

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

        # births, suppressing spawns that overlap an active track (ghost IDs)
        active_boxes = [t.xyxy for t in activated + refind if t.is_activated]
        active_boxes += [t.xyxy for t in self.tracked_stracks if t.state == TrackState.Tracked]
        active_stack = np.asarray(active_boxes, np.float32).reshape(-1, 4)
        for i in u_det3:
            det = remaining[i]
            if det.score < self.new_track_thresh:
                continue
            if self.init_iou_suppress < 1.0 and len(active_stack):
                if bbox_ioa(det.xyxy[None], active_stack, iou=True).max() >= self.init_iou_suppress:
                    continue
            det.activate(self.kalman_filter, self.frame_id)
            activated.append(det)
            active_stack = np.concatenate([active_stack, det.xyxy[None]], 0)

        # expire lost tracks, granting recently-occluded ones a longer window
        for t in self.lost_stracks:
            recently_occ = t.was_recently_occluded and (self.frame_id - t.last_occluded_frame <= self.occ_reappear_window)
            if not recently_occ and self.frame_id - t.end_frame > self.max_time_lost:
                t.mark_removed()
                removed.append(t)

        self.tracked_stracks = [t for t in self.tracked_stracks if t.state == TrackState.Tracked]
        self.tracked_stracks = _join(self.tracked_stracks, activated)
        self.tracked_stracks = _join(self.tracked_stracks, refind)
        self.lost_stracks = _sub(self.lost_stracks, self.tracked_stracks)
        self.lost_stracks.extend(lost)
        self.lost_stracks = _sub(self.lost_stracks, removed)
        self.removed_stracks.extend(removed)

        # only tracks updated THIS frame (stale coasting boxes stay hidden)
        out = [
            np.concatenate([t.xyxy, [t.track_id, t.score, t.cls]])
            for t in self.tracked_stracks
            if t.is_activated and t.frame_id == self.frame_id
        ]
        return np.asarray(out, np.float32).reshape(-1, 7)

    def _handle_occlusions(self, r_tracked: List[FastSTrack], u_track, activated, lost):
        """Flag covered unmatched tracks occluded; roll their Kalman state back."""
        if len(u_track) == 0:
            return
        active = [t for t in activated if t.is_activated and not t.is_occluded]
        active_boxes = np.asarray([t.xyxy for t in active], np.float32).reshape(-1, 4)
        active_ids = np.asarray([t.track_id for t in active])
        unmatched = [r_tracked[i] for i in u_track]
        un_boxes = np.asarray([t.xyxy for t in unmatched], np.float32).reshape(-1, 4)

        if len(active_boxes) and len(un_boxes):
            cov = bbox_ioa(active_boxes, un_boxes)  # [A, U]: covered fraction of each unmatched box
            un_ids = np.asarray([t.track_id for t in unmatched])
            cov[active_ids[:, None] == un_ids[None, :]] = 0.0
            max_cov = cov.max(axis=0)
        else:
            max_cov = np.zeros(len(unmatched), np.float32)

        for i, track in enumerate(unmatched):
            track.not_matched += 1
            if max_cov[i] > self.occ_cover_thresh and not track.is_occluded and track.state == TrackState.Tracked:
                track.is_occluded = True
                track.occluded_len = 1
                track.last_occluded_frame = self.frame_id
                track.was_recently_occluded = True
                hist = track.mean_history
                if track.mean is not None and hist:
                    if len(hist) >= self.reset_velocity_offset_occ:
                        track.mean[4:8] = hist[-self.reset_velocity_offset_occ][0][4:8]
                    if len(hist) >= self.reset_pos_offset_occ:
                        prev_mean, prev_cov = hist[-self.reset_pos_offset_occ]
                        track.mean[0:4] = prev_mean[0:4]
                        track.covariance = prev_cov.copy()
                    # XYAH state: aspect is held, so scaling h scales w too
                    track.mean[3] *= self.enlarge_bbox_occ
                    track.mean[4:8] *= self.dampen_motion_occ
            elif track.is_occluded:
                track.occluded_len += 1
            if track.was_recently_occluded and self.frame_id - track.last_occluded_frame > self.occ_reappear_window:
                track.was_recently_occluded = False
            if track.state != TrackState.Lost:
                if track.not_matched > 2 and (not track.is_occluded or track.occluded_len > self.active_occ_to_lost_thresh):
                    track.mark_lost()
                    lost.append(track)
