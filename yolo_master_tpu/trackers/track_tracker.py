"""TrackTrack: track-perspective association + track-aware initialization
(reference: ultralytics/trackers/track_tracker.py, TrackTrack CVPR'25).

One unified association round instead of BYTE's cascade: high, low, and
recovered detections are matched against tracked+lost tracks together using a
multi-cue cost (HMIoU x motion + optional appearance + confidence projection +
corner-velocity angle), with per-bucket penalties making weaker evidence lose
ties. Matching is iterative mutually-nearest greedy with a shrinking gate.
New tracks spawn only after track-aware NMS (suppressed when covered by an
existing track or a stronger unmatched detection).

The recovered bucket in the reference re-runs NMS at a loose IoU and feeds
back detections the tight NMS dropped; here callers may pass ``dets_del``
(boxes/scores/classes arrays) obtained from a second loose-NMS device call —
the predictor's jitted NMS takes iou_thres as an argument, so no raw-pred
hook is needed (reference attach_raw_preds_hook exists only because torch NMS
happens inside postprocess).
"""

from __future__ import annotations

from collections import deque
from typing import List, Optional

import numpy as np

from .byte_tracker import STrack, TrackState, _join, _sub
from .kalman_filter import KalmanFilterXYWH
from .matching import bbox_ioa

_CORNER_DX = np.array([0, 0, 2, 2])
_CORNER_DY = np.array([1, 3, 1, 3])


class TTSTrack(STrack):
    """STrack on the XYWH/NSA Kalman state + corner velocity, score history,
    and optional EMA appearance features (reference track_tracker.py:205)."""

    min_track_len = 3
    _alpha = 0.95
    _delta_t = 3

    def __init__(self, xyxy, score, cls, feat: Optional[np.ndarray] = None):
        super().__init__(xyxy, score, cls)
        self.prev_score = float(score)
        self.velocity = np.zeros((4, 2), np.float32)
        self._history: deque = deque(maxlen=self._delta_t + 1)
        self.curr_feat = self.smooth_feat = None
        if feat is not None:
            self.update_features(feat)

    # XYWH state (not XYAH)
    @property
    def xywh(self):
        x1, y1, x2, y2 = self._xyxy
        return np.array([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], np.float32)

    @property
    def xyxy(self):
        if self.mean is None:
            return self._xyxy
        cx, cy, w, h = self.mean[:4]
        return np.array([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], np.float32)

    def update_features(self, feat: np.ndarray):
        """Score-adaptive EMA: low-confidence frames blend in less."""
        feat = feat / max(np.linalg.norm(feat), 1e-6)
        self.curr_feat = feat
        beta = self._alpha + (1 - self._alpha) * (1 - self.score)
        if self.smooth_feat is None:
            self.smooth_feat = feat
        else:
            s = beta * self.smooth_feat + (1 - beta) * feat
            self.smooth_feat = s / max(np.linalg.norm(s), 1e-6)

    def get_history_box(self, frame_id: int, dt: int) -> np.ndarray:
        target = frame_id - dt
        for fid, box in self._history:
            if fid == target:
                return box.copy()
        if self._history:
            return self._history[-1][1].copy()
        return self.xyxy.copy()

    def activate(self, kalman_filter, frame_id):
        self.kalman_filter = kalman_filter
        self.track_id = self.next_id()
        self.mean, self.covariance = kalman_filter.initiate(self.xywh)
        self._history.append((frame_id, self.xyxy.copy()))
        self.tracklet_len = 0
        self.state = TrackState.New
        self.is_activated = frame_id == 1
        self.frame_id = self.start_frame = frame_id

    def re_activate(self, new_track, frame_id, new_id=False):
        self.prev_score = self.score
        self.mean, self.covariance = self.kalman_filter.update(
            self.mean, self.covariance, new_track.xywh, confidence=new_track.score
        )
        self._history.append((frame_id, self.xyxy.copy()))
        self.score = new_track.score
        if new_track.curr_feat is not None:
            self.update_features(new_track.curr_feat)
        self.tracklet_len = 0
        self.state = TrackState.Tracked
        self.is_activated = True
        self.frame_id = frame_id
        self.cls = new_track.cls
        if new_id:
            self.track_id = self.next_id()

    def update(self, new_track, frame_id):
        self.frame_id = frame_id
        self.tracklet_len += 1
        self.prev_score = self.score
        self.mean, self.covariance = self.kalman_filter.update(
            self.mean, self.covariance, new_track.xywh, confidence=new_track.score
        )
        self._history.append((frame_id, new_track.xyxy.copy()))
        # per-corner unit velocities averaged over the last delta_t gaps
        velocity = np.zeros((4, 2), np.float32)
        curr = new_track.xyxy
        for dt in range(1, self._delta_t + 1):
            delta = curr - self.get_history_box(frame_id, dt)
            dx, dy = delta[_CORNER_DX], delta[_CORNER_DY]
            n = np.sqrt(dx * dx + dy * dy) + 1e-5
            velocity += np.stack([dx / n, dy / n], -1) / dt
        self.velocity = velocity / self._delta_t
        self.score = new_track.score
        if new_track.curr_feat is not None:
            self.update_features(new_track.curr_feat)
        if self.state == TrackState.Tracked or self.tracklet_len >= self.min_track_len:
            self.state = TrackState.Tracked
            self.is_activated = True
        self.cls = new_track.cls

    def predict(self):
        mean = self.mean.copy()
        if self.state != TrackState.Tracked:
            mean[6:8] = 0  # zero w/h velocity while lost
        self.mean, self.covariance = self.kalman_filter.predict(mean, self.covariance)


def hmiou_distance(tracks: List[TTSTrack], dets: List[TTSTrack]):
    """(iou_sim, 1 - HMIoU): HMIoU = HIoU * IoU, HIoU = vertical overlap/union."""
    n, m = len(tracks), len(dets)
    if n == 0 or m == 0:
        return np.zeros((n, m), np.float32), np.ones((n, m), np.float32)
    a = np.asarray([t.xyxy for t in tracks], np.float32)
    b = np.asarray([d.xyxy for d in dets], np.float32)
    iou_sim = bbox_ioa(a, b, iou=True)
    h_over = np.minimum(a[:, 3:4], b[:, 3:4].T) - np.maximum(a[:, 1:2], b[:, 1:2].T)
    h_union = np.maximum(a[:, 3:4], b[:, 3:4].T) - np.minimum(a[:, 1:2], b[:, 1:2].T)
    h_iou = np.clip(h_over / (h_union + 1e-9), 0, 1)
    return iou_sim, 1.0 - h_iou * iou_sim


def angle_distance(tracks: List[TTSTrack], dets: List[TTSTrack], frame_id: int, delta_t: int = 3) -> np.ndarray:
    """Corner-velocity vs track->detection direction inconsistency, conf-weighted."""
    if not tracks or not dets:
        return np.ones((len(tracks), len(dets)), np.float32)
    tb = np.stack([t.get_history_box(frame_id, delta_t) for t in tracks])
    db = np.stack([d.xyxy for d in dets])
    deltas = db[None] - tb[:, None]  # [T, D, 4]
    dx, dy = deltas[:, :, _CORNER_DX], deltas[:, :, _CORNER_DY]
    n = np.sqrt(dx * dx + dy * dy) + 1e-5
    dx, dy = dx / n, dy / n
    tv = np.stack([t.velocity for t in tracks])  # [T, 4, 2]
    dot = tv[:, None, :, 0] * dx + tv[:, None, :, 1] * dy
    dist = np.abs(np.arccos(np.clip(dot, -1, 1))).mean(-1) / np.pi
    return dist * np.array([d.score for d in dets])[None]


def confidence_distance(tracks: List[TTSTrack], dets: List[TTSTrack]) -> np.ndarray:
    """|first-order projected track score - detection confidence|."""
    if not tracks or not dets:
        return np.ones((len(tracks), len(dets)), np.float32)
    curr = np.array([t.score for t in tracks])
    prev = np.array([t.prev_score for t in tracks])
    proj = curr + (curr - prev)
    return np.abs(proj[:, None] - np.array([d.score for d in dets])[None])


def cosine_distance(tracks: List[TTSTrack], dets: List[TTSTrack]) -> np.ndarray:
    """Cosine distance in [0,1]; NaN where either side lacks features (caller
    falls back to motion for that pair instead of penalizing it)."""
    if not tracks or not dets:
        return np.ones((len(tracks), len(dets)), np.float32)
    tf = [t.smooth_feat if t.smooth_feat is not None else t.curr_feat for t in tracks]
    df = [d.curr_feat for d in dets]
    dim = next((f.shape[0] for f in (*tf, *df) if f is not None), 128)
    zeros = np.zeros(dim, np.float32)
    T = np.stack([f if f is not None else zeros for f in tf])
    D = np.stack([f if f is not None else zeros for f in df])
    valid = np.array([f is not None for f in tf])[:, None] & np.array([f is not None for f in df])[None, :]
    return np.where(valid, np.clip(1 - T @ D.T, 0, 1), np.nan).astype(np.float32)


def iterative_associate(cost: np.ndarray, match_thr: float, reduce_step: float = 0.05):
    """Mutually-nearest greedy rounds; the gate tightens by reduce_step each
    committed round. Returns (matches, unmatched_tracks, unmatched_dets)."""
    matches = []
    cost = cost.copy()
    while cost.shape[0] > 0 and cost.shape[1] > 0:
        nearest_det = np.argmin(cost, 1)
        nearest_track = np.argmin(cost, 0)
        new = [
            (ti, int(nearest_det[ti]))
            for ti in range(cost.shape[0])
            if nearest_track[nearest_det[ti]] == ti and cost[ti, nearest_det[ti]] < match_thr
        ]
        if not new:
            break
        matches.extend(new)
        for ti, di in new:
            cost[ti, :] = np.inf
            cost[:, di] = np.inf
        match_thr -= reduce_step
    mt = {t for t, _ in matches}
    md = {d for _, d in matches}
    return matches, [i for i in range(cost.shape[0]) if i not in mt], [j for j in range(cost.shape[1]) if j not in md]


def track_aware_nms(tracks: List[TTSTrack], dets: List[TTSTrack], tai_thr: float, new_track_thresh: float) -> List[bool]:
    """TAI: suppress spawns covered by an existing track or a stronger det."""
    if not dets:
        return []
    scores = np.array([d.score for d in dets])
    allow = scores > new_track_thresh
    nt = len(tracks)
    if nt + len(dets) < 2:
        return allow.tolist()
    boxes = np.asarray([o.xyxy for o in tracks + dets], np.float32)
    iou = bbox_ioa(boxes, boxes, iou=True)
    if nt:
        allow &= iou[nt:, :nt].max(1) <= tai_thr
    det_iou = iou[nt:, nt:]
    for i in scores.argsort()[::-1]:
        if not allow[i]:
            continue
        suppress = det_iou[i] > tai_thr
        suppress[i] = False
        allow[suppress] = False
    return allow.tolist()


class TRACKTRACK:
    """Track-perspective association tracker (reference track_tracker.py:329).

    Interface matches the repo's other trackers: ``update(boxes, scores,
    classes, img=None, dets_del=None)`` with xyxy boxes, returns [N, 7]
    (x1,y1,x2,y2,id,score,cls). ``embedder`` is an optional callable
    (img, boxes [N,4]) -> [N, D] appearance features (e.g. oc_sort.
    histogram_embedder or a ReID model); motion-only when None."""

    def __init__(self, track_high_thresh=0.6, track_low_thresh=0.1, new_track_thresh=0.7,
                 track_buffer=30, match_thresh=0.7, lost_match_thr=0.0, penalty_p=0.2,
                 penalty_q=0.4, reduce_step=0.05, iou_weight=0.5, reid_weight=0.5,
                 conf_weight=0.1, angle_weight=0.05, tai_thr=0.55, min_track_len=3,
                 frame_rate=30, embedder=None, **_):
        self.tracked_stracks: List[TTSTrack] = []
        self.lost_stracks: List[TTSTrack] = []
        self.removed_stracks: List[TTSTrack] = []
        self.frame_id = 0
        self.track_high_thresh = track_high_thresh
        self.track_low_thresh = track_low_thresh
        self.new_track_thresh = new_track_thresh
        self.max_time_lost = int(frame_rate / 30.0 * track_buffer)
        self.match_thr = match_thresh
        self.lost_match_thr = lost_match_thr
        self.penalty_p, self.penalty_q = penalty_p, penalty_q
        self.reduce_step = reduce_step
        self.iou_weight, self.reid_weight = iou_weight, reid_weight
        self.conf_weight, self.angle_weight = conf_weight, angle_weight
        self.tai_thr = tai_thr
        self.min_track_len = min_track_len
        self.embedder = embedder
        self.kalman_filter = KalmanFilterXYWH()

    def reset(self):
        self.tracked_stracks, self.lost_stracks, self.removed_stracks = [], [], []
        self.frame_id = 0
        self.kalman_filter = KalmanFilterXYWH()
        STrack._count = 0

    def _cost_matrix(self, tracks, dets):
        iou_sim, hmiou = hmiou_distance(tracks, dets)
        if self.embedder is not None:
            cos = cosine_distance(tracks, dets)
            cost = np.where(np.isnan(cos), hmiou, self.iou_weight * hmiou + self.reid_weight * cos)
        else:
            cost = hmiou
        cost = cost + self.conf_weight * confidence_distance(tracks, dets)
        cost = cost + self.angle_weight * angle_distance(tracks, dets, self.frame_id)
        if iou_sim.size:
            cost[iou_sim <= 0.10] = 1.0  # no spatial support -> never match
        return np.clip(cost, 0, 1)

    def _new_track(self, box, score, cls, feat=None):
        t = TTSTrack(box, score, cls, feat)
        t.min_track_len = self.min_track_len
        return t

    def update(self, boxes: np.ndarray, scores: np.ndarray, classes: np.ndarray,
               img: Optional[np.ndarray] = None, dets_del=None) -> np.ndarray:
        self.frame_id += 1
        activated, refind, lost, removed = [], [], [], []
        high = scores >= self.track_high_thresh
        low = (scores > self.track_low_thresh) & ~high

        feats = None
        if self.embedder is not None and img is not None and high.any():
            feats = self.embedder(img, boxes[high])
        dets_high = [
            self._new_track(b, s, c, feats[i] if feats is not None else None)
            for i, (b, s, c) in enumerate(zip(boxes[high], scores[high], classes[high]))
        ]
        dets_low = [self._new_track(b, s, c) for b, s, c in zip(boxes[low], scores[low], classes[low])]
        dets_rec = []
        if dets_del is not None:
            db, ds, dc = dets_del
            m = np.asarray(ds) > self.track_high_thresh
            dets_rec = [self._new_track(b, s, c) for b, s, c in zip(np.asarray(db)[m], np.asarray(ds)[m], np.asarray(dc)[m])]

        unconfirmed = [t for t in self.tracked_stracks if not t.is_activated]
        tracked = [t for t in self.tracked_stracks if t.is_activated]
        pool = _join(tracked, self.lost_stracks)
        for t in pool:
            t.predict()

        # single association round over high + low + recovered with penalties
        all_dets = dets_high + dets_low + dets_rec
        n_high, n_low = len(dets_high), len(dets_low)
        cost = self._cost_matrix(pool, all_dets)
        if cost.shape[1] > n_high:
            cost[:, n_high:n_high + n_low] += self.penalty_p
        if dets_rec:
            cost[:, n_high + n_low:] += self.penalty_q
        cost = np.clip(cost, 0, 1)
        matches, u_track, u_det = iterative_associate(cost, self.match_thr, self.reduce_step)
        for ti, di in matches:
            track, det = pool[ti], all_dets[di]
            if track.state == TrackState.Tracked:
                track.update(det, self.frame_id)
                activated.append(track)
            else:
                track.re_activate(det, self.frame_id)
                refind.append(track)
        for ti in u_track:
            if pool[ti].state != TrackState.Lost:
                pool[ti].mark_lost()
                lost.append(pool[ti])

        # unconfirmed vs leftover high-confidence detections
        leftover = [all_dets[i] for i in u_det if i < n_high]
        if unconfirmed and leftover:
            m2, u_unconf, u_left = iterative_associate(self._cost_matrix(unconfirmed, leftover), self.match_thr, self.reduce_step)
            for ti, di in m2:
                unconfirmed[ti].update(leftover[di], self.frame_id)
                activated.append(unconfirmed[ti])
            for ti in u_unconf:
                unconfirmed[ti].mark_removed()
                removed.append(unconfirmed[ti])
            leftover = [leftover[i] for i in u_left]
        else:
            for t in unconfirmed:
                t.mark_removed()
                removed.append(t)

        # optional relaxed rebind of still-Lost tracks
        if self.lost_match_thr > 0 and leftover:
            unmatched_lost = [t for t in pool if t.state == TrackState.Lost and t not in lost]
            if unmatched_lost:
                m3, _, u3 = iterative_associate(self._cost_matrix(unmatched_lost, leftover), self.lost_match_thr, self.reduce_step)
                for ti, di in m3:
                    unmatched_lost[ti].re_activate(leftover[di], self.frame_id)
                    refind.append(unmatched_lost[ti])
                leftover = [leftover[i] for i in u3]

        # TAI births
        active = [t for t in self.tracked_stracks if t.state == TrackState.Tracked] + activated
        for det, ok in zip(leftover, track_aware_nms(active, leftover, self.tai_thr, self.new_track_thresh)):
            if ok:
                det.activate(self.kalman_filter, self.frame_id)
                activated.append(det)

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
            if t.is_activated and t.frame_id == self.frame_id
        ]
        return np.asarray(out, np.float32).reshape(-1, 7)
