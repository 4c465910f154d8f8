"""OC-SORT and Deep-OC-SORT trackers (reference: ultralytics/trackers/
oc_sort.py OCSortTrack/OCSORT + deep_oc_sort.py).

Observation-centric SORT adds three components over ByteTrack's Kalman loop:
  * ORU (observation-centric re-update): on re-activation after occlusion,
    replay a virtual linear trajectory between the last real observation and
    the new one through the Kalman filter, un-accumulating the drift
  * OCM (observation-centric momentum): an association cost term penalizing
    direction inconsistency between each track's observation velocity and the
    track->detection displacement
  * OCR (observation-centric recovery): a final association pass matching
    remaining tracks' LAST OBSERVATIONS (not KF predictions) to leftover
    detections — recovers stationary objects the KF drifted away from

Deep-OC-SORT layers an appearance-embedding cost with an EMA'd per-track
embedding and adaptive weighting. The default embedder is a normalized
color-histogram patch feature (documented stand-in — the reference uses a
ReID CNN; any callable (img, boxes)->[N,D] plugs in).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from .byte_tracker import BYTETracker, STrack, TrackState, _join, _sub
from .matching import fuse_score, iou_distance, linear_assignment


class OCTrack(STrack):
    """STrack + real-observation history for velocity/ORU/OCR."""

    def __init__(self, xyxy, score, cls, delta_t: int = 3):
        super().__init__(xyxy, score, cls)
        self.last_observation = np.full(4, -1.0, np.float32)
        self.observations: dict = {}
        self.velocity: Optional[np.ndarray] = None
        self.delta_t = delta_t
        self.emb: Optional[np.ndarray] = None  # Deep-OC-SORT appearance

    @staticmethod
    def _center(xyxy):
        return np.array([(xyxy[0] + xyxy[2]) / 2, (xyxy[1] + xyxy[3]) / 2], np.float32)

    def _record(self, xyxy, frame_id):
        # velocity from the observation delta_t frames back (OCM momentum)
        prev = None
        for dt in range(self.delta_t, 0, -1):
            if frame_id - dt in self.observations:
                prev = self.observations[frame_id - dt]
                break
        if prev is None and self.observations:
            prev = self.observations[max(self.observations)]
        if prev is not None:
            d = self._center(xyxy) - self._center(prev)
            n = np.linalg.norm(d)
            self.velocity = d / n if n > 0 else np.zeros(2, np.float32)
        self.observations[frame_id] = np.asarray(xyxy, np.float32)
        self.last_observation = np.asarray(xyxy, np.float32)
        # prune old observations
        for k in [k for k in self.observations if frame_id - k > 60]:
            del self.observations[k]

    def _ema_emb(self, new_track, alpha: float = 0.9):
        """Deep-OC-SORT appearance EMA (reference deep_oc_sort.py)."""
        if getattr(new_track, "emb", None) is None:
            return
        if self.emb is None:
            self.emb = new_track.emb
        else:
            e = alpha * self.emb + (1 - alpha) * new_track.emb
            self.emb = e / max(np.linalg.norm(e), 1e-6)

    def activate(self, kalman_filter, frame_id):
        super().activate(kalman_filter, frame_id)
        self._record(self.xyxy, frame_id)

    def update(self, new_track, frame_id):
        self._ema_emb(new_track)
        super().update(new_track, frame_id)
        self._record(new_track.xyxy, frame_id)

    def re_activate(self, new_track, frame_id, new_id=False):
        # ORU: replay a virtual linear path from the last observation to the
        # new one so the KF state lands observation-consistent, not drifted
        self._ema_emb(new_track)
        if self.last_observation[0] >= 0 and self.observations:
            last_frame = max(self.observations)
            gap = frame_id - last_frame
            if gap > 1:
                start = self.observations[last_frame]
                end = np.asarray(new_track.xyxy, np.float32)
                for g in range(1, gap):
                    virtual = start + (end - start) * (g / gap)
                    vt = STrack(virtual, self.score, self.cls)
                    super().update(vt, last_frame + g)
        super().re_activate(new_track, frame_id, new_id)
        self._record(new_track.xyxy, frame_id)


def velocity_direction_cost(tracks: List[OCTrack], dets: List[STrack], weight: float = 0.2) -> np.ndarray:
    """OCM: [T, N] cost from angle inconsistency between track velocity and
    track-observation -> detection direction (0 when aligned)."""
    T, N = len(tracks), len(dets)
    cost = np.zeros((T, N), np.float32)
    if T == 0 or N == 0:
        return cost
    for i, t in enumerate(tracks):
        if t.velocity is None or t.last_observation[0] < 0:
            continue
        c0 = OCTrack._center(t.last_observation)
        for j, d in enumerate(dets):
            v = OCTrack._center(d.xyxy) - c0
            n = np.linalg.norm(v)
            if n == 0:
                continue
            cosang = float(np.clip(np.dot(t.velocity, v / n), -1.0, 1.0))
            cost[i, j] = weight * (np.arccos(cosang) / np.pi)
    return cost


def last_observation_iou(tracks: List[OCTrack], dets: List[STrack]) -> np.ndarray:
    """OCR: IoU distance between the tracks' last real observations and dets."""

    class _Shim:
        def __init__(self, xyxy):
            self.xyxy = xyxy

    shims = [_Shim(t.last_observation) for t in tracks]
    return iou_distance(shims, dets)


class OCSORT(BYTETracker):
    """OC-SORT (reference oc_sort.py:167): ByteTrack association loop with
    OCM-augmented costs and an OCR recovery pass."""

    track_class = OCTrack

    def __init__(self, *args, delta_t: int = 3, ocm_weight: float = 0.2, ocr_thresh: float = 0.5, **kw):
        super().__init__(*args, **kw)
        self.delta_t = delta_t
        self.ocm_weight = ocm_weight
        self.ocr_thresh = ocr_thresh

    def _make_tracks(self, boxes, scores, classes, img=None):
        return [self.track_class(b, s, c, self.delta_t) for b, s, c in zip(boxes, scores, classes)]

    def update(self, boxes: np.ndarray, scores: np.ndarray, classes: np.ndarray, img=None) -> np.ndarray:
        self.frame_id += 1
        high = scores >= self.track_high_thresh
        low = (scores > self.track_low_thresh) & ~high
        dets_high = self._make_tracks(boxes[high], scores[high], classes[high], img)
        dets_low = self._make_tracks(boxes[low], scores[low], classes[low], img)

        unconfirmed = [t for t in self.tracked_stracks if not t.is_activated]
        tracked = [t for t in self.tracked_stracks if t.is_activated]
        pool = _join(tracked, self.lost_stracks)
        for t in pool:
            t.predict()

        # stage 1: IoU + OCM velocity-consistency cost
        cost = iou_distance(pool, dets_high) + velocity_direction_cost(pool, dets_high, self.ocm_weight)
        cost = self._fuse_appearance(cost, pool, dets_high)
        if self.fuse:
            cost = fuse_score(np.clip(cost, 0, 1), dets_high)
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

        # stage 2: low-conf rescue (BYTE)
        r_tracked = [pool[i] for i in u_track if pool[i].state == TrackState.Tracked]
        cost2 = iou_distance(r_tracked, dets_low)
        matches2, u_track2, _ = linear_assignment(cost2, 0.5)
        for it, idet in matches2:
            r_tracked[it].update(dets_low[idet], self.frame_id)
            activated.append(r_tracked[it])
        still_un = [r_tracked[i] for i in u_track2]

        # OCR: recover via LAST OBSERVATIONS against leftover high detections
        remaining_high = [dets_high[i] for i in u_det]
        cost3 = last_observation_iou(still_un, remaining_high)
        matches3, u_track3, u_det3 = linear_assignment(cost3, self.ocr_thresh)
        for it, idet in matches3:
            still_un[it].update(remaining_high[idet], self.frame_id)
            activated.append(still_un[it])
        for i in u_track3:
            if still_un[i].state != TrackState.Lost:
                still_un[i].mark_lost()
                lost.append(still_un[i])
        remaining = [remaining_high[i] for i in u_det3]

        # unconfirmed tracks
        cost4 = iou_distance(unconfirmed, remaining)
        matches4, u_unconf, u_det4 = linear_assignment(cost4, 0.7)
        for it, idet in matches4:
            unconfirmed[it].update(remaining[idet], self.frame_id)
            activated.append(unconfirmed[it])
        for i in u_unconf:
            unconfirmed[i].mark_removed()
            removed.append(unconfirmed[i])

        # births
        for i in u_det4:
            det = remaining[i]
            if det.score >= self.new_track_thresh:
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
            if t.is_activated
        ]
        return np.asarray(out, np.float32).reshape(-1, 7)

    def _fuse_appearance(self, cost, tracks, dets):
        return cost  # OC-SORT is motion-only; Deep-OC-SORT overrides


def histogram_embedder(img: np.ndarray, boxes: np.ndarray, bins: int = 8) -> np.ndarray:
    """Default appearance embedder: per-box normalized 3D color histogram
    [N, bins^3]. A documented stand-in for the reference's ReID CNN — any
    callable (img, boxes [N,4]) -> [N, D] plugs into DeepOCSORT."""
    H, W = img.shape[:2]
    out = np.zeros((len(boxes), bins**3), np.float32)
    for i, (x1, y1, x2, y2) in enumerate(boxes.astype(int)):
        x1, y1 = max(0, x1), max(0, y1)
        x2, y2 = min(W, max(x2, x1 + 1)), min(H, max(y2, y1 + 1))
        patch = img[y1:y2, x1:x2].reshape(-1, 3)
        idx = (patch // (256 // bins)).clip(0, bins - 1)
        flat = idx[:, 0] * bins * bins + idx[:, 1] * bins + idx[:, 2]
        hist = np.bincount(flat, minlength=bins**3).astype(np.float32)
        out[i] = hist / max(np.linalg.norm(hist), 1e-6)
    return out


class DeepOCSORT(OCSORT):
    """Deep-OC-SORT (reference deep_oc_sort.py): OC-SORT + EMA appearance
    embeddings fused into the association cost with adaptive weighting."""

    def __init__(self, *args, appearance_weight: float = 0.35, ema_alpha: float = 0.9,
                 embedder=histogram_embedder, **kw):
        super().__init__(*args, **kw)
        self.app_w = appearance_weight
        self.ema_alpha = ema_alpha
        self.embedder = embedder

    def _make_tracks(self, boxes, scores, classes, img=None):
        tracks = super()._make_tracks(boxes, scores, classes)
        if img is not None and len(tracks):
            embs = self.embedder(img, np.asarray([t.xyxy for t in tracks]))
            for t, e in zip(tracks, embs):
                t.emb = e
        return tracks

    def _fuse_appearance(self, cost, tracks, dets):
        if not tracks or not dets or dets[0].emb is None:
            return cost
        te = np.stack([t.emb if t.emb is not None else np.zeros_like(dets[0].emb) for t in tracks])
        de = np.stack([d.emb for d in dets])
        app = 1.0 - te @ de.T  # cosine distance (embeddings normalized)
        # adaptive weighting: trust appearance more where IoU is ambiguous
        return (1 - self.app_w) * cost + self.app_w * app
