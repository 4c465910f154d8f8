"""Tracker gates: identity persistence over synthetic motion, lost-track
rescue, new-track spawning (reference analog: tracker unit tests)."""

import numpy as np
import pytest

from yolo_master_tpu.trackers import BOTSORT, BYTETracker


def make_frame(t, n=2):
    """n boxes moving right at 5 px/frame."""
    boxes = np.array([[50 + 5 * t + 120 * i, 60 + 120 * i, 100 + 5 * t + 120 * i, 120 + 120 * i] for i in range(n)], np.float32)
    scores = np.array([0.9] * n, np.float32)
    classes = np.zeros(n, np.float32)
    return boxes, scores, classes


def test_bytetrack_identity_persistence():
    tracker = BYTETracker()
    ids_per_frame = []
    for t in range(10):
        boxes, scores, classes = make_frame(t)
        out = tracker.update(boxes, scores, classes)
        if t > 0:
            assert out.shape[1] == 7
            ids_per_frame.append(sorted(out[:, 4].tolist()))
    # the same two identities persist across all frames
    assert all(ids == ids_per_frame[0] for ids in ids_per_frame)
    assert len(ids_per_frame[0]) == 2


def test_bytetrack_low_conf_rescue():
    tracker = BYTETracker(track_high_thresh=0.5, track_low_thresh=0.1)
    for t in range(3):
        boxes, scores, classes = make_frame(t, n=1)
        tracker.update(boxes, scores, classes)
    # confidence dips below high threshold -> rescued by stage 2
    boxes, _, classes = make_frame(3, n=1)
    out = tracker.update(boxes, np.array([0.3], np.float32), classes)
    assert len(out) == 1, "low-conf detection should keep the track alive"


def test_bytetrack_track_expiry():
    tracker = BYTETracker(track_buffer=2)
    for t in range(3):
        boxes, scores, classes = make_frame(t, n=1)
        tracker.update(boxes, scores, classes)
    for t in range(3, 8):  # object disappears
        out = tracker.update(np.zeros((0, 4), np.float32), np.zeros(0), np.zeros(0))
    assert len(out) == 0
    assert len(tracker.lost_stracks) == 0, "expired tracks must leave the lost list"


def test_botsort_with_camera_motion():
    tracker = BOTSORT()
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (240, 320, 3), np.uint8)
    for t in range(5):
        boxes, scores, classes = make_frame(t, n=2)
        shifted = np.roll(img, t * 3, axis=1)  # simulated camera pan
        out = tracker.update(boxes, scores, classes, img=shifted)
    assert len(out) == 2


def test_fasttracker_occlusion_survival_vs_byte():
    """A track hidden behind a neighbor beyond track_buffer keeps its ID with
    FastTracker (occlusion grace + reappear window); plain BYTE forgets it."""
    from yolo_master_tpu.trackers import FASTTracker

    A = np.array([100, 100, 200, 200], np.float32)
    B = np.array([120, 120, 150, 150], np.float32)  # inside A: cover = 1.0

    def run(tracker):
        b_id = None
        for t in range(5):  # both visible
            out = tracker.update(np.stack([A, B]), np.array([0.9, 0.9], np.float32), np.zeros(2, np.float32))
            if len(out) == 2:
                areas = (out[:, 2] - out[:, 0]) * (out[:, 3] - out[:, 1])
                b_id = out[np.argmin(areas), 4]
        for t in range(6):  # B hidden behind A (gap 6 > track_buffer 2)
            tracker.update(A[None], np.array([0.9], np.float32), np.zeros(1, np.float32))
        out = tracker.update(np.stack([A, B]), np.array([0.9, 0.9], np.float32), np.zeros(2, np.float32))
        areas = (out[:, 2] - out[:, 0]) * (out[:, 3] - out[:, 1])
        return b_id, out[np.argmin(areas), 4] if len(out) == 2 else None

    before, after = run(FASTTracker(track_buffer=2))
    assert before is not None and after == before, f"FastTracker lost the occluded ID: {before} -> {after}"
    b_before, b_after = run(BYTETracker(track_buffer=2))
    assert b_after != b_before, "BYTE with a tiny buffer should have re-identified (test is vacuous otherwise)"


def test_fasttracker_spawn_suppression():
    from yolo_master_tpu.trackers import FASTTracker

    tracker = FASTTracker(init_iou_suppress=0.7)
    A = np.array([100, 100, 200, 200], np.float32)
    for t in range(3):
        tracker.update(A[None], np.array([0.9], np.float32), np.zeros(1, np.float32))
    n_before = len(tracker.tracked_stracks)
    dup = A + np.array([5, 5, 5, 5], np.float32)  # IoU ~0.82 with A
    tracker.update(np.stack([A, dup]), np.array([0.9, 0.9], np.float32), np.zeros(2, np.float32))
    assert len(tracker.tracked_stracks) == n_before, "overlapping spawn must be suppressed"


def test_tracktrack_identity_persistence():
    from yolo_master_tpu.trackers import TRACKTRACK

    tracker = TRACKTRACK()
    ids_per_frame = []
    for t in range(10):
        boxes, scores, classes = make_frame(t)
        out = tracker.update(boxes, scores, classes)
        if t > 0:
            assert out.shape[1] == 7
            ids_per_frame.append(sorted(out[:, 4].tolist()))
    assert all(ids == ids_per_frame[0] for ids in ids_per_frame)
    assert len(ids_per_frame[0]) == 2


def test_tracktrack_recovered_bucket_rescues():
    """A detection dropped by tight NMS (passed via dets_del) keeps matching
    its track through the penalized recovered bucket."""
    from yolo_master_tpu.trackers import TRACKTRACK

    tracker = TRACKTRACK(track_buffer=10)
    for t in range(4):
        boxes, scores, classes = make_frame(t, n=1)
        out = tracker.update(boxes, scores, classes)
    tid = out[0, 4]
    # next frame: the detector output is empty, but loose NMS recovered the box
    boxes, scores, classes = make_frame(4, n=1)
    out = tracker.update(np.zeros((0, 4), np.float32), np.zeros(0), np.zeros(0),
                         dets_del=(boxes, scores, classes))
    assert len(out) == 1 and out[0, 4] == tid


def test_tracktrack_tai_suppression():
    from yolo_master_tpu.trackers import TRACKTRACK

    tracker = TRACKTRACK(tai_thr=0.55)
    A = np.array([100, 100, 200, 200], np.float32)
    for t in range(3):
        tracker.update(A[None], np.array([0.9], np.float32), np.zeros(1, np.float32))
    n_before = len(tracker.tracked_stracks)
    dup = A + np.array([5, 5, 5, 5], np.float32)
    tracker.update(np.stack([A, dup]), np.array([0.9, 0.9], np.float32), np.zeros(2, np.float32))
    assert len(tracker.tracked_stracks) == n_before


def test_iterative_associate_mutual_nearest():
    from yolo_master_tpu.trackers.track_tracker import iterative_associate

    cost = np.array([[0.1, 0.9, 0.9], [0.9, 0.2, 0.9]], np.float32)
    matches, ut, ud = iterative_associate(cost, 0.7)
    assert sorted(matches) == [(0, 0), (1, 1)]
    assert ut == [] and ud == [2]


def test_kalman_xywh_nsa_confidence():
    """High NSA confidence shrinks measurement noise -> posterior closer to
    the measurement than a zero-confidence update."""
    from yolo_master_tpu.trackers.kalman_filter import KalmanFilterXYWH

    kf = KalmanFilterXYWH()
    mean, cov = kf.initiate(np.array([50, 50, 20, 40], np.float32))
    mean, cov = kf.predict(mean, cov)
    meas = np.array([60, 55, 22, 42], np.float32)
    m_lo, _ = kf.update(mean, cov, meas, confidence=0.0)
    m_hi, _ = kf.update(mean, cov, meas, confidence=0.9)
    assert np.linalg.norm(m_hi[:4] - meas) < np.linalg.norm(m_lo[:4] - meas)


def test_predictor_loose_nms_recovered_bucket():
    """second_nms_iou surfaces tight-NMS-dropped detections as Results.dets_del
    (TrackTrack's recovered bucket, reference track_tracker.py:150) and
    .track(tracker='tracktrack') consumes them."""
    from yolo_master_tpu.models.yolo import YOLO

    img = (np.random.default_rng(0).random((96, 96, 3)) * 255).astype(np.uint8)
    y = YOLO({"nc": 2, "backbone": [[-1, 1, "Conv", [8, 3, 2]], [-1, 1, "Conv", [16, 3, 2]]],
              "head": [[[1], 1, "Detect", ["nc"]]]})
    r = y.predict(img, imgsz=64, conf=1e-5, iou=0.3, max_det=16, max_nms=64, second_nms_iou=0.95)[0]
    assert hasattr(r, "dets_del")
    db, ds, dc = r.dets_del
    assert db.shape[1] == 4 and len(db) == len(ds) == len(dc)
    if len(r.boxes) and len(db):
        from yolo_master_tpu.utils.metrics import box_iou_np

        assert box_iou_np(db, r.boxes.xyxy).max() < 0.97, "recovered dets must be novel vs tight dets"

    out = y.track([img, img], tracker="tracktrack", imgsz=64, conf=1e-5, max_det=16, max_nms=64)
    assert len(out) == 2 and hasattr(out[0], "tracks")
