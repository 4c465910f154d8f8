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
