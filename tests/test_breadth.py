"""Breadth sweep gates (VERDICT r1 #9): OC-SORT/Deep-OC-SORT trackers,
solutions batch 2, CLI track/benchmark modes."""

import numpy as np
import pytest


def _drift_boxes(f):
    return np.array([[10 + f * 4, 10, 50 + f * 4, 50], [200, 200, 260, 260]], np.float32)


def test_ocsort_identity_through_occlusion():
    """OCR must re-associate a stationary object after a detection gap via its
    last observation; ORU keeps the recovered box near the observation."""
    from yolo_master_tpu.trackers import OCSORT

    t = OCSORT(track_buffer=30)
    for f in range(4):
        out = t.update(_drift_boxes(f), np.array([0.9, 0.9]), np.array([0, 0]))
    ids_before = set(out[:, 4].astype(int))
    # occlusion: object 2 missing for 3 frames
    for f in range(4, 7):
        t.update(_drift_boxes(f)[:1], np.array([0.9]), np.array([0]))
    out = t.update(_drift_boxes(7), np.array([0.9, 0.9]), np.array([0, 0]))
    ids_after = set(out[:, 4].astype(int))
    assert ids_before == ids_after, "identity must survive the gap (OCR/ORU)"
    stat = out[np.argmax(out[:, 0])]  # the stationary (right) object
    assert abs(stat[0] - 200) < 8, "ORU should keep the recovered box at the observation"


def test_ocsort_velocity_momentum():
    from yolo_master_tpu.trackers.oc_sort import OCTrack, velocity_direction_cost
    from yolo_master_tpu.trackers.byte_tracker import STrack

    tr = OCTrack(np.array([0, 0, 10, 10], np.float32), 0.9, 0)
    tr.observations = {1: np.array([0, 0, 10, 10], np.float32)}
    tr._record(np.array([10, 0, 20, 10], np.float32), 4)  # moving +x
    assert tr.velocity is not None and tr.velocity[0] > 0.9
    det_fwd = STrack(np.array([20, 0, 30, 10], np.float32), 0.9, 0)  # ahead
    det_back = STrack(np.array([-10, 0, 0, 10], np.float32), 0.9, 0)  # behind
    c = velocity_direction_cost([tr], [det_fwd, det_back], weight=0.2)
    assert c[0, 0] < c[0, 1], "momentum cost must prefer direction-consistent dets"


def test_deep_ocsort_appearance_separates_crossing():
    from yolo_master_tpu.trackers import DeepOCSORT

    img = np.zeros((120, 240, 3), np.uint8)
    img[:, :120] = (0, 0, 255)  # left half red
    img[:, 120:] = (255, 0, 0)  # right half blue
    t = DeepOCSORT()
    out = t.update(np.array([[10, 40, 50, 80], [190, 40, 230, 80]], np.float32),
                   np.array([0.9, 0.9]), np.array([0, 0]), img=img)
    assert out.shape == (2, 7)
    assert t.tracked_stracks[0].emb is not None


def test_solutions_batch2():
    from yolo_master_tpu.solutions import (
        AIGym, Analytics, InstanceSegmentationOverlay, ObjectBlurrer, ObjectCropper,
        ParkingManagement, SecurityAlarm, TrackZone, VisionEye,
    )

    tracks = np.array([[10, 10, 30, 30, 1, 0.9, 0], [60, 60, 90, 90, 2, 0.8, 1]], np.float32)

    pm = ParkingManagement([[(0, 0), (40, 0), (40, 40), (0, 40)], [(100, 100), (200, 100), (200, 200), (100, 200)]])
    st = pm.update(tracks)
    assert st == {"occupied": 1, "available": 1}

    an = Analytics(names={0: "car", 1: "bus"})
    an.update(tracks)
    an.update(tracks[:1])
    s = an.series()
    assert s["car"] == [1, 1] and s["bus"] == [1, 0]

    gym = AIGym(kpts=(0, 1, 2))
    straight = np.array([[[0, 0], [10, 0], [20, 0]]], np.float32)  # 180deg = up
    bent = np.array([[[0, 0], [10, 0], [5, 5]]], np.float32)  # 45deg = down
    gym.update(bent, [1])
    gym.update(straight, [1])
    assert gym.count[1] == 1

    tz = TrackZone([(0, 0), (50, 0), (50, 50), (0, 50)])
    kept = tz.update(tracks)
    assert len(kept) == 1 and tz.in_zone_ids == {1}

    img = np.random.default_rng(0).integers(0, 255, (100, 100, 3)).astype(np.uint8)
    blurred = ObjectBlurrer(0.3).apply(img, tracks[:, :4])
    assert blurred.shape == img.shape
    patch = slice(12, 28)
    assert blurred[patch, patch].std() < img[patch, patch].std()

    crops = ObjectCropper().crop(img, tracks[:, :4])
    assert len(crops) == 2 and crops[0].shape == (20, 20, 3)

    ve = VisionEye((50, 99))
    rows = ve.update(tracks)
    assert rows[0]["track_id"] == 1 and rows[0]["dist_px"] > 0

    fired = []
    al = SecurityAlarm(records=2, notify=fired.append)
    al.update(tracks)
    assert fired == [2]
    al.update(tracks[:1])  # resets
    al.update(tracks)
    assert fired == [2, 2]

    masks = np.zeros((2, 100, 100), bool)
    masks[0, 10:30, 10:30] = True
    out = InstanceSegmentationOverlay().apply(img, masks, [0, 1])
    assert out.shape == img.shape and (out[15, 15] != img[15, 15]).any()


def test_cli_track_mode(tmp_path):
    import cv2

    from yolo_master_tpu.cfg.cli import entrypoint

    vp = tmp_path / "clip.avi"
    vw = cv2.VideoWriter(str(vp), cv2.VideoWriter_fourcc(*"MJPG"), 10, (64, 64))
    if not vw.isOpened():
        pytest.skip("VideoWriter unavailable")
    for t in range(4):
        img = np.full((64, 64, 3), 120, np.uint8)
        cv2.rectangle(img, (5 + t * 3, 20), (35 + t * 3, 50), (0, 0, 220), -1)
        vw.write(img)
    vw.release()
    rc = entrypoint(["detect", "track", f"source={vp}", "imgsz=64", "conf=0.001",
                     "max_det=4", "max_nms=64", "tracker=ocsort"])
    assert rc == 0


def test_tracker_map_complete():
    """All six reference tracker families (trackers/__init__.py)."""
    from yolo_master_tpu.trackers import TRACKER_MAP

    assert set(TRACKER_MAP) == {"bytetrack", "botsort", "ocsort", "deepocsort", "fasttrack", "tracktrack"}
