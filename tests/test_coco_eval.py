"""COCO evaluator gates: perfect predictions -> AP 1.0, misses lower AP,
area ranges and crowd handling."""

import json

import numpy as np
import pytest

from yolo_master_tpu.utils.coco import COCOEvaluator


def make_gt():
    anns = []
    aid = 0
    rng = np.random.default_rng(0)
    for img in range(4):
        for _ in range(3):
            x, y = rng.uniform(0, 400, 2)
            w, h = rng.uniform(40, 120, 2)
            anns.append({"id": aid, "image_id": img, "category_id": int(rng.integers(0, 3)),
                         "bbox": [float(x), float(y), float(w), float(h)], "area": float(w * h), "iscrowd": 0})
            aid += 1
    return {"images": [{"id": i} for i in range(4)], "annotations": anns}


def preds_from_gt(gt, jitter=0.0, score=0.9, drop=0):
    rng = np.random.default_rng(1)
    out = []
    for a in gt["annotations"][: len(gt["annotations"]) - drop]:
        b = np.asarray(a["bbox"], np.float64)
        b[:2] += rng.uniform(-jitter, jitter, 2)
        out.append({"image_id": a["image_id"], "category_id": a["category_id"],
                    "bbox": b.tolist(), "score": float(score)})
    return out


def test_perfect_predictions_ap1():
    gt = make_gt()
    ev = COCOEvaluator(gt)
    res = ev.evaluate(preds_from_gt(gt))
    assert res["AP"] > 0.99 and res["AP50"] > 0.99, res


def test_dropped_predictions_lower_ap():
    gt = make_gt()
    ev = COCOEvaluator(gt)
    full = ev.evaluate(preds_from_gt(gt))["AP"]
    partial = ev.evaluate(preds_from_gt(gt, drop=6))["AP"]
    assert partial < full - 0.2


def test_jittered_predictions_degrade_high_thresholds():
    gt = make_gt()
    ev = COCOEvaluator(gt)
    res = ev.evaluate(preds_from_gt(gt, jitter=12.0))
    assert res["AP50"] > res["AP75"], res


def test_crowd_matches_do_not_penalize():
    gt = make_gt()
    gt["annotations"][0]["iscrowd"] = 1
    ev = COCOEvaluator(gt)
    # predictions only for non-crowd GT; a crowd-overlapping extra det is ignored
    preds = preds_from_gt(gt)[1:]
    crowd_box = gt["annotations"][0]["bbox"]
    preds.append({"image_id": 0, "category_id": gt["annotations"][0]["category_id"],
                  "bbox": crowd_box, "score": 0.95})
    res = ev.evaluate(preds)
    assert res["AP"] > 0.99, res
