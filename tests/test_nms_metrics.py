"""NMS exactness vs a plain-numpy greedy reference + metric sanity gates."""

import numpy as np
import pytest


def greedy_nms_numpy(boxes, scores, iou_thres):
    """Straightforward sequential greedy NMS (torchvision semantics)."""
    order = scores.argsort()[::-1]
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    areas = (boxes[:, 2] - boxes[:, 0]).clip(0) * (boxes[:, 3] - boxes[:, 1]).clip(0)
    for i in order:
        if suppressed[i] or scores[i] <= 0:
            continue
        keep.append(i)
        xx1 = np.maximum(boxes[i, 0], boxes[:, 0])
        yy1 = np.maximum(boxes[i, 1], boxes[:, 1])
        xx2 = np.minimum(boxes[i, 2], boxes[:, 2])
        yy2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = (xx2 - xx1).clip(0) * (yy2 - yy1).clip(0)
        iou = inter / (areas + areas[i] - inter + 1e-7)
        suppressed |= iou > iou_thres
    return np.array(keep)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_greedy_nms_matches_reference(seed):
    import jax.numpy as jnp

    from yolo_master_tpu.ops.nms import _greedy_nms

    rng = np.random.default_rng(seed)
    n = 200
    xy = rng.uniform(0, 600, (n, 2))
    wh = rng.uniform(10, 120, (n, 2))
    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    scores = rng.uniform(0.01, 1.0, n).astype(np.float32)

    ref = greedy_nms_numpy(boxes, scores, 0.45)
    keep_idx, keep_valid = _greedy_nms(jnp.asarray(boxes), jnp.asarray(scores), 0.45, 100)
    got = np.asarray(keep_idx)[np.asarray(keep_valid)]
    k = min(len(ref), 100)
    assert np.array_equal(got[:k], ref[:k]), f"greedy keep mismatch seed={seed}"


def test_batched_nms_class_separation():
    import jax.numpy as jnp

    from yolo_master_tpu.ops.nms import non_max_suppression

    # two identical boxes, different classes -> both survive class-aware NMS
    pred = np.zeros((1, 10, 4 + 3), np.float32)
    pred[0, 0, :4] = [100, 100, 50, 50]  # xywh
    pred[0, 0, 4] = 0.9  # class 0
    pred[0, 1, :4] = [100, 100, 50, 50]
    pred[0, 1, 6] = 0.8  # class 2
    out = non_max_suppression(jnp.asarray(pred), nc=3, conf_thres=0.25, iou_thres=0.45, max_det=10, max_nms=16)
    assert int(out["valid"][0].sum()) == 2
    cls = sorted(np.asarray(out["classes"][0][:2]).tolist())
    assert cls == [0.0, 2.0]
    # agnostic NMS suppresses the weaker one
    out2 = non_max_suppression(
        jnp.asarray(pred), nc=3, conf_thres=0.25, iou_thres=0.45, max_det=10, max_nms=16, agnostic=True
    )
    assert int(out2["valid"][0].sum()) == 1


def test_metrics_perfect_predictions():
    from yolo_master_tpu.utils.metrics import DetMetrics

    m = DetMetrics(nc=2)
    rng = np.random.default_rng(0)
    for _ in range(8):
        gt = rng.uniform(0, 500, (3, 2))
        gt_boxes = np.concatenate([gt, gt + 60], -1)
        gt_cls = rng.integers(0, 2, 3)
        m.update(gt_boxes, np.full(3, 0.9), gt_cls, gt_boxes, gt_cls)
    out = m.compute()
    assert out["mAP50"] > 0.99 and out["mAP50-95"] > 0.99


def test_metrics_all_wrong_class():
    from yolo_master_tpu.utils.metrics import DetMetrics

    m = DetMetrics(nc=2)
    gt = np.array([[10, 10, 100, 100]], np.float32)
    m.update(gt, np.array([0.9]), np.array([1]), gt, np.array([0]))
    out = m.compute()
    assert out["mAP50"] == 0.0


def test_classes_filter_on_logits_path():
    """classes= filter must mask logits to -inf, not 0 (ADVICE r1, high):
    a zeroed logit sigmoids to 0.5 and floods outputs with excluded classes."""
    import jax.numpy as jnp
    from yolo_master_tpu.ops.nms import non_max_suppression

    nc = 3
    # one anchor strongly predicting class 2 (logit 4), others background (-6)
    pred = jnp.array([[[100.0, 100.0, 40.0, 40.0, -6.0, -6.0, 4.0]]])
    mask = jnp.array([1.0, 1.0, 0.0])  # exclude class 2
    det = non_max_suppression(
        pred, nc=nc, conf_thres=0.25, max_det=4, max_nms=4,
        class_mask=mask, scores_are_logits=True, use_pallas=False,
    )
    assert int(det["valid"].sum()) == 0  # nothing above conf once cls2 masked
    # without the mask the detection must survive as class 2
    det2 = non_max_suppression(
        pred, nc=nc, conf_thres=0.25, max_det=4, max_nms=4,
        scores_are_logits=True, use_pallas=False,
    )
    assert int(det2["valid"].sum()) == 1 and int(det2["classes"][0, 0]) == 2


def test_decode_topk_exact_vs_full_decode():
    """The predictor's top-k-first fast path (decode_topk + NMS) must produce
    the EXACT detections of decode(raw_scores=True) + NMS: top-k selection on
    logit max commutes with sigmoid, and the single-label NMS path only ever
    reads the top max_nms candidates."""
    import jax.numpy as jnp

    from yolo_master_tpu.nn.module import Context
    from yolo_master_tpu.nn.tasks import DetectionModel
    from yolo_master_tpu.ops.nms import non_max_suppression

    model = DetectionModel("yolo-master-n")
    params = model.init_params(0)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(0, 1, (2, 96, 96, 3)), jnp.float32)
    preds = model.forward_train(params, x, Context(training=False))

    full = model.head.decode(preds, raw_scores=True)
    topk = model.head.decode_topk(preds, k=256)
    kw = dict(nc=model.nc, conf_thres=0.05, iou_thres=0.45, max_det=32,
              max_nms=256, scores_are_logits=True, use_pallas=False)
    da = non_max_suppression(full, **kw)
    db = non_max_suppression(topk, **kw)
    assert np.array_equal(np.asarray(da["valid"]), np.asarray(db["valid"]))
    v = np.asarray(da["valid"])
    assert np.allclose(np.asarray(da["boxes"])[v], np.asarray(db["boxes"])[v], atol=1e-5)
    assert np.allclose(np.asarray(da["scores"])[v], np.asarray(db["scores"])[v], atol=1e-6)
    assert np.array_equal(np.asarray(da["classes"])[v], np.asarray(db["classes"])[v])
