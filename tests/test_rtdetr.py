"""RT-DETR gates: decoder build/forward, Hungarian matcher optimality,
DETR loss gradients."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolo_master_tpu.nn.module import Context
from yolo_master_tpu.nn.tasks import RTDETRDetectionModel

MINI = {
    "nc": 5,
    "backbone": [
        [-1, 1, "Conv", [16, 3, 2]],
        [-1, 1, "Conv", [32, 3, 2]],
        [-1, 1, "Conv", [32, 3, 2]],
        [-1, 1, "Conv", [48, 3, 2]],
        [-1, 1, "Conv", [64, 3, 2]],
    ],
    "head": [[[2, 3, 4], 1, "RTDETRDecoder", ["nc", 64, 50, 4, 4, 2, 128]]],
}


@pytest.fixture(scope="module")
def model():
    m = RTDETRDetectionModel(MINI)
    return m, m.init_params(0)


def test_rtdetr_forward_shapes(model):
    m, p = model
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (2, 64, 64, 3)), jnp.float32)
    preds = m.forward_train(p, x, Context(training=True))
    assert preds["dec_boxes"].shape == (2, 2, 50, 4)  # [ndl, B, nq, 4]
    assert preds["dec_scores"].shape == (2, 2, 50, 5)
    assert bool(jnp.all((preds["dec_boxes"] >= 0) & (preds["dec_boxes"] <= 1)))
    dec = m.forward_predict(p, x)
    assert dec.shape == (2, 50, 9)


def test_hungarian_matcher_prefers_overlap():
    from yolo_master_tpu.models.rtdetr import hungarian_match

    nq, nc = 8, 3
    pred_boxes = np.full((nq, 4), 0.5, np.float32)
    pred_boxes[2] = [0.2, 0.2, 0.2, 0.2]
    pred_boxes[5] = [0.8, 0.8, 0.2, 0.2]
    pred_scores = np.full((nq, nc), -4.0, np.float32)
    pred_scores[2, 1] = 3.0  # confident class-1 at the class-1 GT location
    pred_scores[5, 0] = 3.0
    gt_boxes = np.array([[0.2, 0.2, 0.2, 0.2], [0.8, 0.8, 0.2, 0.2]], np.float32)
    gt_cls = np.array([1, 0])
    pi, gi = hungarian_match(pred_boxes, pred_scores, gt_boxes, gt_cls)
    pairs = dict(zip(gi.tolist(), pi.tolist()))
    assert pairs[0] == 2 and pairs[1] == 5


def test_detr_loss_gradients(model):
    from yolo_master_tpu.models.rtdetr import detr_loss_single, hungarian_match

    m, p = model
    x = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (1, 64, 64, 3)), jnp.float32)
    gt_b = jnp.asarray([[0.3, 0.3, 0.2, 0.2]], jnp.float32)
    gt_c = jnp.asarray([2], jnp.int32)

    preds0 = m.forward_train(p, x, Context(training=True))
    pi, gi = hungarian_match(np.asarray(preds0["dec_boxes"][-1][0]), np.asarray(preds0["dec_scores"][-1][0]),
                             np.asarray(gt_b), np.asarray(gt_c))

    def loss_fn(params):
        preds = m.forward_train(params, x, Context(training=True))
        total = 0.0
        for l in range(preds["dec_boxes"].shape[0]):  # per-decoder-layer supervision
            total = total + detr_loss_single(preds["dec_boxes"][l][0], preds["dec_scores"][l][0], gt_b, gt_c, pi, gi, nc=5)
        return total

    loss, grads = jax.value_and_grad(loss_fn)(p)
    assert bool(jnp.isfinite(loss)) and float(loss) > 0
    gn = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads))
    assert gn > 0
