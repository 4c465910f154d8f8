"""Multi-task model gates: build, param parity with reference summaries,
train-step smoke for seg/pose/obb/cls (reference analog: per-task CI train
smokes, SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import pytest

from yolo_master_tpu.engine.train_step import TrainState, make_optimizer, make_train_step
from yolo_master_tpu.nn.tasks import (
    ClassificationModel,
    OBBModel,
    PoseModel,
    SegmentationModel,
)


def trainable(tree):
    tot = 0

    def walk(n):
        nonlocal tot
        if isinstance(n, dict):
            for k, v in n.items():
                if k in ("mean", "var"):
                    continue
                walk(v)
        else:
            tot += n.size

    walk(tree)
    return tot


# reference summaries (torch parameters(); ours lacks the 16 frozen DFL weights)
REF_COUNTS = [
    (SegmentationModel, "yolo-master-seg-n", 80, 2_910_268 - 16),
    (PoseModel, "yolo-master-pose-n", 1, 2_888_042 - 16),
    (OBBModel, "yolo-master-obb-n", 80, 2_747_599 - 16),
    (ClassificationModel, "yolo-master-cls-n", 80, 2_193_692),
]


@pytest.mark.parametrize("cls_,name,nc,expected", REF_COUNTS)
def test_task_param_counts(cls_, name, nc, expected):
    m = cls_(name, nc=nc)
    assert trainable(m.init_params(0)) == expected


def _run_step(model, batch):
    p = model.init_params(0)
    tx = make_optimizer(0.01, params=p)
    state = TrainState(
        p, tx.init(p), jax.tree_util.tree_map(jnp.copy, p), jnp.zeros((), jnp.int32), jnp.zeros((), jnp.float32)
    )
    step = make_train_step(model, tx=tx)
    _, m = step(state, batch)
    assert float(m["finite"]) == 1.0
    assert all(jnp.isfinite(v) for v in m.values())
    return m


@pytest.fixture(scope="module")
def common_batch():
    B, M = 2, 4
    batch = {
        "boxes": jnp.zeros((B, M, 4)).at[0, 0].set(jnp.array([10.0, 10.0, 40.0, 40.0])),
        "classes": jnp.zeros((B, M), jnp.int32),
        "mask": jnp.zeros((B, M), bool).at[0, 0].set(True),
        "images": jnp.full((B, 64, 64, 3), 0.4),
    }
    return batch


def test_seg_train_step(common_batch):
    model = SegmentationModel("yolo-master-seg-n", nc=80)
    b = dict(common_batch)
    b["masks"] = jnp.zeros((2, 4, 16, 16)).at[0, 0, 3:10, 3:10].set(1.0)
    m = _run_step(model, b)
    assert float(m["seg_loss"]) > 0


def test_pose_train_step(common_batch):
    model = PoseModel("yolo-master-pose-n")
    b = dict(common_batch)
    b["keypoints"] = jnp.zeros((2, 4, 17, 3)).at[0, 0, :, :2].set(20.0).at[0, 0, :, 2].set(1.0)
    m = _run_step(model, b)
    assert float(m["pose_loss"]) > 0


def test_obb_train_step(common_batch):
    model = OBBModel("yolo-master-obb-n", nc=15)
    b = dict(common_batch)
    b.pop("boxes")
    b["rboxes"] = jnp.zeros((2, 4, 5)).at[0, 0].set(jnp.array([25.0, 25.0, 20.0, 12.0, 0.4]))
    m = _run_step(model, b)
    assert float(m["box_loss"]) > 0


def test_cls_train_step():
    model = ClassificationModel("yolo-master-cls-n", nc=10)
    b = {"images": jnp.full((2, 64, 64, 3), 0.4), "classes": jnp.zeros((2,), jnp.int32)}
    m = _run_step(model, b)
    assert 1.5 < float(m["cls_loss"]) < 3.5  # ~ln(10) at init


def test_decode_shapes():
    a = (64 // 8) ** 2 + (64 // 16) ** 2 + (64 // 32) ** 2
    from yolo_master_tpu.nn.module import Context

    for cls_, name, nc, extra in [
        (SegmentationModel, "yolo-master-seg-n", 80, 32),
        (PoseModel, "yolo-master-pose-n", 1, 51),
        (OBBModel, "yolo-master-obb-n", 15, 1),
    ]:
        m = cls_(name, nc=nc)
        p = m.init_params(0)
        dec = m.head.decode(m.forward_train(p, jnp.zeros((1, 64, 64, 3)), Context(training=False)))
        assert dec.shape == (1, a, 4 + nc + extra)
        assert bool(jnp.all(jnp.isfinite(dec)))
