"""Semantic segmentation, distillation, and tuner gates."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolo_master_tpu.nn.module import Context
from yolo_master_tpu.nn.tasks import DetectionModel, SemanticSegmentationModel

SEM_CFG = {
    "nc": 5,
    "backbone": [
        [-1, 1, "Conv", [16, 3, 2]],
        [-1, 1, "Conv", [32, 3, 2]],
        [-1, 1, "C3k2", [32, False, 0.25]],
        [-1, 1, "Conv", [64, 3, 2]],
        [-1, 1, "C3k2", [64, True]],
        [-1, 1, "Conv", [64, 3, 2]],
    ],
    "head": [
        [-1, 1, "Upsample", [None, 2, "nearest"]],
        [[-1, 4], 1, "Concat", [1]],
        [-1, 1, "C3k2", [64, True]],
        [[8, 5], 1, "SemanticSegment", ["nc"]],
    ],
}

DET_CFG = {
    "nc": 2,
    "backbone": [
        [-1, 1, "Conv", [16, 3, 2]],
        [-1, 1, "Conv", [32, 3, 2]],
        [-1, 1, "Conv", [32, 3, 2]],
        [-1, 1, "Conv", [32, 3, 2]],
        [-1, 1, "Conv", [32, 3, 2]],
    ],
    "head": [[[2, 3, 4], 1, "Detect", ["nc"]]],
}


def test_semantic_train_and_decode():
    from yolo_master_tpu.engine.train_step import TrainState, make_optimizer, make_train_step

    m = SemanticSegmentationModel(SEM_CFG)
    p = m.init_params(0)
    dec = m.forward_predict(p, jnp.full((1, 64, 64, 3), 0.4))
    assert dec.shape == (1, 64, 64, 5)
    tx = make_optimizer(0.01, params=p)
    state = TrainState(p, tx.init(p), jax.tree_util.tree_map(jnp.copy, p), jnp.zeros((), jnp.int32), jnp.zeros((), jnp.float32))
    step = make_train_step(m, tx=tx)
    batch = {
        "images": jnp.full((2, 64, 64, 3), 0.4),
        "sem_mask": jnp.zeros((2, 64, 64), jnp.int32).at[:, 8:32, 8:32].set(2),
    }
    _, metrics = step(state, batch)
    assert float(metrics["finite"]) == 1.0 and float(metrics["seg_loss"]) > 0


def test_distillation_losses_decrease_toward_teacher():
    from yolo_master_tpu.engine.distill import DistillationModel

    teacher = DetectionModel(DET_CFG)
    tp = teacher.init_params(1)
    student = DetectionModel(DET_CFG)
    sp = student.init_params(2)
    dm = DistillationModel(student, sp, teacher, tp)
    x = jnp.full((1, 64, 64, 3), 0.4)
    loss0, parts = dm.distill_losses(sp, x, Context(training=True))
    assert float(loss0) > 0 and jnp.isfinite(loss0)
    # identical weights + eval-mode BN (matching the teacher) -> near-zero loss
    loss_same, _ = dm.distill_losses(tp, x, Context(training=False))
    assert float(loss_same) < 1e-5, f"identity distill loss should vanish, got {float(loss_same)}"

    # gradient descent on the distill loss moves the student toward the teacher
    g = jax.grad(lambda p: dm.distill_losses(p, x, Context(training=True))[0])(sp)
    gn = sum(float(jnp.abs(v).sum()) for v in jax.tree_util.tree_leaves(g))
    assert gn > 0


def test_tuner_improves_objective(tmp_path):
    from yolo_master_tpu.engine.tuner import Tuner

    # toy objective: peak at lr0 = 0.03, mosaic = 0.2
    def objective(hyp):
        return -((hyp["lr0"] - 0.03) ** 2) * 1000 - (hyp["mosaic"] - 0.2) ** 2

    t = Tuner(objective, save_dir=str(tmp_path), seed=0)
    best = t(iterations=30)
    default_fit = objective(t._default_hyp())
    best_fit = max(f for f, _ in t.history)
    assert best_fit > default_fit, "evolution must beat the default hyp"
    assert (tmp_path / "tune_results.csv").exists()
