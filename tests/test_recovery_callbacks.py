"""Recovery controller, callbacks, grad accumulation gates
(reference analogs: test_ddp_lifecycle_ema_nan.py, recovery suites)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolo_master_tpu.engine.recovery import TrainingRecoveryController
from yolo_master_tpu.engine.train_step import TrainState, make_optimizer, make_train_step
from yolo_master_tpu.nn.tasks import DetectionModel

MINI = {
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


def make_state(model, p, tx):
    # the jitted step donates its input state, so give it its own buffer copies
    p = jax.tree_util.tree_map(jnp.copy, p)
    return TrainState(p, tx.init(p), jax.tree_util.tree_map(jnp.copy, p), jnp.zeros((), jnp.int32), jnp.zeros((), jnp.float32))


def test_recovery_restores_healthy_state(tmp_path):
    model = DetectionModel(MINI)
    p = model.init_params(0)
    tx = make_optimizer(0.01, params=p)
    state = make_state(model, p, tx)
    rc = TrainingRecoveryController(model, str(tmp_path), smoke_imgsz=64)
    assert rc.refresh(state, epoch=0, metrics={"loss": 1.0})

    # poison the live state
    bad = state._replace(params=jax.tree_util.tree_map(lambda x: x * jnp.nan, state.params))
    restored, recovered = rc.maybe_recover(bad, {"loss": float("nan")})
    assert recovered
    leaf = jax.tree_util.tree_leaves(restored.params)[0]
    assert bool(jnp.all(jnp.isfinite(leaf)))

    # finite metrics -> no recovery
    _, rec2 = rc.maybe_recover(state, {"loss": 0.5})
    assert not rec2


def test_recovery_rejects_nan_checkpoint(tmp_path):
    model = DetectionModel(MINI)
    p = model.init_params(0)
    tx = make_optimizer(0.01, params=p)
    bad_state = make_state(model, jax.tree_util.tree_map(lambda x: x * jnp.nan, p), tx)
    rc = TrainingRecoveryController(model, str(tmp_path), smoke_imgsz=64, keep_on_disk=False)
    assert not rc.refresh(bad_state, epoch=0), "NaN weights must fail the forward smoke test"


def test_nonfinite_step_skips_update():
    model = DetectionModel(MINI)
    p = model.init_params(0)
    tx = make_optimizer(0.01, params=p)
    state = make_state(model, p, tx)
    step = make_train_step(model, tx=tx)
    batch = {
        "images": jnp.full((2, 64, 64, 3), jnp.nan),  # poisoned inputs -> NaN loss
        "boxes": jnp.zeros((2, 4, 4)),
        "classes": jnp.zeros((2, 4), jnp.int32),
        "mask": jnp.zeros((2, 4), bool),
    }
    new_state, m = step(state, batch)
    assert float(m["finite"]) == 0.0
    before = jax.tree_util.tree_leaves(p)[0]
    after = jax.tree_util.tree_leaves(new_state.params)[0]
    assert jnp.allclose(before, after), "non-finite step must not touch weights"


def test_grad_accumulation_matches_full_batch():
    model = DetectionModel(MINI)
    p = model.init_params(0)
    tx = make_optimizer(0.01, params=p)
    rng = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(rng.uniform(0, 1, (4, 64, 64, 3)), jnp.float32),
        "boxes": jnp.tile(jnp.asarray([[10.0, 10.0, 40.0, 40.0]]), (4, 4, 1)).reshape(4, 4, 4),
        "classes": jnp.zeros((4, 4), jnp.int32),
        "mask": jnp.ones((4, 4), bool),
    }
    s1, m1 = make_train_step(model, tx=tx, accumulate=1)(make_state(model, p, tx), batch)
    s2, m2 = make_train_step(model, tx=tx, accumulate=2)(make_state(model, p, tx), batch)
    # batch-size scaling makes losses differ by the micro-batch factor, but the
    # resulting updates must land close (loss ~ B * mean, grads averaged)
    l1 = jax.tree_util.tree_leaves(s1.params)
    l2 = jax.tree_util.tree_leaves(s2.params)
    diffs = [float(jnp.abs(a - b).max()) for a, b in zip(l1, l2)]
    assert max(diffs) < 5e-2, f"accumulated update diverges: {max(diffs)}"


def test_csv_logger(tmp_path):
    from yolo_master_tpu.utils.callbacks import default_callbacks

    reg = default_callbacks(str(tmp_path))
    reg.fire("on_fit_epoch_end", 0, {"loss": 1.5, "box_loss": 0.3})
    reg.fire("on_fit_epoch_end", 1, {"loss": 1.2, "box_loss": 0.2})
    text = (tmp_path / "results.csv").read_text().strip().splitlines()
    assert text[0].startswith("epoch") and len(text) == 3
