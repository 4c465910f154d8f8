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


def test_integration_callbacks_fanout(tmp_path, monkeypatch):
    """W&B/MLflow adapters attach when their packages import (faked here) and
    degrade to no-ops when absent (reference add_integration_callbacks)."""
    import sys
    import types

    logged = {}

    fake_wandb = types.ModuleType("wandb")

    class _Run:
        def log(self, d, step=None):
            logged.setdefault("wandb", []).append((step, d))

        def finish(self):
            logged["wandb_done"] = True

    fake_wandb.init = lambda **kw: _Run()
    fake_mlflow = types.ModuleType("mlflow")
    fake_mlflow.set_experiment = lambda name: None
    fake_mlflow.start_run = lambda: object()
    fake_mlflow.log_metrics = lambda m, step=None: logged.setdefault("mlflow", []).append((step, m))
    fake_mlflow.end_run = lambda: logged.__setitem__("mlflow_done", True)
    monkeypatch.setitem(sys.modules, "wandb", fake_wandb)
    monkeypatch.setitem(sys.modules, "mlflow", fake_mlflow)

    from yolo_master_tpu.utils.callbacks import default_callbacks

    reg = default_callbacks(str(tmp_path), integrations=("wandb", "mlflow", "console"))
    reg.fire("on_fit_epoch_end", 3, {"loss": 1.5, "mAP50(B)": 0.2})
    reg.fire("on_train_end")
    assert logged["wandb"][0][0] == 3 and logged["wandb"][0][1]["loss"] == 1.5
    assert logged["mlflow"][0][1]["mAP50B"] == 0.2  # parens stripped for mlflow key rules
    assert logged.get("wandb_done") and logged.get("mlflow_done")

    # absent package -> silently skipped
    monkeypatch.delitem(sys.modules, "wandb")
    monkeypatch.setattr("builtins.__import__", __import__)
    reg2 = default_callbacks(str(tmp_path / "b"), integrations=("wandb",))
    reg2.fire("on_fit_epoch_end", 0, {"loss": 1.0})  # must not raise


def test_routing_dashboard_html(tmp_path):
    import numpy as np

    from yolo_master_tpu.nn.moe.analysis import RoutingHistory, render_dashboard

    h = RoutingHistory(str(tmp_path))
    h.record(0, {"layers.4.moe": np.array([5, 3, 1, 1])})
    h.record(1, {"layers.4.moe": np.array([19, 1, 0, 0])})
    html = open(render_dashboard(h)).read()
    assert "layers.4.moe" in html and "collapsed" in html and "gini" in html
    # csv round-trip renders identically
    html2 = open(render_dashboard(h.save())).read()
    assert "layers.4.moe" in html2
