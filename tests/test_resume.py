"""Resume e2e gate (VERDICT r4 next #3): interrupt training at the midpoint,
resume from the orbax state checkpoint, and the final weights / EMA /
optimizer state must be BITWISE-equal to an uninterrupted run — the analog of
the reference's first-class resume restoring optimizer/EMA/epoch
(reference engine/trainer.py resume path + check_resume).

First tests anywhere to execute save_train_state -> load_train_state
(utils/checkpoint.py:63-78) and the trainer resume branch (engine/trainer.py).
Includes a mesh-sharded variant and the loader-length-change case (the
``step // nb_opt`` epoch derivation the explicit state_meta.json now guards).
"""

import json
from pathlib import Path

import numpy as np
import pytest

import jax

from test_train import synth_dataset  # noqa: F401 (fixture reuse)
from yolo_master_tpu.nn.tasks import DetectionModel

# small but real: Conv stack + one routed block, same shape family as the
# dp-equality gate
CFG = {
    "nc": 2,
    "backbone": [
        [-1, 1, "Conv", [8, 3, 2]],
        [-1, 1, "Conv", [16, 3, 2]],
        [-1, 1, "ES_MOE", [16]],
    ],
    "head": [[[2], 1, "Detect", ["nc"]]],
}

# deterministic trainer config: no mosaic-close flip, no moe-gain scheduling,
# synchronous loader (workers=0), fixed shuffle seeds
COMMON = dict(
    batch=8,
    imgsz=96,
    max_gt=8,
    optimizer="SGD",
    warmup_epochs=0,
    lr0=0.02,
    nbs=8,  # no accumulation
    amp=False,
    hyp={"mosaic": 0.0},
    patience=1000,
    val=False,
    close_mosaic=0,
    moe_schedule=None,
    workers=0,
    seed=0,
)


def _make_trainer(synth_dataset, save_dir, epochs, resume=False, mesh=None, **over):
    from yolo_master_tpu.engine.trainer import DetectionTrainer

    class Stub:
        pass

    model = DetectionModel(CFG)
    yolo = Stub()
    yolo.model = model
    yolo.params = model.init_params(0)
    kw = {**COMMON, **over}
    return DetectionTrainer(
        yolo, data=synth_dataset, epochs=epochs, save_dir=str(save_dir),
        resume=resume, mesh=mesh, save_period=2, **kw,
    )


def _flat(tree):
    return {jax.tree_util.keystr(p): np.asarray(x) for p, x in jax.tree_util.tree_leaves_with_path(tree)}


def _assert_state_equal(a, b, what):
    fa, fb = _flat(a), _flat(b)
    assert set(fa) == set(fb)
    for k in fa:
        np.testing.assert_array_equal(fa[k], fb[k], err_msg=f"{what} diverges at {k}")


@pytest.mark.parametrize("sharded", [False, True], ids=["single", "mesh8"])
def test_resume_equals_uninterrupted(synth_dataset, tmp_path, sharded):
    """2 epochs + save -> resume -> 4 epochs  ==  4 uninterrupted epochs,
    bitwise on params, EMA, opt_state, and step counters."""
    mesh = None
    if sharded:
        from yolo_master_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(8, axes=("data",))

    full = _make_trainer(synth_dataset, tmp_path / "full", epochs=4, mesh=mesh)
    full.train()

    # genuine interruption: SAME 4-epoch config (so the LR decay horizon
    # matches), killed right after the epoch-2 state save
    part = _make_trainer(synth_dataset, tmp_path / "resume", epochs=4, mesh=mesh)
    orig_fire = part.callbacks.fire

    def fire(event, *a):
        orig_fire(event, *a)
        if event == "on_fit_epoch_end" and a[0] == 2:
            raise KeyboardInterrupt("simulated crash mid-epoch-3")

    part.callbacks.fire = fire
    with pytest.raises(KeyboardInterrupt):
        part.train()
    assert (tmp_path / "resume" / "state").exists(), "save_period=2 must have saved the state"
    assert (tmp_path / "resume" / "state_meta.json").exists()

    resumed = _make_trainer(synth_dataset, tmp_path / "resume", epochs=4, resume=True, mesh=mesh)
    assert resumed.start_epoch == 2, f"resume must continue at epoch 2, got {resumed.start_epoch}"
    resumed.train()

    assert int(resumed.state.step) == int(full.state.step), "step counter must match uninterrupted run"
    _assert_state_equal(resumed.state.params, full.state.params, "params")
    _assert_state_equal(resumed.state.ema_params, full.state.ema_params, "EMA")
    _assert_state_equal(resumed.state.opt_state, full.state.opt_state, "opt_state")
    assert float(resumed.state.ema_updates) == float(full.state.ema_updates)


def test_resume_survives_loader_length_change(synth_dataset, tmp_path):
    """Resuming with a different batch size changes nb_opt; the explicit
    state_meta.json epoch record must keep start_epoch correct where the
    step//nb_opt fallback would misalign."""
    part = _make_trainer(synth_dataset, tmp_path / "run", epochs=2)
    part.train()
    nb_opt_orig = part.nb_opt

    # nb_opt = n_train/nbs (batch cancels: nb/accumulate = (n/batch)/(nbs/batch)),
    # so a genuine loader-length change needs a different nbs: 16/4 = 4 != 16/8 = 2
    resumed = _make_trainer(synth_dataset, tmp_path / "run", epochs=4, resume=True, batch=4, nbs=4)
    assert resumed.nb_opt != nb_opt_orig, "test needs a genuine loader-length change"
    assert resumed.start_epoch == 2, (
        f"start_epoch {resumed.start_epoch} != 2: epoch derivation broke under loader-length change"
    )
    # the stale derivation would have produced a different (wrong) epoch
    meta = json.loads((tmp_path / "run" / "state_meta.json").read_text())
    derived = int(resumed.state.step) // max(resumed.nb_opt, 1)
    assert meta["epoch"] == 2
    if derived != 2:
        # documents exactly the failure mode the meta file fixes
        assert resumed.start_epoch != derived


def test_train_state_roundtrip_bitwise(tmp_path):
    """save_train_state -> load_train_state is a bitwise identity on a
    freshly-trained state (params + opt_state incl. int counters)."""
    from yolo_master_tpu.engine.train_step import make_optimizer, make_train_state, make_train_step
    from yolo_master_tpu.utils.checkpoint import load_train_state, save_train_state

    model = DetectionModel(CFG)
    tx = make_optimizer(0.01, params=model.init_params(0))
    state = make_train_state(model, seed=0, tx=tx)
    step = make_train_step(model, tx=tx, imgsz=64, batch_per_step=4, max_gt=4)
    rng = np.random.default_rng(0)
    batch = {
        "images": rng.random((4, 64, 64, 3)).astype(np.float32),
        "boxes": rng.uniform(4, 60, (4, 4, 4)).astype(np.float32),
        "classes": rng.integers(0, 2, (4, 4)).astype(np.int32),
        "mask": np.ones((4, 4), bool),
    }
    state, _ = step(state, {k: jax.numpy.asarray(v) for k, v in batch.items()})

    path = tmp_path / "state"
    save_train_state(state, str(path))
    template = make_train_state(model, seed=1, tx=tx)  # different values, same structure
    restored = load_train_state(str(path), template)
    assert int(restored.step) == int(state.step) == 1
    _assert_state_equal(restored.params, state.params, "params")
    _assert_state_equal(restored.ema_params, state.ema_params, "EMA")
    _assert_state_equal(restored.opt_state, state.opt_state, "opt_state")
