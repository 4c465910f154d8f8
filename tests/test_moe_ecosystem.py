"""MoE ecosystem gates: pruning surgery, schedulers, collapse detection,
quantization, CW-NMS, Sparse SAHI (reference analogs: tests/test_moe.py,
moe pruning/scheduler suites)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolo_master_tpu.nn.module import Context
from yolo_master_tpu.nn.tasks import DetectionModel

MINI = {
    "nc": 2,
    "backbone": [
        [-1, 1, "Conv", [16, 3, 2]],
        [-1, 1, "Conv", [32, 3, 2]],
        [-1, 1, "ES_MOE", [32, 4, 8, 2]],  # c2, num_experts, reduction, top_k
        [-1, 1, "Conv", [32, 3, 2]],
        [-1, 1, "Conv", [32, 3, 2]],
        [-1, 1, "Conv", [32, 3, 2]],
    ],
    "head": [[[3, 4, 5], 1, "Detect", ["nc"]]],
}


@pytest.fixture(scope="module")
def mini_model():
    m = DetectionModel(MINI)
    return m, m.init_params(0)


def test_prune_es_moe(mini_model):
    from yolo_master_tpu.nn.moe.pruning import prune_moe_model

    model, params = mini_model
    moe_path = next(s.module.path for s in model.specs if s.type_name == "ES_MOE")
    usage = {moe_path: np.array([0.5, 0.45, 0.04, 0.01])}
    x = jnp.full((1, 64, 64, 3), 0.4)
    before = model.forward_predict(params, x)
    model, new_params = prune_moe_model(model, params, usage, threshold=0.15)
    moe = next(s.module for s in model.specs if s.type_name == "ES_MOE")
    assert moe.num_experts == 2
    after = model.forward_predict(new_params, x)
    assert after.shape == before.shape
    assert bool(jnp.all(jnp.isfinite(after)))


def test_gini_and_schedulers():
    from yolo_master_tpu.nn.moe.scheduler import GiniBalanceScheduler, MapSaturationScheduler, compute_gini

    assert compute_gini(np.array([0.25, 0.25, 0.25, 0.25])) < 0.01
    assert compute_gini(np.array([1.0, 0.0, 0.0, 0.0])) > 0.7

    g = GiniBalanceScheduler(base_gain=0.01)
    up = g.update({"b": np.array([0.97, 0.01, 0.01, 0.01])})
    assert up > 0.01
    down = GiniBalanceScheduler(base_gain=0.01).update({"b": np.array([0.25, 0.25, 0.25, 0.25])})
    assert down < 0.01

    m = MapSaturationScheduler(base_gain=0.1, patience=2)
    assert m.update(0.3) == 0.1  # improvement
    m.update(0.3)
    assert m.update(0.3) < 0.1  # plateau -> decay


def test_collapse_detector_and_tracker():
    from yolo_master_tpu.nn.moe.analysis import ExpertUsageTracker, RoutingCollapseDetector

    t = ExpertUsageTracker()
    t.update({"block_a": {"expert_usage": np.array([0.9, 0.05, 0.05])}})
    t.update({"block_a": {"expert_usage": np.array([0.94, 0.03, 0.03])}})
    mean = t.mean_usage()["block_a"]
    assert abs(mean[0] - 0.92) < 1e-6
    findings = RoutingCollapseDetector(max_share_threshold=0.9).check(t.mean_usage())
    assert findings and findings[0]["block"] == "block_a"


def test_router_aware_quantization(mini_model):
    from yolo_master_tpu.nn.moe.quantize import dequantize_params, quantization_report, quantize_params

    model, params = mini_model
    q = quantize_params(params, min_size=128)
    rep = quantization_report(params, q)
    assert rep["quantized_tensors"] > 0
    assert rep["ratio"] < 0.7

    # router weights stay full precision
    def routers_unquantized(node, path=()):
        if isinstance(node, dict):
            if "q" in node and "scale" in node:
                assert not any(s in ("routing", "fc1", "fc2") for s in path), path
                return
            for k, v in node.items():
                routers_unquantized(v, path + (k,))

    routers_unquantized(q)

    deq = dequantize_params(q)
    x = jnp.full((1, 64, 64, 3), 0.4)
    y0 = model.forward_predict(params, x)
    y1 = model.forward_predict(deq, x)
    # int8 weight quantization error stays moderate on scores
    assert float(jnp.abs(y0[..., 4:] - y1[..., 4:]).max()) < 0.2


def test_cw_nms_fuses_cluster():
    from yolo_master_tpu.ops.nms import cluster_weighted_nms

    pred = np.zeros((1, 8, 4 + 2), np.float32)
    pred[0, 0, :4] = [100, 100, 50, 50]
    pred[0, 0, 4] = 0.9
    pred[0, 1, :4] = [104, 104, 50, 50]
    pred[0, 1, 4] = 0.6
    out = cluster_weighted_nms(jnp.asarray(pred), nc=2, conf_thres=0.25, iou_thres=0.45, max_det=4, max_nms=8)
    assert int(out["valid"][0].sum()) == 1
    box = np.asarray(out["boxes"][0, 0])
    # fused box sits between the two members, closer to the stronger one
    assert 75 < box[0] < 79


def test_sparse_sahi_skips_blank_tiles(mini_model):
    from yolo_master_tpu.engine.sahi import SparseSAHIPredictor, tile_grid

    tiles = tile_grid(1280, 1920, 640, 0.2)
    assert all(x + 640 <= 1920 and y + 640 <= 1280 for x, y in tiles)

    model, params = mini_model
    img = np.full((1280, 1920, 3), 114, np.uint8)
    pred = SparseSAHIPredictor(model, params, imgsz=64, slice_size=640, objectness_threshold=0.9)
    res = pred(img)
    assert pred.last_stats["tiles"] == len(tiles)
    assert pred.last_stats["skip_ratio"] == 1.0  # random model scores < 0.9 -> all skipped
    assert res.orig_shape == (1280, 1920)


def test_mixture_aux_composition():
    """Per-family gains + EMA normalization + budget + non-finite isolation
    (reference nn/mixture_loss.py CompositeCriterion)."""
    import jax.numpy as jnp

    from yolo_master_tpu.nn.mixture_loss import FAMILIES, compose_aux, init_aux_ema
    from yolo_master_tpu.nn.module import Context

    ctx = Context(training=True)
    ctx.add_aux("m.1", jnp.asarray(4.0), family="moe")
    ctx.add_aux("m.2", jnp.asarray(2.0), family="moa")
    ctx.add_aux("m.3", jnp.asarray(jnp.nan), family="mot")  # must be isolated

    ema = init_aux_ema()
    total, new_ema, metrics = compose_aux(ctx, {"moe": 0.01, "moa": 0.05}, ema)
    assert jnp.isfinite(total), "non-finite family must not poison the total"
    assert float(metrics["aux_isolated"]) == 1.0
    # moa uses its own gain, not the moe default
    assert float(metrics["aux_moa"]) != float(metrics["aux_moe"])
    # EMA moved toward the observed magnitudes for active families only
    i_moe, i_mot = FAMILIES.index("moe"), FAMILIES.index("mot")
    assert float(new_ema[i_moe]) != 1.0 and float(new_ema[i_mot]) == 1.0

    # budget caps the composed total
    big, _, _ = compose_aux(ctx, {"moe": 100.0}, ema, budget=0.5)
    assert abs(float(big)) <= 0.5 + 1e-6


def test_train_step_composes_families():
    """The jitted step consumes TrainState.aux_ema and reports per-family aux."""
    import jax
    import jax.numpy as jnp

    from yolo_master_tpu.engine.train_step import make_optimizer, make_train_state, make_train_step
    from yolo_master_tpu.nn.tasks import DetectionModel

    cfg = {
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
    m = DetectionModel(cfg)
    tx = make_optimizer(0.01, params=m.init_params(0))
    state = make_train_state(m, seed=0, tx=tx)
    step = make_train_step(m, tx=tx, imgsz=64, batch_per_step=2, max_gt=4)
    batch = {
        "images": jnp.zeros((2, 64, 64, 3)),
        "boxes": jnp.zeros((2, 4, 4)),
        "classes": jnp.zeros((2, 4), jnp.int32),
        "mask": jnp.zeros((2, 4), bool),
    }
    state, metrics = step(state, batch)
    assert "aux_moe" in metrics and jnp.isfinite(metrics["loss"])
    assert state.aux_ema is not None and float(state.aux_ema[0]) != 1.0


def test_new_router_family_contract():
    """UltraEfficient/EfficientSpatial/AdvancedRouting (reference routers.py:
    60,251,355): weights sum to 1, exactly top-k nonzero, legacy channel
    adaptation works, train noise only perturbs in training mode."""
    import jax
    import jax.numpy as jnp

    from yolo_master_tpu.nn.module import Context
    from yolo_master_tpu.nn.moe.routers import (
        AdvancedRoutingLayer, EfficientSpatialRouter, UltraEfficientRouter,
    )

    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 16))
    for cls, kw in ((UltraEfficientRouter, {"top_k": 2}), (EfficientSpatialRouter, {"top_k": 2})):
        r = cls(16, 8, **kw).finalize("r")
        p = r.init(jax.random.PRNGKey(1))
        w, logits = r(p, x, Context(training=False))
        assert w.shape == (2, 8) and logits.shape == (2, 8)
        assert jnp.allclose(w.sum(-1), 1.0, atol=1e-5)
        assert int((w[0] > 0).sum()) == 2, f"{cls.__name__} must route top-2"
        w_tr, _ = r(p, x, Context(training=True, step=3))
        assert not jnp.allclose(w, w_tr), "train noise must perturb routing"

    r = AdvancedRoutingLayer(64, 3).finalize("r")
    p = r.init(jax.random.PRNGKey(2))
    w, _ = r(p, x, Context(training=False))  # 16 channels -> zero-pad to 64
    assert w.shape == (2, 3) and jnp.allclose(w.sum(-1), 1.0, atol=1e-5)
    assert int((w[0] > 0).sum()) == 3, "dense (no top_k) keeps all experts"
