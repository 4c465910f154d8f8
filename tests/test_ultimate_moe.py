"""Ultra/Ultimate MoE line + DyMoE legacy blocks (VERDICT r1 rows 20/22/33)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_master_tpu.nn.module import Context
from yolo_master_tpu.nn.moe.dynamic import DyC2f, DyMoEBlock
from yolo_master_tpu.nn.moe.ultimate import (
    AdaptiveBalanceController,
    AdaptiveCapacityMoE,
    AdvancedRoutingLayer,
    HyperUltimateMoE,
    UltimateOptimizedMoE,
    UltraEfficientRouter,
    UltraOptimizedMoE,
)

KEY = jax.random.PRNGKey(0)
X = jax.random.normal(KEY, (2, 16, 16, 32))


@pytest.mark.parametrize("cls", [UltraOptimizedMoE, AdaptiveCapacityMoE, HyperUltimateMoE, UltimateOptimizedMoE])
def test_forward_train_eval_and_grads(cls):
    m = cls(32, 32, num_experts=4, top_k=2).finalize("m")
    p = m.init(KEY)
    ctx = Context(training=True, step=10)
    y = m(p, X, ctx)
    assert y.shape == X.shape
    assert ctx.aux and jnp.isfinite(ctx.total_aux())
    assert "m" in ctx.stats and ctx.stats["m"]["expert_usage"].shape == (4,)

    ye = m(p, X, Context(training=False))
    assert jnp.isfinite(ye).all()

    def loss(p):
        c = Context(training=True, step=10)
        return jnp.sum(m(p, X, c) ** 2) * 1e-3 + c.total_aux()

    g = jax.grad(loss)(p)
    flat = jax.tree_util.tree_leaves(g)
    assert all(jnp.isfinite(l).all() for l in flat)
    # router gets gradient through the balance loss
    router_g = jax.tree_util.tree_leaves(g["routing"])
    assert any(float(jnp.abs(l).max()) > 0 for l in router_g)


def test_progressive_sparsity_schedule():
    m = HyperUltimateMoE(32, 32, num_experts=4, top_k=1, warmup_steps=100).finalize("m")
    assert int(m._adaptive_top_k(Context(training=True, step=0))) == 4
    assert int(m._adaptive_top_k(Context(training=True, step=50))) >= 2
    assert int(m._adaptive_top_k(Context(training=True, step=1000))) == 1
    assert m._adaptive_top_k(Context(training=False)) == 1


def test_ultimate_temperature_anneal():
    m = UltimateOptimizedMoE(32, 32, num_experts=4, top_k=2, warmup_steps=100).finalize("m")
    t0 = float(m._temperature(Context(training=True, step=0)))
    t1 = float(m._temperature(Context(training=True, step=1000)))
    assert t0 == pytest.approx(2.0) and t1 == pytest.approx(0.5)


def test_adaptive_capacity_scales_expert_path():
    m = AdaptiveCapacityMoE(32, 32, num_experts=4, top_k=2, capacity_factor=2.0).finalize("m")
    p = m.init(KEY)
    y = m(p, X, Context(training=False))
    # zero the complexity head bias+weight -> sigmoid(0)=0.5 -> scale=1 -> same
    p2 = jax.tree_util.tree_map(jnp.copy, p)
    p2["complexity_estimator"]["w"] = jnp.zeros_like(p2["complexity_estimator"]["w"])
    p2["complexity_estimator"]["b"] = jnp.full_like(p2["complexity_estimator"]["b"], 5.0)
    y2 = m(p2, X, Context(training=False))
    # strongly-positive complexity -> scale ~2 -> different output
    assert float(jnp.abs(y2 - y).max()) > 1e-5


def test_routers_logits_shape():
    for cls, kw in [(UltraEfficientRouter, {}), (AdvancedRoutingLayer, {})]:
        r = cls(32, 4, **kw).finalize("r")
        p = r.init(KEY)
        lg = r.logits(p, X, Context(training=False))
        assert lg.shape == (2, 4) and jnp.isfinite(lg).all()


def test_balance_controller_decay_and_entropy():
    c = AdaptiveBalanceController(4, initial_coeff=1.0, final_coeff=0.1, decay_steps=100).finalize("c")
    p = c.init(KEY)
    stats = {"expert_usage": jnp.asarray([0.97, 0.01, 0.01, 0.01])}
    early = float(c(p, stats, Context(step=0)))
    late = float(c(p, stats, Context(step=1000)))
    balanced = float(c(p, {"expert_usage": jnp.full((4,), 0.25)}, Context(step=0)))
    assert early > late > 0
    assert early > balanced  # collapse is penalized harder


def test_dymoe_blocks():
    m = DyMoEBlock(32, num_experts=4, top_k=2).finalize("m")
    p = m.init(KEY)
    ctx = Context(training=True, step=3)
    y = m(p, X, ctx)
    assert y.shape == X.shape and ctx.aux

    c2f = DyC2f(32, 32, n=2).finalize("dy")
    pc = c2f.init(KEY)
    ctx = Context(training=True, step=3)
    y = c2f(pc, X, ctx)
    assert y.shape == X.shape and len(ctx.aux) == 2


def test_registry_parses_new_blocks():
    from yolo_master_tpu.nn.tasks import DetectionModel

    cfg = {
        "nc": 2,
        "backbone": [
            [-1, 1, "Conv", [16, 3, 2]],
            [-1, 1, "UltraOptimizedMoE", [16, 4, 2]],
            [-1, 1, "Conv", [32, 3, 2]],
            [-1, 1, "HyperUltimateMoE", [32, 4, 2]],
            [-1, 1, "Conv", [32, 3, 2]],
            [-1, 2, "DyC2f", [32, 4, 2]],
            [-1, 1, "Conv", [32, 3, 2]],
            [-1, 1, "UltimateOptimizedMoE", [32, 4, 2]],
            [-1, 1, "Conv", [32, 3, 2]],
            [-1, 1, "AdaptiveCapacityMoE", [32, 4, 2]],
        ],
        "head": [[[5, 7, 9], 1, "Detect", ["nc"]]],
    }
    model = DetectionModel(cfg)
    params = model.init_params(0)
    x = jnp.zeros((1, 64, 64, 3))
    ctx = Context(training=True, step=0)
    preds = model.forward_train(params, x, ctx)
    assert len(ctx.aux) >= 4  # one aux per routed block (DyC2f publishes 2)
