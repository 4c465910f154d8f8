"""Model graph build gates (reference analog: tests/test_master_model_configs.py)."""

import jax
import jax.numpy as jnp
import pytest

from yolo_master_tpu.nn.module import Context, apply_updates
from yolo_master_tpu.nn.tasks import DetectionModel


def count_trainable(tree):
    tot = 0

    def walk(node):
        nonlocal tot
        if isinstance(node, dict):
            for k, v in node.items():
                if k in ("mean", "var"):
                    continue
                walk(v)
        else:
            tot += node.size

    walk(tree)
    return tot


@pytest.fixture(scope="module")
def model_n():
    return DetectionModel("yolo-master-n")


@pytest.fixture(scope="module")
def params_n(model_n):
    return model_n.init_params(0)


def test_param_count_matches_reference(model_n, params_n):
    # reference summary: 2,694,364 params (cfg/models/master/v0/det/yolo-master-n.yaml:7)
    # minus the 16 frozen DFL projection weights (ours is a pure function)
    assert count_trainable(params_n) == 2_694_364 - 16


def test_strides(model_n):
    assert model_n.head_strides == (8, 16, 32)


def test_forward_decode_shapes(model_n, params_n):
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    y = model_n.forward_predict(params_n, x)
    a = (64 // 8) ** 2 + (64 // 16) ** 2 + (64 // 32) ** 2
    assert y.shape == (2, a, 4 + 80)
    assert bool(jnp.all(jnp.isfinite(y)))


def test_train_forward_collects_aux_and_bn_updates(model_n, params_n):
    x = jnp.ones((2, 64, 64, 3), jnp.float32)
    ctx = Context(training=True)
    preds = model_n.forward_train(params_n, x, ctx)
    assert "one2many" in preds
    # 4 ES_MOE blocks publish one balance loss each
    assert len(ctx.aux) == 4
    total = ctx.total_aux()
    assert bool(jnp.isfinite(total))
    # every BatchNorm must emit a running-stat update
    assert len(ctx.updates) > 50
    new_params = apply_updates(params_n, ctx.updates)
    assert count_trainable(new_params) == count_trainable(params_n)


def test_scales_build():
    for s in ("n", "s"):
        m = DetectionModel(f"yolo-master-{s}")
        assert m.head_strides == (8, 16, 32)
