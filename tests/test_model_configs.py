"""Config gate: every model yaml must build and forward, with param counts
matching the torch reference exactly (reference analog:
tests/test_master_model_configs.py — every master YAML builds + forwards)."""

import jax
import jax.numpy as jnp
import pytest

from yolo_master_tpu.nn.module import Context
from yolo_master_tpu.nn.tasks import DetectionModel


def trainable(tree):
    tot = 0

    def walk(n):
        nonlocal tot
        if isinstance(n, dict):
            for k, v in n.items():
                # skip buffers: BN running stats + underscore-named persistent
                # buffers (e.g. the MoA global head's _rf_matrix) — torch's
                # parameters() count excludes buffers too
                if k in ("mean", "var") or k.startswith("_"):
                    continue
                walk(v)
        else:
            tot += n.size

    walk(tree)
    return tot


# expected = torch reference parameters() count (ours excludes the 16 frozen
# DFL weights for reg_max=16 heads; reg_max=1 heads have no DFL)
CONFIGS = [
    ("yolo-master-n", 2_694_364 - 16),
    ("yolo26-master-n", 5_115_336),
    ("yolo26-master-moa-mot-n", 2_908_922),
    ("yolo26-master-latent-n", 5_478_423),
    ("yolo-master-v0_10-n", 3_449_963 - 16),
    ("yolo-master-v0_1-n", 7_546_984 - 16),
    ("yolo-master-v0_3-n", 2_810_639 - 16),
    ("yolo-master-uomoe-n", 7_447_724 - 16),
    ("yolo-master-dymoe-n", None),  # legacy family: build/forward gate only
]


@pytest.mark.parametrize("name,expected", CONFIGS)
def test_config_builds_param_exact(name, expected):
    m = DetectionModel(name)
    p = m.init_params(0)
    if expected is not None:
        assert trainable(p) == expected


@pytest.mark.parametrize("name", [c[0] for c in CONFIGS[1:]])
def test_mixture_configs_forward_train_and_eval(name):
    m = DetectionModel(name)
    p = m.init_params(0)
    x = jnp.full((2, 64, 64, 3), 0.4)
    ctx = Context(training=True, step=50)
    preds = m.forward_train(p, x, ctx)
    assert len(ctx.aux) > 0, "mixture blocks must publish aux losses in training"
    assert bool(jnp.isfinite(ctx.total_aux()))
    dec = m.head.decode(preds)
    assert bool(jnp.all(jnp.isfinite(dec)))
    # eval path
    dec_eval = m.forward_predict(p, x)
    assert bool(jnp.all(jnp.isfinite(dec_eval)))


def test_progressive_sparsity_schedule():
    """OptimizedMOEImproved adaptive top-k anneals E -> top_k over warmup."""
    from yolo_master_tpu.nn.moe.mixtures import OptimizedMOEImproved

    moe = OptimizedMOEImproved(32, 32, num_experts=4, top_k=2, warmup_steps=100)
    moe.finalize("moe")
    for step, expected in [(0, 4), (50, 3), (99, 2), (1000, 2)]:
        k = moe._adaptive_top_k(Context(training=True, step=step))
        assert int(k) == expected, f"step {step}: {int(k)} != {expected}"
    assert moe._adaptive_top_k(Context(training=False)) == 2
