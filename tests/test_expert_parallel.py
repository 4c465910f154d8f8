"""Expert-parallel correctness gate (VERDICT r2 item 3).

The REAL model's ES_MOE expert banks are sharded over an ('data', 'expert')
mesh inside make_train_step (not a toy einsum): one EP×DP train step must
produce the same weights/loss as the unsharded single-device step on the same
batch. Also checks the EP dense forward equals the masked-dense loop exactly
enough (kernel zero-padding is conv-exact; only summation order differs).
"""

import numpy as np

import jax
import jax.numpy as jnp

from yolo_master_tpu.engine.train_step import make_optimizer, make_train_state, make_train_step
from yolo_master_tpu.nn.module import Context
from yolo_master_tpu.nn.tasks import DetectionModel
from yolo_master_tpu.parallel.mesh import make_mesh

CFG = {
    "nc": 2,
    "backbone": [
        [-1, 1, "Conv", [8, 3, 2]],
        [-1, 1, "Conv", [16, 3, 2]],
        [-1, 1, "ES_MOE", [16, 16, 4]],  # (c2=16, num_experts=16, reduction=4)
    ],
    "head": [[[2], 1, "Detect", ["nc"]]],
}

# Multi-scale routed topology (VERDICT r4 next #9): TWO ES_MOE blocks at TWO
# pyramid scales plus the PAN save-list wiring (Upsample + Concat) and a
# 2-scale Detect — the smallest config whose EP sharding exercises expert
# banks of different channel widths and spatial sizes in one step. Kept
# separate from CFG so cold rigs still have the 3-layer fast gate.
CFG_DEEP = {
    "nc": 2,
    "backbone": [
        [-1, 1, "Conv", [8, 3, 2]],        # 0  /2
        [-1, 1, "Conv", [16, 3, 2]],       # 1  /4 (P2)
        [-1, 1, "ES_MOE", [16, 4, 4]],     # 2  4 experts @ /4
        [-1, 1, "Conv", [24, 3, 2]],       # 3  /8 (P3)
        [-1, 1, "ES_MOE", [24, 4, 4]],     # 4  4 experts @ /8
    ],
    "head": [
        [-1, 1, "Upsample", [None, 2, "nearest"]],  # 5
        [[-1, 2], 1, "Concat", [1]],                # 6  cat P2
        [-1, 1, "Conv", [16, 3, 1]],                # 7  P2 out
        [-1, 1, "Conv", [16, 3, 2]],                # 8  down
        [[-1, 4], 1, "Concat", [1]],                # 9  cat P3
        [-1, 1, "Conv", [24, 3, 1]],                # 10 P3 out
        [[7, 10], 1, "Detect", ["nc"]],             # 11
    ],
}


def _batch(n):
    rng = np.random.default_rng(0)
    return {
        "images": jnp.asarray(rng.random((n, 64, 64, 3)), jnp.float32),
        "boxes": jnp.asarray(rng.uniform(4, 60, (n, 4, 4)).astype(np.float32)),
        "classes": jnp.asarray(rng.integers(0, 2, (n, 4)), jnp.int32),
        "mask": jnp.ones((n, 4), bool),
    }


def test_ep_forward_equals_dense_loop():
    """EP dense dispatch == masked-dense loop on the same params/input."""
    model = DetectionModel(CFG)
    params = model.init_params(0)
    x = jnp.asarray(np.random.default_rng(1).random((4, 64, 64, 3)), jnp.float32)

    ref_ctx = Context(training=True)
    ref = model.forward_train(params, x, ref_ctx)

    ep_ctx = Context(training=True, expert_axis="expert")  # mesh=None: math-only path
    got = model.forward_train(params, x, ep_ctx)

    for a, b in zip(jax.tree_util.tree_leaves(ref), jax.tree_util.tree_leaves(got)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    # BN updates must cover the same paths with the same values
    assert set(ref_ctx.updates) == set(ep_ctx.updates)
    for path in ref_ctx.updates:
        for k in ref_ctx.updates[path]:
            np.testing.assert_allclose(
                np.asarray(ref_ctx.updates[path][k]), np.asarray(ep_ctx.updates[path][k]),
                atol=1e-5, err_msg=f"{path}.{k}",
            )


import pytest


@pytest.mark.parametrize("cfg", [CFG, CFG_DEEP], ids=["mini", "deep-2moe-2scale"])
def test_ep_dp_step_equals_single_device(cfg):
    """One train step on a 4x2 (data, expert) mesh == unsharded step."""
    model = DetectionModel(cfg)
    batch = _batch(8)

    results = {}
    meshes = {
        "single": (None, None),
        "ep_dp": (make_mesh(8, axes=("data", "expert"), shape=(4, 2)), "expert"),
    }
    for name, (mesh, axis) in meshes.items():
        tx = make_optimizer(0.01, params=model.init_params(0))
        state = make_train_state(model, seed=0, tx=tx)
        step = make_train_step(model, tx=tx, mesh=mesh, imgsz=64, batch_per_step=8,
                               max_gt=4, expert_axis=axis)
        new_state, metrics = step(state, batch)
        jax.block_until_ready(metrics)
        results[name] = (jax.tree_util.tree_map(np.asarray, new_state.params), dict(metrics))

    p1, m1 = results["single"]
    p2, m2 = results["ep_dp"]
    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-3, f"{m1['loss']} vs {m2['loss']}"
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(p1), jax.tree_util.tree_leaves_with_path(p2)
    ):
        err = float(np.max(np.abs(a.astype(np.float64) - b.astype(np.float64))))
        assert err < 5e-5, f"EP-step weight divergence at {jax.tree_util.keystr(path)}: {err}"
