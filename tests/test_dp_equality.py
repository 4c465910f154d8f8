"""Data-parallel correctness gate: one train step sharded over the 8-device
virtual CPU mesh must produce THE SAME weights as the unsharded step on the
same batch — the TPU-native analog of the reference's 2-proc gloo smoke
scripts that assert post-step weight equality via all_gather
(SURVEY §4, reference tests/ddp_moe_smoke.py)."""

import numpy as np

import jax
import jax.numpy as jnp

from yolo_master_tpu.engine.train_step import make_optimizer, make_train_state, make_train_step
from yolo_master_tpu.nn.tasks import DetectionModel
from yolo_master_tpu.parallel.mesh import make_mesh

CFG = {
    "nc": 2,
    "backbone": [[-1, 1, "Conv", [8, 3, 2]], [-1, 1, "Conv", [16, 3, 2]], [-1, 1, "ES_MOE", [16]]],
    "head": [[[2], 1, "Detect", ["nc"]]],
}


def _batch(n):
    rng = np.random.default_rng(0)
    return {
        "images": jnp.asarray(rng.random((n, 64, 64, 3)), jnp.float32),
        "boxes": jnp.asarray(rng.uniform(4, 60, (n, 4, 4)).astype(np.float32)),
        "classes": jnp.asarray(rng.integers(0, 2, (n, 4)), jnp.int32),
        "mask": jnp.ones((n, 4), bool),
    }


def test_sharded_step_equals_single_device():
    model = DetectionModel(CFG)
    batch = _batch(8)

    results = {}
    for name, mesh in (("single", None), ("mesh8", make_mesh(8, axes=("data",)))):
        tx = make_optimizer(0.01, params=model.init_params(0))
        state = make_train_state(model, seed=0, tx=tx)
        step = make_train_step(model, tx=tx, mesh=mesh, imgsz=64, batch_per_step=8, max_gt=4)
        new_state, metrics = step(state, batch)
        jax.block_until_ready(metrics)
        results[name] = (jax.tree_util.tree_map(np.asarray, new_state.params), dict(metrics))

    p1, m1 = results["single"]
    p8, m8 = results["mesh8"]
    assert abs(float(m1["loss"]) - float(m8["loss"])) < 1e-3, f"{m1['loss']} vs {m8['loss']}"
    leaves1 = jax.tree_util.tree_leaves_with_path(p1)
    leaves8 = jax.tree_util.tree_leaves_with_path(p8)
    worst = 0.0
    for (path, a), (_, b) in zip(leaves1, leaves8):
        err = float(np.max(np.abs(a.astype(np.float64) - b.astype(np.float64))))
        worst = max(worst, err)
        assert err < 5e-5, f"post-step weight divergence at {jax.tree_util.keystr(path)}: {err}"
    assert worst > 0 or True  # informational
