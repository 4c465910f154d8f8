"""Multi-host story gate (VERDICT r4 next #2): 2 REAL jax processes on
localhost, coordinated via jax.distributed.initialize, run a mesh-sharded
train step over their combined 4 CPU devices and must agree bitwise on the
post-step weights — the exact analog of the reference's 2-proc gloo smoke
(/root/reference/tests/ddp_moe_smoke.py, launched by utils/dist.py:50-170).

The parent additionally recomputes the same steps UNSHARDED in-process and
asserts near-equality, tying the multi-process path to the DP-equality gate
(tests/test_dp_equality.py).
"""

import json
import os
import sys
from pathlib import Path

import numpy as np
import pytest

import jax

from yolo_master_tpu.parallel.launch import launch_workers

WORKER = str(Path(__file__).with_name("_mp_worker.py"))


@pytest.fixture(scope="module")
def worker_run(tmp_path_factory):
    out = tmp_path_factory.mktemp("mp_dp")
    env = {
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        # drop any outer compile-cache dir contention; workers re-enable their own
        "PYTHONUNBUFFERED": "1",
    }
    rc = launch_workers(WORKER, 2, args=[str(out)], env=env, timeout=420.0)
    assert rc == 0
    return out


def test_two_process_weight_equality(worker_run):
    """Both processes finish, agree on loss, and produce BITWISE-identical
    post-step weights (identical SPMD programs on identical shards)."""
    metas = []
    for r in (0, 1):
        f = worker_run / f"rank{r}.json"
        assert f.exists(), f"worker {r} produced no result"
        metas.append(json.loads(f.read_text()))
    assert metas[0]["world"] == metas[1]["world"] == 2
    assert metas[0]["loss"] == pytest.approx(metas[1]["loss"], abs=1e-6)

    p0 = np.load(worker_run / "params_rank0.npz")
    p1 = np.load(worker_run / "params_rank1.npz")
    assert set(p0.files) == set(p1.files)
    for k in p0.files:
        np.testing.assert_array_equal(p0[k], p1[k], err_msg=f"cross-process weight divergence at {k}")


def test_main_process_gating(worker_run):
    """Only process 0 writes the checkpoint marker (reference trainer.py:881)."""
    assert (worker_run / "main_marker.txt").exists()
    assert "process 0" in (worker_run / "main_marker.txt").read_text()


def test_multiprocess_matches_unsharded(worker_run):
    """The 2-process sharded trajectory equals the single-process unsharded
    one on the same global batch (ties the launch path to test_dp_equality)."""
    sys.path.insert(0, str(Path(WORKER).parent))
    import _mp_worker as w

    from yolo_master_tpu.engine.train_step import make_optimizer, make_train_state, make_train_step
    from yolo_master_tpu.nn.tasks import DetectionModel

    model = DetectionModel(w.CFG)
    tx = make_optimizer(0.01, params=model.init_params(0))
    state = make_train_state(model, seed=0, tx=tx)
    step = make_train_step(model, tx=tx, mesh=None, imgsz=64, batch_per_step=w.GLOBAL_BS, max_gt=w.MAX_GT)
    batch = {k: jax.numpy.asarray(v) for k, v in w.make_global_batch_np(w.GLOBAL_BS).items()}
    for _ in range(w.STEPS):
        state, metrics = step(state, batch)
    ref = {jax.tree_util.keystr(p): np.asarray(x) for p, x in jax.tree_util.tree_leaves_with_path(state.params)}

    p0 = np.load(worker_run / "params_rank0.npz")
    assert set(p0.files) == set(ref)
    worst = 0.0
    for k in p0.files:
        err = float(np.max(np.abs(p0[k].astype(np.float64) - ref[k].astype(np.float64))))
        worst = max(worst, err)
        assert err < 5e-5, f"multi-process vs unsharded divergence at {k}: {err}"


def test_process_local_indices_partition():
    """Single-process: identity permutation coverage; the sharding math is
    world-size independent (exercised at world=2 inside the workers)."""
    from yolo_master_tpu.parallel.launch import process_local_indices

    idx = process_local_indices(10, shuffle=True, seed=3)
    assert sorted(idx.tolist()) == list(range(10))
