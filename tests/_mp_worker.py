"""Multi-process DP worker — spawned by tests/test_multiprocess_dp.py via
launch_workers (2 processes x 2 CPU devices each = 4 global devices).

The multi-process analog of the reference's gloo smoke worker
(/root/reference/tests/ddp_moe_smoke.py): init the distributed runtime from
env, run K sharded train steps on per-process batch shards, and publish the
post-step weights + rank-0 gating evidence for the parent to assert on.

NOT a pytest file (leading underscore keeps collection away).
"""

import json
import os
import sys
from pathlib import Path

# platform setup must precede the jax import (the test passes these in env,
# but keep the worker self-sufficient for manual runs)
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=2").strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402

# the axon sitecustomize pins JAX_PLATFORMS=axon (single tunneled TPU); this
# test needs the multi-device CPU backend — env override is ineffective, the
# jax config flag is the only lever (same note as tests/conftest.py)
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

# init the distributed runtime BEFORE any import that initializes the XLA
# backend (train_step's optax/jnp module constants do) — jax.distributed
# requires it (same ordering contract as torch dist.init_process_group
# before CUDA context creation)
from yolo_master_tpu.parallel import launch  # noqa: E402

WORLD = launch.init_distributed()

from yolo_master_tpu.engine.train_step import make_optimizer, make_train_state, make_train_step  # noqa: E402
from yolo_master_tpu.nn.tasks import DetectionModel  # noqa: E402

CFG = {
    "nc": 2,
    "backbone": [[-1, 1, "Conv", [8, 3, 2]], [-1, 1, "Conv", [16, 3, 2]], [-1, 1, "ES_MOE", [16]]],
    "head": [[[2], 1, "Detect", ["nc"]]],
}
GLOBAL_BS, MAX_GT, STEPS = 8, 4, 2


def make_global_batch_np(n):
    """The SAME deterministic global batch every process derives (the parent
    test recomputes it for its unsharded reference run)."""
    rng = np.random.default_rng(0)
    return {
        "images": rng.random((n, 64, 64, 3)).astype(np.float32),
        "boxes": rng.uniform(4, 60, (n, MAX_GT, 4)).astype(np.float32),
        "classes": rng.integers(0, 2, (n, MAX_GT)).astype(np.int32),
        "mask": np.ones((n, MAX_GT), bool),
    }


def main() -> int:
    out_dir = Path(sys.argv[1])
    world = WORLD
    assert world == 2, f"expected 2 processes, got {world}"
    assert jax.device_count() == 4, f"expected 4 global devices, got {jax.device_count()}"
    rank = jax.process_index()

    mesh = launch.global_mesh()
    model = DetectionModel(CFG)
    tx = make_optimizer(0.01, params=model.init_params(0))
    state = make_train_state(model, seed=0, tx=tx)
    step = make_train_step(model, tx=tx, mesh=mesh, imgsz=64, batch_per_step=GLOBAL_BS, max_gt=MAX_GT)

    # DistributedSampler analog: each process feeds its contiguous shard of
    # the SAME global batch; global_batch() assembles the global jax.Array
    full = make_global_batch_np(GLOBAL_BS)
    idx = launch.process_local_indices(GLOBAL_BS, shuffle=False)
    local = {k: v[idx] for k, v in full.items()}
    batch = launch.global_batch(mesh, local)

    loss = None
    for _ in range(STEPS):
        state, metrics = step(state, batch)
        loss = float(metrics["loss"])
    assert np.isfinite(loss), f"non-finite loss {loss}"

    # replicated params are fully addressable on every process
    leaves = jax.tree_util.tree_leaves_with_path(state.params)
    flat = {jax.tree_util.keystr(p): np.asarray(x) for p, x in leaves}
    np.savez(out_dir / f"params_rank{rank}.npz", **flat)
    (out_dir / f"rank{rank}.json").write_text(json.dumps({"rank": rank, "world": world, "loss": loss}))

    # rank-0 gating evidence (reference trainer.py:881 saves on RANK 0 only)
    if launch.is_main_process():
        (out_dir / "main_marker.txt").write_text(f"written by process {rank}")
    launch.barrier("worker-done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
