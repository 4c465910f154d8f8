"""Multi-process / multi-host launch — the jax.distributed analog of the
reference's torchrun DDP launcher (ultralytics/utils/dist.py:50-170).

The reference spawns one process per GPU via ``torch.distributed.run``, gates
downloads/checkpoints on RANK 0 (utils/torch_utils.py:64, engine/trainer.py:881)
and shards the dataset with a DistributedSampler. The TPU-native mapping
(SURVEY.md §5 "ICI (intra-pod) / DCN (multi-slice)"):

  torchrun --nproc_per_node       -> :func:`launch_workers` subprocess spawn
                                     (one process per host/slice; all local
                                     chips belong to that one process)
  dist.init_process_group(...)    -> :func:`init_distributed` →
                                     ``jax.distributed.initialize`` against a
                                     coordinator address
  RANK / WORLD_SIZE / MASTER_*    -> honored as env fallbacks (so torchrun-
                                     style launchers keep working), plus the
                                     native COORDINATOR_ADDRESS / NUM_PROCESSES
                                     / PROCESS_ID names
  rank-0 gating                   -> :func:`is_main_process` /
                                     :func:`main_process_only`
  DistributedSampler              -> :func:`process_local_indices`
  DDP gradient all-reduce         -> the SAME single-program mesh step
                                     (engine/train_step.py): a Mesh over
                                     ``jax.devices()`` spans every process, so
                                     XLA emits the gradient reductions over
                                     ICI within a slice and DCN across slices.
                                     Per-process local batches become one
                                     global array via :func:`global_batch`.

After ``init_distributed`` the entire single-host trainer works unchanged —
the only per-process differences are which batch shard a process feeds and
which process writes checkpoints/logs.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys
from typing import Dict, Optional, Sequence, Tuple

import jax
import numpy as np

from ..utils import LOGGER

# processes participating after init (1 == single-process mode, the default)
_initialized = False


def find_free_port() -> int:
    """Free localhost port (reference dist.py:34 find_free_network_port)."""
    with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _env(*names: str) -> Optional[str]:
    for n in names:
        v = os.environ.get(n)
        if v:
            return v
    return None


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> int:
    """Initialize the JAX distributed runtime from args or environment.

    Env fallbacks accept both the JAX-native names and the torchrun names the
    reference's launcher exports (dist.py:50-170):

      coordinator: COORDINATOR_ADDRESS | MASTER_ADDR(+MASTER_PORT)
      world size:  NUM_PROCESSES | WORLD_SIZE
      rank:        PROCESS_ID | RANK

    No-ops (returns 1) when neither args nor env describe a multi-process run,
    so single-host scripts can call it unconditionally. Returns process count.
    """
    global _initialized
    if _initialized:
        return jax.process_count()
    coordinator_address = coordinator_address or _env("COORDINATOR_ADDRESS")
    if coordinator_address is None and _env("MASTER_ADDR"):
        coordinator_address = f"{_env('MASTER_ADDR')}:{_env('MASTER_PORT') or 29400}"
    num_processes = num_processes if num_processes is not None else int(_env("NUM_PROCESSES", "WORLD_SIZE") or 0) or None
    process_id = process_id if process_id is not None else (int(_env("PROCESS_ID", "RANK")) if _env("PROCESS_ID", "RANK") is not None else None)
    if coordinator_address is None or num_processes is None or num_processes <= 1:
        return 1
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _initialized = True
    LOGGER.info(
        f"jax.distributed initialized: process {jax.process_index()}/{jax.process_count()}, "
        f"{jax.local_device_count()} local / {jax.device_count()} global devices"
    )
    return jax.process_count()


def is_main_process() -> bool:
    """True on process 0 — the RANK-0 gate (reference torch_utils.py:64)."""
    return jax.process_index() == 0


def main_process_only(fn):
    """Run ``fn`` only on process 0 (checkpoint/log/download gating —
    reference trainer.py:881 saves only on RANK in {-1, 0})."""

    def wrapper(*a, **k):
        if is_main_process():
            return fn(*a, **k)
        return None

    return wrapper


def barrier(name: str = "barrier") -> None:
    """Block until every process arrives (reference dist.barrier)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def global_mesh(axes: Tuple[str, ...] = ("data",), shape: Optional[Tuple[int, ...]] = None):
    """Mesh over ALL global devices (every process must build the same mesh).

    With the default 1-axis layout the data axis spans processes, so the
    jitted train step's gradient psum rides ICI within a host/slice and DCN
    across — exactly the SURVEY §5 mapping. Device order from
    ``jax.devices()`` is coordinator-consistent across processes.
    """
    from .mesh import make_mesh

    return make_mesh(axes=axes, shape=shape)


def process_local_indices(n: int, shuffle: bool = True, seed: int = 0, drop_last: bool = True) -> np.ndarray:
    """This process's shard of dataset indices — the DistributedSampler analog.

    Every process derives the SAME global permutation (seeded) and takes a
    contiguous slice; with drop_last the shards are equal-sized so global
    batch shapes stay static across processes (XLA requirement).
    """
    rank, world = jax.process_index(), jax.process_count()
    idx = np.random.default_rng(seed).permutation(n) if shuffle else np.arange(n)
    if world == 1:
        return idx
    per = n // world if drop_last else -(-n // world)
    if not drop_last and per * world > n:  # pad by wrapping (reference sampler repeats)
        idx = np.concatenate([idx, idx[: per * world - n]])
    return idx[rank * per : (rank + 1) * per]


def global_batch(mesh, local_batch: Dict[str, np.ndarray]):
    """Assemble per-process local batch shards into global jax.Arrays.

    Each process passes its LOCAL [B_local, ...] arrays; the result is a
    global [B_local * num_processes, ...] array sharded over the mesh's first
    axis — the input contract of make_train_step(mesh=...). Single-process
    meshes short-circuit to a plain device_put so the same trainer code path
    covers both.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P(mesh.axis_names[0]))
    if jax.process_count() == 1:
        return {k: jax.device_put(np.asarray(v), sh) for k, v in local_batch.items()}
    return {k: jax.make_array_from_process_local_data(sh, np.asarray(v)) for k, v in local_batch.items()}


def launch_workers(
    script: str,
    nprocs: int,
    *,
    args: Sequence[str] = (),
    env: Optional[Dict[str, str]] = None,
    coordinator_port: Optional[int] = None,
    timeout: float = 600.0,
) -> int:
    """Spawn ``nprocs`` local worker processes — the torchrun analog for
    single-node multi-process runs (reference dist.py ddp_launch_prefix).

    Each worker gets COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID in env
    and is expected to call :func:`init_distributed`. Waits for all workers;
    returns 0 on success. On any failure, kills the rest and raises with the
    failing worker's output (the collect_ddp_error_logs analog).
    """
    port = coordinator_port or find_free_port()
    procs = []
    for rank in range(nprocs):
        e = {**os.environ, **(env or {}),
             "COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
             "NUM_PROCESSES": str(nprocs),
             "PROCESS_ID": str(rank)}
        procs.append(
            subprocess.Popen([sys.executable, script, *args], env=e,
                             stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        )
    rc = 0
    outputs = []
    try:
        for rank, p in enumerate(procs):
            out, _ = p.communicate(timeout=timeout)
            outputs.append(out)
            if p.returncode != 0:
                rc = p.returncode
                raise RuntimeError(f"worker {rank} exited rc={p.returncode}:\n{out[-4000:]}")
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    LOGGER.info(f"launch_workers: {nprocs} workers completed")
    return rc
