"""Device mesh + sharding helpers — the TPU-native replacement for the
reference's DDP stack (SURVEY.md §2.7).

The reference launches one process per GPU via torchrun and all-reduces
gradients with NCCL (ultralytics/utils/dist.py:50-170). Here a single program
jits the train step over a jax.sharding.Mesh: the batch axis is sharded over
the 'data' axis, params are replicated, and XLA inserts the gradient
reductions over ICI. The reference's collective control flow (loss AVG,
stop broadcast, non-finite any-reduce) becomes plain jnp reductions inside the
jitted step — identical math on every shard by construction.

Expert parallelism: ES-MoE experts are replicated like the reference (which
has no cross-device expert parallelism); an 'expert' mesh axis can be added
for larger expert counts without changing the module code (grouped dispatch
in nn/moe shards over it).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axes: Tuple[str, ...] = ("data",), shape: Optional[Tuple[int, ...]] = None) -> Mesh:
    """Build a mesh over available devices.

    Args:
        n_devices: how many devices to use (default: all).
        axes: mesh axis names, e.g. ("data",) or ("data", "model").
        shape: explicit per-axis sizes; default puts everything on axes[0].
    """
    devs = jax.devices()[: n_devices or len(jax.devices())]
    if shape is None:
        shape = (len(devs),) + (1,) * (len(axes) - 1)
    arr = np.array(devs).reshape(shape)
    return Mesh(arr, axes)


def shard_batch(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding for [B, ...] arrays: batch split over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
