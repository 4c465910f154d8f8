"""Device mesh + sharding helpers — the TPU-native replacement for the
reference's DDP stack (SURVEY.md §2.7).

The reference launches one process per GPU via torchrun and all-reduces
gradients with NCCL (ultralytics/utils/dist.py:50-170). Here a single program
jits the train step over a jax.sharding.Mesh: the batch axis is sharded over
the 'data' axis, params are replicated, and XLA inserts the gradient
reductions over ICI. The reference's collective control flow (loss AVG,
stop broadcast, non-finite any-reduce) becomes plain jnp reductions inside the
jitted step — identical math on every shard by construction.

Expert parallelism (the TPU-native addition; the reference replicates experts
per rank): pass ``expert_axis='expert'`` to ``make_train_step`` with a
('data', 'expert') mesh — routed blocks stack their [E, ...] expert banks and
constrain them to the expert axis so XLA partitions expert compute over it
(nn/moe/es_moe.py:_expert_parallel_dense; equality gate
tests/test_expert_parallel.py).
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


def expert_parallel_dryrun(n_devices: int, E: int = 8, C: int = 64, O: int = 64) -> float:
    """Minimal standalone exercise of the 'expert' mesh axis: shard an
    [E, C, O] weight bank over a ('data', 'expert') mesh and run one routed
    forward+backward step. Returns the (finite) scalar loss.

    This is a mesh-infrastructure smoke only — the REAL model's expert
    parallelism (ES_MOE banks sharded inside make_train_step via
    ``expert_axis=``) is gated by tests/test_expert_parallel.py and exercised
    by ``__graft_entry__.dryrun_multichip``.
    """
    import jax.numpy as jnp

    d_exp = 2 if n_devices % 2 == 0 else 1
    mesh = make_mesh(n_devices, axes=("data", "expert"), shape=(n_devices // d_exp, d_exp))
    B = max(n_devices, 4)

    w = jax.device_put(jnp.full((E, C, O), 0.01, jnp.float32), NamedSharding(mesh, P("expert")))
    router = jax.device_put(jnp.full((C, E), 0.1, jnp.float32), NamedSharding(mesh, P()))
    x = jax.device_put(jnp.ones((B, 16, C), jnp.float32), NamedSharding(mesh, P("data")))

    def loss_fn(w, router, x):
        probs = jax.nn.softmax(jnp.einsum("bnc,ce->be", x / x.shape[1], router))
        # dense routed mixture: the e-contraction is sharded over 'expert'
        out = jnp.einsum("bnc,eco,be->bno", x, w, probs)
        return jnp.mean(out**2)

    loss, grads = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1)))(w, router, x)
    jax.block_until_ready(grads)
    assert jnp.isfinite(loss), "expert-parallel dryrun produced non-finite loss"
    return float(loss)
