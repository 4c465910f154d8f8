"""Pallas TPU kernel: gathered expert matmul for sparse MoE dispatch.

The BASELINE north star recasts dynamic top-k routing as "capacity-bounded
sort/gather feeding a grouped-matmul expert kernel". For per-sample routing
(the ES-MoE family routes whole images, SURVEY.md §2.4) the capacity-bounded
form is exactly:

    out[b] = sum_k  wts[b,k] * (x[b] @ W[idx[b,k]])

XLA's dense fallback computes ALL E experts and gathers afterwards — E/K times
the FLOPs (the reference's >=20% expert-FLOPs-reduction gate,
benchmarks/mixture_baselines.yaml:5, exists precisely because sparse dispatch
must beat dense). This kernel uses scalar-prefetched routing indices so the
BlockSpec index_map DMAs ONLY the selected experts' weights from HBM into
VMEM: FLOPs and weight traffic scale with K, not E.

Grid: (B, K, N_tiles). The output block is revisited across k and accumulated
in-place (zero-init at k==0).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(idx_ref, wts_ref, x_ref, w_ref, out_ref):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    b = pl.program_id(0)
    weight = wts_ref[b, k]
    acc = jnp.dot(x_ref[0], w_ref[0], preferred_element_type=jnp.float32)
    out_ref[0] += (acc * weight).astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("tile_n", "interpret"))
def gathered_expert_matmul(
    x: jnp.ndarray,  # [B, N, C] tokens per sample
    w: jnp.ndarray,  # [E, C, O] expert weight bank
    idx: jnp.ndarray,  # [B, K] int32 selected experts
    wts: jnp.ndarray,  # [B, K] routing weights (0 for dropped slots)
    tile_n: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """out[b] = sum_k wts[b,k] * x[b] @ w[idx[b,k]]  with only K weight DMAs."""
    B, N, C = x.shape
    E, _, O = w.shape
    K = idx.shape[1]
    tile_n = min(tile_n, N)
    grid = (B, K, pl.cdiv(N, tile_n))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # idx, wts
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_n, C), lambda b, k, n, idx_ref, wts_ref: (b, n, 0)),
            # the gathered weight block: expert chosen by the prefetched index
            pl.BlockSpec((1, C, O), lambda b, k, n, idx_ref, wts_ref: (idx_ref[b, k], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile_n, O), lambda b, k, n, idx_ref, wts_ref: (b, n, 0)),
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, N, O), x.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "parallel"),
        ),
    )(idx.astype(jnp.int32), wts.astype(jnp.float32), x, w)


def dense_expert_matmul(x, w, idx, wts):
    """XLA dense reference: compute all E experts, gather, weighted-sum."""
    all_out = jnp.einsum("bnc,eco->beno", x, w)  # [B, E, N, O]
    sel = jnp.take_along_axis(all_out, idx[:, :, None, None], axis=1)  # [B, K, N, O]
    return jnp.sum(sel * wts[:, :, None, None].astype(sel.dtype), axis=1)
