"""Sparse expert dispatch — compute only the top-k routed experts.

The reference's eager eval skips unselected experts with a dynamic
``index_add_`` loop (ultralytics/nn/modules/moe/modules.py:612-662). Under jit
that dynamic skipping is recast as *gathered dispatch* (SURVEY.md §7.5, the
"dispatch='gather'" contract promised in es_moe.py):

  1. stack the E expert param trees into ``[E, ...]`` weight banks (one-time,
     cheap dict surgery — heterogeneous ES-MoE depthwise kernels 3/5/7 are
     zero-padded to the max size, which is conv-exact for stride-1 SAME pads);
  2. gather the ``[B, K]`` selected experts' params with the routing indices;
  3. evaluate the expert function under a double vmap over (batch, k).

FLOPs and expert weight traffic scale with K, not E, with fully static shapes
— the measured form of the reference's >=20% expert-FLOPs-reduction gate
(benchmarks/mixture_baselines.yaml:5). Numerics match the masked-dense path to
float-sum tolerance: masked-dense adds exact zeros for unselected experts, the
gathered path simply omits them.
"""

from __future__ import annotations

from typing import Callable, List, Sequence

import jax
import jax.numpy as jnp

from ..module import Context, Params


def _pad_kernel_center(w: jnp.ndarray, kh: int, kw: int) -> jnp.ndarray:
    """Zero-pad an HWIO conv kernel to [kh, kw, I, O], centered.

    For stride-1 convs with symmetric (k-1)//2 padding this is exact: the
    padded kernel's extra taps are zero, so a 3x3 kernel padded to 7x7 under
    pad=3 computes the same output as the 3x3 under pad=1.
    """
    dh, dw = kh - w.shape[0], kw - w.shape[1]
    assert dh >= 0 and dw >= 0 and dh % 2 == 0 and dw % 2 == 0, (
        f"kernel {w.shape[:2]} cannot be centered in ({kh},{kw})"
    )
    return jnp.pad(w, ((dh // 2, dh // 2), (dw // 2, dw // 2), (0, 0), (0, 0)))


def stack_expert_params(expert_params: Sequence[Params]) -> Params:
    """Stack E structurally-identical expert param trees into [E, ...] banks.

    4D conv-kernel leaves whose spatial dims differ across experts are
    zero-padded (centered) to the max size before stacking.
    """
    leaves_list = [jax.tree_util.tree_leaves(p) for p in expert_params]
    treedef = jax.tree_util.tree_structure(expert_params[0])
    n = len(leaves_list[0])
    stacked = []
    for i in range(n):
        ls = [lv[i] for lv in leaves_list]
        shapes = {l.shape for l in ls}
        if len(shapes) > 1:
            if not all(l.ndim == 4 for l in ls):
                raise ValueError(f"cannot stack heterogeneous non-conv leaves: {shapes}")
            kh = max(l.shape[0] for l in ls)
            kw = max(l.shape[1] for l in ls)
            ls = [_pad_kernel_center(l, kh, kw) for l in ls]
        stacked.append(jnp.stack(ls))
    return jax.tree_util.tree_unflatten(treedef, stacked)


def gather_dispatch(
    expert_apply: Callable[[Params, jnp.ndarray, Context], jnp.ndarray],
    bank: Params,
    x: jnp.ndarray,
    idx: jnp.ndarray,
    wts: jnp.ndarray,
    ctx: Context,
) -> jnp.ndarray:
    """out[b] = sum_k wts[b,k] * expert_apply(bank[idx[b,k]], x[b])  (fp32 acc).

    Args:
        expert_apply: single-expert forward taking a [1, H, W, C] batch.
        bank: stacked [E, ...] expert params.
        x: [B, H, W, C] inputs.
        idx: [B, K] int32 selected expert indices.
        wts: [B, K] routing weights (zeros allowed).
    """
    sel = jax.tree_util.tree_map(lambda l: l[idx], bank)  # leaves [B, K, ...]

    def one(pe, xb):
        return expert_apply(pe, xb[None], ctx)[0]

    y = jax.vmap(jax.vmap(one, in_axes=(0, None)), in_axes=(0, 0))(sel, x)  # [B,K,H,W,O]
    out = jnp.sum(y.astype(jnp.float32) * wts[:, :, None, None, None].astype(jnp.float32), axis=1)
    return out.astype(x.dtype)


def top_k_from_weights(w: jnp.ndarray, k: int):
    """Extract [B, K] (weights, indices) from a [B, E] weight matrix that is
    already zero outside the top-k (the output of soft_top_k/process_logits)."""
    wts, idx = jax.lax.top_k(w, k)
    return wts, idx.astype(jnp.int32)
