"""ES_MOE — the YOLO-Master paper block, TPU-native.

Reference semantics (ultralytics/nn/modules/moe/modules.py:396-740):
  * per-sample routing via DynamicRoutingLayer (GAP -> MLP -> (top-k) softmax)
  * E heterogeneous depthwise-separable experts with kernels 3/5/7/...
    capped at max_kernel_size (modules.py:447-454)
  * dense forward = sum_e w_e * expert_e(x) (modules.py:612-619)
  * sparse eval = top-k retained experts, weights renormalized, optional
    dynamic_threshold pruning that always retains rank-0 (modules.py:629-651)
  * GShard balance loss published per step (modules.py:664-701)
  * BN + SiLU output norm (modules.py:457-460)

TPU-first recast: in training, routing weights after soft top-k are *exactly
zero* for unselected experts, so the masked-dense sum equals the reference's
sparse ``index_add_`` dispatch to float tolerance — with fully static shapes
(needed for gradient flow anyway). In sparse eval the block switches to
*gathered dispatch* (nn/moe/dispatch.py): expert params are stacked into
[E, ...] banks (heterogeneous 3/5/7 dw kernels zero-padded to the max size,
conv-exact) and only the [B, top_k] selected experts are computed — FLOPs
scale with K, not E, matching the reference's drop-free per-sample routing
with capacity = B and no token dropping.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..module import Context, Module, ModuleList, Params
from ..layers import BatchNorm, silu
from .experts import EfficientExpertGroup
from .losses import gshard_balance_loss
from .routers import DynamicRoutingLayer, soft_top_k


def expert_kernel_sizes(num_experts: int, max_kernel_size: int) -> list[int]:
    """Growing odd kernels 3/5/7/... capped at max (reference modules.py:447-452)."""
    default = [3, 5, 7]
    if num_experts <= len(default):
        return [min(k, max_kernel_size) for k in default[:num_experts]]
    return [min(3 + 2 * i, max_kernel_size) for i in range(num_experts)]


class ES_MOE(Module):
    """Routed expert block with GShard balance aux loss."""

    def __init__(
        self,
        in_channels: int,
        out_channels: Optional[int] = None,
        num_experts: int = 3,
        reduction: int = 8,
        top_k: Optional[int] = None,
        use_sparse_inference: bool = True,
        dynamic_threshold: float = 0.4,
        max_kernel_size: int = 15,
    ):
        super().__init__()
        if in_channels < 1 or (out_channels is not None and out_channels < 1):
            raise ValueError("in_channels and out_channels must be positive")
        if num_experts < 1:
            raise ValueError(f"num_experts must be positive, got {num_experts}")
        if top_k is not None and not 1 <= top_k <= num_experts:
            raise ValueError(f"top_k must be in [1, {num_experts}], got {top_k}")
        if not 0.0 <= dynamic_threshold <= 1.0:
            raise ValueError(f"dynamic_threshold must be in [0, 1], got {dynamic_threshold}")
        if max_kernel_size < 3:
            raise ValueError(f"max_kernel_size must be at least 3, got {max_kernel_size}")
        max_kernel_size = int(max_kernel_size)
        if max_kernel_size % 2 == 0:
            max_kernel_size -= 1
        out_channels = out_channels or in_channels

        self.in_channels = in_channels
        self.out_channels = out_channels
        self.num_experts = num_experts
        self.top_k = min(top_k, num_experts) if top_k is not None else num_experts
        self.use_top_k = top_k is not None
        self.use_sparse_inference = use_sparse_inference
        self.dynamic_threshold = dynamic_threshold
        self.max_kernel_size = max_kernel_size
        self.balance_loss_coeff = 1.0

        self.routing = DynamicRoutingLayer(in_channels, num_experts, reduction, top_k)
        ks = expert_kernel_sizes(num_experts, max_kernel_size)
        self.experts = ModuleList([EfficientExpertGroup(in_channels, out_channels, k) for k in ks])
        self.norm_bn = BatchNorm(out_channels)

    # -- routing weight post-processing (eval sparse path) -------------------
    def _sparse_retained_weights(self, w: jnp.ndarray) -> jnp.ndarray:
        """Apply dynamic-threshold pruning on top of top-k weights, renormalize.

        ``w`` is the [B, E] output of soft_top_k (zeros outside top-k). The
        reference additionally drops retained experts whose importance falls
        below ``dynamic_threshold``, always keeping the strongest one
        (modules.py:629-642).
        """
        if self.dynamic_threshold <= 0:
            return w
        wf = w.astype(jnp.float32)
        is_max = wf >= jnp.max(wf, axis=-1, keepdims=True)
        retained = is_max | (wf >= self.dynamic_threshold)
        wf = wf * retained
        denom = jnp.clip(jnp.sum(wf, axis=-1, keepdims=True), 1e-9, None)
        return (wf / denom).astype(w.dtype)

    def __call__(self, p: Params, x: jnp.ndarray, ctx: Context) -> jnp.ndarray:
        w, logits = self.routing(p["routing"], x, ctx)  # [B, E], [B, E]

        # GShard balance aux loss (reference modules.py:664-701). Usage here is
        # the batch-mean routing weight; pmean across data-parallel shards is
        # applied by the train step (single-program analog of reduce_ddp).
        usage = jnp.mean(w.astype(jnp.float32), axis=0)
        aux = gshard_balance_loss(usage, self.num_experts) * self.balance_loss_coeff
        if ctx.training:
            ctx.add_aux(self.path, aux)
            ctx.stats[self.path] = {"expert_usage": usage, "balance_loss": aux}

        sparse_eval = (
            not ctx.training
            and ctx.sparse_inference
            and self.use_sparse_inference
            and self.use_top_k
            and self.top_k < self.num_experts
        )
        if sparse_eval:
            w = self._sparse_retained_weights(w)
            # Gathered dispatch: compute ONLY the top-k experts per sample.
            # All experts share the dwsep structure; the 3/5/7 kernels are
            # zero-padded to the max size (conv-exact), so the max-kernel
            # expert module applies any gathered params.
            from .dispatch import gather_dispatch, stack_expert_params, top_k_from_weights

            bank = stack_expert_params([p["experts"][str(i)] for i in range(self.num_experts)])
            wts, idx = top_k_from_weights(w, self.top_k)
            out = gather_dispatch(self.experts[self.num_experts - 1], bank, x, idx, wts, ctx)
        else:
            # Masked-dense dispatch: zeros in w make this numerically identical
            # to the reference's sparse index_add_ path while keeping static shapes.
            out = None
            for i, expert in enumerate(self.experts):
                y = expert(p["experts"][str(i)], x, ctx)
                wi = w[:, i][:, None, None, None].astype(y.dtype)
                out = y * wi if out is None else out + y * wi

        out = self.norm_bn(p["norm_bn"], out, ctx)
        return silu(out)
