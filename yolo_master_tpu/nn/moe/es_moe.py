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
        if ctx.expert_axis is not None and not sparse_eval:
            # Expert-parallel dense dispatch: the [E, ...] bank of THIS block's
            # experts is sharded over the mesh 'expert' axis; XLA partitions
            # the channel-folded expert conv across expert shards and reduces
            # the routed mixture. (Measured NOT to help single-chip eval:
            # the tile/einsum materialization loses to XLA's fusion of the
            # masked-dense loop — 1.69 vs 1.17 ms e2e — so folding is
            # EP-only.)
            out = self._expert_parallel_dense(p, x, w, ctx)
        elif sparse_eval:
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

    def pallas_fusable(self) -> bool:
        """Whether deploy surgery can swap this block for the fused kernel:
        dense eval (no top-k sparse path — the flagship's ``top_k=None``
        placements) and stride-1 experts."""
        return (
            not (self.use_sparse_inference and self.use_top_k and self.top_k < self.num_experts)
            and all(self.experts[i].conv.s == 1 for i in range(self.num_experts))
        )

    def _expert_parallel_dense(self, p: Params, x: jnp.ndarray, w: jnp.ndarray, ctx: Context) -> jnp.ndarray:
        """Dense routed mixture with expert compute sharded over ``ctx.expert_axis``.

        Numerically equivalent to the masked-dense loop (kernels zero-padded to
        the max size are conv-exact for stride-1 SAME convs); the stacked
        [E, ...] bank is sharding-constrained to the expert mesh axis so GSPMD
        places expert e's convs on the shard owning bank[e] and inserts the
        cross-shard reduce for the weighted sum. BN running-stat updates are
        scattered back to each expert's own path.

        The dwsep expert is written out explicitly here — experts FOLDED into
        the channel dimension for the depthwise conv (one plain grouped conv
        over [B, H, W, E*C], groups=E*C) and einsum for the pointwise — rather
        than vmapping the expert module over the bank: vmapping a conv over
        its weights lowers to a batch_group_count convolution whose FORWARD
        and BACKWARD XLA:CPU GSPMD miscompiles under an expert-axis sharding
        constraint (verified empirically; the channel-folded conv + einsums
        partition exactly — fp-noise-level deltas fwd and bwd).
        """
        from .dispatch import stack_expert_params

        E = self.num_experts
        assert self.experts[0].conv.s == 1, "EP dense path assumes stride-1 experts (kernel zero-padding exactness)"
        bank = stack_expert_params([p["experts"][str(i)] for i in range(E)])
        if ctx.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            sh = NamedSharding(ctx.mesh, P(ctx.expert_axis))
            bank = jax.tree_util.tree_map(lambda l: jax.lax.with_sharding_constraint(l, sh), bank)
        conv_p = bank["conv"]
        dw = conv_p["depthwise"]["w"]      # [E, k, k, 1, C]
        pw = conv_p["pointwise"]["w"]      # [E, 1, 1, C, O]
        k = dw.shape[1]
        c1 = self.in_channels
        B, H, W = x.shape[0], x.shape[1], x.shape[2]

        from ..layers import conv2d

        # channel-folded depthwise: out channel j = e*C + c applies expert e's
        # kernel to input channel c of the e-th tiled copy
        xt = jnp.tile(x, (1, 1, 1, E))
        dwt = dw.transpose(1, 2, 3, 0, 4).reshape(k, k, 1, E * c1)
        y = conv2d(xt, dwt, stride=1, padding=(k - 1) // 2, groups=E * c1)  # [B,H,W,E*C]
        y = y.reshape(B, H, W, E, c1)
        if ctx.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            y = jax.lax.with_sharding_constraint(
                y, NamedSharding(ctx.mesh, P("data", None, None, ctx.expert_axis))
            )
        # pointwise as a per-expert matmul
        y = jnp.einsum("bhwec,eco->bhweo", y, pw[:, 0, 0].astype(y.dtype))
        if "b" in conv_p["pointwise"]:  # deploy-fused form (utils/fuse.py)
            y = y + conv_p["pointwise"]["b"][None, None, None].astype(y.dtype)
        elif "bn" in conv_p:
            bnp = conv_p["bn"]
            eps = self.experts[0].conv.bn.eps
            mom = self.experts[0].conv.bn.momentum
            yf = y.astype(jnp.float32)
            if ctx.training:
                mean = jnp.mean(yf, (0, 1, 2))  # [E, O]
                var = jnp.var(yf, (0, 1, 2))
                n = B * H * W
                unbiased = var * (n / max(n - 1, 1))
                for i in range(E):
                    ctx.updates[f"{self.path}.experts.{i}.conv.bn"] = {
                        "mean": (1 - mom) * bnp["mean"][i] + mom * jax.lax.stop_gradient(mean[i]),
                        "var": (1 - mom) * bnp["var"][i] + mom * jax.lax.stop_gradient(unbiased[i]),
                    }
            else:
                mean, var = bnp["mean"], bnp["var"]
            inv = jax.lax.rsqrt(var + eps) * bnp["scale"]  # [E, O]
            yf = (yf - mean[None, None, None]) * inv[None, None, None] + bnp["bias"][None, None, None]
            y = yf.astype(x.dtype)
        y = silu(y)
        out = jnp.einsum("bhweo,be->bhwo", y.astype(jnp.float32), w.astype(jnp.float32)).astype(x.dtype)
        return out


class PallasESMOE(Module):
    """Deploy-time replacement for a dense-eval ES_MOE block: routing stays in
    XLA (GAP + tiny MLP, fuses into the producer), the E-expert dwsep mixture +
    output norm runs as ONE whole-plane Pallas kernel (ops/pallas_esmoe.py) —
    one HBM plane read + one write instead of ~8 lane-padded round-trips.

    Params: {"routing": <DynamicRoutingLayer tree>, "banks": {dw, pw, pb,
    gamma, beta}} — produced by utils/fuse.py pallas_esmoe_fuse. Eval-only
    (deploy surgery happens after training)."""

    def __init__(self, block: "ES_MOE"):
        super().__init__()
        self.routing = block.routing
        self._children["routing"] = block.routing
        self.ks = tuple(block.experts[i].conv.k for i in range(block.num_experts))
        self.in_channels = block.in_channels
        self.out_channels = block.out_channels

    def __call__(self, p: Params, x: jnp.ndarray, ctx: Context) -> jnp.ndarray:
        from ...ops.pallas_esmoe import fused_esmoe

        w, _ = self.routing(p["routing"], x, ctx)
        b = p["banks"]
        interpret = jax.default_backend() != "tpu"
        return fused_esmoe(
            x, w.astype(jnp.float32), b["dw"], b["pw"], b["pb"],
            b["gamma"], b["beta"], ks=self.ks, interpret=interpret,
        )
