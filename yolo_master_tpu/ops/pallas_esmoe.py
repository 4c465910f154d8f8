"""Pallas TPU kernel: fused dense ES_MOE block (whole-plane, per-image grid).

The flagship's ES_MOE blocks (reference ultralytics/nn/modules/moe/modules.py:
396-740 with ``top_k=None``) run ALL E heterogeneous dwsep experts at eval:

    w   = softmax(MLP(GAP(x)))                      # [B, E] (computed outside)
    y_e = SiLU(pw_e(dw_e(x)) + b_e)                 # expert BN folded into b_e
    out = SiLU(gamma * sum_e w[b,e] * y_e + beta)   # norm BN folded (sum w = 1)

XLA executes this as ~9 separate conv/elementwise ops, each round-tripping the
[H, W, C] plane through HBM with sub-128 channel counts padded to 128 lanes
(2x traffic inflation at C=64) — ~8 plane round-trips per block. This kernel
computes the whole block in VMEM: one plane read, one plane write. The
depthwise taps are VPU multiply-accumulates over statically shifted slices of
a zero-padded plane (each expert unrolls only ITS k*k taps — 9+25+49 for the
3/5/7 bank, not E*kmax^2); pointwise runs on the MXU contracting lanes.

The routing weights are scalar-prefetched ([B, E] in SMEM) so the mix is a
scalar-broadcast FMA; GAP + routing MLP stay in XLA (one tiny fused reduce).

Grid: (B,) — whole-plane blocks (<=8 MB VMEM for every flagship placement:
160x160x64, 80x80x128, 40x40x128, 20x20x256).

Measured (TPU v5e, flagship yolo-master-n @640 bs=1): swapping all four
ES_MOE placements for this kernel made the e2e forward SLOWER — 2.16 ms vs
1.16 ms — and an ablation that skips the blocks entirely bounds the win at
~0.16 ms, i.e. XLA's own fusion of the dwsep experts is already near the HBM
roofline (the in-kernel shifted-slice taps materialize padded plane copies
the conv HW path avoids). Same conclusion as the whole-block C3k2
experiments (ops/pallas_c3k2.py). Kept as an OPT-IN deploy surgery
(utils/fuse.py pallas_esmoe_fuse) with exact-parity tests — it is the
documented record of why the conv-region Pallas direction has poor ROI here;
the production fast path remains XLA + the fused stem (ops/pallas_stem.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(H: int, W: int, C: int, O: int, ks: tuple[int, ...]):
    kmax = max(ks)
    h = (kmax - 1) // 2

    def kernel(w_ref, x_ref, dw_ref, pw_ref, pb_ref, gamma_ref, beta_ref, out_ref):
        b = pl.program_id(0)
        x = x_ref[0].astype(jnp.float32)                       # [H, W, C]
        xp = jnp.pad(x, ((h, h), (h, h), (0, 0)))              # [H+2h, W+2h, C]

        mix = None
        for e, k in enumerate(ks):
            he = (k - 1) // 2
            off = h - he  # centre-padded bank: expert e's taps start at off
            acc = None
            for dr in range(k):
                for dc in range(k):
                    tap = xp[h - he + dr: h - he + dr + H, h - he + dc: h - he + dc + W, :]
                    term = tap * dw_ref[e, off + dr, off + dc]
                    acc = term if acc is None else acc + term
            z = jax.lax.dot_general(
                acc, pw_ref[e],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + pb_ref[e]
            z = z * jax.nn.sigmoid(z)
            we = w_ref[b, e]
            mix = z * we if mix is None else mix + z * we

        mix = mix * gamma_ref[...] + beta_ref[...]
        out_ref[0] = (mix * jax.nn.sigmoid(mix)).astype(out_ref.dtype)

    return kernel


@partial(jax.jit, static_argnames=("ks", "interpret"))
def fused_esmoe(
    x: jnp.ndarray,        # [B, H, W, C]
    w: jnp.ndarray,        # [B, E] routing weights (rows sum to 1)
    dw: jnp.ndarray,       # [E, kmax, kmax, C] depthwise (small kernels centre-padded)
    pw: jnp.ndarray,       # [E, C, O] pointwise
    pb: jnp.ndarray,       # [E, O] pointwise bias (expert BN folded)
    gamma: jnp.ndarray,    # [O] output-norm scale (BN folded)
    beta: jnp.ndarray,     # [O] output-norm shift
    ks: tuple[int, ...],
    interpret: bool = False,
) -> jnp.ndarray:
    B, H, W, C = x.shape
    E, O = pw.shape[0], pw.shape[2]
    assert len(ks) == E and dw.shape == (E, max(ks), max(ks), C)
    kernel = _make_kernel(H, W, C, O, ks)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W, C), lambda b, w_: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W, O), lambda b, w_: (b, 0, 0, 0), memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, W, O), x.dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        w.astype(jnp.float32),
        x,
        dw.astype(jnp.float32),
        pw.astype(jnp.float32),
        pb.astype(jnp.float32),
        gamma.astype(jnp.float32),
        beta.astype(jnp.float32),
    )


def pack_esmoe_params(block, p):
    """Stack a (deploy-fused or raw) ES_MOE block's expert params into the
    kernel's banks. ``p`` is the block's param subtree; BN stats are folded
    here when still unfused. Returns (dw, pw, pb, gamma, beta, ks)."""
    E = block.num_experts
    ks = tuple(block.experts[i].conv.k for i in range(E))
    kmax = max(ks)
    C, O = block.in_channels, block.out_channels
    dws, pws, pbs = [], [], []
    for i in range(E):
        ep = p["experts"][str(i)]["conv"]
        k = ks[i]
        pad = (kmax - k) // 2
        d = jnp.asarray(ep["depthwise"]["w"], jnp.float32)[..., 0, :]  # [k, k, C]
        d = jnp.pad(d, ((pad, pad), (pad, pad), (0, 0)))
        pwm = jnp.asarray(ep["pointwise"]["w"], jnp.float32)[0, 0]     # [C, O]
        if "b" in ep["pointwise"]:
            pb = jnp.asarray(ep["pointwise"]["b"], jnp.float32)
        else:
            bn = ep["bn"]
            eps = block.experts[i].conv.bn.eps
            inv = jax.lax.rsqrt(jnp.asarray(bn["var"], jnp.float32) + eps) * bn["scale"]
            pwm = pwm * inv[None, :]
            pb = jnp.asarray(bn["bias"], jnp.float32) - bn["mean"] * inv
        dws.append(d)
        pws.append(pwm)
        pbs.append(pb)
    nb = p["norm_bn"]
    if "mean" in nb:
        eps = block.norm_bn.eps
        inv = jax.lax.rsqrt(jnp.asarray(nb["var"], jnp.float32) + eps) * nb["scale"]
        gamma = inv
        beta = jnp.asarray(nb["bias"], jnp.float32) - nb["mean"] * inv
    else:  # already-affine form {scale, bias}
        gamma = jnp.asarray(nb["scale"], jnp.float32)
        beta = jnp.asarray(nb["bias"], jnp.float32)
    return jnp.stack(dws), jnp.stack(pws), jnp.stack(pbs), gamma, beta, ks
