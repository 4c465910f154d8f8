"""Gathered sparse dispatch: parity vs masked-dense + measured FLOP reduction
(the reference gates: sparse-vs-dense <= 1e-4 and >= 20% expert-FLOPs cut,
benchmarks/mixture_baselines.yaml:4-5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_master_tpu.nn.module import Context
from yolo_master_tpu.nn.moe.dispatch import _pad_kernel_center, gather_dispatch, stack_expert_params
from yolo_master_tpu.nn.moe.es_moe import ES_MOE
from yolo_master_tpu.nn.moe.mixtures import OptimizedMOEImproved


def _x(b=4, hw=16, c=32, seed=0):
    return jnp.asarray(np.random.default_rng(seed).normal(size=(b, hw, hw, c)), jnp.float32)


@pytest.mark.parametrize(
    "block",
    [
        ES_MOE(32, 32, num_experts=8, top_k=2, dynamic_threshold=0.0),
        ES_MOE(32, 32, num_experts=8, top_k=3, dynamic_threshold=0.0),
        OptimizedMOEImproved(32, 32, num_experts=8, top_k=2, progressive_sparsity=False),
        OptimizedMOEImproved(32, 48, num_experts=6, top_k=2, expert_type="ghost", progressive_sparsity=False),
    ],
    ids=["es_moe_k2", "es_moe_k3", "opt_simple", "opt_ghost"],
)
def test_sparse_gather_matches_dense(block):
    """Computing only the top-k gathered experts must equal the masked-dense
    sum (weights are exactly zero outside top-k). Precision pinned so the gate
    measures dispatch math, not backend conv rounding."""
    block.finalize("m")
    p = block.init(jax.random.PRNGKey(0))
    x = _x(c=32)
    with jax.default_matmul_precision("highest"):
        ys = jax.jit(lambda p, x: block(p, x, Context(training=False, sparse_inference=True)))(p, x)
        yd = jax.jit(lambda p, x: block(p, x, Context(training=False, sparse_inference=False)))(p, x)
    assert float(jnp.abs(ys - yd).max()) <= 1e-4


def test_dynamic_threshold_gather_matches_masked_dense():
    """Threshold pruning is a sparse-eval-only behavior (reference
    modules.py:629-642, dense forward does not prune): compare the gathered
    path against a manual masked-dense sum using the SAME retained weights."""
    m = ES_MOE(32, 32, num_experts=8, top_k=3, dynamic_threshold=0.4)
    m.finalize("m")
    p = m.init(jax.random.PRNGKey(0))
    x = _x(c=32)
    ctx = Context(training=False)
    with jax.default_matmul_precision("highest"):
        ys = m(p, x, Context(training=False, sparse_inference=True))
        w, _ = m.routing(p["routing"], x, ctx)
        w = m._sparse_retained_weights(w)
        out = None
        for i, expert in enumerate(m.experts):
            y = expert(p["experts"][str(i)], x, ctx) * w[:, i][:, None, None, None]
            out = y if out is None else out + y
        from yolo_master_tpu.nn.layers import silu

        yd = silu(m.norm_bn(p["norm_bn"], out, ctx))
    assert float(jnp.abs(ys - yd).max()) <= 1e-4


def test_sparse_flops_reduction_measured():
    """Compiled-HLO FLOPs of the gathered path must be >=20% below dense
    (measured, not k/E arithmetic) on a 16-expert top-2 layer."""
    m = OptimizedMOEImproved(32, 32, num_experts=16, top_k=2, progressive_sparsity=False)
    m.finalize("m")
    p = m.init(jax.random.PRNGKey(0))
    x = _x(c=32)
    fs = jax.jit(lambda p, x: m(p, x, Context(training=False, sparse_inference=True)))
    fd = jax.jit(lambda p, x: m(p, x, Context(training=False, sparse_inference=False)))
    flops_s = fs.lower(p, x).compile().cost_analysis()["flops"]
    flops_d = fd.lower(p, x).compile().cost_analysis()["flops"]
    assert flops_s < 0.8 * flops_d, (flops_s, flops_d)


def test_pad_kernel_center_conv_exact():
    from yolo_master_tpu.nn.layers import conv2d

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 12, 12, 8)), jnp.float32)
    w3 = jnp.asarray(rng.normal(size=(3, 3, 1, 8)), jnp.float32)
    w9 = _pad_kernel_center(w3, 9, 9)
    with jax.default_matmul_precision("highest"):
        y1 = conv2d(x, w3, stride=1, padding=1, groups=8)
        y2 = conv2d(x, w9, stride=1, padding=4, groups=8)
    assert float(jnp.abs(y1 - y2).max()) < 1e-5


def test_stack_gather_heterogeneous_kernels():
    """ES-MoE 3/5/7 depthwise kernels stack via centered zero-pad; gathering
    any expert through the max-kernel module reproduces its direct output."""
    m = ES_MOE(16, 16, num_experts=3, top_k=2)
    m.finalize("m")
    p = m.init(jax.random.PRNGKey(1))
    x = _x(b=2, hw=8, c=16, seed=1)
    ctx = Context(training=False)
    bank = stack_expert_params([p["experts"][str(i)] for i in range(3)])
    with jax.default_matmul_precision("highest"):
        for e in range(3):
            direct = m.experts[e](p["experts"][str(e)], x, ctx)
            idx = jnp.full((2, 1), e, jnp.int32)
            wts = jnp.ones((2, 1), jnp.float32)
            gathered = gather_dispatch(m.experts[2], bank, x, idx, wts, ctx)
            assert float(jnp.abs(direct - gathered).max()) < 1e-5


def test_suite_expert_flops_gate():
    from yolo_master_tpu.benchmarks.suite import _expert_flops

    out = _expert_flops({"num_experts": 8, "top_k": 2, "channels": 32, "batch": 2})
    assert out["pass"], out
    assert out["flop_reduction"] >= 0.2
