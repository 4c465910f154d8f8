"""Fused Pallas ES_MOE kernel (ops/pallas_esmoe.py): parity vs the block's
dense eval path, BN-folded and raw params, and the deploy surgery contract."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_master_tpu.nn.module import Context
from yolo_master_tpu.nn.moe.es_moe import ES_MOE, PallasESMOE
from yolo_master_tpu.ops.pallas_esmoe import fused_esmoe, pack_esmoe_params
from yolo_master_tpu.utils.fuse import fuse_bn_params, pallas_esmoe_fuse


def _block_with_stats(cin=64, cout=None, seed=0):
    rng = np.random.default_rng(seed)
    block = ES_MOE(cin, cout)
    block.finalize("m")
    p = block.init(jax.random.PRNGKey(seed))
    co = block.out_channels
    p["norm_bn"]["mean"] = jnp.asarray(rng.normal(0, 0.2, co), jnp.float32)
    p["norm_bn"]["var"] = jnp.asarray(rng.uniform(0.5, 2.0, co), jnp.float32)
    for i in range(block.num_experts):
        bn = p["experts"][str(i)]["conv"]["bn"]
        bn["mean"] = jnp.asarray(rng.normal(0, 0.2, co), jnp.float32)
        bn["var"] = jnp.asarray(rng.uniform(0.5, 2.0, co), jnp.float32)
    return block, p


@pytest.mark.parametrize("cin,cout", [(64, 64), (32, 48)])
def test_fused_esmoe_parity(cin, cout):
    block, p = _block_with_stats(cin, cout)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (2, 24, 24, cin)), jnp.float32)
    ctx = Context(training=False)
    ref = block(p, x, ctx)
    w, _ = block.routing(p["routing"], x, ctx)
    dw, pw, pb, gamma, beta, ks = pack_esmoe_params(block, p)
    out = fused_esmoe(x, w.astype(jnp.float32), dw, pw, pb, gamma, beta,
                      ks=ks, interpret=jax.default_backend() != "tpu")
    # folding the BN stats into pw/pb reorders the f32 math slightly
    assert float(jnp.max(jnp.abs(out - ref))) < 5e-3


def test_fused_esmoe_parity_folded_params():
    block, p = _block_with_stats()
    pf = fuse_bn_params(p)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(0, 1, (1, 32, 32, 64)), jnp.float32)
    ctx = Context(training=False)
    ref = block(pf, x, ctx)
    w, _ = block.routing(pf["routing"], x, ctx)
    dw, pw, pb, gamma, beta, ks = pack_esmoe_params(block, pf)
    out = fused_esmoe(x, w.astype(jnp.float32), dw, pw, pb, gamma, beta,
                      ks=ks, interpret=jax.default_backend() != "tpu")
    assert float(jnp.max(jnp.abs(out - ref))) < 2e-3


def test_fused_esmoe_bf16():
    block, p = _block_with_stats()
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 1, (2, 16, 16, 64)), jnp.bfloat16)
    ctx = Context(training=False)
    ref = jnp.asarray(block(p, x, ctx), jnp.float32)
    w, _ = block.routing(p["routing"], x, ctx)
    dw, pw, pb, gamma, beta, ks = pack_esmoe_params(block, p)
    out = fused_esmoe(x, w.astype(jnp.float32), dw, pw, pb, gamma, beta,
                      ks=ks, interpret=jax.default_backend() != "tpu")
    assert out.dtype == jnp.bfloat16
    assert float(jnp.max(jnp.abs(jnp.asarray(out, jnp.float32) - ref))) < 0.1


def test_surgery_swaps_dense_blocks_only():
    from yolo_master_tpu.nn.tasks import DetectionModel

    m = DetectionModel("yolo-master-n")
    p = m.init_params(0)
    pf = pallas_esmoe_fuse(m, p)
    swapped = [s.i for s in m.specs if isinstance(s.module, PallasESMOE)]
    assert swapped == [3, 6, 9, 12]
    for i in swapped:
        leaf = pf["layers"][str(i)]
        assert set(leaf) == {"routing", "banks"}
        assert set(leaf["banks"]) == {"dw", "pw", "pb", "gamma", "beta"}
    # sparse (top_k < E) blocks must be left alone: the gathered dispatch
    # path already computes only k experts
    sparse = ES_MOE(64, top_k=2)
    assert not sparse.pallas_fusable()


def test_surgery_forward_runs():
    from yolo_master_tpu.nn.tasks import DetectionModel

    rng = np.random.default_rng(4)
    m = DetectionModel("yolo-master-n")
    p = m.init_params(0)
    x = jnp.asarray(rng.normal(0.4, 0.2, (1, 64, 64, 3)), jnp.float32)
    ref = m.forward_predict(p, x)
    pf = pallas_esmoe_fuse(m, p)
    out = m.forward_predict(pf, x)
    assert out.shape == ref.shape
    assert bool(jnp.all(jnp.isfinite(out)))
    assert float(jnp.max(jnp.abs(out - ref))) < 5e-3
