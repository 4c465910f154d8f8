"""Fused Pallas stem gates (interpret mode on CPU; the real-TPU numbers are
in NOTES_ROUND2 — 3.3x vs the XLA stem at bs=8/640px).

The kernel (ops/pallas_stem.py) computes conv0(k3,s2,p1)+SiLU then
conv1(k3,s2,p1)+SiLU from a space-to-depth(4) host blob; these tests gate
bit-level parity against the plain lax.conv stem and the whole-model fuse
transform (utils/fuse.py pallas_stem_fuse).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _ref_stem(x_nhwc, w0, b0, w1, b1):
    def conv(x, w, b):
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=(2, 2), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b
        return y * jax.nn.sigmoid(y)

    return conv(conv(x_nhwc, w0, b0), w1, b1)


def test_fused_stem_matches_lax_conv_interpret():
    from yolo_master_tpu.ops.pallas_stem import fused_stem, s2d4_blob, s2d4_blob_np

    rng = np.random.default_rng(0)
    H = W = 64
    c0, c1 = 8, 16
    x = rng.standard_normal((2, H, W, 3)).astype(np.float32)
    w0 = (rng.standard_normal((3, 3, 3, c0)) * 0.2).astype(np.float32)
    b0 = rng.standard_normal(c0).astype(np.float32)
    w1 = (rng.standard_normal((3, 3, c0, c1)) * 0.2).astype(np.float32)
    b1 = rng.standard_normal(c1).astype(np.float32)

    ref = _ref_stem(jnp.asarray(x), jnp.asarray(w0), b0, jnp.asarray(w1), b1)

    blob = s2d4_blob(jnp.transpose(jnp.asarray(x), (0, 3, 1, 2)))
    out = fused_stem(blob, jnp.asarray(w0), b0, jnp.asarray(w1), b1, height=H, interpret=True)
    assert out.shape == (2, H // 4, W // 4, c1)
    assert float(jnp.abs(out - ref).max()) < 1e-4

    # numpy host-preprocess twin produces the identical blob
    blob_np = s2d4_blob_np(np.transpose(x, (0, 3, 1, 2)))
    assert blob_np.shape == blob.shape
    np.testing.assert_allclose(np.asarray(blob), blob_np, rtol=0, atol=0)


def test_pallas_stem_fuse_model_parity_interpret():
    from yolo_master_tpu.nn.module import Context
    from yolo_master_tpu.nn.tasks import DetectionModel
    from yolo_master_tpu.ops.pallas_stem import s2d4_blob
    from yolo_master_tpu.utils.fuse import fuse_bn_params, pallas_stem_fuse

    m = DetectionModel("yolo-master-n")
    p = fuse_bn_params(m.init_params(0))
    x = jnp.asarray(np.random.default_rng(1).random((1, 64, 64, 3)), jnp.float32)
    ref = m.forward_predict(p, x, Context(training=False))

    p2 = pallas_stem_fuse(m, p, 64)
    assert m.input_blob
    blob = s2d4_blob(jnp.transpose(x, (0, 3, 1, 2)))
    out = m.forward_predict(p2, blob, Context(training=False))
    assert float(jnp.abs(out - ref).max()) < 1e-3


@pytest.mark.slow
def test_facade_fuse_pallas_stem_predict_parity():
    from yolo_master_tpu.models.yolo import YOLO

    img = (np.random.default_rng(2).random((80, 70, 3)) * 255).astype(np.uint8)
    y = YOLO("yolo-master-n")
    ref = y.predict(img, imgsz=64, conf=0.0001, max_det=20)[0]
    y.fuse(pallas_stem=True, imgsz=64)
    out = y.predict(img, imgsz=64, conf=0.0001, max_det=20)[0]
    assert len(out.boxes) == len(ref.boxes)
    np.testing.assert_allclose(out.boxes.xyxy, ref.boxes.xyxy, atol=0.1)


def test_pallas_stem_fuse_requires_bn_fold():
    from yolo_master_tpu.nn.tasks import DetectionModel
    from yolo_master_tpu.utils.fuse import pallas_stem_fuse

    m = DetectionModel("yolo-master-n")
    with pytest.raises(ValueError, match="fuse_bn_params"):
        pallas_stem_fuse(m, m.init_params(0), 64)


def test_blocked_c3k2_parity():
    """Space-to-depth(2) blocked C3k2 (nn/blocked.py) is exact vs the plain
    block (the HBM lane-padding fix; 2.3x measured in isolation on v5e)."""
    from yolo_master_tpu.nn.blocked import BlockedC3k2, block_weight, from_blocked, to_blocked
    from yolo_master_tpu.nn.layers import C3k2
    from yolo_master_tpu.nn.module import Context
    from yolo_master_tpu.utils.fuse import fuse_bn_params

    m = C3k2(32, 64, n=2, c3k=False, e=0.25).finalize("l2")
    p = fuse_bn_params({"layers": {"0": m.init(jax.random.PRNGKey(0))}})["layers"]["0"]
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 32))
    ref = m(p, x, Context(training=False))
    bm = BlockedC3k2(m)
    out = bm(BlockedC3k2.remap_params(p), x, Context(training=False))
    assert float(jnp.abs(out - ref).max()) < 1e-5

    # relayout round-trip is the identity
    np.testing.assert_array_equal(np.asarray(from_blocked(to_blocked(x))), np.asarray(x))
    # k1 blocked weight is block-diagonal per phase
    w = np.random.default_rng(0).standard_normal((1, 1, 4, 8)).astype(np.float32)
    wb = block_weight(w)
    assert wb.shape == (1, 1, 16, 32)
    for pi in range(4):
        for po in range(4):
            sub = wb[0, 0][pi::4][:, po::4]
            if pi == po:
                np.testing.assert_allclose(sub, w[0, 0])
            else:
                assert np.abs(sub).max() == 0
