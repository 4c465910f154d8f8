"""SAM promptable segmentation beachhead (VERDICT r1 #8): encoder/prompt/
decoder shapes, gradient flow, point/box prompt API, FastSAM filtering."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_master_tpu.nn.module import Context


@pytest.fixture(scope="module")
def tiny_sam():
    from yolo_master_tpu.models.sam import build_sam

    m = build_sam("vit_b_tiny", img_size=128)
    return m, m.init_params(0)


def test_sam_component_shapes(tiny_sam):
    m, p = tiny_sam
    ctx = Context(training=False)
    x = jnp.zeros((1, 128, 128, 3))
    emb = m.encode_image(p, x, ctx)
    assert emb.shape == (1, 8, 8, 256)  # 128/16 grid, 256 embed

    pts = jnp.asarray([[[0.3, 0.4], [0.0, 0.0]]], jnp.float32)
    lbl = jnp.asarray([[1, -1]], jnp.int32)
    masks, iou = m.decode_prompts(p, emb, ctx, points=pts, labels=lbl)
    assert masks.shape == (1, 4, 32, 32)  # 4 mask tokens, 4x-upscaled grid
    assert iou.shape == (1, 4)

    box = jnp.asarray([[[0.1, 0.1], [0.7, 0.8]]], jnp.float32)
    masks_b, _ = m.decode_prompts(p, emb, ctx, boxes=box)
    assert masks_b.shape == (1, 4, 32, 32)


def test_sam_gradients_flow(tiny_sam):
    m, p = tiny_sam
    ctx = Context(training=True)
    x = jnp.asarray(np.random.default_rng(0).uniform(size=(1, 128, 128, 3)), jnp.float32)
    pts = jnp.asarray([[[0.5, 0.5]]], jnp.float32)
    lbl = jnp.asarray([[1]], jnp.int32)
    target = jnp.zeros((1, 32, 32))

    def loss(p):
        emb = m.encode_image(p, x, ctx)
        masks, iou = m.decode_prompts(p, emb, ctx, points=pts, labels=lbl)
        return jnp.mean((jax.nn.sigmoid(masks[:, 0]) - target) ** 2) + 1e-3 * jnp.mean(iou**2)

    g = jax.grad(loss)(p)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # encoder, prompt encoder, and decoder must ALL receive gradient
    assert float(jnp.abs(g["image_encoder"]["patch_embed"]["w"]).max()) > 0
    assert float(jnp.abs(g["mask_decoder"]["mask_tokens"]).max()) > 0


def test_sam_predictor_point_and_box_prompts():
    import cv2

    from yolo_master_tpu.models.sam import SAMPredictor

    img = np.full((96, 160, 3), 110, np.uint8)
    cv2.rectangle(img, (40, 20), (110, 70), (0, 0, 230), -1)
    pred = SAMPredictor(variant="vit_b_tiny", img_size=128)
    pred.set_image(img)
    masks, iou = pred.predict_points([(75, 45)], [1])
    assert masks.shape == (4, 96, 160) and masks.dtype == bool
    assert iou.shape == (4,)
    # prompt-set reuse: a second prompt on the same image needs no re-encode
    emb_before = pred._emb
    masks2, _ = pred.predict_box([40, 20, 110, 70])
    assert pred._emb is emb_before
    assert masks2.shape == (4, 96, 160)


def test_fastsam_prompt_filtering():
    from yolo_master_tpu.engine.results import Results

    class _StubYOLO:
        def predict(self, source, **kw):
            img = np.zeros((100, 100, 3), np.uint8)
            boxes = np.array(
                [[10, 10, 30, 30, 0.9, 0], [60, 60, 90, 90, 0.8, 0], [40, 40, 55, 55, 0.7, 1]], np.float32
            )
            return [Results(img, names={0: "a", 1: "b"}, boxes=boxes)]

    from yolo_master_tpu.models.sam import FastSAM

    fs = FastSAM.__new__(FastSAM)
    fs.yolo = _StubYOLO()
    r = fs(np.zeros((100, 100, 3), np.uint8), points=[(20, 20)])[0]
    assert len(r.boxes) == 1 and r.boxes.xyxy[0, 0] == 10
    r2 = fs(np.zeros((100, 100, 3), np.uint8), bboxes=[58, 58, 92, 92])[0]
    assert len(r2.boxes) == 1 and r2.boxes.xyxy[0, 0] == 60
