"""RT-DETR completion gates (VERDICT r1 #7): HGNetV2 backbone blocks, AIFI,
contrastive denoising (CDN), and end-to-end training through the shared loop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_master_tpu.nn.module import Context

TINY_RTDETR = {
    "nc": 2,
    "backbone": [
        [-1, 1, "HGStem", [8, 16]],                 # 0  P2/4
        [-1, 1, "HGBlock", [8, 32, 3]],             # 1
        [-1, 1, "DWConv", [32, 3, 2, 1, False]],    # 2  P3/8
        [-1, 1, "HGBlock", [16, 64, 3, True, False]],  # 3
        [-1, 1, "DWConv", [64, 3, 2, 1, False]],    # 4  P4/16
        [-1, 1, "HGBlock", [16, 64, 3, True, True]],   # 5
        [-1, 1, "DWConv", [64, 3, 2, 1, False]],    # 6  P5/32
        [-1, 1, "AIFI", [64, 4]],                   # 7
        [-1, 1, "RepC3", [64]],                     # 8
    ],
    "head": [[[3, 5, 8], 1, "RTDETRDecoder", ["nc", 32, 16, 2, 4, 2, 64]]],
}


def test_hgnet_blocks_and_aifi_forward():
    from yolo_master_tpu.nn.layers import AIFI, HGBlock, HGStem, RepC3

    x = jnp.ones((2, 32, 32, 3))
    ctx = Context(training=False)
    stem = HGStem(3, 8, 16)
    stem.finalize("s")
    y = stem(stem.init(jax.random.PRNGKey(0)), x, ctx)
    assert y.shape == (2, 8, 8, 16)  # 4x downsample

    blk = HGBlock(16, 8, 32, n=3, lightconv=True, shortcut=False)
    blk.finalize("b")
    y2 = blk(blk.init(jax.random.PRNGKey(1)), y, ctx)
    assert y2.shape == (2, 8, 8, 32)

    aifi = AIFI(32, cm=64, num_heads=4)
    aifi.finalize("a")
    y3 = aifi(aifi.init(jax.random.PRNGKey(2)), y2, ctx)
    assert y3.shape == y2.shape

    rep = RepC3(32, 32, n=2)
    rep.finalize("r")
    y4 = rep(rep.init(jax.random.PRNGKey(3)), y3, ctx)
    assert y4.shape == y3.shape


def test_rtdetr_hgnet_model_builds():
    from yolo_master_tpu.nn.tasks import RTDETRDetectionModel

    m = RTDETRDetectionModel(TINY_RTDETR)
    p = m.init_params(0)
    out = m.forward_predict(p, jnp.zeros((1, 64, 64, 3)), Context(training=False))
    assert out.shape[-1] == 4 + 2  # xywh + nc scores


def test_cdn_group_structure():
    from yolo_master_tpu.models.rtdetr import get_cdn_group

    B, m, nq = 2, 4, 16
    gt_boxes = jnp.array([[[10, 10, 50, 50], [20, 20, 60, 60], [0, 0, 0, 0], [0, 0, 0, 0]],
                          [[5, 5, 30, 30], [0, 0, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0]]], jnp.float32)
    gt_cls = jnp.zeros((B, m), jnp.int32)
    gt_mask = jnp.array([[True, True, False, False], [True, False, False, False]])
    dn = get_cdn_group(gt_boxes, gt_cls, gt_mask, nc=2, nq=nq, imgsz=(96, 96), key=jax.random.PRNGKey(0))

    nd = dn["cls"].shape[1]
    assert nd % (2 * m) == 0
    # padded GT slots carry class 0 (the embedding has nc rows like the
    # reference nn.Embedding(nc, hd)) and are masked out of the loss
    assert int(dn["cls"][1, 1]) == 0
    assert not bool(dn["pos_mask"][1, 1])
    # positives only on valid, even-group slots
    assert bool(dn["pos_mask"][0, 0]) and not bool(dn["pos_mask"][0, m])  # slot m = group 0 negative
    # attention mask: real queries cannot see dn queries
    mask = dn["attn_mask"]
    assert mask.shape == (nd + nq, nd + nq)
    assert float(mask[nd, 0]) < -1e8 and float(mask[0, nd]) == 0.0
    # dn group 0 cannot see group 1
    assert float(mask[0, 2 * m]) < -1e8 and float(mask[0, 1]) == 0.0
    # positive noised boxes stay near their GT (normalized)
    gt0 = np.array([30, 30, 40, 40]) / 96.0  # xywh of first GT
    assert np.abs(np.asarray(dn["boxes"][0, 0]) - gt0).max() < 0.5


def test_rtdetr_train_step_with_cdn():
    """One jitted train step: in-graph greedy matching + CDN loss, finite grads."""
    from yolo_master_tpu.engine.train_step import make_optimizer, make_train_state, make_train_step
    from yolo_master_tpu.nn.tasks import RTDETRDetectionModel

    m = RTDETRDetectionModel(TINY_RTDETR)
    tx = make_optimizer(0.001, params=m.init_params(0))
    state = make_train_state(m, seed=0, tx=tx)
    step = make_train_step(m, tx=tx, imgsz=64, batch_per_step=2, max_gt=4)
    rng = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)), jnp.float32),
        "boxes": jnp.asarray([[[8, 8, 40, 40], [16, 16, 48, 48], [0, 0, 0, 0], [0, 0, 0, 0]]] * 2, jnp.float32),
        "classes": jnp.zeros((2, 4), jnp.int32),
        "mask": jnp.asarray([[True, True, False, False]] * 2),
    }
    state, metrics = step(state, batch)
    assert float(metrics["finite"]) == 1.0
    assert float(metrics["dn_loss"]) > 0.0, "CDN denoising loss must be active in training"
    s2, m2 = step(state, batch)
    assert np.isfinite(float(m2["loss"]))


@pytest.mark.slow
def test_rtdetr_training_e2e(tmp_path):
    """rtdetr-task training through the shared trainer loop on synthetic data."""
    import cv2

    from yolo_master_tpu.engine.trainers_task import TASK_TRAINERS
    from yolo_master_tpu.nn.tasks import RTDETRDetectionModel

    root = tmp_path / "ds"
    rng = np.random.default_rng(1)
    for split, n in (("train", 8), ("val", 4)):
        (root / "images" / split).mkdir(parents=True)
        (root / "labels" / split).mkdir(parents=True)
        for i in range(n):
            img = np.full((96, 96, 3), 120, np.uint8)
            x1, y1 = int(rng.integers(5, 40)), int(rng.integers(5, 40))
            w, h = int(rng.integers(30, 45)), int(rng.integers(25, 40))
            cv2.rectangle(img, (x1, y1), (x1 + w, y1 + h), (0, 0, 220), -1)
            cv2.imwrite(str(root / "images" / split / f"{i:02d}.jpg"), img)
            (root / "labels" / split / f"{i:02d}.txt").write_text(
                f"0 {(x1 + w / 2) / 96:.4f} {(y1 + h / 2) / 96:.4f} {w / 96:.4f} {h / 96:.4f}"
            )
    (root / "data.yaml").write_text(f"path: {root}\ntrain: images/train\nval: images/val\nnames:\n  0: thing\n")

    class Stub:
        pass

    model = RTDETRDetectionModel({**TINY_RTDETR, "nc": 1})
    yolo = Stub()
    yolo.model = model
    yolo.params = model.init_params(0)
    trainer = TASK_TRAINERS["rtdetr"](
        yolo, data=str(root / "data.yaml"), epochs=3, batch=4, imgsz=96, max_gt=4,
        optimizer="AdamW", lr0=0.001, warmup_epochs=0, nbs=4, amp=False,
        patience=100, close_mosaic=0, hyp={"mosaic": 0.0}, save_dir=str(tmp_path / "run"),
    )
    out = trainer.train()
    assert "mAP50" in out


def test_greedy_assign_matches_hungarian_when_unambiguous():
    """With nq >> m and well-separated costs, greedy must equal scipy's
    optimal assignment; on adversarial ties it stays feasible (no conflicts)."""
    from scipy.optimize import linear_sum_assignment

    from yolo_master_tpu.models.rtdetr import greedy_assign

    rng = np.random.default_rng(0)
    for trial in range(5):
        m, nq = 6, 40
        cost = rng.uniform(0, 10, (1, m, nq)).astype(np.float32)
        mask = np.ones((1, m), bool)
        idx = np.asarray(greedy_assign(jnp.asarray(cost), jnp.asarray(mask)))[0]
        assert len(set(idx.tolist())) == m, "assignment must be conflict-free"
        ri, ci = linear_sum_assignment(cost[0])
        greedy_cost = cost[0][np.arange(m), idx].sum()
        opt_cost = cost[0][ri, ci].sum()
        assert greedy_cost <= opt_cost * 1.15 + 1e-6, (greedy_cost, opt_cost)
