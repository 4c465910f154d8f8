"""Pallas kernel gates (interpret mode on CPU; real TPU runs exercised by
bench.py and the verify drives)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_pallas_nms_matches_scan_interpret():
    from yolo_master_tpu.ops.nms import _greedy_nms
    from yolo_master_tpu.ops.pallas_nms import pallas_greedy_nms

    rng = np.random.default_rng(3)
    n = 256
    xy = rng.uniform(0, 600, (n, 2))
    wh = rng.uniform(10, 120, (n, 2))
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1), jnp.float32)
    scores = jnp.asarray(rng.uniform(0.01, 1.0, n), jnp.float32)
    ki_p, kv_p = pallas_greedy_nms(boxes, scores, 0.45, 64, interpret=True)
    ki_s, kv_s = _greedy_nms(boxes, scores, 0.45, 64)
    kept_p = np.asarray(ki_p)[np.asarray(kv_p)]
    kept_s = np.asarray(ki_s)[np.asarray(kv_s)]
    assert np.array_equal(kept_p, kept_s)


def test_pallas_nms_early_exit_matches_scan_interpret():
    """Candidates exhaust long before max_det: the kernel's alive-flag early
    exit must still produce the scan's exact keep set, with every post-exit
    slot invalid (idx 0, valid 0)."""
    from yolo_master_tpu.ops.nms import _greedy_nms
    from yolo_master_tpu.ops.pallas_nms import pallas_greedy_nms

    rng = np.random.default_rng(7)
    n, n_valid, max_det = 256, 6, 64
    xy = rng.uniform(0, 600, (n, 2))
    wh = rng.uniform(10, 120, (n, 2))
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1), jnp.float32)
    scores = np.zeros(n, np.float32)
    scores[rng.choice(n, n_valid, replace=False)] = rng.uniform(0.3, 1.0, n_valid)
    scores = jnp.asarray(scores)
    ki_p, kv_p = pallas_greedy_nms(boxes, scores, 0.45, max_det, interpret=True)
    ki_s, kv_s = _greedy_nms(boxes, scores, 0.45, max_det)
    assert np.array_equal(np.asarray(ki_p)[np.asarray(kv_p)], np.asarray(ki_s)[np.asarray(kv_s)])
    n_kept = int(np.asarray(kv_p).sum())
    assert n_kept <= n_valid
    assert not np.asarray(kv_p)[n_kept:].any()
    assert not np.asarray(ki_p)[n_kept:].any()


def test_gathered_expert_matmul_interpret():
    from yolo_master_tpu.ops.pallas_moe import dense_expert_matmul, gathered_expert_matmul

    rng = np.random.default_rng(0)
    B, N, C, O, E, K = 2, 128, 32, 64, 8, 2
    x = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((E, C, O)) * 0.05, jnp.float32)
    idx = jnp.asarray(rng.integers(0, E, (B, K)), jnp.int32)
    wts = jnp.asarray(rng.uniform(0.2, 0.8, (B, K)), jnp.float32)
    out_p = gathered_expert_matmul(x, w, idx, wts, tile_n=64, interpret=True)
    out_d = dense_expert_matmul(x, w, idx, wts)
    assert float(jnp.abs(out_p - out_d).max()) < 1e-4


def test_pallas_c3k2_variants_interpret():
    """Whole-block C3k2 kernels (ops/pallas_c3k2.py): both the NHWC and the
    channels-first variants must match the plain block exactly."""
    from yolo_master_tpu.nn.layers import C3k2
    from yolo_master_tpu.nn.module import Context
    from yolo_master_tpu.ops.pallas_c3k2 import pallas_c3k2, pallas_c3k2_cf, prepare_c3k2_weights
    from yolo_master_tpu.utils.fuse import fuse_bn_params

    for n in (1, 2):
        m = C3k2(32, 64, n=n, c3k=False, e=0.25).finalize("l2")
        p = fuse_bn_params({"layers": {"0": m.init(jax.random.PRNGKey(0))}})["layers"]["0"]
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 20, 32))
        ref = m(p, x, Context(training=False))
        w = prepare_c3k2_weights(p, c=m.c, n=n)
        for fn in (pallas_c3k2, pallas_c3k2_cf):
            out = fn(x, w, c=m.c, n=n, interpret=True)
            assert float(jnp.abs(out - ref).max()) < 1e-5, fn.__name__


def test_pallas_batched_nms_matches_scan_interpret():
    """Batched lockstep kernel: per-image keep sets must equal the scan's,
    including rows that exhaust at very different greedy steps (the whole-batch
    early-exit flag only fires when EVERY row is done)."""
    from yolo_master_tpu.ops.nms import _greedy_nms
    from yolo_master_tpu.ops.pallas_nms import pallas_batched_greedy_nms

    rng = np.random.default_rng(11)
    b, n, max_det = 5, 256, 64
    xy = rng.uniform(0, 600, (b, n, 2))
    wh = rng.uniform(10, 120, (b, n, 2))
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1), jnp.float32)
    scores = np.zeros((b, n), np.float32)
    # row 0: dense; row 1: sparse (3 valid); row 2: empty; rows 3-4: medium
    for i, nv in enumerate([n, 3, 0, 40, 12]):
        if nv:
            scores[i, rng.choice(n, nv, replace=False)] = rng.uniform(0.1, 1.0, nv)
    scores = jnp.asarray(scores)
    ki_b, kv_b = pallas_batched_greedy_nms(boxes, scores, 0.45, max_det, interpret=True)
    for i in range(b):
        ki_s, kv_s = _greedy_nms(boxes[i], scores[i], 0.45, max_det)
        got = np.asarray(ki_b[i])[np.asarray(kv_b[i])]
        want = np.asarray(ki_s)[np.asarray(kv_s)]
        assert np.array_equal(got, want), f"row {i} keep mismatch"
        nk = int(np.asarray(kv_b[i]).sum())
        assert not np.asarray(kv_b[i])[nk:].any()


def test_batched_nms_via_public_api():
    """non_max_suppression(use_pallas) routes through the batched kernel; on
    CPU interpret isn't used so compare pallas-interpret wiring via the scan
    fallback equivalence instead: the public API result must be identical for
    the scan path whether called batched or per-image (regression guard on the
    prep/finalize split)."""
    from yolo_master_tpu.ops.nms import _single_image_nms, non_max_suppression

    rng = np.random.default_rng(13)
    pred = rng.uniform(0, 1, (3, 128, 4 + 8)).astype(np.float32)
    pred[..., :2] = rng.uniform(100, 500, (3, 128, 2))
    pred[..., 2:4] = rng.uniform(20, 80, (3, 128, 2))
    batched = non_max_suppression(
        jnp.asarray(pred), nc=8, conf_thres=0.3, iou_thres=0.5, max_det=16,
        max_nms=64, use_pallas=False,
    )
    for i in range(3):
        single = _single_image_nms(
            jnp.asarray(pred[i]), nc=8, conf_thres=0.3, iou_thres=0.5,
            max_det=16, max_nms=64, agnostic=False, multi_label=False,
            class_mask=None, use_pallas=False,
        )
        for key in ("boxes", "scores", "classes", "valid"):
            assert np.allclose(np.asarray(batched[key][i]), np.asarray(single[key]), atol=1e-6), (key, i)


def test_pallas_batched_cw_nms_matches_scan_interpret():
    """Batched CW-NMS kernel: fused boxes/scores/seeds must equal the scan's
    per image, including rows exhausting at different steps."""
    from yolo_master_tpu.ops.nms import _greedy_cw_nms
    from yolo_master_tpu.ops.pallas_nms import pallas_batched_cw_nms

    rng = np.random.default_rng(17)
    b, n, max_det = 4, 128, 32
    xy = rng.uniform(0, 400, (b, n, 2))
    wh = rng.uniform(10, 90, (b, n, 2))
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1), jnp.float32)
    scores = np.zeros((b, n), np.float32)
    for i, nv in enumerate([n, 5, 0, 20]):
        if nv:
            scores[i, rng.choice(n, nv, replace=False)] = rng.uniform(0.1, 1.0, nv)
    scores = jnp.asarray(scores)
    for weighted in (True, False):
        fb, fs, seed, valid = pallas_batched_cw_nms(
            boxes, scores, 0.45, max_det, sigma=0.1, weighted_iou=weighted, interpret=True)
        for i in range(b):
            sb, ss, sseed, svalid = _greedy_cw_nms(boxes[i], scores[i], 0.45, max_det, 0.1, weighted)
            v = np.asarray(svalid)
            assert np.array_equal(np.asarray(valid[i]), v), (i, weighted)
            assert np.allclose(np.asarray(fb[i])[v], np.asarray(sb)[v], atol=1e-4), (i, weighted)
            assert np.allclose(np.asarray(fs[i])[v], np.asarray(ss)[v], atol=1e-6), (i, weighted)
            assert np.array_equal(np.asarray(seed[i])[v], np.asarray(sseed)[v]), (i, weighted)
