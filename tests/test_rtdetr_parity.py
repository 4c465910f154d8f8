"""End-to-end RT-DETR decoder parity vs the torch reference (VERDICT r2 #2).

Builds the reference RTDETRDetectionModel from its own rtdetr-l.yaml
(HGNetV2 backbone + AIFI + CCFM + RTDETRDecoder, reference
nn/tasks.py:934 + nn/modules/head.py:1419), imports its randomly
initialized state_dict into our functional model, and compares the decoded
outputs of the full pipeline: multi-scale deformable attention, two-stage
query selection, iterative refinement.

The two-stage top-300 query selection ranks encoder confidences; with
fresh random weights many tokens score within float-accumulation noise of
each other, so torch.topk and lax.top_k can order near-ties differently.
Queries are therefore aligned by their encoder-proposal boxes (a unique
per-anchor signature) and compared under that bijection; only tie-flipped
boundary picks may go unmatched.
"""

import numpy as np
import pytest

REF_YAML = "/root/reference/ultralytics/cfg/models/rt-detr/rtdetr-l.yaml"


@pytest.fixture(scope="module")
def pair(torch_reference):
    import torch

    from ultralytics.nn.tasks import RTDETRDetectionModel as TorchRTDETR

    from yolo_master_tpu.nn.tasks import RTDETRDetectionModel
    from yolo_master_tpu.utils.torch_import import import_state_dict

    torch.manual_seed(0)
    tm = TorchRTDETR(REF_YAML, verbose=False)
    tm.eval()
    jm = RTDETRDetectionModel("rtdetr-master-hgnet")
    params = import_state_dict(jm.init_params(0), tm.state_dict(), strict=True)
    return tm, jm, params


@pytest.fixture(scope="module")
def outputs(pair):
    import torch

    import jax.numpy as jnp

    from yolo_master_tpu.nn.module import Context

    tm, jm, params = pair
    rng = np.random.default_rng(3)
    img = rng.uniform(0, 1, (1, 256, 256, 3)).astype(np.float32)
    with torch.no_grad():
        _, tx = tm(torch.from_numpy(img.transpose(0, 3, 1, 2)))
    t_db, t_ds, t_eb, t_es, _ = (a.numpy() if a is not None else None for a in tx)
    ours = jm.forward_train(params, jnp.asarray(img), Context(training=False))
    return (t_db, t_ds, t_eb, t_es), {k: np.asarray(v) for k, v in ours.items() if k != "hw_shapes"}


def _match(o_eb, t_eb, tol=1e-4):
    """Bijective query alignment by encoder-proposal box signature."""
    d = np.abs(o_eb[:, None, :] - t_eb[None, :, :]).max(-1)
    j = d.argmin(1)
    ok = d.min(1) < tol
    assert len(set(j[ok].tolist())) == ok.sum(), "match is not injective"
    return j, ok


def test_decoder_end_to_end_parity(outputs):
    """Final-layer boxes/scores and the two-stage encoder proposals match the
    reference through the full graph (backbone -> AIFI -> CCFM -> decoder)."""
    (t_db, t_ds, t_eb, t_es), ours = outputs
    assert ours["dec_boxes"].shape == t_db.shape and ours["dec_scores"].shape == t_ds.shape
    j, ok = _match(ours["enc_boxes"][0], t_eb[0])
    # all but a handful of tie-flipped boundary selections must align
    assert ok.sum() >= int(0.9 * len(ok))
    # normalized xywh in [0,1]: 1e-3 is sub-pixel at any image size
    assert np.abs(ours["dec_boxes"][0, 0][ok] - t_db[0, 0][j[ok]]).max() < 1e-3
    # raw class logits accumulate fp drift through ~40 conv/attn layers
    assert np.abs(ours["dec_scores"][0, 0][ok] - t_ds[0, 0][j[ok]]).max() < 5e-2
    assert np.abs(ours["enc_boxes"][0][ok] - t_eb[0][j[ok]]).max() < 1e-3
    assert np.abs(ours["enc_scores"][0][ok] - t_es[0][j[ok]]).max() < 5e-2


def test_top_detections_agree(outputs):
    """Every torch top-30 detection (by sigmoid confidence) has a matching
    detection of the same class in ours — the user-facing contract
    (reference head.py:1596 postprocess)."""
    (t_db, t_ds, _, _), ours = outputs
    t_s = 1 / (1 + np.exp(-t_ds[0, 0]))  # [nq, nc]
    o_s = 1 / (1 + np.exp(-ours["dec_scores"][0, 0]))
    flat_t = t_s.reshape(-1)
    top = np.argsort(-flat_t)[:30]
    tq, tc = top // t_s.shape[1], top % t_s.shape[1]
    for q, c in zip(tq, tc):
        # same-class candidate in ours with matching box and score
        db = np.abs(ours["dec_boxes"][0, 0] - t_db[0, 0, q]).max(-1)
        ds = np.abs(o_s[:, c] - t_s[q, c])
        assert np.min(db + ds) < 2e-3
