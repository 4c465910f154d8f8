"""Quantization ACCURACY gates (VERDICT r3 missing #6 / next-round item 8).

The router-aware int8 plan (`nn/moe/quantize.py`, reference
ultralytics/nn/modules/moe/quantize.py:40-204) existed without a measured mAP
delta. This module trains a small MoE detection model to real accuracy on the
synthetic set, then gates on a 64-image UNSEEN val split (8 images quantize
mAP50-95 in 0.0125 steps — one box crossing one IoU bucket — which is coarser
than the gates themselves; measured, see the fixture):

  * int8 weight quantization round-trip (the production plan):
    |dmAP50-95| <= 0.01  (measured ~0.0002);
  * router exclusion does something: quantizing the routers too must never
    beat the router-aware plan (and the structural exclusion is asserted);
  * the PTQ tflite ARTIFACTS, calibrated on real val images, validated
    through AutoBackend with the identical protocol. Measured ladder on this
    2M-param toy (64-image val): weight-only int8 0.0002, 16x8 activations
    ~0.027, full-int8 activations ~0.21 — ACTIVATION quantization of the
    decode head is the cost driver, the router-aware weight plan is free.
    Gates: 16x8 |dmAP50-95| <= 0.03; full-int8 functional (non-degenerate).
"""

import numpy as np
import pytest

from test_train import MINI_CFG, synth_dataset  # noqa: F401 (fixture reuse)

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def trained(synth_dataset, tmp_path_factory):  # noqa: F811
    """MINI_CFG (has an ES_MOE block -> real router params) overfit to the
    synthetic set — same recipe as test_train.test_overfit_synthetic."""
    from yolo_master_tpu.engine.trainer import DetectionTrainer
    from yolo_master_tpu.nn.tasks import DetectionModel

    class Stub:
        pass

    model = DetectionModel(MINI_CFG)
    yolo = Stub()
    yolo.model = model
    yolo.params = model.init_params(0)
    trainer = DetectionTrainer(
        yolo, data=synth_dataset, epochs=150, batch=8, imgsz=96, max_gt=8,
        optimizer="SGD", warmup_epochs=0, lr0=0.02, lrf=0.1, nbs=8, amp=False,
        save_dir=str(tmp_path_factory.mktemp("quant_run")), hyp={"mosaic": 0.0},
        patience=1000, val=False,
    )
    trainer.train()
    return model, trainer.state.ema_params


@pytest.fixture(scope="module")
def big_val(tmp_path_factory):
    """64 UNSEEN val images of the same rectangle distribution (seed differs
    from the training fixture). 8 val images give mAP50-95 a 0.0125-step
    resolution — coarser than the 0.01 gate — so accuracy deltas are measured
    here instead (~0.002-step resolution)."""
    import cv2

    root = tmp_path_factory.mktemp("quant_bigval")
    rng = np.random.default_rng(7)
    for split, n in (("train", 2), ("val", 64)):  # tiny train split: unused
        (root / f"images/{split}").mkdir(parents=True)
        (root / f"labels/{split}").mkdir(parents=True)
        for i in range(n):
            img = np.full((96, 96, 3), 120, np.uint8)
            lines = []
            for _ in range(int(rng.integers(1, 3))):
                cls = int(rng.integers(0, 2))
                w, h = int(rng.integers(25, 45)), int(rng.integers(25, 45))
                x1, y1 = int(rng.integers(0, 96 - w)), int(rng.integers(0, 96 - h))
                color = (0, 0, 220) if cls == 0 else (220, 0, 0)
                cv2.rectangle(img, (x1, y1), (x1 + w, y1 + h), color, -1)
                lines.append(
                    f"{cls} {(x1 + w / 2) / 96:.4f} {(y1 + h / 2) / 96:.4f} {w / 96:.4f} {h / 96:.4f}"
                )
            cv2.imwrite(str(root / f"images/{split}/{i:03d}.jpg"), img)
            (root / f"labels/{split}/{i:03d}.txt").write_text("\n".join(lines))
    (root / "data.yaml").write_text(
        f"path: {root}\ntrain: images/train\nval: images/val\nnames:\n  0: red\n  1: blue\n"
    )
    return str(root / "data.yaml")


def _val(model, params, data, backend=None):
    from yolo_master_tpu.engine.validator import DetectionValidator

    v = DetectionValidator(model=model, params=params, data=data, imgsz=96, batch=8,
                           max_gt=8, backend=backend)
    return v()


def test_int8_roundtrip_accuracy(trained, big_val):
    from yolo_master_tpu.nn.moe.quantize import dequantize_params, quantize_params

    model, params = trained
    base = _val(model, params, big_val)
    assert base["mAP50"] > 0.6, f"underfit baseline invalidates the gate: {base}"

    # the PRODUCTION plan (default min_size=512 floor, routers excluded):
    # this is what quantize_params ships — gate its absolute accuracy
    q_prod = dequantize_params(quantize_params(params))
    prod = _val(model, q_prod, big_val)
    d_prod = abs(prod["mAP50-95"] - base["mAP50-95"])
    assert d_prod <= 0.01, f"int8 plan mAP drop {d_prod:.4f} > 0.01 ({prod} vs {base})"

    # aggressive floor (min_size=16): every leaf >=16 elements is eligible, so
    # the router MLPs are in play — router_aware=True must EXCLUDE them and
    # must never be WORSE than quantizing the routers too (comparative gate)
    q_ra = dequantize_params(quantize_params(params, router_aware=True, min_size=16))
    ra = _val(model, q_ra, big_val)
    d_ra = abs(ra["mAP50-95"] - base["mAP50-95"])

    q_all = dequantize_params(quantize_params(params, router_aware=False, min_size=16))
    allq = _val(model, q_all, big_val)
    d_all = abs(allq["mAP50-95"] - base["mAP50-95"])
    assert d_ra <= d_all + 5e-3, (
        f"router-aware ({d_ra:.4f}) worse than quantize-everything ({d_all:.4f})"
    )


def test_router_exclusion_structural(trained):
    """The router-aware plan must actually leave router leaves in float while
    the non-aware plan quantizes them (reference quantize.py node exclusion)."""
    from yolo_master_tpu.nn.moe.quantize import quantize_params

    model, params = trained

    def router_quantized(tree, path=()):
        found = []
        if isinstance(tree, dict):
            if "q" in tree and "scale" in tree:
                return [(path, True)]
            for k, v in tree.items():
                found += router_quantized(v, path + (k,))
        return found

    from yolo_master_tpu.nn.moe.quantize import _is_router_path

    # min_size=16: MINI_CFG's ES_MOE routing MLP leaves are 256/24 elements,
    # under the default 512 size floor — the exclusion gate needs them eligible
    ra = [p for p, _ in router_quantized(quantize_params(params, router_aware=True, min_size=16))]
    nora = [p for p, _ in router_quantized(quantize_params(params, router_aware=False, min_size=16))]
    ra_routers = [p for p in ra if _is_router_path(p)]
    nora_routers = [p for p in nora if _is_router_path(p)]
    assert not ra_routers, f"router-aware quantized router leaves: {ra_routers[:3]}"
    assert nora_routers, "no router leaf was ever quantized — exclusion gate is vacuous"


def test_int8_tflite_artifact_accuracy(trained, synth_dataset, big_val, tmp_path):  # noqa: F811
    """The actual PTQ tflite artifacts, calibrated on real images, validated
    with the SAME protocol as the native path via AutoBackend."""
    from yolo_master_tpu.data.dataset import DataLoader, YOLODataset
    from yolo_master_tpu.engine.exporter import export_model
    from yolo_master_tpu.nn.autobackend import AutoBackend

    model, params = trained
    base = _val(model, params, big_val)

    # calibration batches = real images, letterboxed like inference
    ds = YOLODataset(synth_dataset, split="val", imgsz=96, max_gt=8, augment=False)
    calib = [b["images"][:1] for b in DataLoader(ds, 1, shuffle=False).epoch(0)]

    # accuracy-first PTQ: 16x8 (int16 activations, int8 weights)
    tl = export_model(
        model, params, "tflite", imgsz=96, batch=1, int8=True, act16=True, nms=False,
        output=str(tmp_path / "int16x8.tflite"), calibration_data=calib,
    )
    q = _val(model, None, big_val, backend=AutoBackend(tl))
    d = abs(q["mAP50-95"] - base["mAP50-95"])
    assert q["mAP50"] > 0.5, f"16x8 tflite artifact degenerate: {q}"
    # measured ~0.022-0.027 across calibration sizes (8 vs 64 images): the
    # int16 activation grid on the DFL/decode tail, not calibration thinness
    assert d <= 0.03, f"16x8 tflite mAP50-95 drop {d:.4f} > 0.03 ({q} vs {base})"

    # full-int8 activations: with the embedded decode this measured ~0.21
    # mAP50-95 — the int8 grid destroys the DFL/decode tail. The shipped
    # artifact now defaults to host_decode: the quantized body returns raw
    # head logits and AutoBackend runs the tail in float (the edgetpu-optimal
    # partition), which makes full-int8 accuracy-gated like 16x8.
    import json

    tl8 = export_model(
        model, params, "tflite", imgsz=96, batch=1, int8=True, nms=False,
        output=str(tmp_path / "int8.tflite"), calibration_data=calib,
    )
    assert json.loads((tmp_path / "int8.tflite.json").read_text())["decode"] == "host"
    q8 = _val(model, None, big_val, backend=AutoBackend(tl8))
    d8 = abs(q8["mAP50-95"] - base["mAP50-95"])
    assert q8["mAP50"] > 0.5, f"full-int8 tflite artifact degenerate: {q8}"
    assert d8 <= 0.03, f"full-int8 (host-decode) mAP50-95 drop {d8:.4f} > 0.03 ({q8} vs {base})"
