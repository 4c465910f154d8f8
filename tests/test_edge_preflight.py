"""Edge deployment API + export capability matrix / preflight gates
(reference analogs: ultralytics/edge, utils/export_capabilities.py,
utils/export_preflight.py, utils/export_validation.py)."""

import numpy as np
from pathlib import Path
import pytest


@pytest.fixture(scope="module")
def model_np():
    from yolo_master_tpu.nn.tasks import DetectionModel

    m = DetectionModel("yolo-master-n")
    return m, m.init_params(0)


def test_capability_matrix_loads_and_validates():
    from yolo_master_tpu.utils.export_preflight import load_export_capability_matrix

    mat = load_export_capability_matrix()
    assert mat["schema_version"] == 1
    assert {"MoE", "MoA", "MoT", "MoLoRA", "Latent"} <= set(mat["modules"])
    # every exporter format row must have a matrix row (alias-normalized)
    from yolo_master_tpu.engine.exporter import EXPORT_FORMATS
    from yolo_master_tpu.utils.export_preflight import normalize_export_format

    for fmt in EXPORT_FORMATS:
        if fmt in ("npz", "tfjs", "rknn", "imx", "executorch"):
            continue  # npz native; niche rows carry their own matrix keys
        assert normalize_export_format(fmt) in mat["formats"], fmt


def test_matrix_validation_rejects_bad_schemas():
    from yolo_master_tpu.utils.export_preflight import validate_export_capability_matrix

    with pytest.raises(ValueError):
        validate_export_capability_matrix({"schema_version": 2, "formats": {}, "modules": {}})
    with pytest.raises(ValueError):
        validate_export_capability_matrix({
            "schema_version": 1,
            "formats": {"x": {"supported": False, "default": "dynamic", "known_error": None}},
            "modules": {f: {"supported": True, "dense_fallback": False,
                            "requires_merge": False, "known_error": None}
                        for f in ("MoE", "MoA", "MoT", "MoLoRA", "Latent")},
        })  # unsupported format must refuse


def test_preflight_decisions_on_moe_model(model_np):
    from yolo_master_tpu.utils.export_preflight import export_preflight

    m, _ = model_np
    out = export_preflight(m, "tflite", strict=True)
    assert out["backend"] == "litert" and out["ok"]
    fams = {d["module_family"] for d in out["decisions"]}
    assert "MoE" in fams  # yolo-master-n carries ES_MOE blocks
    assert all(d["strategy"] == "dynamic" for d in out["decisions"])


def test_preflight_refuses_tensorrt_strict(model_np):
    from yolo_master_tpu.utils.export_preflight import export_preflight

    m, _ = model_np
    with pytest.raises(RuntimeError, match="refused"):
        export_preflight(m, "engine", strict=True)
    out = export_preflight(m, "engine", strict=False)
    assert not out["ok"]
    assert all(d["strategy"] == "refuse" for d in out["decisions"])


def test_preflight_molora_requires_merge(model_np):
    from yolo_master_tpu.utils.export_preflight import export_preflight

    m, _ = model_np
    out = export_preflight(m, "saved_model", peft_state={"merged": False}, strict=False)
    mol = [d for d in out["decisions"] if d["module_family"] == "MoLoRA"]
    assert mol and not mol[0]["supported"]
    out2 = export_preflight(m, "saved_model", peft_state={"merged": True}, strict=True)
    mol2 = [d for d in out2["decisions"] if d["module_family"] == "MoLoRA"]
    assert mol2 and mol2[0]["supported"]


def test_export_roundtrip_validation(model_np, tmp_path):
    from yolo_master_tpu.utils.export_preflight import validate_export_roundtrip

    m, p = model_np
    r = validate_export_roundtrip(m, p, "npz", imgsz=64, output=str(tmp_path / "m.npz"))
    assert r.passed, f"max_abs_error={r.max_abs_error}"
    assert r.artifact_bytes > 0


def test_edge_profiles():
    from yolo_master_tpu.edge import BUILTIN_PROFILES, get_profile

    assert get_profile("visdrone").imgsz == 960
    assert get_profile("coral").int8
    with pytest.raises(ValueError):
        get_profile("nope")
    assert "default" in BUILTIN_PROFILES


def test_deploy_for_edge_and_benchmark(model_np, tmp_path):
    from yolo_master_tpu.edge import benchmark_edge_model, deploy_for_edge

    m, p = model_np
    res = deploy_for_edge(m, p, formats=["tflite"], profile="default",
                          output_dir=tmp_path, imgsz=64)
    assert "tflite" in res and res["tflite"].exists()
    stats = benchmark_edge_model(res["tflite"], model=m, imgsz=64, warmup=1, runs=3)
    assert stats["mean_ms"] > 0 and stats["fps"] > 0
    assert stats["p95_ms"] >= stats["p50_ms"]


def test_deploy_for_edge_rejects_unknown_format(model_np):
    from yolo_master_tpu.edge import deploy_for_edge

    m, p = model_np
    with pytest.raises(ValueError, match="Unsupported"):
        deploy_for_edge(m, p, formats=["engine"])


def test_export_model_runs_preflight(model_np, tmp_path, caplog):
    """export_model preflights routed modules; strict mode propagates refusals
    from an injected all-refuse matrix via the default path being permissive —
    here we just assert the integrated call succeeds and stays silent for a
    fully-dynamic format."""
    from yolo_master_tpu.engine.exporter import export_model

    m, p = model_np
    path = export_model(m, p, "npz", imgsz=64, output=str(tmp_path / "w.npz"),
                        strict_preflight=True)
    assert Path(path).exists()
