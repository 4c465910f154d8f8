"""Agent JSON-skill dispatcher (reference agent/runtime/cli contract):
request {"skill", "inputs", "params", "dry_run"} -> response
{"skill", "status", "summary", ...}; errors become failed payloads."""

import json

import numpy as np
import pytest

from yolo_master_tpu.agent import HANDLERS, dispatch, main


def test_system_doctor():
    out = dispatch({"skill": "yolo.system"})
    assert out["status"] == "ok" and out["devices"]


def test_dry_run_plans():
    for skill in ("yolo.train", "yolo.val", "yolo.predict", "yolo.export", "yolo.benchmark",
                  "yolo.moe.diagnose", "yolo.moe.prune", "yolo.solutions.run"):
        req = {"skill": skill, "dry_run": True,
               "inputs": {"data": "d.yaml", "source": "x.jpg", "app": "counter"}, "params": {}}
        out = dispatch(req)
        assert out["status"] == "ok" and out.get("dry_run") and "plan" in out, (skill, out)


def test_error_contract():
    out = dispatch({"skill": "yolo.predict", "inputs": {}})
    assert out["status"] == "failed" and "source" in out["summary"]
    out = dispatch({"skill": "does.not.exist"})
    assert out["status"] == "failed" and "unsupported" in out["summary"]


def test_predict_runner_end_to_end(tmp_path):
    import cv2

    img_path = tmp_path / "im.jpg"
    cv2.imwrite(str(img_path), np.full((64, 64, 3), 120, np.uint8))
    cfg = {"skill": "yolo.predict",
           "inputs": {"model": "yolo-master-n", "source": str(img_path)},
           "params": {"imgsz": 64, "conf": 0.5, "max_nms": 64, "max_det": 4}}
    out = dispatch(cfg)
    assert out["status"] == "ok" and out["results"][0]["path"] == str(img_path)


def test_cli_entrypoint_exit_codes(tmp_path, capsys):
    req = tmp_path / "r.json"
    req.write_text(json.dumps({"skill": "yolo.system"}))
    assert main(["--request", str(req)]) == 0
    payload = json.loads(capsys.readouterr().out)
    assert payload["skill"] == "yolo.system"
    assert main(["--json", json.dumps({"skill": "bogus"})]) == 1


def test_handler_coverage():
    assert {"yolo.train", "yolo.val", "yolo.predict", "yolo.track", "yolo.export",
            "yolo.benchmark", "yolo.tune", "yolo.moe.diagnose", "yolo.moe.prune",
            "yolo.eval.sparse_sahi_compare", "yolo.solutions.run", "yolo.system",
            "yolo.model.inspect"} <= set(HANDLERS)
