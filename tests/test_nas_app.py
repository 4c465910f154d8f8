"""NAS wrapper + demo app (VERDICT r1 rows 57/64)."""

import numpy as np
import pytest


def _cfg():
    return {"nc": 2, "backbone": [
        [-1, 1, "Conv", [16, 3, 2]],
        [-1, 1, "Conv", [32, 3, 2]],
        [-1, 1, "Conv", [32, 3, 2]],
        [-1, 1, "Conv", [32, 3, 2]],
        [-1, 1, "Conv", [32, 3, 2]],
    ], "head": [[[2, 3, 4], 1, "Detect", ["nc"]]]}


def test_nas_rejects_yaml_and_predicts():
    from yolo_master_tpu.models import NAS

    with pytest.raises(AssertionError):
        NAS("model.yaml")
    nas = NAS(_cfg())
    img = np.full((80, 96, 3), 120, np.uint8)
    img[20:60, 30:70] = (0, 0, 230)
    results = nas.predict(img, imgsz=64, conf=1e-6, max_det=4, max_nms=256)
    assert len(results) == 1 and results[0].boxes is not None


def test_app_http_fallback_serves_page():
    import http.client
    import threading

    from yolo_master_tpu.app import launch_http

    httpd = launch_http(port=0, serve_forever=False)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", httpd.server_address[1], timeout=10)
        conn.request("GET", "/")
        resp = conn.getresponse()
        body = resp.read().decode()
        assert resp.status == 200 and "YOLO-Master TPU" in body and "predict" in body
    finally:
        httpd.shutdown()


def test_app_model_manager_scan(tmp_path):
    from yolo_master_tpu.app import ModelManager

    (tmp_path / "a-seg-best.npz").write_bytes(b"x")
    (tmp_path / "det.npz").write_bytes(b"x")
    m = ModelManager(str(tmp_path))
    scan = m.scan_checkpoints()
    assert any("seg" in p for p in scan["segment"])
    assert any("det" in p for p in scan["detect"])
