"""C++ gRPC serving client (VERDICT r2 item 10 — the Triton-client analog of
reference examples/YOLO11-Triton-CPP/inference.cpp, SURVEY §2.9(b)).

The client is dependency-free C++ (no grpc++/protobuf in the image): it
speaks the HTTP/2 + HPACK subset gRPC unary calls need, plus the ymt tensor
codec. This test compiles it with g++ and drives it against a live in-process
InferenceServer."""

import shutil
import subprocess
import sys
import time
from pathlib import Path

import numpy as np
import pytest

ROOT = Path(__file__).resolve().parent.parent
CPP = ROOT / "deploy" / "cpp"

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def client_bin(tmp_path_factory):
    if shutil.which("g++") is None:
        pytest.skip("g++ not available")
    if subprocess.run(["pkg-config", "--exists", "opencv4"]).returncode != 0:
        pytest.skip("OpenCV not available")
    out = tmp_path_factory.mktemp("bin") / "ymt_grpc_client"
    cflags = subprocess.check_output(["pkg-config", "--cflags", "opencv4"]).decode().split()
    libs = subprocess.check_output(["pkg-config", "--libs", "opencv4"]).decode().split()
    res = subprocess.run(
        ["g++", "-std=c++17", "-O2", f"-I{CPP / 'include'}", *cflags,
         str(CPP / "src" / "grpc_client_main.cpp"), *libs, "-o", str(out)],
        capture_output=True, text=True,
    )
    assert res.returncode == 0, f"client build failed:\n{res.stderr[-3000:]}"
    return out


@pytest.fixture(scope="module")
def live_server():
    pytest.importorskip("grpc")
    from yolo_master_tpu.engine.predictor import DetectionPredictor
    from yolo_master_tpu.models.yolo import YOLO
    from yolo_master_tpu.serving import InferenceServer

    mini = {
        "nc": 2,
        "backbone": [[-1, 1, "Conv", [8, 3, 2]], [-1, 1, "Conv", [16, 3, 2]], [-1, 1, "ES_MOE", [16]]],
        "head": [[[2], 1, "Detect", ["nc"]]],
    }
    y = YOLO(mini)
    pred = DetectionPredictor(y.model, y.params, imgsz=64, conf=1e-9)
    srv = InferenceServer(pred, names={0: "a", 1: "b"})
    port = srv.start(port=0)
    yield port
    srv.stop()


def test_cpp_client_roundtrip(client_bin, live_server, tmp_path):
    import cv2

    img = tmp_path / "in.png"
    arr = np.full((120, 160, 3), 40, np.uint8)
    cv2.rectangle(arr, (30, 30), (90, 90), (0, 200, 255), -1)
    cv2.imwrite(str(img), arr)

    res = subprocess.run(
        [str(client_bin), f"127.0.0.1:{live_server}", str(img), "64", "0"],
        capture_output=True, text=True, timeout=120,
    )
    assert res.returncode == 0, f"client failed:\nstdout={res.stdout}\nstderr={res.stderr}"
    assert '"nc": 2' in res.stdout, "metadata missing"
    # conf=0 -> the fixed-shape head always yields max_det rows
    last = [l for l in res.stdout.splitlines() if l.startswith("total:")]
    assert last and int(last[0].split()[1]) > 0, f"no detections flowed:\n{res.stdout}"


def test_cpp_client_synthetic_source(client_bin, live_server):
    res = subprocess.run(
        [str(client_bin), f"127.0.0.1:{live_server}", "synthetic", "64", "0"],
        capture_output=True, text=True, timeout=120,
    )
    assert res.returncode == 0, res.stderr
    assert "total:" in res.stdout
