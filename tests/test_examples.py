"""Examples smoke: each example script parses and the light ones run
end-to-end on the reference's bundled assets (reference examples/ analog)."""

import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
ASSET = "/root/reference/ultralytics/assets/bus.jpg"


def test_examples_compile():
    import py_compile

    scripts = sorted((REPO / "examples").glob("*.py"))
    assert len(scripts) >= 7
    for s in scripts:
        py_compile.compile(str(s), doraise=True)


def test_predict_example_runs(tmp_path):
    if not Path(ASSET).exists():
        pytest.skip("reference assets absent")
    out = subprocess.run(
        [sys.executable, str(REPO / "examples/predict_image.py"), ASSET,
         "--cpu", "--save", str(tmp_path / "out.jpg")],
        capture_output=True, text=True, timeout=600, cwd=str(REPO),
    )
    assert out.returncode == 0, out.stderr[-1500:]
    assert "saved:" in out.stdout and (tmp_path / "out.jpg").exists()
