"""Repro-script harness (analog of reference scripts/reproduce/):
--check-build offline path + sparse-eval flipping + summary wiring."""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def test_check_build_subprocess():
    """reproduce_visdrone.py --check-build builds both nano variants offline."""
    out = subprocess.run(
        [sys.executable, str(REPO / "scripts/reproduce/reproduce_visdrone.py"),
         "--check-build", "--imgsz", "64"],
        capture_output=True, text=True, timeout=600,
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu", "HOME": str(Path.home())},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "v0.1-N" in out.stdout and "EsMoE-N" in out.stdout


def test_set_sparse_eval_flips_esmoe():
    sys.path.insert(0, str(REPO / "scripts/reproduce"))
    from _reproduce_common import set_sparse_eval

    from yolo_master_tpu.nn.tasks import DetectionModel

    m = DetectionModel("yolo-master-n")
    n = set_sparse_eval(m, False)
    assert n > 0  # found the ES_MOE blocks nested in the graph
    flipped = [x for x in _iter_flags(m)]
    assert flipped and not any(flipped)
    assert set_sparse_eval(m, True) == n


def _iter_flags(model):
    seen = set()

    def walk(obj, depth=0):
        if depth > 8 or id(obj) in seen or not hasattr(obj, "__dict__"):
            return
        seen.add(id(obj))
        if hasattr(obj, "use_sparse_inference"):
            yield obj.use_sparse_inference
        for v in vars(obj).values():
            for it in (v if isinstance(v, (list, tuple)) else [v]):
                if hasattr(it, "__dict__") and not isinstance(it, type):
                    yield from walk(it, depth + 1)

    for layer in getattr(model, "layers", []):
        yield from walk(layer)
