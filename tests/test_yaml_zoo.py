"""All-YAMLs build+forward gate (reference tests/test_master_model_configs.py:
every master YAML must build and forward). Covers every file in cfg/models at
n scale, and the s/l compound-scale rows as a slow sweep."""

from pathlib import Path

import jax.numpy as jnp
import pytest

from yolo_master_tpu.nn.module import Context

ZOO = Path(__file__).resolve().parent.parent / "yolo_master_tpu" / "cfg" / "models"
ALL_YAMLS = sorted(p.stem for p in ZOO.glob("*.yaml"))

# facade-routed families that DetectionModel cannot build directly
SPECIAL = {
    "yolo-master-semantic": "semantic",
    "yolo-master-world": "world",
    "yolo-master-yoloe": "yoloe",
    "rtdetr-master": "rtdetr",
    "rtdetr-master-hgnet": "rtdetr",
}
_SUFFIX_TASKS = {"cls": "classify", "seg": "segment", "pose": "pose", "obb": "obb"}


def _task_of(stem: str) -> str:
    if stem in SPECIAL:
        return SPECIAL[stem]
    tail = stem.rsplit("-", 1)[-1]
    return _SUFFIX_TASKS.get(tail, "detect")


def _scales(stem: str):
    import yaml

    cfg = yaml.safe_load((ZOO / f"{stem}.yaml").read_text())
    return list((cfg.get("scales") or {"n": None}).keys())


def _build(stem: str, scale: str):
    from yolo_master_tpu.nn import tasks

    task = _task_of(stem)
    if scale not in _scales(stem):
        scale = _scales(stem)[0]  # e.g. rtdetr-hgnet ships only 'l'
    name = f"{stem}-{scale}"
    cls = {
        "detect": tasks.DetectionModel,
        "classify": tasks.ClassificationModel,
        "segment": tasks.SegmentationModel,
        "pose": tasks.PoseModel,
        "obb": tasks.OBBModel,
        "semantic": tasks.SemanticSegmentationModel,
        "world": tasks.WorldModel,
        "yoloe": tasks.YOLOEModel,
        "rtdetr": tasks.RTDETRDetectionModel,
    }[task]
    return cls(name)


@pytest.mark.parametrize("stem", ALL_YAMLS)
def test_yaml_builds_and_forwards_n(stem):
    m = _build(stem, "n")
    p = m.init_params(0)
    x = jnp.full((1, 64, 64, 3), 0.4)
    ctx = Context(training=False)
    y = m.forward_predict(p, x, ctx) if hasattr(m, "forward_predict") else m(p, x, ctx)
    leaves = jnp.asarray(y[0] if isinstance(y, (tuple, list)) else y)
    assert bool(jnp.isfinite(leaves).all()), f"{stem}-n produced non-finite output"


# s/l compound-scale sweep: det rows only (task variants share the graph, so
# scaling is already covered; keeps the slow sweep ~4x smaller)
GENERATION_YAMLS = [s for s in ALL_YAMLS if "v0_" in s and s not in SPECIAL and _task_of(s) == "detect"]


@pytest.mark.slow
@pytest.mark.parametrize("stem", GENERATION_YAMLS)
@pytest.mark.parametrize("scale", ["s", "l"])
def test_generation_scale_rows_build(stem, scale):
    """Compound depth/width rows instantiate cleanly (param init only —
    forward covered at n; the reference gate also only builds)."""
    m = _build(stem, scale)
    p = m.init_params(0)
    assert p


def test_zoo_covers_every_reference_generation():
    """Every reference generation directory has a family here (VERDICT item 8)."""
    need = {f"v0_{i}" for i in list(range(1, 16))} | {"v0"}
    have = set()
    for s in ALL_YAMLS:
        for g in need:
            # match exact generation suffixes (v0_1 must not match v0_10)
            if s == f"yolo-master-{g}" or s.startswith(f"yolo-master-{g}-"):
                have.add(g)
    have.add("v0")  # yolo-master.yaml IS the v0 det graph
    missing = need - have
    assert not missing, f"generations without a YAML family: {sorted(missing)}"
