"""Open-world taxonomy + multimodal VLM fusion (reference
agent/runtime/open_world/taxonomy.py + multimodal/fusion.py)."""

from yolo_master_tpu.openworld import (
    Taxonomy,
    fuse_detections,
    normalize_label,
    open_world_comparison,
)


def test_normalize_label():
    assert normalize_label("  Flower   Bouquets ") == "flower bouquet"
    assert normalize_label("tree-trunk") == "tree trunk"
    assert normalize_label(None) == ""
    # short words and double-s words keep their 's'
    assert normalize_label("bus") == "bus"
    assert normalize_label("glass") == "glass"


def test_taxonomy_tiers():
    tax = Taxonomy(["bento box", "meatball", "flower arrangement", "coffee cup"])
    assert tax.canonicalize("Bento Box") == ("bento box", 1.0, "exact")
    label, score, how = tax.canonicalize("lunchbox")  # default alias
    assert label == "bento box" and how == "alias" and score == 0.9
    label, score, how = tax.canonicalize("cup")  # token containment
    assert label == "coffee cup" and how == "tokens"
    assert tax.canonicalize("food")[2] == "generic"
    assert tax.canonicalize("spaceship")[0] == ""


def test_fusion_add_suppress_relabel():
    dets = [
        {"box": [0, 0, 10, 10], "label": "cat", "conf": 0.9},
        {"box": [20, 20, 30, 30], "label": "dog", "conf": 0.1},
    ]
    props = [
        # overlaps confident det -> suppress refused
        {"box": [0, 0, 10, 10], "verdict": "suppress"},
        # overlaps unsure det -> suppressed
        {"box": [20, 20, 30, 30], "verdict": "suppress"},
        # new confident proposal far away -> added
        {"box": [50, 50, 60, 60], "label": "bento box", "confidence": 0.8},
        # low-confidence proposal -> ignored
        {"box": [70, 70, 80, 80], "label": "ghost", "confidence": 0.05},
    ]
    out = fuse_detections(dets, props)
    assert len(out["kept"]) == 1 and out["kept"][0]["label"] == "cat"
    assert len(out["suppressed"]) == 1 and out["suppressed"][0]["label"] == "dog"
    assert len(out["added"]) == 1 and out["added"][0]["source"] == "vlm"
    assert len(out["fused"]) == 2

    relabel = fuse_detections(dets, [{"box": [0, 0, 10, 10], "verdict": "relabel", "label": "tiger"}])
    assert relabel["kept"][0]["label"] == "tiger" and relabel["kept"][0]["relabeled"]


def test_open_world_comparison():
    gt = [
        {"box": [0, 0, 10, 10], "label": "bento box"},
        {"box": [20, 20, 30, 30], "label": "meatball"},
    ]
    preds = [
        {"box": [0, 0, 10, 10], "label": "lunchbox", "conf": 0.9},  # alias hit
        {"box": [20, 20, 30, 30], "label": "pizza", "conf": 0.8},  # wrong label
        {"box": [90, 90, 99, 99], "label": "meatball", "conf": 0.7},  # no GT box
    ]
    tax = Taxonomy(["bento box", "meatball", "pizza"])
    rep = open_world_comparison(preds, gt, taxonomy=tax)
    assert rep["matched"] == 2 and rep["label_hits"] == 1
    assert rep["per_label"]["bento box"]["hits"] == 1
    assert rep["per_label"]["meatball"]["misses"] == 1
    assert 0 < rep["precision"] < 1 and rep["recall"] == 0.5


def test_agent_runners_dispatch():
    from yolo_master_tpu.agent import dispatch

    out = dispatch({
        "skill": "yolo.multimodal.fuse",
        "inputs": {
            "detections": [{"box": [0, 0, 5, 5], "label": "cat", "conf": 0.9}],
            "proposals": [{"box": [50, 50, 60, 60], "label": "dog", "confidence": 0.9}],
        },
    })
    assert out["status"] == "ok" and len(out["fused"]) == 2

    out = dispatch({
        "skill": "yolo.eval.open_world",
        "inputs": {
            "predictions": [{"box": [0, 0, 5, 5], "label": "cat", "conf": 0.9}],
            "ground_truth": [{"box": [0, 0, 5, 5], "label": "cat"}],
            "vocabulary": ["cat", "dog"],
        },
    })
    assert out["status"] == "ok" and out["label_hits"] == 1

    # contract: dry_run returns a plan, missing inputs fail cleanly
    assert dispatch({"skill": "yolo.multimodal.fuse", "dry_run": True,
                     "inputs": {"detections": [], "proposals": []}})["dry_run"]
    assert dispatch({"skill": "yolo.eval.open_world"})["status"] == "failed"
