"""Solutions apps + Muon optimizer gates."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def track_row(x1, y1, x2, y2, tid, score=0.9, cls=0):
    return [x1, y1, x2, y2, tid, score, cls]


def test_object_counter_line_crossing():
    from yolo_master_tpu.solutions import ObjectCounter

    counter = ObjectCounter(line=[(100, 0), (100, 200)])
    for x in (60, 80, 120, 140):  # track 1 crosses left->right
        counter.update(np.array([track_row(x - 10, 50, x + 10, 90, 1)]))
    out = counter.update(np.array([track_row(150, 50, 170, 90, 1)]))
    assert out["in"] + out["out"] == 1
    # a second track that never crosses
    for x in (20, 30, 40):
        out = counter.update(np.array([track_row(x, 50, x + 10, 90, 2)]))
    assert out["in"] + out["out"] == 1


def test_region_counter_and_queue():
    from yolo_master_tpu.solutions import QueueManager, RegionCounter

    rc = RegionCounter({"zone": [(0, 0), (100, 0), (100, 100), (0, 100)]})
    dets = np.array([[10, 10, 30, 30, 0.9, 0], [200, 200, 220, 220, 0.8, 1]])
    assert rc.count(dets) == {"zone": 1}

    qm = QueueManager(region=[(0, 0), (100, 0), (100, 100), (0, 100)], min_frames=2)
    t = np.array([track_row(10, 10, 30, 30, 7)])
    assert qm.update(t)["count"] == 0  # first frame: dwell too short
    assert qm.update(t)["count"] == 1


def test_heatmap_and_speed():
    from yolo_master_tpu.solutions import Heatmap, SpeedEstimator

    hm = Heatmap((100, 100))
    hm.update(np.array([[10, 10, 30, 30, 0.9, 0]]))
    acc = hm.update(np.array([[10, 10, 30, 30, 0.9, 0]]))
    assert acc[20, 20] > acc[50, 50]
    img = hm.render(np.zeros((100, 100, 3), np.uint8))
    assert img.shape == (100, 100, 3)

    sp = SpeedEstimator(pixels_per_meter=10, fps=30)
    sp.update(np.array([track_row(0, 0, 20, 20, 1)]))
    speeds = sp.update(np.array([track_row(10, 0, 30, 20, 1)]))  # 1 px = 0.1m per frame
    assert 50 < speeds[1] < 120  # ~1m/frame * 30fps * 3.6 ~ 108 km/h smoothed


def test_muon_orthogonalizes_and_descends():
    from yolo_master_tpu.optim import muon, musgd, newton_schulz_orthogonalize

    g = jnp.asarray(np.random.default_rng(0).standard_normal((64, 32)), jnp.float32)
    o = newton_schulz_orthogonalize(g)
    gram = np.asarray(o.T @ o)
    # columns approximately orthonormal
    off = gram - np.diag(np.diag(gram))
    assert np.abs(off).max() < 0.35
    assert abs(np.diag(gram).mean() - 1.0) < 0.35

    # quadratic descent with musgd
    W = jnp.asarray(np.random.default_rng(1).standard_normal((16, 16)), jnp.float32)
    params = {"w": jnp.zeros((16, 16))}
    tx = musgd(0.1, momentum=0.9)
    state = tx.init(params)

    def loss(p):
        return jnp.sum((p["w"] - W) ** 2)

    l0 = float(loss(params))
    for _ in range(50):
        grads = jax.grad(loss)(params)
        updates, state = tx.update(grads, state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
    assert float(loss(params)) < l0 * 0.25


def test_muon_hwio_matricization():
    """4D HWIO conv grads must be orthogonalized as [O, H*W*I] (the reference's
    torch OIHW reshape), not [kh, kw*I*O] (ADVICE r1, medium)."""
    import numpy as np
    from yolo_master_tpu.optim import newton_schulz_orthogonalize

    rng = np.random.default_rng(0)
    g = rng.normal(size=(3, 3, 8, 16)).astype(np.float32)  # HWIO
    out = np.asarray(newton_schulz_orthogonalize(jnp.asarray(g)))
    assert out.shape == g.shape
    m = out.transpose(3, 0, 1, 2).reshape(16, -1)  # [O, H*W*I]
    gram = m @ m.T
    # rows should be near-orthonormal after NS iteration on the [O, fan-in] matrix
    off = gram - np.diag(np.diag(gram))
    assert np.abs(np.diag(gram) - 1).mean() < 0.35
    assert np.abs(off).mean() < 0.08


def test_micro_dispatch_benchmarks():
    """benchmarks/micro.py (reference benchmark_{mot,molora}_dispatch.py):
    tiny-shape dispatch timings run and return well-formed results."""
    from yolo_master_tpu.benchmarks.micro import (
        bench_esmoe_dispatch,
        bench_molora_dispatch,
        bench_mot_dispatch,
    )

    m = bench_mot_dispatch(steps=2, batch=2, size=16, ch=32)
    assert m["dense_ms"] > 0 and m["sparse_ms"] > 0 and m["output_gap"] < 1e-3
    m = bench_molora_dispatch(steps=2, batch=2, size=8, ch=16)
    assert m["base_ms"] > 0 and m["routed_ms"] > 0
    m = bench_esmoe_dispatch(steps=2, batch=2, size=16, ch=32)
    assert m["dense_ms"] > 0 and m["sparse_ms"] > 0


def test_benchmark_suite_catalog(tmp_path):
    """suites.yaml catalog + run.py CLI (reference benchmarks/run.py)."""
    import json

    from yolo_master_tpu.benchmarks.run import main

    assert main(["--list"]) == 0
    out = tmp_path / "r.json"
    assert main(["--suite", "flops_gates", "--case", "moe4-expert-flops",
                 "--output", str(out)]) == 0
    r = json.loads(out.read_text())
    assert r["moe4-expert-flops"]["pass"] is True


def test_solution_config():
    """SolutionConfig (reference solutions/config.py): typed defaults,
    did-you-mean rejection, per-app subsetting."""
    import pytest

    from yolo_master_tpu.solutions import AIGym, QueueManager, SolutionConfig

    cfg = SolutionConfig().update(region=[(0, 0), (10, 0), (10, 10)], conf=0.5)
    assert cfg.conf == 0.5 and len(cfg.region) == 3
    with pytest.raises(ValueError, match="did you mean 'region'"):
        cfg.update(reigon=[(0, 0)])
    sub = cfg.for_app(QueueManager)
    assert "region" in sub and "json_file" not in sub
    QueueManager(**sub)  # config subset constructs the app
    gym = cfg.for_app(AIGym)
    assert gym["up_angle"] == 145.0 and "region" not in gym
